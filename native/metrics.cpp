// Native metrics kernels for the TPU-native ASR framework.
//
// batch_levenshtein_ids: batched edit distance over id sequences — the native
// replacement for the third-party python-Levenshtein C extension the
// reference depends on (reference: src/train.py:13,419). Decode semantics
// match the reference idx_to_str (src/train.py:432-445): skip the <sos> id,
// stop at the first <eos> id; gold sequences are additionally truncated to
// their true length.
//
// Build: see native/Makefile -> libasrtpu.so, loaded via ctypes from
// attention_based_e2e_asr_dnn_tpu/utils/levenshtein.py.

#include <algorithm>
#include <cstdint>
#include <vector>
#include <thread>

namespace {

// Trim an id row: drop sos, cut at first eos. Returns length written to out.
int trim(const int32_t* row, int n, int32_t sos, int32_t eos, int32_t* out) {
  int m = 0;
  for (int i = 0; i < n; ++i) {
    int32_t v = row[i];
    if (v == sos) continue;
    if (v == eos) break;
    out[m++] = v;
  }
  return m;
}

int edit_distance(const int32_t* a, int n, const int32_t* b, int m) {
  if (n < m) { std::swap(a, b); std::swap(n, m); }
  if (m == 0) return n;
  std::vector<int> prev(m + 1), cur(m + 1);
  for (int j = 0; j <= m; ++j) prev[j] = j;
  for (int i = 1; i <= n; ++i) {
    cur[0] = i;
    const int32_t ai = a[i - 1];
    for (int j = 1; j <= m; ++j) {
      const int del = prev[j] + 1;
      const int ins = cur[j - 1] + 1;
      const int sub = prev[j - 1] + (ai != b[j - 1]);
      cur[j] = std::min(del, std::min(ins, sub));
    }
    std::swap(prev, cur);
  }
  return prev[m];
}

}  // namespace

extern "C" {

void batch_levenshtein_ids(const int32_t* pred, const int32_t* gold,
                           int32_t batch, int32_t pred_len, int32_t gold_len,
                           const int32_t* gold_lens, int32_t sos, int32_t eos,
                           int32_t* out) {
  const unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  const int n_threads = static_cast<int>(std::min<unsigned>(hw, batch));

  auto work = [&](int start, int stop) {
    std::vector<int32_t> pbuf(pred_len), gbuf(gold_len);
    for (int b = start; b < stop; ++b) {
      const int pn =
          trim(pred + static_cast<int64_t>(b) * pred_len, pred_len, sos, eos,
               pbuf.data());
      const int limit = std::min(gold_lens[b], gold_len);
      const int gn = trim(gold + static_cast<int64_t>(b) * gold_len, limit,
                          sos, eos, gbuf.data());
      out[b] = edit_distance(pbuf.data(), pn, gbuf.data(), gn);
    }
  };

  if (n_threads <= 1) {
    work(0, batch);
    return;
  }
  std::vector<std::thread> threads;
  const int chunk = (batch + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int start = t * chunk;
    const int stop = std::min<int>(start + chunk, batch);
    if (start >= stop) break;
    threads.emplace_back(work, start, stop);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
