"""Component-level timing of the flagship train step on the real chip.

Times, at bench shapes (B=128, T=1536, L=192, bf16, Pallas kernels):
  * the full train step (fwd + bwd + optimizer)         [bench.py parity]
  * listener forward / forward+backward
  * speller forward / forward+backward (given enc_h)
  * SpecAugment alone
  * optimizer update alone (tx.update + apply_updates)

Prints a table plus the implied residual (dispatch / fusion seams), and the
analytic-FLOPs MFU of each stage — this is the map for where the next
utilization push goes (VERDICT.md round-1 item 2).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from attention_based_e2e_asr_dnn_tpu.utils.compile_cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

from attention_based_e2e_asr_dnn_tpu.data.specaug import specaugment
from attention_based_e2e_asr_dnn_tpu.models.las import (
    las_config_from_dicts,
    las_init,
    listener_apply,
    speller_apply,
)
from attention_based_e2e_asr_dnn_tpu.training.loss import masked_ce_loss
from attention_based_e2e_asr_dnn_tpu.training.optim import build_optimizer
from attention_based_e2e_asr_dnn_tpu.training.steps import (
    create_train_state,
    make_train_step,
)
from attention_based_e2e_asr_dnn_tpu.utils.flops import (
    las_train_step_flops,
    listener_flops,
    peak_flops_per_chip,
    speller_flops,
)

BATCH, T, L, F = 128, 1536, 192, 15
DTYPE = jnp.bfloat16
WARMUP, STEPS = 2, 8


def bench(fn, *args, steps=STEPS, warmup=WARMUP, windows=3):
    """Back-to-back dispatch, one honest sync per window (scalar host pull —
    block_until_ready under-waits on this relay). Best of ``windows``: the
    tunnel shows multi-ms first-window jitter."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


def _sync(out):
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
    # pull ONE scalar element to the host
    float(jnp.asarray(leaves[0]).reshape(-1)[0].astype(jnp.float32))


def main():
    from attention_based_e2e_asr_dnn_tpu.utils.backend import probe_backend

    if not probe_backend():
        print("device backend unavailable (tunnel down) — aborting",
              file=sys.stderr)
        sys.exit(3)
    # PROF_ARCH=scaled profiles BASELINE.json config #5 (1024 hid, 4-head)
    # — the round-4 MFU investigation's map (VERDICT r3 weak #2)
    if os.environ.get("PROF_ARCH", "base") == "scaled":
        cfg = las_config_from_dicts(
            dict(input_dim=F, uniform_hid_dim=1024, lstm_layers=1,
                 plstm_layers=3, init_dropout=0.3, mid_dropout=0.3,
                 final_dropout=0.35, lstm_impl="pallas", remat=True),
            dict(att_proj_dim=256, att_heads=4, att_dropout=0.0,
                 dec_emb_dim=512, dec_emb_dropout=0.0, dec_lstm_hid_dim=1024,
                 dec_lstm_out_dim=256, dec_lstm_dropout=0.3,
                 CHR_MAX_STEPS=600,
                 decoder_impl=os.environ.get("PROF_DECODER", "pallas")),
        )
    else:
        cfg = las_config_from_dicts(
            dict(input_dim=F, uniform_hid_dim=512, lstm_layers=1, plstm_layers=3,
                 init_dropout=0.3, mid_dropout=0.3, final_dropout=0.35,
                 lstm_impl="pallas"),
            dict(att_proj_dim=256, att_heads=1, att_dropout=0.0, dec_emb_dim=512,
                 dec_emb_dropout=0.0, dec_lstm_hid_dim=512, dec_lstm_out_dim=256,
                 dec_lstm_dropout=0.3, CHR_MAX_STEPS=600,
                 decoder_impl=os.environ.get("PROF_DECODER", "pallas")),
        )
    params = las_init(jax.random.key(0), cfg)
    tx = build_optimizer("adamw", {"lr": 1e-3, "weight_decay": 5e-6,
                                   "amsgrad": True}, grad_norm=5.0)
    state = create_train_state(params, tx, jax.random.key(1))

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.normal(size=(BATCH, T, F)).astype(np.float32))
    xb = x.astype(DTYPE)
    lx = jax.device_put(np.full((BATCH,), T, np.int32))
    y = jax.device_put(rng.integers(0, 30, size=(BATCH, L)).astype(np.int32))
    ly = jax.device_put(np.full((BATCH,), L, np.int32))
    tf = jnp.asarray(0.9, jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)

    peak = peak_flops_per_chip() or float("nan")
    rows = []

    def row(name, seconds, flops=None):
        m = (flops / seconds / peak) if flops else float("nan")
        rows.append((name, seconds * 1e3, m))

    def try_row(name, thunk, flops=None):
        """A standalone component program can hit a scoped-VMEM compile OOM
        that the SAME kernel shapes do not hit inside the full step (Mosaic
        scoped allocation is context-dependent — docs/kernels.md measured
        ±65% model error). One failing row must not kill the whole map."""
        try:
            row(name, thunk(), flops)
        except Exception as exc:  # pragma: no cover - device-dependent
            msg = str(exc).splitlines()[0][:120]
            print(f"[profile] {name}: SKIPPED ({msg})", file=sys.stderr)
            rows.append((name, float("nan"), float("nan")))

    # --- full train step ---------------------------------------------------
    from attention_based_e2e_asr_dnn_tpu.models.las import las_apply

    def apply_fn(p, r, x_, lx_, dec_y=None, tf_rate=1.0, init_force=False,
                 train=False):
        return las_apply(p, cfg, r, x_, lx_, dec_y, tf_rate, init_force,
                         train, unroll=8)

    full = make_train_step(apply_fn, tx, compute_dtype=DTYPE,
                           use_specaug=True, donate=False)

    def run_full(state):
        s, m, _ = full(state, x, lx, y, ly, tf, lr)
        return m["loss"]

    t_full = bench(run_full, state)
    row("full train step", t_full, las_train_step_flops(cfg, BATCH, T, L))

    # --- listener ----------------------------------------------------------
    lk = jax.random.key(7)

    @jax.jit
    def lst_fwd(p, x_, lx_):
        h, l = listener_apply(p, cfg.listener, lk, x_, lx_, train=True)
        return h.sum()

    import optax

    @jax.jit
    def lst_fwdbwd(p, x_, lx_):
        g = jax.grad(lambda pp: listener_apply(
            pp, cfg.listener, lk, x_, lx_, train=True)[0].sum())(p)
        return optax.global_norm(g)  # consume EVERY grad (defeat DCE)

    lf = listener_flops(cfg, BATCH, T)
    try_row("listener fwd",
            lambda: bench(lst_fwd, params["listener"], xb, lx), lf)
    try_row("listener fwd+bwd",
            lambda: bench(lst_fwdbwd, params["listener"], xb, lx), 3 * lf)

    # --- speller (given enc_h) ----------------------------------------------
    enc_t = T // cfg.listener.time_reduction
    enc_h = jax.device_put(
        rng.normal(size=(BATCH, enc_t, cfg.listener.enc_out_dim))
    ).astype(DTYPE)
    enc_l = jax.device_put(np.full((BATCH,), enc_t, np.int32))
    sk = jax.random.key(8)

    @jax.jit
    def sp_fwd(p, eh, el, y_):
        out = speller_apply(p, cfg.speller, sk, eh, el, y_, tf_rate=0.9,
                            train=True)
        return out.logits.sum()

    @jax.jit
    def sp_fwdbwd(p, eh, el, y_, ly_):
        def loss(pp):
            out = speller_apply(pp, cfg.speller, sk, eh, el, y_, tf_rate=0.9,
                                train=True)
            return masked_ce_loss(out.logits, y_, ly_)[0]
        import optax
        return optax.global_norm(jax.grad(loss)(p))

    sf = speller_flops(cfg, BATCH, L, enc_t)
    try_row("speller fwd",
            lambda: bench(sp_fwd, params["speller"], enc_h, enc_l, y), sf)
    try_row("speller fwd+bwd",
            lambda: bench(sp_fwdbwd, params["speller"], enc_h, enc_l, y, ly),
            3 * sf)

    # --- joint fwd / fwd+bwd (no optimizer machinery) ------------------------
    mk = jax.random.key(9)

    @jax.jit
    def joint_fwd(p, x_, lx_, y_, ly_):
        out = las_apply(p, cfg, mk, specaugment(mk, x_, 6, 200, False)
                        .astype(DTYPE), lx_, y_, 0.9, False, True, unroll=8)
        return masked_ce_loss(out.logits, y_, ly_)[0]

    @jax.jit
    def joint_fwdbwd(p, x_, lx_, y_, ly_):
        import optax
        loss, g = jax.value_and_grad(joint_fwd)(p, x_, lx_, y_, ly_)
        return loss, optax.global_norm(g)

    jf = las_train_step_flops(cfg, BATCH, T, L)
    try_row("joint fwd (loss)",
            lambda: bench(joint_fwd, params, x, lx, y, ly), jf // 3)
    try_row("joint fwd+bwd",
            lambda: bench(joint_fwdbwd, params, x, lx, y, ly), jf)

    # --- full step without the nan guard -------------------------------------
    no_guard = make_train_step(apply_fn, tx, compute_dtype=DTYPE,
                               use_specaug=True, nan_guard=False,
                               donate=False)

    def run_no_guard(state):
        s, m, _ = no_guard(state, x, lx, y, ly, tf, lr)
        return m["loss"]

    row("full step, no guard", bench(run_no_guard, state), jf)

    # --- specaug -----------------------------------------------------------
    @jax.jit
    def aug(r, x_):
        return specaugment(r, x_, 6, 200, False)

    row("specaug", bench(aug, jax.random.key(3), x))

    # --- optimizer alone ----------------------------------------------------
    grads = jax.tree.map(jnp.ones_like, params)

    @jax.jit
    def opt(os_, g, p):
        up, os2 = tx.update(g, os_, p)
        import optax
        return optax.apply_updates(p, up)["speller"]["cls_b"]

    row("optimizer update", bench(opt, state.opt_state, grads, params))

    # --- report -------------------------------------------------------------
    print(f"\ndevice: {jax.devices()[0].device_kind}  "
          f"B={BATCH} T={T} L={L} dtype={DTYPE.__name__}")
    print(f"{'component':<22}{'ms':>9}{'MFU':>8}")
    for name, ms, m in rows:
        print(f"{name:<22}{ms:>9.2f}{m:>8.3f}" if m == m
              else f"{name:<22}{ms:>9.2f}{'—':>8}")
    known = sum(ms for n, ms, _ in rows
                if ms == ms and n in ("listener fwd+bwd", "speller fwd+bwd",
                                      "specaug", "optimizer update"))
    print(f"{'sum of parts':<22}{known:>9.2f}")
    print(f"{'residual (full-sum)':<22}{rows[0][1] - known:>9.2f}")


if __name__ == "__main__":
    main()
