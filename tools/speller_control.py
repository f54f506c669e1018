"""Stripped controls for the SCALED-arch speller tier (VERDICT r4 weak #1).

Round 4 asserted (one sentence) that the scaled arch's 45 ms speller
fwd+bwd wall is structural: "per-step (B,4H) work with Te-bounded attention
reads cannot tile the MXU". This harness PROVES or REFUTES that with the
same method as round 3's gates-stripped listener control: strip the decode
loop down one mechanism at a time and measure each wall on-chip.

Variants (all lax.scan over L teacher-forced steps, bf16, B=128, the
scaled dims h1=1024/h2=256/proj=256/heads=4/emb=512):

  * full        — embed + cell1 + cell2 + attention + tied classifier
                  (the scan twin of the fused kernel's work)
  * noattn      — context frozen at its initial value: same chain, no
                  per-step K/V reads or softmax
  * cells       — the bare 2-cell recurrence on a fixed input (no embed,
                  no attention, no classifier): the irreducible serial chain
  * attn_only   — per-step attention on a FIXED query: the read/softmax
                  cost with no recurrence
  * cls_batched — the classifier matmul over ALL steps as one (B*L, .)
                  MXU op: what the per-step classifier work costs when it
                  CAN tile

Speed-of-light for each variant = its analytic matmul FLOPs / 197 TFLOP/s.
If wall(cells) alone dominates wall(full) and sits far above its own
speed-of-light, the tier is chain-latency-bound — structural, not a
scheduling gap. Writes results/speller_control_scaled.json.

Also measures the FUSED KERNEL tier (speller_apply, decoder_impl=pallas)
fwd and fwd+bwd at TPU_LAS_BIGH_BB in {16, 32} — the round-5 chunk-cap A/B.
"""

from __future__ import annotations

import json
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

from attention_based_e2e_asr_dnn_tpu.models.las import (
    las_config_from_dicts,
    las_init,
    speller_apply,
)
from attention_based_e2e_asr_dnn_tpu.ops.attention import (
    cross_attention_precompute,
    cross_attention_step,
)
from attention_based_e2e_asr_dnn_tpu.ops.lstm import lstm_cell_step
from attention_based_e2e_asr_dnn_tpu.training.loss import masked_ce_loss
from attention_based_e2e_asr_dnn_tpu.utils.flops import peak_flops_per_chip

B, TE, L, F = 128, 192, 192, 15
H1, H2, PROJ, EMB, HEADS, V = 1024, 256, 256, 512, 4, 30
DTYPE = jnp.bfloat16
WARMUP, STEPS, WINDOWS = 2, 8, 3


def bench(fn, *args):
    out = None
    for _ in range(WARMUP):
        out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / STEPS)
    return best


def _sync(out):
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
    float(jnp.asarray(leaves[0]).reshape(-1)[0].astype(jnp.float32))


def scaled_cfg(decoder_impl: str):
    return las_config_from_dicts(
        dict(input_dim=F, uniform_hid_dim=H1, lstm_layers=1, plstm_layers=3,
             init_dropout=0.3, mid_dropout=0.3, final_dropout=0.35,
             lstm_impl="pallas", remat=True),
        dict(att_proj_dim=PROJ, att_heads=HEADS, att_dropout=0.0,
             dec_emb_dim=EMB, dec_emb_dropout=0.0, dec_lstm_hid_dim=H1,
             dec_lstm_out_dim=H2, dec_lstm_dropout=0.3, CHR_MAX_STEPS=600,
             decoder_impl=decoder_impl),
    )


def make_variant(variant: str, params, cfg):
    """Teacher-forced decode scan with pieces stripped per ``variant``."""
    sp = params["speller"]
    spc = cfg.speller
    emb = sp["char_emb"].astype(DTYPE)

    def run(enc_h, enc_l, y):
        cache = cross_attention_precompute(sp["attention"], enc_h, enc_l,
                                           HEADS)
        h1 = jnp.broadcast_to(sp["init_h1"].astype(DTYPE), (B, H1))
        c1 = jnp.broadcast_to(sp["init_c1"].astype(DTYPE), (B, H1))
        h2 = jnp.broadcast_to(sp["init_h2"].astype(DTYPE), (B, H2))
        c2 = jnp.broadcast_to(sp["init_c2"].astype(DTYPE), (B, H2))
        q0 = jnp.broadcast_to(sp["init_query"].astype(DTYPE), (B, H2))
        ctx0, _, _ = cross_attention_step(sp["attention"], cache, q0, HEADS,
                                          spc.legacy_scale)
        gold = emb[y]                                   # (B, L, EMB)
        fixed_in = jnp.zeros((B, EMB + PROJ), DTYPE)

        def step(carry, g_t):
            h1, c1, h2, c2, ctx = carry
            if variant == "cells":
                cell_in = fixed_in
            else:
                cell_in = jnp.concatenate([g_t, ctx], axis=-1)
            h1n, c1n = lstm_cell_step(sp["cell1"], cell_in, h1, c1)
            h2n, c2n = lstm_cell_step(sp["cell2"], h1n, h2, c2)
            if variant == "full":
                ctxn, _, qp = cross_attention_step(
                    sp["attention"], cache, h2n, HEADS, spc.legacy_scale)
                logits = jnp.dot(jnp.concatenate([qp, ctxn], -1), emb.T,
                                 preferred_element_type=DTYPE)
            elif variant == "noattn":
                ctxn = ctx
                logits = jnp.dot(jnp.concatenate([h2n, ctxn], -1)[:, :EMB],
                                 emb.T, preferred_element_type=DTYPE)
            else:  # cells
                ctxn = ctx
                logits = h2n
            return (h1n, c1n, h2n, c2n, ctxn), logits

        _, outs = jax.lax.scan(step, (h1, c1, h2, c2, ctx0),
                               jnp.swapaxes(gold, 0, 1))
        return outs

    return run


def main():
    from attention_based_e2e_asr_dnn_tpu.utils.backend import probe_backend

    if not probe_backend():
        print("device backend unavailable — aborting", file=sys.stderr)
        sys.exit(3)

    peak = peak_flops_per_chip() or float("nan")
    cfg = scaled_cfg("scan")
    params = las_init(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    enc_h = jax.device_put(
        rng.normal(size=(B, TE, 2 * H1)).astype(np.float32)).astype(DTYPE)
    enc_l = jax.device_put(np.full((B,), TE, np.int32))
    y = jax.device_put(rng.integers(0, V, size=(B, L)).astype(np.int32))
    ly = jax.device_put(np.full((B,), L, np.int32))

    # analytic per-variant matmul FLOPs (fwd)
    cell1 = 2 * B * (EMB + PROJ + H1) * 4 * H1 * L
    cell2 = 2 * B * (H1 + H2) * 4 * H2 * L
    attn = 2 * B * (H2 * PROJ + 2 * TE * PROJ) * L   # q proj + scores + ctx
    cls = 2 * B * (PROJ + PROJ) * V * L
    flops = {"full": cell1 + cell2 + attn + cls,
             "noattn": cell1 + cell2 + cls,
             "cells": cell1 + cell2}

    results = {"shapes": dict(B=B, Te=TE, L=L, h1=H1, h2=H2, proj=PROJ,
                              heads=HEADS, emb=EMB, dtype="bfloat16"),
               "peak_flops": peak, "walls_ms": {}, "mfu": {}}

    for variant in ("full", "noattn", "cells"):
        run = jax.jit(make_variant(variant, params, cfg))
        t = bench(run, enc_h, enc_l, y)
        results["walls_ms"][f"{variant}_fwd"] = round(t * 1e3, 2)
        results["mfu"][f"{variant}_fwd"] = round(flops[variant] / t / peak, 4)

        import optax

        grad_run = jax.jit(lambda p, v=variant: optax.global_norm(
            jax.grad(lambda pp: make_variant(v, {"speller": pp}, cfg)(
                enc_h, enc_l, y).astype(jnp.float32).sum())(p)))
        t2 = bench(grad_run, params["speller"])
        results["walls_ms"][f"{variant}_fwdbwd"] = round(t2 * 1e3, 2)
        results["mfu"][f"{variant}_fwdbwd"] = round(
            3 * flops[variant] / t2 / peak, 4)

    # attention-only: per-step reads/softmax on a fixed query, no recurrence
    sp = params["speller"]

    @jax.jit
    def attn_only(enc_h_, enc_l_):
        cache = cross_attention_precompute(sp["attention"], enc_h_, enc_l_,
                                           HEADS)
        q = jnp.zeros((B, H2), DTYPE)

        def step(carry, _):
            ctx, _, _ = cross_attention_step(sp["attention"], cache, q,
                                             HEADS, cfg.speller.legacy_scale)
            return carry + ctx.astype(jnp.float32).sum(), None

        acc, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=L)
        return acc

    t = bench(attn_only, enc_h, enc_l)
    results["walls_ms"]["attn_only_fwd"] = round(t * 1e3, 2)
    results["mfu"]["attn_only_fwd"] = round(attn / t / peak, 4)

    # classifier as ONE batched MXU op — the "if it could tile" bound
    wide = jax.device_put(
        rng.normal(size=(B * L, 2 * PROJ)).astype(np.float32)).astype(DTYPE)

    @jax.jit
    def cls_batched(w):
        return jnp.dot(w, sp["char_emb"].astype(DTYPE).T,
                       preferred_element_type=DTYPE).sum()

    t = bench(cls_batched, wide)
    results["walls_ms"]["cls_batched"] = round(t * 1e3, 2)

    # the FUSED KERNEL tier at both chunk caps (round-5 bb A/B)
    for bb in ("16", "32"):
        os.environ["TPU_LAS_BIGH_BB"] = bb
        pcfg = scaled_cfg("pallas")
        sk = jax.random.key(8)

        @jax.jit
        def sp_fwd(p, eh, el, y_):
            out = speller_apply(p, pcfg.speller, sk, eh, el, y_, tf_rate=0.9,
                                train=True)
            return out.logits.sum()

        @jax.jit
        def sp_fwdbwd(p, eh, el, y_, ly_):
            import optax

            def loss(pp):
                out = speller_apply(pp, pcfg.speller, sk, eh, el, y_,
                                    tf_rate=0.9, train=True)
                return masked_ce_loss(out.logits, y_, ly_)[0]

            return optax.global_norm(jax.grad(loss)(p))

        try:
            t_f = bench(sp_fwd, params["speller"], enc_h, enc_l, y)
            t_fb = bench(sp_fwdbwd, params["speller"], enc_h, enc_l, y, ly)
            results["walls_ms"][f"pallas_bb{bb}_fwd"] = round(t_f * 1e3, 2)
            results["walls_ms"][f"pallas_bb{bb}_fwdbwd"] = round(t_fb * 1e3, 2)
        except Exception as exc:
            results["walls_ms"][f"pallas_bb{bb}_fwd"] = None
            results[f"pallas_bb{bb}_error"] = str(exc).splitlines()[0][:160]
    os.environ.pop("TPU_LAS_BIGH_BB", None)

    print(json.dumps(results, indent=1))
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "speller_control_scaled.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"written: {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
