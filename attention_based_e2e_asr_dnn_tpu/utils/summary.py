"""Parameter-table model summary + real-batch shape/FLOP probe.

The fail-fast shape check the reference got from torchsummaryX on a real
batch at startup (reference: src/train.py:600-607), rebuilt as a param-pytree
walk plus a ``jax.eval_shape`` forward probe — per-module output shapes and
analytic FLOPs without running any compute (so it stays instant even on the
remote-compile TPU tunnel).
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp


def model_summary(params: Any, title: str = "model") -> str:
    """Render a per-leaf parameter table and total count."""
    lines = [f"{'param':60s} {'shape':>20s} {'count':>12s}"]
    lines.append("-" * 94)
    total = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = jax.tree_util.keystr(path)
        count = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 1
        shape = str(tuple(leaf.shape)) if hasattr(leaf, "shape") else "()"
        total += count
        lines.append(f"{name:60s} {shape:>20s} {count:>12,d}")
    lines.append("-" * 94)
    lines.append(f"{title}: {total:,d} parameters ({total/1e6:.2f}M)")
    return "\n".join(lines)


def shape_flop_summary(params: Any, las_cfg, batch: int, time_steps: int,
                       label_len: int, feat_dim: int = 15) -> str:
    """Per-module output shapes (via ``jax.eval_shape`` — abstract, zero
    compute) and analytic FLOPs on a real batch's shapes.

    The fail-fast equivalent of the reference's torchsummaryX call on the
    first batch (src/train.py:600-607): a listener/speller wiring mistake
    raises here, before the first epoch compiles.
    """
    from attention_based_e2e_asr_dnn_tpu.models.las import (
        las_apply,
        listener_apply,
    )
    from attention_based_e2e_asr_dnn_tpu.utils.flops import (
        las_forward_flops,
        las_train_step_flops,
        listener_flops,
        speller_flops,
    )

    x = jax.ShapeDtypeStruct((batch, time_steps, feat_dim), jnp.float32)
    lx = jax.ShapeDtypeStruct((batch,), jnp.int32)
    y = jax.ShapeDtypeStruct((batch, label_len), jnp.int32)

    enc_h, enc_l = jax.eval_shape(
        lambda p, x, lx: listener_apply(p["listener"], las_cfg.listener,
                                        None, x, lx, train=False),
        params, x, lx,
    )
    out = jax.eval_shape(
        lambda p, r, x, lx, y: las_apply(p, las_cfg, r, x, lx, dec_y=y,
                                         train=True),
        params, jax.random.key(0), x, lx, y,
    )
    enc_time = time_steps // las_cfg.listener.time_reduction
    l_flops = listener_flops(las_cfg, batch, time_steps)
    s_flops = speller_flops(las_cfg, batch, label_len, enc_time)
    fwd = las_forward_flops(las_cfg, batch, time_steps, label_len)
    train_flops = las_train_step_flops(las_cfg, batch, time_steps, label_len)

    lines = [
        f"{'module':24s} {'output shape':>28s} {'GFLOPs (fwd)':>14s}",
        "-" * 68,
        f"{'input':24s} {str((batch, time_steps, feat_dim)):>28s} {'-':>14s}",
        f"{'listener':24s} {str(tuple(enc_h.shape)):>28s} {l_flops/1e9:>14.2f}",
        f"{'speller (tf decode)':24s} {str(tuple(out.logits.shape)):>28s} {s_flops/1e9:>14.2f}",
        f"{'attention map':24s} {str(tuple(out.att_map.shape)):>28s} {'-':>14s}",
        "-" * 68,
        f"forward: {fwd/1e9:.2f} GFLOPs/batch "
        f"({fwd/batch/1e9:.2f} GFLOPs/utt) | "
        f"train step (fwd+bwd~3x): {train_flops/1e9:.2f} GFLOPs",
    ]
    from attention_based_e2e_asr_dnn_tpu.models.las import decode_route_report

    routes = decode_route_report()
    if routes:
        route_str = ", ".join(f"{k}->{v}" for k, v in routes.items())
        lines.append(f"decoder routes (traced so far): {route_str}")
    elif getattr(las_cfg.speller, "decoder_impl", "scan") == "pallas":
        lines.append("decoder routes: pallas requested (route decided per "
                     "traced shape; fallbacks warn on stderr)")
    return "\n".join(lines)
