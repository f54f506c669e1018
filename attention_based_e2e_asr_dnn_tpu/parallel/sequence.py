"""Sequence-parallel cross-attention over a device mesh.

SURVEY.md §5.7 flags where sequence parallelism slots in: "sharding the
encoder time axis of K/V if sequence length ever outgrew a chip". This
module implements that: the attention cache's time axis is sharded over a
mesh axis, each device computes scores/partial context over its local
frames, and a numerically-stable global softmax is assembled with
``psum``/``pmax`` collectives (the flash-attention/ring-attention
decomposition, one hop instead of a ring since K/V stay resident).

For LAS-scale encodings (T/8 frames) a single chip is plenty — this is the
scale-out path for very long inputs, validated on the CPU mesh in tests.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from attention_based_e2e_asr_dnn_tpu.ops.attention import AttentionCache, linear_apply
from attention_based_e2e_asr_dnn_tpu.ops.precision import matmul_precision


def _local_attention_step(params, keys, values, mask, dec_h, heads,
                          legacy_scale, axis_name):
    """Per-shard body: local scores -> globally-normalized context via psum."""
    batch = dec_h.shape[0]
    proj_dim = params["query_map"]["w"].shape[1]
    d_head = proj_dim // heads
    dtype = dec_h.dtype
    prec = matmul_precision(dtype)

    q_proj = linear_apply(params["query_map"], dec_h)
    q = q_proj.reshape(batch, heads, d_head)
    scale = math.sqrt(d_head) if legacy_scale else 1.0 / math.sqrt(d_head)
    scores = jnp.einsum("bhd,bhtd->bht", q, keys, precision=prec) * jnp.asarray(
        scale, dtype
    )
    neg = jnp.finfo(dtype).min
    scores = jnp.where(mask[:, None, :], neg, scores)

    # stable global softmax: global max, then psum of exp-sums and weighted V
    local_max = jnp.max(scores, axis=-1)                       # (B, h)
    global_max = jax.lax.pmax(local_max, axis_name)
    exp = jnp.where(
        mask[:, None, :], jnp.zeros((), dtype),
        jnp.exp(scores - global_max[..., None]),
    )
    denom = jax.lax.psum(jnp.sum(exp, axis=-1), axis_name)     # (B, h)
    ctx_num = jnp.einsum("bht,bhtd->bhd", exp, values, precision=prec)
    ctx_num = jax.lax.psum(ctx_num, axis_name)                 # (B, h, d)
    context = (ctx_num / denom[..., None]).reshape(batch, proj_dim)
    wgts_local = exp / denom[..., None]                        # (B, h, T_local)
    return context, wgts_local, q_proj


def sequence_parallel_attention_step(
    params: dict,
    cache: AttentionCache,
    dec_h: jnp.ndarray,
    heads: int,
    mesh: Mesh,
    axis_name: str = "seq",
    legacy_scale: bool = False,
):
    """cross_attention_step with the cache's time axis sharded over ``mesh``.

    cache.keys/values: (B, heads, T, d_head) with T sharded on ``axis_name``;
    cache.mask: (B, T) likewise. dec_h replicated. Returns (context, wgts,
    q_proj) where wgts keeps the sharded layout.
    """
    fn = partial(_local_attention_step, heads=heads, legacy_scale=legacy_scale,
                 axis_name=axis_name)
    shard = partial(jax.sharding.NamedSharding, mesh)
    mapped = jax.shard_map(
        lambda k, v, m, q: fn(params, k, v, m, q),
        mesh=mesh,
        in_specs=(P(None, None, axis_name, None),
                  P(None, None, axis_name, None),
                  P(None, axis_name),
                  P()),
        out_specs=(P(), P(None, None, axis_name), P()),
        check_vma=False,
    )
    return mapped(cache.keys, cache.values, cache.mask, dec_h)


def shard_cache_over_time(cache: AttentionCache, mesh: Mesh,
                          axis_name: str = "seq") -> AttentionCache:
    """Place an AttentionCache with its time axis sharded over the mesh."""
    kv_sharding = NamedSharding(mesh, P(None, None, axis_name, None))
    mask_sharding = NamedSharding(mesh, P(None, axis_name))
    return AttentionCache(
        keys=jax.device_put(cache.keys, kv_sharding),
        values=jax.device_put(cache.values, kv_sharding),
        mask=jax.device_put(cache.mask, mask_sharding),
    )
