"""Probe: pallas_call (real Mosaic, not interpret) inside jax.shard_map.

Runs the shard_map DP train step on a 1-device 'data' mesh ON THE REAL TPU
with both Pallas kernel tiers at base dims. CPU tests run the kernels in
interpret mode, which cannot prove Mosaic lowers inside shard_map's
manual-sharding context — this does.
"""
import sys, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.sharding import Mesh
from attention_based_e2e_asr_dnn_tpu.models.las import (
    las_apply, las_config_from_dicts, las_init)
from attention_based_e2e_asr_dnn_tpu.parallel.dp import (
    make_dp_eval_step, make_dp_train_step)
from attention_based_e2e_asr_dnn_tpu.training.optim import build_optimizer
from attention_based_e2e_asr_dnn_tpu.training.steps import create_train_state
from attention_based_e2e_asr_dnn_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()
print("devices:", jax.devices())
cfg = las_config_from_dicts(
    dict(input_dim=15, uniform_hid_dim=512, lstm_layers=1, plstm_layers=3,
         init_dropout=0.3, mid_dropout=0.3, final_dropout=0.35,
         lstm_impl="pallas"),
    dict(att_proj_dim=256, att_heads=1, att_dropout=0.0, dec_emb_dim=512,
         dec_emb_dropout=0.0, dec_lstm_hid_dim=512, dec_lstm_out_dim=256,
         dec_lstm_dropout=0.3, CHR_MAX_STEPS=600, decoder_impl="pallas"),
)
params = las_init(jax.random.key(0), cfg)
tx = build_optimizer("adamw", {"lr": 1e-3}, grad_norm=5.0)
state = create_train_state(params, tx, jax.random.key(1))
mesh = Mesh(np.array(jax.devices()[:1]), ("data",))

def apply_fn(p, rng, x, lx, dec_y=None, tf_rate=1.0, init_force=False, train=False):
    return las_apply(p, cfg, rng, x, lx, dec_y, tf_rate, init_force, train, 8)

step = make_dp_train_step(apply_fn, tx, mesh, compute_dtype=jnp.bfloat16,
                          use_specaug=True, donate=False)
rng = np.random.default_rng(0)
B, T, L = 32, 512, 64
x = jax.device_put(rng.normal(size=(B, T, 15)).astype(np.float32))
lx = jax.device_put(np.full((B,), T, np.int32))
y = jax.device_put(rng.integers(0, 30, size=(B, L)).astype(np.int32))
ly = jax.device_put(np.full((B,), L, np.int32))
s2, m, att = step(state, x, lx, y, ly, jnp.float32(0.9), jnp.float32(1e-3))
loss = float(m["loss"])
assert np.isfinite(loss), loss
ev = make_dp_eval_step(apply_fn, mesh, compute_dtype=jnp.bfloat16)
me, ids = ev(s2.params, x, lx, y, ly)
assert np.isfinite(float(me["loss"]))
print(json.dumps({"probe": "pallas-in-shard_map on real TPU", "ok": True,
                  "train_loss": loss, "eval_loss": float(me["loss"])}))
