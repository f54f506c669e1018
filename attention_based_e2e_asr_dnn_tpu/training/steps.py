"""Functional jitted train/eval steps — the TPU replacement for the
reference's mutable Trainer hot loop (src/train.py:104-197).

Design:
  * TrainState pytree (params, opt_state, rng, step) donated to the jitted
    step — no host round trips inside an epoch except scalar metrics;
  * learning rate and teacher-forcing rate enter as runtime scalars (no
    recompile when schedulers move them); the LR is written into the
    inject_hyperparams leaf functionally inside the step;
  * bf16 compute policy: activations cast to ``compute_dtype``, params and
    optimizer state stay float32 (replacing CUDA AMP + GradScaler — bf16 on
    TPU needs no loss scaling, SURVEY.md §2.9);
  * SpecAugment runs on device inside the step (reference did it in the host
    collate, src/utils.py:122-126);
  * a NaN/inf guard skips the optimizer update for non-finite gradients (the
    reference had this commented out, src/train.py:174-176).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from attention_based_e2e_asr_dnn_tpu.data.specaug import specaugment
from attention_based_e2e_asr_dnn_tpu.training.loss import masked_ce_loss


def _cast_features(x, compute_dtype):
    """Cast float features to the compute dtype; integer inputs (the
    Rewriter's char ids) pass through untouched."""
    if jnp.issubdtype(x.dtype, jnp.floating):
        return x.astype(compute_dtype)
    return x


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    rng: jax.Array
    step: jnp.ndarray  # int32 update counter


def create_train_state(params, tx: optax.GradientTransformation, rng: jax.Array) -> TrainState:
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        rng=rng,
        step=jnp.zeros((), jnp.int32),
    )


def _set_lr(opt_state, lr, accum_steps: int):
    """Functionally write the LR into the inject_hyperparams leaf."""
    if accum_steps > 1:
        inner = opt_state.inner_opt_state
        hp = dict(inner.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return opt_state._replace(inner_opt_state=inner._replace(hyperparams=hp))
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(hyperparams=hp)


def make_train_step(
    apply_fn,
    tx: optax.GradientTransformation,
    accum_steps: int = 1,
    compute_dtype=jnp.float32,
    use_specaug: bool = False,
    specaug_freq: int = 6,
    specaug_time: int = 200,
    specaug_iid: bool = False,
    nan_guard: bool = True,
    donate: bool = True,
):
    """Build the jitted train step.

    ``apply_fn(params, rng, x, lx, dec_y, tf_rate, init_force, train)`` must
    return an object with ``.logits`` and ``.att_map`` (las_apply /
    rewriter_apply partials).

    Returned step signature:
        step(state, x, lx, y, ly, tf_rate, lr, init_force) ->
            (state, metrics dict, att_map)
    ``y`` must already have <sos> stripped (trainer does it, parity with
    src/train.py:117).
    """

    def loss_fn(params, rng, x, lx, y, ly, tf_rate, init_force):
        out = apply_fn(
            params, rng, _cast_features(x, compute_dtype), lx, dec_y=y,
            tf_rate=tf_rate, init_force=init_force, train=True,
        )
        loss, n_tokens = masked_ce_loss(out.logits, y, ly)
        return loss, (n_tokens, out.att_map)

    @partial(jax.jit, static_argnames=("init_force",), donate_argnums=(0,) if donate else ())
    def step(state: TrainState, x, lx, y, ly, tf_rate, lr, init_force: bool = False):
        rng, aug_rng, model_rng = jax.random.split(state.rng, 3)
        if use_specaug:
            x = specaugment(aug_rng, x, specaug_freq, specaug_time, specaug_iid)

        (loss, (n_tokens, att_map)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, model_rng, x, lx, y, ly, tf_rate, init_force)

        grad_norm = optax.global_norm(grads)
        ok = jnp.isfinite(grad_norm) if nan_guard else jnp.array(True)

        opt_state = _set_lr(state.opt_state, lr, accum_steps)
        if nan_guard:
            # A non-finite batch must be a true no-op: zero the applied
            # update AND keep the previous optimizer state, otherwise Adam's
            # stale momentum / AdamW's decoupled weight decay still move the
            # parameters on the "skipped" step.
            grads = jax.tree.map(
                lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads
            )
            updates, new_opt_state = tx.update(grads, opt_state, state.params)
            updates = jax.tree.map(
                lambda u: jnp.where(ok, u, jnp.zeros_like(u)), updates
            )
            opt_state = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old)
                if hasattr(new, "shape") else new,
                new_opt_state, opt_state,
            )
        else:
            updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        metrics = {
            "loss": loss,
            "ppl": jnp.exp(loss),
            "grad_norm": grad_norm,
            "n_tokens": n_tokens,
            "finite": ok,
        }
        return TrainState(params, opt_state, rng, state.step + 1), metrics, att_map

    return step


def make_eval_step(apply_fn, compute_dtype=jnp.float32):
    """Build the jitted free-running eval step (reference: src/train.py:199-258).

    The model free-runs (dec_y=None -> CHR_MAX_STEPS greedy steps); loss is
    computed on logits truncated to the label length; greedy ids are returned
    for the host-side Levenshtein pass.
    """

    @jax.jit
    def step(params, x, lx, y, ly):
        out = apply_fn(
            params, None, _cast_features(x, compute_dtype), lx, dec_y=None,
            tf_rate=0.0, init_force=False, train=False,
        )
        logits = out.logits
        # truncate BOTH sides to the shorter horizon: the reference slices
        # logits[:, :label_len] (src/train.py:226) and implicitly requires
        # CHR_MAX_STEPS >= label_len; this stays correct either way
        n = min(logits.shape[1], y.shape[1])
        loss, n_tokens = masked_ce_loss(
            logits[:, :n, :], y[:, :n], jnp.minimum(ly, n)
        )
        pred_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return {"loss": loss, "ppl": jnp.exp(loss), "n_tokens": n_tokens}, pred_ids

    return step


def make_infer_step(apply_fn, compute_dtype=jnp.float32):
    """Greedy inference step: features -> predicted ids (B, CHR_MAX_STEPS)."""

    @jax.jit
    def step(params, x, lx):
        out = apply_fn(
            params, None, _cast_features(x, compute_dtype), lx, dec_y=None,
            tf_rate=0.0, init_force=False, train=False,
        )
        return jnp.argmax(out.logits, axis=-1).astype(jnp.int32)

    return step
