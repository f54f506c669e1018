"""Pipeline parallelism: the LAS graph staged across devices.

The reference has no distributed support at all (SURVEY.md §2.9); DP, TP and
sequence parallelism live in parallel/mesh.py / parallel/sequence.py. This
module adds the remaining axis: a 2-stage GPipe-style pipeline that puts the
**Listener on one device (group) and the Speller on another**, streaming
microbatches through both.

TPU-native design choice: instead of translating send/recv collectives, the
pipeline is expressed as per-stage jitted programs whose inputs live on their
stage's device — XLA's async dispatch + ICI transfers ARE the pipeline. While
the Speller (stage 1) processes microbatch i, the Listener (stage 0) is
already computing microbatch i+1; each device's execution queue is serial,
cross-device dependencies are enforced by the runtime.

Backward uses activation recomputation on stage 0 (the standard 1F1B remat
trade): the listener backward re-runs its forward instead of shipping
residuals across the wire — the same FLOPs-for-memory trade as
``jax.checkpoint``, which also bounds pipeline activation memory to one
microbatch.

Gradients never cross stages (each stage owns disjoint parameters), so the
optimizer update runs per-stage on the stage's own device; only the
(B_mb, T/8, 2H) encoder activations and their cotangents cross the wire.

PP x DP composition (``dp > 1``): each stage owns a dp-device 1-D mesh
instead of a single device. Microbatches shard over the stage mesh's
'data' axis, stage params/optimizer state replicate within the stage
group, and jit compiles each stage program SPMD over its mesh — GSPMD
derives the within-stage gradient all-reduce from the annotations exactly
like plain DP (parallel/mesh.py). The pipeline loop itself is unchanged:
`jax.device_put` between the two stage meshes is the cross-stage transfer
(device-to-device resharding), and the cross-stage global norm is still
two replicated scalars.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from attention_based_e2e_asr_dnn_tpu.models.las import (
    LASConfig,
    listener_apply,
    speller_apply,
)
from attention_based_e2e_asr_dnn_tpu.training.loss import masked_ce_loss


class PipelineState(NamedTuple):
    """Per-stage params + optimizer state, pinned to their stage's device.

    ``acc_listener``/``acc_speller`` hold the cross-batch gradient
    accumulators when ``accu_grad > 1`` (None between windows / when
    accumulation is off), and ``acc_count`` is the window position — kept
    IN the state (not a host-side counter) so a state reset/rollback/resume
    can never desync position from accumulator. They are NOT checkpointed:
    resuming mid-window restarts the accumulation window (the single-device
    optax.MultiSteps counterpart checkpoints its window, a documented
    deviation)."""

    params_listener: dict
    params_speller: dict
    opt_listener: tuple
    opt_speller: tuple
    rng: jax.Array
    acc_listener: Optional[dict] = None
    acc_speller: Optional[dict] = None
    acc_count: int = 0

    # Trainer-protocol views (checkpoint payloads, eval, summaries)
    @property
    def params(self) -> dict:
        return {"listener": self.params_listener,
                "speller": self.params_speller}

    @property
    def opt_state(self) -> dict:
        return {"listener": self.opt_listener, "speller": self.opt_speller}


def _stage_placements(devices: Sequence, dp: int, tp: int = 1):
    """Per-stage ``(batch_target, replicated_target[, param_placer])``
    device_put targets.

    ``dp == tp == 1``: plain device pinning — stage 0 on devices[0],
    stage 1 on devices[1] (both targets are the device itself).
    Otherwise: stage 0 owns a (dp, tp) mesh over devices[:dp*tp], stage 1
    over the next dp*tp; batch tensors shard over the mesh's 'data' axis,
    scalars/rngs replicate within the stage group, and — when ``tp > 1`` —
    params/optimizer state place via ``model_parallel_placement`` (gate
    matrices, attention projections, char_emb column-parallel on 'model';
    see parallel/mesh.py). ``jax.device_put`` accepts either form, so the
    pipeline step body is placement-agnostic.

    Returns ``((b0, r0), (b1, r1), (p0, p1))`` where ``p*`` are
    tree-placement callables for param-shaped pytrees (identity-equivalent
    to ``r*`` when tp == 1).
    """
    if dp <= 1 and tp <= 1:
        d0, d1 = devices[0], devices[1]
        place0 = lambda tree: jax.device_put(tree, d0)
        place1 = lambda tree: jax.device_put(tree, d1)
        return (d0, d0), (d1, d1), (place0, place1)
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    group = dp * tp
    if len(devices) < 2 * group:
        raise ValueError(
            f"pipeline x (dp={dp} x tp={tp}) needs 2*dp*tp = {2 * group} "
            f"devices, got {len(devices)}")
    m0 = Mesh(np.asarray(devices[:group]).reshape(dp, tp),
              ("data", "model"))
    m1 = Mesh(np.asarray(devices[group:2 * group]).reshape(dp, tp),
              ("data", "model"))

    def _placer(mesh):
        if tp <= 1:
            repl = NamedSharding(mesh, PartitionSpec())
            return lambda tree: jax.device_put(tree, repl)
        from attention_based_e2e_asr_dnn_tpu.parallel.mesh import (
            model_parallel_placement,
        )

        place = model_parallel_placement(mesh)
        return lambda tree: jax.tree_util.tree_map_with_path(place, tree)

    return (
        (NamedSharding(m0, PartitionSpec("data")),
         NamedSharding(m0, PartitionSpec())),
        (NamedSharding(m1, PartitionSpec("data")),
         NamedSharding(m1, PartitionSpec())),
        (_placer(m0), _placer(m1)),
    )


def place_pipeline_state(state: PipelineState, devices: Sequence,
                         dp: int = 1, tp: int = 1) -> PipelineState:
    """Pin stage 0 (listener) to its stage device (group), stage 1
    (speller) to the other; with ``dp > 1`` state replicates within each
    stage's dp-device mesh, with ``tp > 1`` param-shaped trees place via
    the TP pattern (see ``_stage_placements``)."""
    (_, r0), (_, r1), (p0, p1) = _stage_placements(devices, dp, tp)
    return PipelineState(
        params_listener=p0(state.params_listener),
        params_speller=p1(state.params_speller),
        opt_listener=p0(state.opt_listener),
        opt_speller=p1(state.opt_speller),
        rng=jax.device_put(state.rng, r0),
        acc_listener=(p0(state.acc_listener)
                      if state.acc_listener is not None else None),
        acc_speller=(p1(state.acc_speller)
                     if state.acc_speller is not None else None),
        acc_count=state.acc_count,
    )


def make_pipeline_train_step(
    cfg: LASConfig,
    tx,
    devices: Optional[Sequence] = None,
    n_microbatches: int = 2,
    compute_dtype=jnp.float32,
    grad_norm: float = 0.0,
    accum_steps: int = 1,
    use_specaug: bool = False,
    specaug_freq: int = 6,
    specaug_time: int = 200,
    specaug_iid: bool = False,
    nan_guard: bool = True,
    dp: int = 1,
    tp: int = 1,
) -> Callable:
    """Build a 2-stage pipelined train step.

    Returns ``step(state, x, lx, y, ly, tf_rate, lr) -> (state, metrics)``
    where the global batch is split into ``n_microbatches`` along axis 0.
    Loss/grad semantics match the single-device step with randomness
    quiesced (tf_rate=1.0, dropout=0, no SpecAugment): the masked CE is
    summed over microbatches token-weighted, exactly like one big batch.
    With tf_rate<1 or dropout>0 each microbatch draws its OWN
    teacher-forcing coins and dropout masks from a per-microbatch rng, so
    the pipelined trajectory is statistically equivalent to — but not
    bitwise identical with — the single-device one (which shares one coin
    per decode step across the whole batch).

    ``grad_norm > 0`` applies GLOBAL-norm clipping across BOTH stages (two
    scalar squared-norms cross the wire, nothing else) — identical semantics
    to the single-device ``clip_by_global_norm``. Build ``tx`` WITHOUT its
    own clipping (``build_optimizer(..., grad_norm=inf)``), otherwise the
    stages would clip by their per-stage norms, which is a different
    optimizer than the reference's (src/train.py:167).

    ``accum_steps > 1`` accumulates the per-batch (token-mean) gradients
    across calls and updates every ``accum_steps``-th call on their mean —
    the cross-stage norm, clip, and non-finite guard all apply to the
    ACCUMULATED gradient at the window boundary, exactly matching the
    single-device ``optax.MultiSteps`` semantics (clip-after-accumulate).
    Build ``tx`` WITHOUT MultiSteps — accumulation lives here.

    ``dp > 1`` data-parallelizes each stage over a dp-device stage mesh
    (devices[:dp] | devices[dp:2*dp]): microbatches shard over the stage's
    'data' axis, stage state replicates within the group, and GSPMD derives
    the within-stage gradient all-reduce. Loss/clip/guard semantics are
    bitwise those of the dp=1 pipeline (the reduction tree over a sharded
    batch is XLA's, so float association may differ at epsilon scale).
    Every microbatch must be divisible by dp.

    ``tp > 1`` additionally tensor-parallelizes each stage over a
    (dp, tp) stage mesh: stage params/optimizer state place via the same
    column-parallel pattern as 2-D mesh training (parallel/mesh.py), grads
    inherit the placement through the jitted stage programs, and GSPMD
    derives the TP collectives per stage — the full PP x DP x TP
    composition. State must be placed with the same (dp, tp)
    (``init_pipeline_state(..., dp=, tp=)``).
    """
    if devices is None:
        devices = jax.devices()[:2 * max(dp, 1) * max(tp, 1)]
    (b0, r0), (b1, r1), _ = _stage_placements(devices, dp, tp)
    d0, d1 = r0, r1  # replicated-in-stage targets (the device itself at dp=1)

    if use_specaug:
        from attention_based_e2e_asr_dnn_tpu.data.specaug import specaugment

        @jax.jit
        def _augment(rng, x):
            return specaugment(rng, x, specaug_freq, specaug_time,
                               specaug_iid)

    def _listener_fwd(p, rng, x, lx):
        return listener_apply(p, cfg.listener, rng, x.astype(compute_dtype),
                              lx, train=True)

    def _speller_loss(p, rng, enc_h, enc_l, y, ly, tf_rate):
        out = speller_apply(p, cfg.speller, rng, enc_h, enc_l, y,
                            tf_rate=tf_rate, train=True)
        loss, n_tokens = masked_ce_loss(out.logits, y, ly)
        return loss * n_tokens, n_tokens  # token-sum; re-normalized at the end

    # stage programs; each runs on the device of its inputs
    listener_fwd = jax.jit(_listener_fwd)

    @jax.jit
    def speller_grad(p, rng, enc_h, enc_l, y, ly, tf_rate):
        (loss_sum, n_tok), g = jax.value_and_grad(
            lambda pp, eh: _speller_loss(pp, rng, eh, enc_l, y, ly, tf_rate),
            argnums=(0, 1), has_aux=True,
        )(p, enc_h)
        (g_sp, d_enc) = g
        return loss_sum, n_tok, g_sp, d_enc

    @jax.jit
    def listener_bwd(p, rng, x, lx, d_enc):
        # activation recomputation: re-run the forward under vjp (remat)
        _, vjp = jax.vjp(
            lambda pp: _listener_fwd(pp, rng, x, lx)[0], p)
        return vjp(d_enc)[0]

    @jax.jit
    def apply_updates(p, opt_state, grads, lr, ok):
        """Optimizer update with the same non-finite no-op guard as the
        single-device step (training/steps.py:115-131): when ``ok`` is False
        the update is zeroed AND the optimizer state keeps its old value."""
        from attention_based_e2e_asr_dnn_tpu.training.steps import _set_lr
        import optax

        # stage tx is never MultiSteps-wrapped (accumulation is handled in
        # the step loop below), so the LR leaf sits at the top level
        opt_state = _set_lr(opt_state, lr, 1)
        grads = jax.tree.map(lambda g: jnp.where(ok, g, jnp.zeros_like(g)),
                             grads)
        updates, new_opt_state = tx.update(grads, opt_state, p)
        updates = jax.tree.map(lambda u: jnp.where(ok, u, jnp.zeros_like(u)),
                               updates)
        opt_state = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old)
            if hasattr(new, "shape") else new,
            new_opt_state, opt_state,
        )
        return optax.apply_updates(p, updates), opt_state

    tree_add = jax.jit(lambda a, b: jax.tree.map(jnp.add, a, b))
    tree_scale = jax.jit(lambda a, s: jax.tree.map(lambda x: x * s, a))
    sq_norm = jax.jit(lambda a: sum(
        jnp.sum(jnp.square(x.astype(jnp.float32))) for x in jax.tree.leaves(a)))
    tree_zero_unless = jax.jit(lambda a, ok: jax.tree.map(
        lambda x: jnp.where(ok, x, jnp.zeros_like(x)), a))

    def step(state: PipelineState, x, lx, y, ly, tf_rate, lr):
        batch = x.shape[0]
        if batch % n_microbatches:
            raise ValueError(
                f"batch {batch} not divisible by {n_microbatches} microbatches")
        mb = batch // n_microbatches
        if mb % max(dp, 1):
            raise ValueError(
                f"microbatch {mb} not divisible by dp={dp} (stage-mesh "
                "batch sharding needs equal shards)")
        rng, aug_rng, *mb_rngs = jax.random.split(
            state.rng, 2 * n_microbatches + 2)
        if use_specaug:
            x = _augment(jax.device_put(aug_rng, d0),
                         jax.device_put(jnp.asarray(x), b0))

        # ---- fill the pipe: dispatch every microbatch's stage-0 forward ----
        encs = []
        xs, lxs = [], []
        for i in range(n_microbatches):
            sl = slice(i * mb, (i + 1) * mb)
            xi = jax.device_put(x[sl], b0)
            lxi = jax.device_put(lx[sl], b0)
            xs.append(xi)
            lxs.append(lxi)
            encs.append(listener_fwd(state.params_listener, mb_rngs[i], xi, lxi))

        # ---- stage 1 (speller fwd+bwd) on d1, stage-0 bwd back on d0 -------
        loss_sum = jnp.zeros((), jnp.float32)
        tok_sum = jnp.zeros((), jnp.float32)
        g_sp_acc = None
        g_ls_acc = None
        for i in range(n_microbatches):
            sl = slice(i * mb, (i + 1) * mb)
            enc_h, enc_l = encs[i]
            enc_h = jax.device_put(enc_h, b1)
            enc_l = jax.device_put(enc_l, b1)
            yi = jax.device_put(y[sl], b1)
            lyi = jax.device_put(ly[sl], b1)
            ls, nt, g_sp, d_enc = speller_grad(
                state.params_speller,
                jax.device_put(mb_rngs[n_microbatches + i], d1),
                enc_h, enc_l, yi, lyi, tf_rate)
            # stage-0 backward for microbatch i overlaps stage-1 forward of
            # microbatch i+1 (async dispatch, separate device queues)
            g_ls = listener_bwd(state.params_listener, mb_rngs[i], xs[i],
                                lxs[i], jax.device_put(d_enc, b0))
            loss_sum = loss_sum + jax.device_put(ls, d0).astype(jnp.float32)
            tok_sum = tok_sum + jax.device_put(nt, d0).astype(jnp.float32)
            g_sp_acc = g_sp if g_sp_acc is None else tree_add(g_sp_acc, g_sp)
            g_ls_acc = g_ls if g_ls_acc is None else tree_add(g_ls_acc, g_ls)

        # token-mean normalization identical to the fused single-device loss
        inv = 1.0 / tok_sum
        g_sp_acc = tree_scale(g_sp_acc, jax.device_put(inv, d1))
        g_ls_acc = tree_scale(g_ls_acc, jax.device_put(inv, d0))
        loss = loss_sum * inv

        # per-BATCH global norm (cross-stage: only two scalars cross the
        # wire). With accumulation this guards each batch BEFORE it enters
        # the accumulator — steps.py zeroes a non-finite batch's grads so
        # the rest of the window still produces a real update; without the
        # per-batch guard one poisoned batch would silently void the whole
        # window. (Deviation: the single-device MultiSteps no-op also skips
        # the window-counter advance — here the zeroed batch still counts
        # toward the window, so the window mean divides by accum_steps.)
        batch_sq = (sq_norm(g_ls_acc) + jax.device_put(sq_norm(g_sp_acc), d0))
        gnorm_batch = jnp.sqrt(batch_sq)
        ok_batch = (jnp.isfinite(gnorm_batch) if nan_guard
                    else jnp.asarray(True))
        if nan_guard and accum_steps > 1:
            g_ls_acc = tree_zero_unless(g_ls_acc, ok_batch)
            g_sp_acc = tree_zero_unless(g_sp_acc,
                                        jax.device_put(ok_batch, d1))

        if accum_steps > 1:
            # mean over the window of per-batch token-mean grads — the same
            # quantity optax.MultiSteps hands its inner chain at the boundary
            g_ls_s = tree_scale(g_ls_acc, 1.0 / accum_steps)
            g_sp_s = tree_scale(g_sp_acc, 1.0 / accum_steps)
            acc_ls = (g_ls_s if state.acc_listener is None
                      else tree_add(state.acc_listener, g_ls_s))
            acc_sp = (g_sp_s if state.acc_speller is None
                      else tree_add(state.acc_speller, g_sp_s))
            # window position derives from the STATE (acc_count travels
            # with the accumulators) — a rollback/resume/fresh state can
            # never desync position from accumulated gradient
            if (state.acc_count + 1) % accum_steps != 0:
                # mid-window: stash the accumulators, no update this call.
                # grad_norm/finite report THIS batch so a poisoned batch is
                # visible in the logs the moment it happens.
                new_state = PipelineState(
                    state.params_listener, state.params_speller,
                    state.opt_listener, state.opt_speller, rng,
                    acc_ls, acc_sp, state.acc_count + 1)
                return new_state, {
                    "loss": loss, "ppl": jnp.exp(loss), "n_tokens": tok_sum,
                    "grad_norm": gnorm_batch, "finite": ok_batch}
            # boundary: clip/guard/update on the ACCUMULATED gradient
            g_ls_acc, g_sp_acc = acc_ls, acc_sp
            total_sq = (sq_norm(g_ls_acc)
                        + jax.device_put(sq_norm(g_sp_acc), d0))
            gnorm = jnp.sqrt(total_sq)
            ok = jnp.isfinite(gnorm) if nan_guard else jnp.asarray(True)
        else:
            gnorm, ok = gnorm_batch, ok_batch
        if grad_norm and grad_norm > 0.0:
            scale = jnp.minimum(1.0, grad_norm / (gnorm + 1e-12))
            g_ls_acc = tree_scale(g_ls_acc, scale)
            g_sp_acc = tree_scale(g_sp_acc, jax.device_put(scale, d1))

        p_sp, opt_sp = apply_updates(state.params_speller, state.opt_speller,
                                     g_sp_acc, lr, jax.device_put(ok, d1))
        p_ls, opt_ls = apply_updates(state.params_listener, state.opt_listener,
                                     g_ls_acc, lr, ok)
        new_state = PipelineState(p_ls, p_sp, opt_ls, opt_sp, rng)
        return new_state, {"loss": loss, "ppl": jnp.exp(loss),
                           "n_tokens": tok_sum, "grad_norm": gnorm,
                           "finite": ok}

    return step


def init_pipeline_state(params: dict, tx, rng: jax.Array,
                        devices: Optional[Sequence] = None,
                        dp: int = 1, tp: int = 1) -> PipelineState:
    """Split a las_init params tree into pinned per-stage state."""
    if devices is None:
        devices = jax.devices()[:2 * max(dp, 1) * max(tp, 1)]
    state = PipelineState(
        params_listener=params["listener"],
        params_speller=params["speller"],
        opt_listener=tx.init(params["listener"]),
        opt_speller=tx.init(params["speller"]),
        rng=rng,
    )
    return place_pipeline_state(state, devices, dp=dp, tp=tp)
