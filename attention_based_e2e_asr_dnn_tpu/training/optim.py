"""Optimizers and schedulers.

Optimizer registry parity with the reference ({adam, adamw, sgd} built from
YAML, src/train.py:71-77), rebuilt on optax with the learning rate injected
as a mutable hyperparameter so the host-side schedulers (cosine-with-warmup
per batch, ReduceLROnPlateau per epoch) can steer it without recompiling.

Scheduler parity:
  * CosineWarmupSchedule — the reference's per-batch table
    (src/utils.py:295-332) linearly warms min_lr -> init_lr then anneals.
    NOTE deviation: the reference's annealing term ``min + (init-min)*cos(...)``
    goes NEGATIVE in the second half (a latent bug; the feature is disabled
    in every shipped config). This implements the standard
    ``min + (init-min) * 0.5 * (1 + cos(pi * i/left))``.
  * ReduceLROnPlateau — torch semantics (factor 0.5, patience 3, mode min,
    rel threshold 1e-4), stepped by the Trainer only once dev LD <= 20
    (reference gate, src/train.py:294-297).
  * TeacherForcingScheduler — LD-gated tf_rate decay with interval/floor
    semantics and the last-turn improvement check (src/train.py:448-456).
  * DropoutScheduler — epoch-keyed multiplicative table over module dropout
    rates (src/train.py:459-474). Here it rescales ALL rates uniformly,
    including the decoder cells' (the reference mutated stored attrs, which
    silently missed the constructed nn.Dropout — documented fix).
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import optax


# ---------------------------------------------------------------------------
# Optimizer registry
# ---------------------------------------------------------------------------

def _base_optimizer(name: str, learning_rate: float, configs: dict) -> optax.GradientTransformation:
    """Build the inner optimizer, honoring EVERY config key the reference's
    ``**configs`` splat would pass to torch (src/train.py:71-77) and raising
    on keys it cannot honor — a silently-dropped hyperparameter trains with
    different dynamics than the same YAML under the reference."""
    cfg = dict(configs)
    cfg.pop("lr", None)
    name = name.lower()

    def take(key, default):
        return cfg.pop(key, default)

    if name == "adam":
        betas = take("betas", (0.9, 0.999))
        eps = take("eps", 1e-8)
        wd = take("weight_decay", 0.0)
        amsgrad = take("amsgrad", False)
        scale = (optax.scale_by_amsgrad(b1=betas[0], b2=betas[1], eps=eps)
                 if amsgrad else
                 optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
        parts = []
        if wd:
            # torch Adam weight_decay is L2-style: wd*p added to the GRADIENT
            # before the moment updates, hence BEFORE the adam scaling
            parts.append(optax.add_decayed_weights(wd))
        parts += [scale, optax.scale_by_learning_rate(learning_rate)]
        opt = optax.chain(*parts)
    elif name == "adamw":
        betas = take("betas", (0.9, 0.999))
        eps = take("eps", 1e-8)
        wd = take("weight_decay", 0.0)
        scale = (optax.scale_by_amsgrad(b1=betas[0], b2=betas[1], eps=eps)
                 if take("amsgrad", False) else
                 optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
        # torch AdamW: DECOUPLED weight decay — applied after the scaling
        opt = optax.chain(
            scale,
            optax.add_decayed_weights(wd),
            optax.scale_by_learning_rate(learning_rate),
        )
    elif name == "sgd":
        momentum = take("momentum", 0.0)
        nesterov = take("nesterov", False)
        wd = take("weight_decay", 0.0)
        parts = []
        if wd:
            parts.append(optax.add_decayed_weights(wd))  # torch SGD: L2 into grads
        parts.append(optax.sgd(learning_rate, momentum=momentum or None,
                               nesterov=nesterov))
        opt = optax.chain(*parts)
    else:
        raise ValueError(f"unknown optimizer {name!r} (expected adam/adamw/sgd)")

    if cfg:
        raise ValueError(
            f"optimizer {name!r} got unsupported config keys {sorted(cfg)} — "
            f"refusing to silently drop hyperparameters"
        )
    return opt


def build_optimizer(
    name: str,
    configs: dict,
    grad_norm: float = 5.0,
    accum_steps: int = 1,
) -> optax.GradientTransformation:
    """Clip-by-global-norm -> optimizer, with injectable learning rate and
    optional gradient accumulation (reference accu_grad, src/train.py:163-188).

    The returned transformation's state exposes
    ``.hyperparams['learning_rate']`` (inside MultiSteps: ``.inner_opt_state``)
    for host-side LR control.
    """
    lr = float(configs.get("lr", 1e-3))

    @optax.inject_hyperparams
    def make(learning_rate):
        return optax.chain(
            optax.clip_by_global_norm(grad_norm),
            _base_optimizer(name, learning_rate, configs),
        )

    tx = make(learning_rate=lr)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


# ---------------------------------------------------------------------------
# Schedulers (host-side state machines)
# ---------------------------------------------------------------------------

class CosineWarmupSchedule:
    """Per-batch LR schedule: linear warmup then cosine annealing.

    Parity of intent with the reference's precomputed table
    (src/utils.py:295-332); see module docstring for the documented fix of
    its negative-LR tail.
    """

    def __init__(self, num_batches: int, warmup_epochs: float = 1.0,
                 max_epochs: int = 10, init_lr: float = 1e-3, min_lr: float = 1e-6):
        self.total = num_batches * max_epochs
        self.warmup = int(num_batches * warmup_epochs)
        self.init_lr = init_lr
        self.min_lr = min_lr
        self.step_count = 0

    def __call__(self, step: Optional[int] = None) -> float:
        i = self.step_count if step is None else step
        if i < self.warmup and self.warmup > 0:
            return self.min_lr + (self.init_lr - self.min_lr) * i / self.warmup
        left = max(self.total - self.warmup, 1)
        j = min(i - self.warmup, left)
        return self.min_lr + (self.init_lr - self.min_lr) * 0.5 * (
            1.0 + math.cos(math.pi * j / left)
        )

    def step(self) -> float:
        lr = self()
        self.step_count += 1
        return lr

    def state_dict(self) -> dict:
        return {"step_count": self.step_count}

    def load_state_dict(self, d: dict) -> None:
        self.step_count = d["step_count"]


class ReduceLROnPlateau:
    """torch-equivalent ReduceLROnPlateau (factor/patience/min mode).

    Reference instantiation: factor=0.5, patience=3, mode='min'
    (src/train.py:83-85).
    """

    def __init__(self, init_lr: float, factor: float = 0.5, patience: int = 3,
                 threshold: float = 1e-4, min_lr: float = 0.0):
        self.lr = init_lr
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = float("inf")
        self.num_bad = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr

    def state_dict(self) -> dict:
        return {"lr": self.lr, "best": self.best, "num_bad": self.num_bad}

    def load_state_dict(self, d: dict) -> None:
        self.lr, self.best, self.num_bad = d["lr"], d["best"], d["num_bad"]


class TeacherForcingScheduler:
    """LD-gated tf_rate decay (reference: src/train.py:448-456).

    Drop tf_rate by ``factor`` when: epoch > 0, last dev LD <= 20, tf_rate
    above ``lowest``, more than ``interval`` epochs since the last turn, and
    dev LD improved vs. the last turn.
    """

    def __init__(self, tf_rate: float, factor: float = 0.1, interval: int = 10,
                 lowest: float = 0.6):
        self.tf_rate = tf_rate
        self.factor = factor
        self.interval = interval
        self.lowest = lowest
        self.last_turn = (-1, float("inf"))  # (epoch, ld)

    def step(self, epoch: int, dev_ld_history: list) -> float:
        if (
            epoch > 0
            and dev_ld_history
            and dev_ld_history[-1] <= 20
            # epsilon guard: repeated ``tf -= 0.1`` leaves 0.6000...01 > 0.6
            # and the floor is silently crossed (the reference has the same
            # float bug, src/train.py:452; documented fix)
            and self.tf_rate > self.lowest + 1e-9
            and epoch - self.last_turn[0] > self.interval
            and dev_ld_history[-1] < self.last_turn[1]
        ):
            self.tf_rate -= self.factor
            self.last_turn = (epoch, dev_ld_history[-1])
        return self.tf_rate

    def state_dict(self) -> dict:
        return {"tf_rate": self.tf_rate, "last_turn": list(self.last_turn)}

    def load_state_dict(self, d: dict) -> None:
        self.tf_rate = d["tf_rate"]
        self.last_turn = tuple(d["last_turn"])


class DropoutScheduler:
    """Epoch-keyed multiplicative dropout-rate table (src/train.py:459-474).

    ``step(epoch)`` returns the multiplier to apply to every dropout rate at
    that epoch (1.0 when the epoch has no entry). Rate changes retrace the
    jitted step (rates are static), which happens at most once per table key.
    """

    def __init__(self, table: Dict[int, float]):
        self.table = {int(k): float(v) for k, v in table.items()}

    def step(self, epoch: int) -> float:
        return self.table.get(epoch, 1.0)
