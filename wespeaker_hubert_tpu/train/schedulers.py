"""Learning-rate and margin schedules as pure functions of the step.

Functional redesign of the reference's stateful schedulers
(reference: wespeaker/utils/schedulers.py — MarginScheduler:20 mutates the
projection module; BaseClass:97 mutates optimizer.param_groups): here each
schedule is `f(step) -> scalar` usable directly as an optax schedule or as
a traced input to the jitted train step, so the whole margin/LR ramp lives
inside ONE compiled program.

Formulas match the reference exactly:
  * margin: fixed initial before increase_start; exp (or linear) ramp to
    final between increase_start and fix_start; fixed after
    (schedulers.py:58-68).
  * ExponentialDecrease: lr = coeff * initial * exp(t/T * ln(final/initial))
    with the multi-process warmup coefficient ramping scale_ratio over
    warm_up_epoch epochs (schedulers.py:125-135,177-182); scale_ratio is
    world_batch/64 as set in reference bin/train.py:192.
  * TriAngular2: cyclic triangular schedule with halving peaks
    (schedulers.py:189-243).
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

__all__ = [
    "MarginSchedule",
    "ExponentialDecrease",
    "TriAngular2",
    "get_lr_schedule",
]


@dataclasses.dataclass(frozen=True)
class MarginSchedule:
    epoch_iter: int
    increase_start_epoch: int
    fix_start_epoch: int
    initial_margin: float
    final_margin: float
    increase_type: str = "exp"  # 'exp' or 'linear'
    update_margin: bool = True

    def __call__(self, step):
        """margin at iteration `step` (0-based); traced-scalar-safe."""
        if not self.update_margin:
            return jnp.asarray(self.initial_margin, jnp.float32)
        inc_start = (self.increase_start_epoch - 1) * self.epoch_iter
        fix_start = (self.fix_start_epoch - 1) * self.epoch_iter
        inc_iters = max(fix_start - inc_start, 1)
        t = (jnp.asarray(step, jnp.float32) - inc_start) / inc_iters
        if self.increase_type == "exp":
            # 1 - exp(t * ln(1e-3)) ramp (reference schedulers.py:58-63)
            ratio = 1.0 - jnp.exp(t * math.log(1e-3 / (1.0 + 1e-6)))
        else:
            ratio = t
        margin = self.initial_margin + (
            self.final_margin - self.initial_margin
        ) * ratio
        margin = jnp.where(step < inc_start, self.initial_margin, margin)
        margin = jnp.where(step >= fix_start, self.final_margin, margin)
        return margin.astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class _LrBase:
    num_epochs: int
    epoch_iter: int
    initial_lr: float
    final_lr: float
    warm_up_epoch: int = 6
    scale_ratio: float = 1.0
    warm_from_zero: bool = False

    def _coeff(self, step):
        warm_iter = self.warm_up_epoch * self.epoch_iter
        t = jnp.asarray(step, jnp.float32)
        full = jnp.asarray(self.scale_ratio, jnp.float32)
        if self.warm_from_zero:
            warm = full * t / warm_iter
        elif self.scale_ratio > 1:
            warm = (self.scale_ratio - 1.0) * t / warm_iter + 1.0
        else:
            warm = full
        return jnp.where(t < warm_iter, warm, full)


@dataclasses.dataclass(frozen=True)
class ExponentialDecrease(_LrBase):
    def __call__(self, step):
        max_iter = self.num_epochs * self.epoch_iter
        t = jnp.asarray(step, jnp.float32)
        lr = (
            self._coeff(step)
            * self.initial_lr
            * jnp.exp((t / max_iter) * math.log(self.final_lr / self.initial_lr))
        )
        return lr.astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class TriAngular2(_LrBase):
    cycle_step: int = 2
    reduce_lr_diff_ratio: float = 0.5

    def __call__(self, step):
        cycle_iter = self.cycle_step * self.epoch_iter
        step_size = cycle_iter // 2
        max_lr0, min_lr = self.initial_lr, self.final_lr
        gap = max_lr0 - min_lr

        t = jnp.asarray(step, jnp.int32)
        point = (t % cycle_iter).astype(jnp.float32)
        cycle_index = (t // cycle_iter).astype(jnp.float32)
        max_lr = min_lr + gap * self.reduce_lr_diff_ratio**cycle_index
        up = min_lr + (max_lr - min_lr) * point / step_size
        down = max_lr - (max_lr - min_lr) * (point - step_size) / step_size
        lr = jnp.where(point <= step_size, up, down)
        return (self._coeff(step) * lr).astype(jnp.float32)


def get_lr_schedule(name: str, **kwargs):
    table = {
        "ExponentialDecrease": ExponentialDecrease,
        "TriAngular2": TriAngular2,
    }
    try:
        return table[name](**kwargs)
    except KeyError:
        raise ValueError(f"unknown LR scheduler {name!r}") from None
