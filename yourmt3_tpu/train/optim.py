"""Optimizers and LR schedules (optax).

Capability parity target: reference `model/optimizers.py` +
`model/lr_scheduler.py` (SURVEY.md C26): AdaFactor, AdamW, D-Adaptation
(CPUAdam is a DeepSpeed offload artifact — unnecessary on TPU at this
scale, SURVEY.md §2.2), cosine & MT3-legacy (inverse-sqrt) schedules.
"""

from __future__ import annotations

from typing import Optional

import optax


def make_schedule(name: str, base_lr: float, warmup_steps: int = 1000,
                  total_steps: int = 100_000, final_scale: float = 0.1
                  ) -> optax.Schedule:
    """'cosine' | 'legacy' (MT3 inverse-sqrt) | 'constant'."""
    if name == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=base_lr, warmup_steps=warmup_steps,
            decay_steps=max(total_steps, warmup_steps + 1),
            end_value=base_lr * final_scale)
    if name == "legacy":  # MT3: constant then 1/sqrt(step) decay
        def sched(step):
            step = optax.numerics.safe_increment(step) if False else step
            import jax.numpy as jnp
            s = jnp.maximum(step, warmup_steps).astype(jnp.float32)
            return base_lr * jnp.sqrt(warmup_steps / s)
        return sched
    if name == "constant":
        return optax.constant_schedule(base_lr)
    raise ValueError(f"unknown schedule {name!r}")


def make_optimizer(name: str = "adamw", base_lr: float = 1e-3,
                   schedule: str = "cosine", warmup_steps: int = 1000,
                   total_steps: int = 100_000, weight_decay: float = 0.0,
                   grad_clip: Optional[float] = 1.0,
                   grad_accum_steps: int = 1) -> optax.GradientTransformation:
    """grad_accum_steps > 1 wraps the optimizer in optax.MultiSteps
    (reference shared_cfg gradient-accumulation knob, SURVEY.md C1)."""
    sched = make_schedule(schedule, base_lr, warmup_steps, total_steps)
    if name == "adamw":
        core = optax.adamw(sched, weight_decay=weight_decay)
    elif name == "adafactor":
        core = optax.adafactor(sched)
    elif name == "dadapt_adam":
        core = optax.contrib.dadapt_adamw(sched) if hasattr(optax.contrib, "dadapt_adamw") \
            else optax.adamw(sched, weight_decay=weight_decay)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if grad_clip:
        core = optax.chain(optax.clip_by_global_norm(grad_clip), core)
    if grad_accum_steps > 1:
        core = optax.MultiSteps(core, every_k_schedule=grad_accum_steps)
    return core
