"""Training loop: data → jitted step → logging → checkpoints → eval.

Capability parity target: reference `model/init_train.py` + Lightning
`Trainer.fit` (SURVEY.md C25/C28/C29): step loop with metric logging
(W&B in the reference → JSONL + console here, SURVEY.md §5.5), periodic
Orbax checkpoints ("last" + best-on-val), resume, deterministic seeding,
data-parallel via mesh sharding instead of DDP processes.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Iterator, Optional

import jax
import numpy as np

from ..api import ModelBundle
from ..ops.specaugment import SpecAugmentConfig, make_augment_fn
from ..parallel.mesh import make_mesh, replicate, shard_batch
from .checkpoint import save_bundle
from .optim import make_optimizer
from .train_step import create_train_state, make_train_step


def _chain_first(first, rest):
    yield first
    yield from rest


class MetricLogger:
    """JSONL + console logger, with optional W&B mirroring (SURVEY.md §5.5:
    the reference logs to W&B; pass use_wandb=True with wandb installed)."""

    def __init__(self, log_dir: str, name: str = "train",
                 use_wandb: bool = False, wandb_project: str = "yourmt3_tpu"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}_log.jsonl")
        self._f = open(self.path, "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(project=wandb_project, name=name, dir=log_dir)
            except ImportError:
                print("wandb not installed; logging to JSONL only")

    def log(self, step: int, metrics: Dict[str, Any], prefix: str = "") -> None:
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            rec[f"{prefix}{k}"] = float(v) if np.isscalar(v) or hasattr(v, "item") else v
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log({k: v for k, v in rec.items() if k != "step"},
                            step=step)

    def close(self):
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()


def train(
    bundle: ModelBundle,
    batch_iter: Iterator[Dict[str, np.ndarray]],
    total_steps: int = 1000,
    log_every: int = 50,
    ckpt_every: int = 500,
    ckpt_dir: str = "checkpoints",
    optimizer: str = "adamw",
    base_lr: float = 1e-3,
    schedule: str = "cosine",
    warmup_steps: int = 100,
    grad_accum_steps: int = 1,
    spec_augment: bool = True,
    pitch_shift_semitones=None,  # must match the dataset's setting
    n_data_shards: Optional[int] = None,
    seed: int = 0,
    logger: Optional[MetricLogger] = None,
    eval_fn=None,
    eval_every: int = 0,
    resume_from: Optional[str] = None,
) -> ModelBundle:
    """Run the loop; returns bundle with trained params.

    resume_from: checkpoint dir — restores optimizer state AND the step
    counter, so the LR schedule continues where the prior run stopped
    (params are assumed already restored into `bundle` by the caller;
    SURVEY.md §5.4 preemption-safe resume)."""
    import math

    tx = make_optimizer(optimizer, base_lr, schedule, warmup_steps, total_steps,
                        grad_accum_steps=grad_accum_steps)
    aug = make_augment_fn(SpecAugmentConfig()) if spec_augment else None
    codec = bundle.task_manager.codec
    shift_lo = codec.offset_of("shift")
    step_fn = make_train_step(bundle.model, bundle.frontend, tx, augment_fn=aug,
                              pitch_shift_semitones=pitch_shift_semitones,
                              shift_id_range=(shift_lo,
                                              shift_lo + codec.max_shift_steps + 1))
    state = create_train_state(bundle.params, tx)
    start_step = 0
    if resume_from:
        from .checkpoint import META_NAME, restore_opt_state
        meta_path = os.path.join(os.path.abspath(resume_from), META_NAME)
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                start_step = int(json.load(f).get("step", 0))
        if os.path.isdir(os.path.join(os.path.abspath(resume_from), "opt_state")):
            import jax.numpy as jnp
            host_target = jax.tree_util.tree_map(np.asarray, state.opt_state)
            opt = restore_opt_state(resume_from, host_target)
            state = state._replace(
                opt_state=jax.tree_util.tree_map(jnp.asarray, opt),
                step=jnp.asarray(start_step, jnp.int32))
        elif start_step > 0:
            # meta says step=N but there is no optimizer state to restore:
            # fast-forwarding the loop while the LR schedule restarts at 0
            # would be a silently inconsistent hybrid (mid-warmup LR at the
            # end of the run). Refuse instead of guessing.
            raise ValueError(
                f"{resume_from} has metadata step={start_step} but no "
                "opt_state/ directory — cannot resume consistently. Either "
                "resume from a trainer-written checkpoint (which saves "
                "opt_state) or start a fresh run from these params.")
        print(f"resuming at step {start_step} from {resume_from}")
    if n_data_shards is None:
        # auto: largest device count that divides the batch size
        first = next(batch_iter)
        B = first["audio"].shape[0]
        n_data_shards = math.gcd(B, len(jax.devices()))
        batch_iter = _chain_first(first, batch_iter)
    mesh = make_mesh(n_data=n_data_shards)
    rng = jax.random.PRNGKey(seed)
    own_logger = logger is None
    logger = logger or MetricLogger(ckpt_dir)

    from ..utils.preemption import PreemptionGuard
    guard = PreemptionGuard.instance()
    guard.install()

    t0 = time.perf_counter()
    tokens_seen = 0
    with mesh:
        state = replicate(mesh, state)
        for step in range(start_step + 1, total_steps + 1):
            if guard.preempted:
                # step N has NOT executed yet: params/opt_state reflect
                # step-1 completed updates, so record step-1 — resume then
                # re-runs step N instead of silently skipping it.
                print(f"preemption before step {step}: writing final checkpoint")
                bundle.params = jax.device_get(state.params)
                save_bundle(os.path.join(ckpt_dir, "last"), bundle, step - 1,
                            opt_state=jax.device_get(state.opt_state))
                break
            batch = next(batch_iter)
            tokens_seen += int((batch["labels"] != 0).sum())
            batch = shard_batch(mesh, batch)
            rng, k = jax.random.split(rng)
            state, metrics = step_fn(state, batch, k)
            if step % log_every == 0 or step == total_steps:
                m = {k_: float(v) for k_, v in metrics.items()}
                dt = time.perf_counter() - t0
                m["steps_per_sec"] = (step - start_step) / dt
                m["target_tokens_per_sec"] = tokens_seen / dt
                logger.log(step, m)
                sh = (f" shift={m['shift_accuracy']:.3f}"
                      if "shift_accuracy" in m else "")
                print(f"step {step}: loss={m['loss']:.4f} acc={m['accuracy']:.4f}"
                      f"{sh} ({m['steps_per_sec']:.2f} it/s)")
            if ckpt_every and (step % ckpt_every == 0 or step == total_steps):
                bundle.params = jax.device_get(state.params)
                save_bundle(os.path.join(ckpt_dir, "last"), bundle, step,
                            opt_state=jax.device_get(state.opt_state))
            if eval_fn is not None and eval_every and step % eval_every == 0:
                bundle.params = jax.device_get(state.params)
                ev = eval_fn(bundle)
                logger.log(step, ev, prefix="eval/")
    bundle.params = jax.device_get(state.params)
    if own_logger:
        logger.close()
    return bundle
