"""Training-throughput attribution: pure-device step time vs the live
loader-fed rate (SURVEY.md §5.1; the training-side sibling of the decode
roofline in EVIDENCE.md).

Measures, for a given model preset/task/batch on the current jax backend:
  1. jitted train-step wall time on a DEVICE-RESIDENT synthetic batch
     (no host loader in the loop) — the compute ceiling;
  2. the same step re-fed with per-step host->device transfer of a fresh
     numpy batch — adds the H2D cost a real loader pays;
  3. model FLOPs/step via jax.jit(...).lower().cost_analysis() when the
     backend reports it, -> MFU against v5e-1 bf16 peak (197 TFLOP/s).

Compare row 1 with the live trainer's logged steps_per_sec to attribute
the residual to host batch PRODUCTION (synth/tokenize/submix in the
spawn workers), which neither row pays.

Usage: python scripts/profile_train_step.py [preset] [task] [batch] [out.json]
Optionally XPROF=/tmp/ymt3_train_trace dumps a TensorBoard trace of 3 steps.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from yourmt3_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402

# the axon TPU plugin force-sets jax_platforms at import, clobbering a
# JAX_PLATFORMS=cpu request (same guard as __graft_entry__.py)
_want = os.environ.get("JAX_PLATFORMS")
if _want:
    try:
        jax.config.update("jax_platforms", _want)
    except RuntimeError:
        pass
import jax.numpy as jnp  # noqa: E402

from yourmt3_tpu.api import init_model  # noqa: E402
from yourmt3_tpu.train.optim import make_optimizer  # noqa: E402
from yourmt3_tpu.train.train_step import (create_train_state,  # noqa: E402
                                          make_train_step)

V5E_BF16_PEAK = 197e12  # FLOP/s, one v5e chip


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "perceiver_tf_mc13"
    task = sys.argv[2] if len(sys.argv) > 2 else "mc13_full_plus_256"
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    out_path = (sys.argv[4] if len(sys.argv) > 4
                else "artifacts/train_step_profile.json")

    bundle = init_model(preset, task)
    ac, cfg = bundle.audio_cfg, bundle.cfg
    C, L = cfg.num_channels, bundle.task_manager.max_token_length
    rng = np.random.default_rng(0)

    def fresh_batch():
        return {
            "audio": rng.standard_normal(
                (batch, ac.input_frames)).astype(np.float32) * 0.1,
            "labels": rng.integers(
                3, cfg.vocab_size, (batch, C, L)).astype(np.int32),
        }

    tx = make_optimizer("adamw", base_lr=1e-4, total_steps=1000,
                        warmup_steps=10)
    state = create_train_state(bundle.params, tx)
    # make_train_step returns an already-jitted fn (donates state)
    jitted = make_train_step(bundle.model, bundle.frontend, tx,
                             augment_fn=None)

    dev_batch = jax.device_put(
        {k: jnp.asarray(v) for k, v in fresh_batch().items()})
    key = jax.random.PRNGKey(0)

    # FLOPs (before the first run so lowering is cheap to reuse)
    flops = None
    try:
        cost = jitted.lower(state, dev_batch, key).cost_analysis()
        if cost:
            ca = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = float(ca.get("flops", 0.0)) or None
    except Exception as e:  # backend may not report cost analysis
        # axon reports none: re-run this script under JAX_PLATFORMS=cpu to
        # lower the identical step on CPU (HLO FLOP count is backend-
        # independent) and merge flops into the TPU-measured artifact —
        # that is how artifacts/train_mfu_r5.json got its MFU number.
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)

    # warm/compile
    state, metrics = jitted(state, dev_batch, key)
    jax.block_until_ready(metrics["loss"])

    n = 20
    xprof = os.environ.get("XPROF")
    if xprof:
        jax.profiler.start_trace(xprof)

    # row 1: device-resident batch (reuse the same arrays; donation only
    # consumes the state, not the batch)
    t0 = time.perf_counter()
    for i in range(n):
        state, metrics = jitted(state, dev_batch,
                                jax.random.fold_in(key, i))
        if xprof and i == 2:
            jax.block_until_ready(metrics["loss"])
            jax.profiler.stop_trace()
    jax.block_until_ready(metrics["loss"])
    dev_step_s = (time.perf_counter() - t0) / n

    # row 2: fresh host batch every step (H2D included)
    t0 = time.perf_counter()
    for i in range(n):
        hb = fresh_batch()
        db = {k: jnp.asarray(v) for k, v in hb.items()}
        state, metrics = jitted(state, db, jax.random.fold_in(key, i))
    jax.block_until_ready(metrics["loss"])
    h2d_step_s = (time.perf_counter() - t0) / n

    row = {
        "config": f"{preset}/{task}", "batch": batch,
        "device_step_ms": round(dev_step_s * 1e3, 2),
        "device_steps_per_sec": round(1.0 / dev_step_s, 3),
        "h2d_step_ms": round(h2d_step_s * 1e3, 2),
        "h2d_steps_per_sec": round(1.0 / h2d_step_s, 3),
        "flops_per_step": flops,
        "mfu_vs_v5e_bf16_peak": (round(flops / dev_step_s / V5E_BF16_PEAK, 4)
                                 if flops else None),
        "audio_seconds_per_train_sec": round(
            batch * ac.segment_seconds / dev_step_s, 1),
        "note": ("compare device_steps_per_sec with the live trainer's "
                 "steps_per_sec to attribute host batch-production cost "
                 "(synth render + tokenize + submix in spawn workers)"),
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(row, f, indent=1)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
