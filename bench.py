"""Benchmark: full-song transcription throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio_seconds_per_second_per_chip",
   "vs_baseline": N}

Baseline target (BASELINE.md): ≥50× realtime per v5e chip. vs_baseline is
value / 50. Runs the flagship inference path: fused frontend → encoder →
projection → jitted while-loop greedy decode (worst-case: no early EOS on
an untrained model ⇒ the number reported is a floor).
"""

import json
import sys
import time

import numpy as np


def main():
    from yourmt3_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import functools

    import jax
    import jax.numpy as jnp
    from yourmt3_tpu.api import init_model
    from yourmt3_tpu.models.decoding import greedy_decode
    from yourmt3_tpu.models.ymt3 import YMT3

    model_preset = "t5_small"
    task = "mt3_full_plus"
    batch = 16  # sweet spot measured: 49.9 au-s/s vs 46.1 at B=32 (KV traffic)
    max_length = 1024
    pallas_decode = None  # auto: kernel wins for long-L few-stream decode
    for a in sys.argv[1:]:
        if a.startswith("--model="):
            model_preset = a.split("=", 1)[1]
        elif a.startswith("--task="):
            task = a.split("=", 1)[1]
        elif a.startswith("--batch="):
            batch = int(a.split("=", 1)[1])
        elif a.startswith("--max-length="):
            max_length = int(a.split("=", 1)[1])
        elif a == "--pallas-decode":
            pallas_decode = True
        elif a == "--no-pallas-decode":
            pallas_decode = False

    if pallas_decode is None:
        # measured: paged kernel 1.3× at L=1024 single-channel; loses at
        # L=256 × 13 channels (per-program overhead × many short streams)
        pallas_decode = max_length >= 512
    bundle = init_model(model_preset, task, use_pallas_decode=pallas_decode)
    ac = bundle.audio_cfg
    max_length = min(max_length, bundle.task_manager.max_token_length)

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((batch, ac.input_frames)),
                        jnp.float32) * 0.1

    # worst-case honest decode: EOS banned ⇒ the while-loop runs all
    # max_length steps (a trained model early-exits and is strictly faster)
    @functools.partial(jax.jit, static_argnames=())
    def run(params, audio):
        feats = bundle.frontend(audio)
        memory = bundle.model.apply(params, feats, method=YMT3.encode)
        return greedy_decode(bundle.model, params, memory, max_length,
                             ban_eos=True)

    ids = run(bundle.params, audio)
    ids.block_until_ready()

    n_iters = 3
    t0 = time.perf_counter()
    for _ in range(n_iters):
        ids = run(bundle.params, audio)
    ids.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iters

    audio_seconds = batch * ac.segment_seconds
    throughput = audio_seconds / dt
    print(json.dumps({
        "metric": f"full_song_transcription_throughput[{model_preset},B={batch},L={max_length}]",
        "value": round(throughput, 3),
        "unit": "audio_seconds_per_second_per_chip",
        "vs_baseline": round(throughput / 50.0, 4),
    }))


if __name__ == "__main__":
    main()
