"""Split flagship e2e time into frontend / encode / decode-loop parts."""

import functools
import time

import numpy as np


def timed(fn, *args, loops=5, warmup=1):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(loops):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / loops


def main():
    from yourmt3_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    from yourmt3_tpu.api import init_model
    from yourmt3_tpu.models.decoding import greedy_decode
    from yourmt3_tpu.models.ymt3 import YMT3

    bundle = init_model("perceiver_tf_mc13", "mc13_full_plus_256")
    ac = bundle.audio_cfg
    B, L = 16, 256
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, ac.input_frames)), jnp.float32) * 0.1

    fe = jax.jit(bundle.frontend)
    t = timed(fe, audio)
    print(f"frontend      : {t*1e3:8.2f} ms")

    @jax.jit
    def enc(params, audio):
        feats = bundle.frontend(audio)
        return bundle.model.apply(params, feats, method=YMT3.encode)

    t = timed(enc, bundle.params, audio)
    print(f"frontend+enc  : {t*1e3:8.2f} ms")
    memory = enc(bundle.params, audio)

    @jax.jit
    def dec(params, memory):
        return greedy_decode(bundle.model, params, memory, L, ban_eos=True)

    t = timed(dec, bundle.params, memory)
    print(f"decode loop   : {t*1e3:8.2f} ms  ({t/L*1e6:.0f} us/step)")

    @jax.jit
    def full(params, audio):
        feats = bundle.frontend(audio)
        memory = bundle.model.apply(params, feats, method=YMT3.encode)
        return greedy_decode(bundle.model, params, memory, L, ban_eos=True)

    t = timed(full, bundle.params, audio)
    print(f"full e2e      : {t*1e3:8.2f} ms  ({B*ac.segment_seconds/t:.1f} audio-s/s)")


if __name__ == "__main__":
    main()
