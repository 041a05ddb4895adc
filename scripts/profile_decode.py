"""Decode-step cost breakdown at flagship (perceiver_tf_mc13) shapes.

Times, on the real chip, jitted microbenches of each per-step component so
the flagship optimization work (VERDICT item 1) attacks the real hot spot:

  - full decode_step (8 layers, embed + lm_head)
  - dense self-attn read (per layer): q·K over (S,H,L,dk) + softmax + ·V
  - paged self-attn kernel (per layer)
  - cross-attn read (per layer): same shape, static KV
  - FF (per layer), qkv+o projections (per layer), lm_head, embed

Run: python scripts/profile_decode.py [--loops=50]
"""

import functools
import sys
import time

import numpy as np


def timeit(fn, *args, loops=50, warmup=2):
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
    loops = 50
    for a in sys.argv[1:]:
        if a.startswith("--loops="):
            loops = int(a.split("=")[1])

    import jax
    import jax.numpy as jnp
    from yourmt3_tpu.api import init_model
    from yourmt3_tpu.models.ymt3 import YMT3
    from yourmt3_tpu.models.layers import dot_product_attention
    from yourmt3_tpu.ops.pallas.decode_attention import (
        empty_paged_cache, paged_cache_update, paged_decode_attention)

    bundle = init_model("perceiver_tf_mc13", "mc13_full_plus_256")
    cfg = bundle.cfg
    B, C = 16, cfg.num_channels
    S = B * C
    H, dk, D, L, V = cfg.num_heads, cfg.d_kv, cfg.d_model, 256, cfg.vocab_size
    NL = cfg.num_decoder_layers
    print(f"flagship: S={S} H={H} dk={dk} D={D} L={L} V={V} layers={NL}")

    rng = np.random.default_rng(0)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    bf16 = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)

    # ---- full decode step ------------------------------------------------
    memory = bf16(B, C, bundle.audio_cfg.num_frames, D).astype(jnp.bfloat16)
    cross_kvs = jax.jit(lambda p, m: bundle.model.apply(
        p, m, method=YMT3.init_cross_kv))(bundle.params, memory)
    self_kvs = bundle.model.empty_self_kvs(S, L)
    tok = jnp.ones((S, 1), jnp.int32)
    pos = jnp.asarray(128, jnp.int32)

    @jax.jit
    def step(params, tok, pos, self_kvs, cross_kvs):
        return bundle.model.apply(params, tok, pos, self_kvs, cross_kvs,
                                  method=YMT3.decode_step)

    t = timeit(step, bundle.params, tok, pos, self_kvs, cross_kvs, loops=loops)
    print(f"full decode_step      : {t*1e6:9.1f} us  (x{L} steps = "
          f"{t*L*1e3:.0f} ms; {B*2.048/(t*L):.1f} audio-s/s bound)")

    # ---- components --------------------------------------------------
    q = bf16(S, H, 1, dk)
    k_dense = bf16(S, H, L, dk)
    v_dense = bf16(S, H, L, dk)
    bias_row = f32(1, H, 1, L)

    t = timeit(jax.jit(lambda q, k, v, b: dot_product_attention(q, k, v, b)),
               q, k_dense, v_dense, bias_row, loops=loops)
    print(f"dense self-attn/layer : {t*1e6:9.1f} us  (x{NL} = {t*NL*1e6:.0f} us/step)")

    t = timeit(jax.jit(lambda q, k, v: dot_product_attention(q, k, v, None)),
               q, k_dense, v_dense, loops=loops)
    print(f"dense cross-attn/layer: {t*1e6:9.1f} us  (x{NL} = {t*NL*1e6:.0f} us/step)")

    # paged kernel (single 256 page, sp=16 as the model uses for L<=256)
    kc = empty_paged_cache(S, H, dk, 256, 256)
    vc = empty_paged_cache(S, H, dk, 256, 256)
    table = f32(32, H)
    pk = jax.jit(functools.partial(
        paged_decode_attention, block=256, streams_per_tile=16,
        rel_max_distance=cfg.rel_attn_max_distance))
    t = timeit(lambda: pk(q, kc, vc, pos, rel_table=table), loops=loops)
    print(f"paged self-attn/layer : {t*1e6:9.1f} us  (block=256, sp=16)")

    kc8 = empty_paged_cache(S, H, dk, 256, 128)
    vc8 = empty_paged_cache(S, H, dk, 256, 128)
    pk8 = jax.jit(functools.partial(
        paged_decode_attention, block=128, streams_per_tile=8,
        rel_max_distance=cfg.rel_attn_max_distance))
    t = timeit(lambda: pk8(q, kc8, vc8, pos, rel_table=table), loops=loops)
    print(f"paged self-attn/layer : {t*1e6:9.1f} us  (block=128, sp=8)")

    # paged kernel as cross-attn (no bias, pos=L-1 → read everything)
    t = timeit(lambda: pk8(q, kc8, vc8, jnp.asarray(L - 1, jnp.int32)),
               loops=loops)
    print(f"paged cross-attn/layer: {t*1e6:9.1f} us  (block=128, sp=8, full L)")

    # cache update
    kstep = bf16(S, H, 1, dk)
    t = timeit(jax.jit(paged_cache_update), kc, kstep, pos, loops=loops)
    print(f"paged cache update    : {t*1e6:9.1f} us  (x{2*NL} = {t*2*NL*1e6:.0f} us/step)")

    dense_upd = jax.jit(lambda c, s, p: jax.lax.dynamic_update_slice(
        c, s, (0, 0, p, 0)))
    t = timeit(dense_upd, k_dense, kstep, pos, loops=loops)
    print(f"dense cache update    : {t*1e6:9.1f} us  (not in-place outside loop)")

    # projections: q,k,v,o per layer = 4 GEMMs (S,1,D)x(D,H*dk)
    x = bf16(S, 1, D)
    wq = bf16(D, H * dk)
    t = timeit(jax.jit(lambda x, w: jnp.einsum("sld,df->slf", x, w,
                                               preferred_element_type=jnp.float32)
                       .astype(jnp.bfloat16)), x, wq, loops=loops)
    print(f"qkvo proj GEMM        : {t*1e6:9.1f} us  (x{6*NL} / step incl. cross q,o)")

    # FF per layer: 3 GEMMs (S,1,D)x(D,dff)
    wff = bf16(D, cfg.d_ff)
    t = timeit(jax.jit(lambda x, w: jnp.einsum("sld,df->slf", x, w,
                                               preferred_element_type=jnp.float32)
                       .astype(jnp.bfloat16)), x, wff, loops=loops)
    print(f"ff GEMM (DxdFF)       : {t*1e6:9.1f} us  (x{3*NL} / step)")

    # lm_head
    wlm = bf16(D, V)
    t = timeit(jax.jit(lambda x, w: jnp.einsum("sld,df->slf", x, w,
                                               preferred_element_type=jnp.float32)),
               x, wlm, loops=loops)
    print(f"lm_head GEMM          : {t*1e6:9.1f} us")

    # RMSNorm-ish elementwise on (S,1,D)
    t = timeit(jax.jit(lambda x: (x.astype(jnp.float32) * jax.lax.rsqrt(
        jnp.mean(x.astype(jnp.float32)**2, -1, keepdims=True) + 1e-6))
        .astype(jnp.bfloat16)), x, loops=loops)
    print(f"rmsnorm               : {t*1e6:9.1f} us  (x{3*NL+1} / step)")


if __name__ == "__main__":
    main()
