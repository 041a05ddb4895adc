"""Honest kernel microbenches at flagship decode shapes.

Timing rule learned the hard way: on this host the runtime can dedup /
pipeline repeated identical dispatches, so back-to-back `fn(x); fn(x)`
timing lies. Every microbench here chains iterations through a lax.scan
whose carry feeds the next call's input, and materializes one final
value — the measured time is then (whole-program wall) / iters.

Run: python scripts/bench_kernels.py
"""

import functools
import sys
import time

import numpy as np


def scan_time(label, build_body, init_carry, iters=64, extra=()):
    """build_body(carry, extras) -> new_carry. Times a jitted scan."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(carry, extras):
        def body(c, _):
            return build_body(c, extras), None
        c, _ = jax.lax.scan(body, carry, None, length=iters)
        return jax.tree_util.tree_map(
            lambda x: jnp.sum(x.astype(jnp.float32)) if x.dtype != jnp.int32
            else jnp.sum(x), c)

    out = run(init_carry, extra)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out = run(init_carry, extra)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0)
    per = dt / iters
    print(f"{label:42s}: {per*1e6:8.1f} us/call")
    return per


def main():
    from yourmt3_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp

    S, H, dk, L, T = 208, 6, 64, 256, 256
    rng = np.random.default_rng(0)
    bf16 = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)

    # 0) pallas launch overhead: trivial kernel copying (8,128)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def tiny_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    def tiny(x):
        return pl.pallas_call(
            tiny_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    scan_time("pallas launch overhead (tiny kernel)",
              lambda c, e: tiny(c), jnp.zeros((8, 128), jnp.float32))

    # 1) XLA dense self-attn (q.K + softmax + .V) at flagship shape
    from yourmt3_tpu.models.layers import dot_product_attention
    k_dense = bf16(S, H, L, dk)
    v_dense = bf16(S, H, L, dk)
    bias_row = jnp.asarray(rng.standard_normal((1, H, 1, L)), jnp.float32)

    def xla_attn(q, extras):
        k, v, b = extras
        out = dot_product_attention(q, k, v, b)  # (S,H,1,dk)
        return out.astype(jnp.bfloat16)

    scan_time("XLA dense attn (full L read)", xla_attn,
              bf16(S, H, 1, dk), extra=(k_dense, v_dense, bias_row))

    # 2) existing paged kernel, block=128 sp=8 / sp=26, pos=127 (half live)
    from yourmt3_tpu.ops.pallas.decode_attention import (
        empty_paged_cache, paged_decode_attention)
    for block, sp in ((128, 8), (128, 26), (64, 26), (256, 16)):
        NB = L // block
        # position-major paged layout (NB, S, H, block, dk) — must match
        # paged_decode_attention (a retired dk-major alloc here silently
        # benchmarked transposed pages; ADVICE r2)
        kc = jnp.zeros((NB, S, H, block, dk), jnp.bfloat16) + bf16(
            NB, S, H, block, dk)
        vc = jnp.zeros((NB, S, H, block, dk), jnp.bfloat16) + bf16(
            NB, S, H, block, dk)
        table = jnp.asarray(rng.standard_normal((32, H)), jnp.float32)
        for posv in (63, 255):
            pk = functools.partial(
                paged_decode_attention, block=block, streams_per_tile=sp,
                rel_max_distance=128)

            def body(q, extras):
                kc, vc, table = extras
                out = pk(q[:, :, 0, :], kc, vc, jnp.int32(posv),
                         rel_table=table)
                return out[:, :, None, :].astype(jnp.bfloat16)

            scan_time(f"paged kernel blk={block} sp={sp} pos={posv}",
                      body, bf16(S, H, 1, dk), extra=(kc, vc, table))


if __name__ == "__main__":
    main()
