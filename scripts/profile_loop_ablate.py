"""Ablate pieces of the decode-loop body to find the in-loop cost center.

The standalone decode_step costs ~330 us but inside lax.while_loop it
costs ~3590 us/step (measured). Each ablation removes one component while
keeping the loop structure; the delta attributes the cost.
"""

import time

import numpy as np


def timed(fn, *args, loops=3, warmup=1):
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
    from yourmt3_tpu.models import t5 as t5mod
    from yourmt3_tpu.models.decoding import greedy_decode
    from yourmt3_tpu.models.ymt3 import YMT3

    bundle = init_model("perceiver_tf_mc13", "mc13_full_plus_256")
    B, L = 16, 256
    C = bundle.cfg.num_channels
    D = bundle.cfg.d_model
    rng = np.random.default_rng(0)
    memory = jnp.asarray(
        rng.standard_normal((B, C, bundle.audio_cfg.num_frames, D)),
        jnp.bfloat16) * 0.02

    def run(tag):
        @jax.jit
        def dec(params, memory):
            return greedy_decode(bundle.model, params, memory, L, ban_eos=True)
        t = timed(dec, bundle.params, memory)
        print(f"{tag:28s}: {t*1e3:8.1f} ms  ({t/L*1e6:6.0f} us/step)")
        return t

    orig = t5mod.T5DecoderLayer.decode_step
    run("baseline dense loop")

    # ---- no cross attention ------------------------------------------
    def no_cross(self, y, self_kv, pos, cross_kv, step_bias):
        h = self.norm_self(y)
        q = self.self_attn._split(self.self_attn.q(h))
        k_step = self.self_attn._split(self.self_attn.k(h))
        v_step = self.self_attn._split(self.self_attn.v(h))
        ck, cv = self_kv
        ck = jax.lax.dynamic_update_slice(ck, k_step, (0, 0, pos, 0))
        cv = jax.lax.dynamic_update_slice(cv, v_step, (0, 0, pos, 0))
        from yourmt3_tpu.models.layers import dot_product_attention
        att = dot_product_attention(q, ck, cv, step_bias)
        y = y + self.self_attn.o(self.self_attn._merge(att))
        h = self.norm_ff(y)
        y = y + self.ff(h, deterministic=True)
        return y, (ck, cv)

    t5mod.T5DecoderLayer.decode_step = no_cross
    run("no cross-attn")

    # ---- no self-cache (attend to current step only, no carry update) --
    def no_self_cache(self, y, self_kv, pos, cross_kv, step_bias):
        from yourmt3_tpu.models.layers import dot_product_attention
        h = self.norm_self(y)
        q = self.self_attn._split(self.self_attn.q(h))
        k_step = self.self_attn._split(self.self_attn.k(h))
        v_step = self.self_attn._split(self.self_attn.v(h))
        att = dot_product_attention(q, k_step, v_step, None)
        y = y + self.self_attn.o(self.self_attn._merge(att))
        h = self.norm_cross(y)
        qc = self.cross_attn._split(self.cross_attn.q(h))
        attc = dot_product_attention(qc, cross_kv[0], cross_kv[1], None)
        y = y + self.cross_attn.o(self.cross_attn._merge(attc))
        h = self.norm_ff(y)
        y = y + self.ff(h, deterministic=True)
        return y, self_kv  # carry untouched

    t5mod.T5DecoderLayer.decode_step = no_self_cache
    run("no self-cache (carry untouched)")

    # ---- self-cache update but attend only to the step ---------------
    def update_only(self, y, self_kv, pos, cross_kv, step_bias):
        from yourmt3_tpu.models.layers import dot_product_attention
        h = self.norm_self(y)
        q = self.self_attn._split(self.self_attn.q(h))
        k_step = self.self_attn._split(self.self_attn.k(h))
        v_step = self.self_attn._split(self.self_attn.v(h))
        ck, cv = self_kv
        ck = jax.lax.dynamic_update_slice(ck, k_step, (0, 0, pos, 0))
        cv = jax.lax.dynamic_update_slice(cv, v_step, (0, 0, pos, 0))
        att = dot_product_attention(q, k_step, v_step, None)
        y = y + self.self_attn.o(self.self_attn._merge(att))
        h = self.norm_cross(y)
        qc = self.cross_attn._split(self.cross_attn.q(h))
        attc = dot_product_attention(qc, cross_kv[0], cross_kv[1], None)
        y = y + self.cross_attn.o(self.cross_attn._merge(attc))
        h = self.norm_ff(y)
        y = y + self.ff(h, deterministic=True)
        return y, (ck, cv)

    t5mod.T5DecoderLayer.decode_step = update_only
    run("cache update, step-only attn")

    t5mod.T5DecoderLayer.decode_step = orig


if __name__ == "__main__":
    main()
