"""Decode-step component microbench (VERDICT item 5 evidence).

The flagship worst-case decode sustains ~290 GB/s (~35% of v5e HBM peak);
EVIDENCE names "VMEM staging + small-op overhead in the 16 attention
fusions per step" but the split was never measured. This bench isolates,
at the exact flagship decode shape (S=B·13 streams, H=6, dk=64, T=256):

  1. cross-attention variants in a tight on-device loop:
       - int8 dense XLA (current flagship winner)
       - int4 dense XLA (int8c4's cross — measured loser e2e, cause unknown)
       - bf16 paged Pallas kernel
       - int8 paged Pallas kernel
  2. self-attention (int8 dense, horizon=128 mid-decode proxy)
  3. full decode_step vs sum-of-parts → staging/small-op overhead, measured

Each timed loop runs inside one jitted lax.fori_loop with a data
dependency (output feeds the next query) so per-dispatch overhead is
excluded and XLA can't dead-code the body.

Usage: python scripts/bench_decode_parts.py [batch_segments] [iters]
Writes artifacts/decode_parts_r4.json
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 200

import jax
import jax.numpy as jnp
import numpy as np

S = B * 13  # streams: segments × channels
H, DK, T = 6, 64, 256
KEY = jax.random.PRNGKey(0)


def timed(fn, *args, iters=ITERS):
    """Median wall time per iteration of fn chained `iters` times under jit."""
    def loop(*a):
        def body(_, carry):
            return fn(*carry)
        return jax.lax.fori_loop(0, iters, body, a)
    j = jax.jit(loop)
    out = j(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = j(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(ts))


def fresh_qkv():
    ks = jax.random.split(KEY, 3)
    q = jax.random.normal(ks[0], (S, H, 1, DK), jnp.bfloat16)
    k = jax.random.normal(ks[1], (S, H, T, DK), jnp.bfloat16)
    v = jax.random.normal(ks[2], (S, H, T, DK), jnp.bfloat16)
    return q, k, v


results = {"streams": S, "segments": B, "T": T, "iters": ITERS,
           "backend": jax.default_backend()}
q0, k0, v0 = fresh_qkv()

# ---- 1. cross variants ----------------------------------------------------
from yourmt3_tpu.ops.kv_quant import (int4_decode_attention,
                                      int8_decode_attention, quantize_kv,
                                      quantize_kv4)

k8, k8s = quantize_kv(k0)
v8, v8s = quantize_kv(v0)

def cross_int8(q, *_unused):
    o = int8_decode_attention(q, k8, k8s, v8, v8s, None)
    return (o.astype(jnp.bfloat16),)

t = timed(lambda q: cross_int8(q), q0)
# bytes actually read per call (K+V int8 + fp32 scales + q + out, 1 layer)
int8_bytes = 2 * S * H * T * DK + 2 * S * H * T * 4
results["cross_int8_dense"] = {
    "ms": t * 1e3, "gb_per_s": int8_bytes / t / 1e9}

k4, k4s = quantize_kv4(k0)
v4, v4s = quantize_kv4(v0)

def cross_int4(q):
    o = int4_decode_attention(q, k4, k4s, v4, v4s, None)
    return (o.astype(jnp.bfloat16),)

t = timed(cross_int4, q0)
int4_bytes = 2 * S * H * T * (DK // 2) + 2 * S * H * T * 4
results["cross_int4_dense"] = {
    "ms": t * 1e3, "gb_per_s": int4_bytes / t / 1e9}

from yourmt3_tpu.ops.pallas.decode_attention import (
    dense_to_paged, empty_paged_scales, paged_cross_attention,
    paged_decode_attention, pick_streams_per_tile)

if jax.default_backend() == "tpu":
    kp = dense_to_paged(k0, 128)
    vp = dense_to_paged(v0, 128)

    def cross_paged_bf16(q):
        o = paged_cross_attention(q[:, :, 0, :], kp, vp, T)
        return (o[:, :, None, :].astype(jnp.bfloat16),)

    t = timed(cross_paged_bf16, q0)
    bf16_bytes = 2 * S * H * T * DK * 2
    results["cross_paged_bf16"] = {
        "ms": t * 1e3, "gb_per_s": bf16_bytes / t / 1e9}

    # int8 paged cross: quantized pages + stream-major scale pages
    kp8 = dense_to_paged(k8.astype(jnp.int8), 128)
    vp8 = dense_to_paged(v8.astype(jnp.int8), 128)
    # (S,H,T) → (S,NB,H,block)
    kps = k8s.reshape(S, H, T // 128, 128).transpose(0, 2, 1, 3)
    vps = v8s.reshape(S, H, T // 128, 128).transpose(0, 2, 1, 3)
    sp = pick_streams_per_tile(S, H, DK, 128)

    def cross_paged_int8(q):
        o = paged_decode_attention(
            q[:, :, 0, :], kp8, vp8, jnp.asarray(T - 1, jnp.int32),
            block=128, streams_per_tile=sp, k_scale=kps, v_scale=vps)
        return (o[:, :, None, :].astype(jnp.bfloat16),)

    t = timed(cross_paged_int8, q0)
    results["cross_paged_int8"] = {
        "ms": t * 1e3, "gb_per_s": int8_bytes / t / 1e9}

    # int4 Pallas cross (split-half dk-major packing, in-kernel unpack)
    from yourmt3_tpu.ops.kv_quant import quantize_kv4_crosspack
    from yourmt3_tpu.ops.pallas.decode_attention import int4_cross_attention
    k4c, k4s = quantize_kv4_crosspack(k0)
    v4c, v4s = quantize_kv4_crosspack(v0)

    def cross_pallas_int4(q):
        o = int4_cross_attention(q[:, :, 0, :], k4c, k4s, v4c, v4s)
        return (o[:, :, None, :].astype(jnp.bfloat16),)

    t = timed(cross_pallas_int4, q0)
    results["cross_pallas_int4"] = {
        "ms": t * 1e3, "gb_per_s": int4_bytes / t / 1e9}

# ---- 2. self-attention (int8 dense, horizon 128) ---------------------------
HZ = 128

def self_int8(q):
    o = int8_decode_attention(q, k8[:, :, :HZ], k8s[:, :, :HZ],
                              v8[:, :, :HZ], v8s[:, :, :HZ], None)
    return (o.astype(jnp.bfloat16),)

t = timed(self_int8, q0)
self_bytes = 2 * S * H * HZ * DK + 2 * S * H * HZ * 4
results["self_int8_dense_h128"] = {
    "ms": t * 1e3, "gb_per_s": self_bytes / t / 1e9}

# ---- 3. full decode_step (flagship config) vs sum of parts -----------------
# One real decode_step at the tuned config (int8 KV + int8 weights, dense
# XLA path), pos mid-decode, kv_len horizon 128 — the same shape the parts
# above isolate. full − (8·self + 8·cross) = FF + projections + norms +
# head + staging/small-op overhead; comparing against the roofline bytes
# says how much of the step is NOT the attention reads.
from yourmt3_tpu.api import init_model
from yourmt3_tpu.models.ymt3 import YMT3

bundle = init_model("perceiver_tf_mc13", "mc13_full_plus_256",
                    kv_quant="int8", weight_quant="int8",
                    use_pallas_decode=False)
model, params = bundle.model, bundle.params
mem = jax.random.normal(KEY, (B, 13, 256,
                              model.cfg.d_model), jnp.bfloat16)
cross_kvs = model.apply(params, mem, method=YMT3.init_cross_kv)
self_kvs = model.empty_self_kvs(S, 256)
tok0 = jnp.zeros((S, 1), jnp.int32)
pos0 = jnp.asarray(100, jnp.int32)


def full_step(tok, pos, kvs):
    logits, new_kvs = model.apply(params, tok, pos, kvs, cross_kvs,
                                  kv_len=HZ, method=YMT3.decode_step)
    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
    return nxt, pos, new_kvs  # pos fixed: keeps horizon semantics stable


t = timed(full_step, tok0, pos0, self_kvs)
results["full_decode_step_h128"] = {"ms": t * 1e3}
n_layers = model.cfg.num_decoder_layers
parts = (n_layers * results["self_int8_dense_h128"]["ms"]
         + n_layers * results["cross_int8_dense"]["ms"])
results["attention_parts_ms"] = parts
results["nonattention_plus_overhead_ms"] = results[
    "full_decode_step_h128"]["ms"] - parts

print(json.dumps(results, indent=1), flush=True)

import os

os.makedirs("artifacts", exist_ok=True)
json.dump(results, open("artifacts/decode_parts_r4.json", "w"), indent=1)
