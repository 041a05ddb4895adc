"""Paged single-query decode attention (Pallas TPU kernel).

North-star requirement (BASELINE.json): "pallas kernels for ... decode-step
attention over a paged KV cache". This is the measured hot spot of
autoregressive decoding: at step `pos`, XLA's dense attention reads the
ENTIRE K/V caches from HBM every step (≈200 MB/step for t5-small B=16
L=1024), even though only `pos+1` positions are live.

Design: caches are paged (NB, S, H, block, dk) — one page is (block, dk),
position-major, H·block·dk·2B ≈ 98 KB contiguous per (page, stream). The
grid is (stream_tiles, NB) and the page axis rides pallas' AUTOMATIC
pipeline (double-buffered prefetch); pages beyond the live range are
skipped by CLAMPING the BlockSpec index map to the last live page — a
revisited block index issues no new DMA — and predicating the compute
with @pl.when. Per-step HBM traffic is ∝ pos+1 instead of ∝ L. Softmax is
online (flash single-query): running max m, normalizer l, accumulator acc
persist in VMEM scratch across page steps.

Why position-major pages (block, dk) rather than (dk, block): the
per-step cache write lands at ONE position, i.e. one sublane row of
dk contiguous lanes per (s, h) — the same write pattern as the dense
(S, H, L, dk) cache, which XLA updates in place for ~1 µs/step. The
previous lane-minor layout made that write a single-lane column scatter;
XLA materialized it as a full-cache rewrite costing 4 ms/step (measured,
flagship shape) — 16× the kernel itself.

(A previous revision hand-rolled double-buffered DMA with a dynamic slot
index; Mosaic materialized the slot select as full-buffer copies and ran
~flat in pos. The clamped-index-map formulation keeps every ref static.)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(pos_ref,  # scalar prefetch: (1,) int32
            q_ref,  # (sp, H, dk) VMEM
            bias_ref,  # (sp·H, L) pre-tiled bias OR (buckets, H_pad) table
            k_ref, v_ref,  # (1, sp, H, block, dk) VMEM — this page
            *rest,  # [ks_ref, vs_ref] when quantized, then outputs/scratch
            block: int, rel_buckets: int = 0, rel_max_distance: int = 128,
            has_bias: bool = True, causal: bool = True,
            quantized: bool = False):
    if quantized:
        ks_ref, vs_ref, out_ref, m_ref, l_ref, acc_ref = rest
    else:
        out_ref, m_ref, l_ref, acc_ref = rest
    pos = pos_ref[0]
    b = pl.program_id(1)
    nb = pl.num_programs(1)
    sp, H, dk = q_ref.shape
    G = sp * H

    @pl.when(b == 0)
    def _():
        m_ref[:] = jnp.full((G, 1), NEG_INF, jnp.float32)
        l_ref[:] = jnp.zeros((G, 1), jnp.float32)
        acc_ref[:] = jnp.zeros((G, dk), jnp.float32)

    @pl.when(b * block <= pos)
    def _():
        q = q_ref[:].reshape(G, dk).astype(jnp.float32)
        k = k_ref[0].reshape(G, block, dk).astype(jnp.float32)
        v = v_ref[0].reshape(G, block, dk).astype(jnp.float32)
        # logits (G, block) = Σ_d q[g,d]·k[g,j,d]  (singleton M dim for MXU)
        logits = jax.lax.dot_general(
            q[:, None, :], k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0, :]
        if quantized:
            # int8 pages: per-position fp32 row scales fold into the
            # logits (K) and the softmax weights (V) — exact algebra
            logits = logits * ks_ref[:, 0].reshape(G, block)
        j = b * block + jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)
        if not has_bias:
            pass  # cross-attention: no positional bias
        elif rel_buckets:
            # reconstruct the T5 rel-bias slice IN KERNEL from the bucket
            # table (a runtime (H, L) bias operand measured 15-30× the whole
            # kernel cost; the table is ~1 KB): bucket(d) → one-hot → MXU.
            # NOTE: only lax.slice/reshape here — numpy-style mixed
            # indexing lowers to gathers Mosaic rejects.
            d = jnp.maximum(pos - j, 0)  # (1, block)
            max_exact = rel_buckets // 2
            dl = jnp.log(d.astype(jnp.float32) / max_exact + 1e-6)
            large = max_exact + (
                dl / np.log(rel_max_distance / max_exact)
                * (rel_buckets - max_exact)).astype(jnp.int32)
            bucket = jnp.where(d < max_exact, d,
                               jnp.minimum(large, rel_buckets - 1))  # (1, blk)
            onehot = (jnp.broadcast_to(bucket, (rel_buckets, block))
                      == jax.lax.broadcasted_iota(
                          jnp.int32, (rel_buckets, block), 0)
                      ).astype(jnp.float32)
            table = bias_ref[:].astype(jnp.float32)  # (buckets, H_pad)
            bias_hb = jax.lax.dot_general(
                table, onehot, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (H_pad, block)
            bias_h = jax.lax.slice(bias_hb, (0, 0), (H, block))
            logits = (logits.reshape(sp, H, block)
                      + jnp.expand_dims(bias_h, 0)).reshape(G, block)
        else:
            logits += bias_ref[:, pl.ds(b * block, block)]
        if causal:
            logits = jnp.where(j <= pos, logits, NEG_INF)

        m = m_ref[:]
        m_new = jnp.maximum(m, jnp.max(logits, axis=1, keepdims=True))
        p = jnp.exp(logits - m_new)
        scale = jnp.exp(m - m_new)
        l_ref[:] = l_ref[:] * scale + jnp.sum(p, axis=1, keepdims=True)
        if quantized:
            p = p * vs_ref[:, 0].reshape(G, block)
        pv = jax.lax.dot_general(
            p[:, None, :], v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0, :]
        acc_ref[:] = acc_ref[:] * scale + pv
        m_ref[:] = m_new

    @pl.when(b == nb - 1)
    def _():
        out = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        out_ref[:] = out.reshape(sp, H, dk).astype(out_ref.dtype)


def paged_decode_attention(
    q: jnp.ndarray,  # (S, H, 1, dk) or (S, H, dk)
    k_cache: jnp.ndarray,  # (NB, S, H, block, dk) — paged layout
    v_cache: jnp.ndarray,  # (NB, S, H, block, dk)
    pos: jnp.ndarray,  # scalar int32 — lockstep decode position
    bias_row: Optional[jnp.ndarray] = None,  # (H, L) additive bias for query
    block: int = 128,
    streams_per_tile: int = 8,
    interpret: Optional[bool] = None,  # default: interpret off-TPU (tests)
    rel_table: Optional[jnp.ndarray] = None,  # (buckets, H) T5 bias table
    rel_max_distance: int = 128,
    k_scale: Optional[jnp.ndarray] = None,  # (S,NB,H,block) fp32 — int8 pages
    v_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """→ attention output with q's leading shape ((S, H, dk) or (S,H,1,dk)).

    Bias options (mutually exclusive): `bias_row` (H, L) explicit additive
    bias, or `rel_table` — the T5 relative-attention bucket table, from
    which the bias is reconstructed IN KERNEL (preferred on TPU: a runtime
    (H, L) operand is pathologically slow through the pallas pipeline).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    squeeze = False
    if q.ndim == 4:
        q = q[:, :, 0, :]
        squeeze = True
    S, H, dk = q.shape
    NB = k_cache.shape[0]
    assert k_cache.shape[3] == block, (k_cache.shape, block)
    L = NB * block
    sp = min(streams_per_tile, S)
    while S % sp:
        sp -= 1
    rel_buckets = 0
    has_bias = rel_table is not None or bias_row is not None
    if rel_table is not None:
        rel_buckets = rel_table.shape[0]
        H_pad = -(-H // 8) * 8
        if rel_table.shape[1] != H_pad:
            rel_table = jnp.pad(rel_table, ((0, 0), (0, H_pad - rel_table.shape[1])))
    if not has_bias:
        # no-bias path (cross-attention): tiny dummy operand, never read
        bias_in = jnp.zeros((8, 128), jnp.float32)
        bias_spec = pl.BlockSpec((8, 128), lambda i, b, p: (0, 0),
                                 memory_space=pltpu.VMEM)
    elif rel_buckets:
        bias_in = rel_table.astype(jnp.float32)  # (buckets, H_pad), ~1 KB
        bias_spec = pl.BlockSpec((rel_buckets, bias_in.shape[1]),
                                 lambda i, b, p: (0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        # pre-tile the bias over the stream tile OUTSIDE the kernel: an
        # in-kernel jnp.tile of a sublane-misaligned (6, block) slice
        # lowers to Mosaic slow-path copies (~20× kernel cost, measured)
        bias_in = jnp.tile(bias_row.astype(jnp.float32), (sp, 1))  # (sp·H, L)
        bias_spec = pl.BlockSpec((sp * H, L), lambda i, b, p: (0, 0),
                                 memory_space=pltpu.VMEM)

    def page_idx(i, b, pos_ref):
        # clamp beyond-live pages to the last live page: pallas skips the
        # DMA when the block index repeats, so dead pages cost nothing
        return jnp.minimum(b, pos_ref[0] // block)

    quantized = k_scale is not None
    page_spec = pl.BlockSpec((1, sp, H, block, dk),
                             lambda i, b, p: (page_idx(i, b, p), i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((sp, H, dk), lambda i, b, p: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        bias_spec,
        page_spec,
        page_spec,
    ]
    operands = [jnp.asarray([pos], jnp.int32).reshape(1), q, bias_in,
                k_cache, v_cache]
    if quantized:
        # scale pages are STREAM-major (S, NB, H, block) so every cache
        # tensor keeps its stream axis where the beam-reorder/compaction
        # gathers expect it (axis 0 for 4-D, axis 1 for 5-D)
        scale_spec = pl.BlockSpec(
            (sp, 1, H, block), lambda i, b, p: (i, page_idx(i, b, p), 0, 0),
            memory_space=pltpu.VMEM)
        in_specs += [scale_spec, scale_spec]
        operands += [k_scale, v_scale]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S // sp, NB),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((sp, H, dk), lambda i, b, p: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((sp * H, 1), jnp.float32),
            pltpu.VMEM((sp * H, 1), jnp.float32),
            pltpu.VMEM((sp * H, dk), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, block=block, rel_buckets=rel_buckets,
                          rel_max_distance=rel_max_distance,
                          has_bias=has_bias, quantized=quantized),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, H, dk), q.dtype),
        interpret=interpret,
    )(*operands)
    return out[:, :, None, :] if squeeze else out


# ---------------------------------------------------------------------------
# Paged-cache helpers (used by models/t5.py decode path)
# ---------------------------------------------------------------------------

def empty_paged_cache(streams: int, heads: int, dk: int, max_len: int,
                      block: int = 128, dtype=jnp.bfloat16) -> jnp.ndarray:
    assert max_len % block == 0
    return jnp.zeros((max_len // block, streams, heads, block, dk), dtype)


def pick_streams_per_tile(S: int, H: int, dk: int, block: int,
                          vmem_budget: int = 11 * 2**20) -> int:
    """Largest divisor of S whose double-buffered k+v pages fit the VMEM
    budget (4 buffers in flight × sp·H·block·lanes·2 B each; pages are
    position-major (block, dk) so dk is the lane dim, padded to 128)."""
    lanes = max(dk, 128)
    cap = max(1, vmem_budget // (4 * H * block * lanes * 2))
    sp = min(cap, S)
    while S % sp:
        sp -= 1
    return sp


def dense_to_paged(kv: jnp.ndarray, block: int = 128) -> jnp.ndarray:
    """(S, H, T, dk) dense KV → (NB, S, H, block, dk) paged layout,
    zero-padding T up to a multiple of `block` (padded columns must be
    masked by the caller via pos=T-1)."""
    S, H, T, dk = kv.shape
    pad = (-T) % block
    if pad:
        kv = jnp.pad(kv, ((0, 0), (0, 0), (0, pad), (0, 0)))
    Tp = T + pad
    # (S,H,Tp,dk) → (S,H,NB,block,dk) → (NB,S,H,block,dk)
    kv = kv.reshape(S, H, Tp // block, block, dk)
    return kv.transpose(2, 0, 1, 3, 4)


def paged_cross_attention(q: jnp.ndarray,  # (S, H, dk) or (S, H, 1, dk)
                          k_paged: jnp.ndarray,  # (NB, S, H, dk, block)
                          v_paged: jnp.ndarray,
                          valid_len: int,
                          streams_per_tile: Optional[int] = None,
                          interpret: Optional[bool] = None) -> jnp.ndarray:
    """Cross-attention decode step through the paged kernel: full read of
    the (static) encoder KV, no positional bias; padded columns beyond
    `valid_len` are masked via the kernel's pos mask."""
    S, H = q.shape[0], q.shape[1]
    dk = q.shape[-1]
    block = k_paged.shape[3]
    if streams_per_tile is None:
        streams_per_tile = pick_streams_per_tile(S, H, dk, block)
    return paged_decode_attention(
        q, k_paged, v_paged, jnp.asarray(valid_len - 1, jnp.int32),
        block=block, streams_per_tile=streams_per_tile,
        interpret=interpret)


def paged_cache_update(cache: jnp.ndarray, step_kv: jnp.ndarray,
                       pos: jnp.ndarray) -> jnp.ndarray:
    """Write one step's (S, H, 1, dk) K or V into the paged cache at pos.

    The position-major page layout makes this a sublane-row write (dk
    contiguous lanes per (s, h)) — XLA keeps it in place inside the
    decode while-loop, same as the dense cache update."""
    block = cache.shape[3]
    page, off = pos // block, pos % block
    upd = step_kv[None]  # (1, S, H, 1, dk)
    return jax.lax.dynamic_update_slice(cache, upd.astype(cache.dtype),
                                        (page, 0, 0, off, 0))


def empty_paged_scales(streams: int, heads: int, max_len: int,
                       block: int = 128) -> jnp.ndarray:
    """fp32 row-scale pages for int8 caches, STREAM-major (see kernel)."""
    assert max_len % block == 0
    return jnp.zeros((streams, max_len // block, heads, block), jnp.float32)


def paged_scale_update(scales: jnp.ndarray, step_scale: jnp.ndarray,
                       pos: jnp.ndarray) -> jnp.ndarray:
    """Write one step's (S, H, 1) fp32 scales into (S, NB, H, block)."""
    block = scales.shape[3]
    page, off = pos // block, pos % block
    upd = step_scale[:, None]  # (S, 1, H, 1)
    return jax.lax.dynamic_update_slice(scales, upd, (0, page, 0, off))


def paged_to_dense(cache: jnp.ndarray) -> jnp.ndarray:
    """(NB, S, H, block, dk) → (S, H, dk, L)."""
    NB, S, H, block, dk = cache.shape
    return cache.transpose(1, 2, 4, 0, 3).reshape(S, H, dk, NB * block)


def reference_decode_attention(q, k_cache, v_cache, pos, bias_row=None):
    """Dense XLA reference with identical semantics (paged or (S,H,dk,L))."""
    if k_cache.ndim == 5:
        k_cache = paged_to_dense(k_cache)
        v_cache = paged_to_dense(v_cache)
    if q.ndim == 3:
        q = q[:, :, None, :]
    S, H, _, dk = q.shape
    L = k_cache.shape[3]
    logits = jnp.einsum("shqd,shdk->shqk", q.astype(jnp.float32),
                        k_cache.astype(jnp.float32))
    if bias_row is not None:
        logits += bias_row[None, :, None, :]
    j = jnp.arange(L)[None, None, None, :]
    logits = jnp.where(j <= pos, logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("shqk,shdk->shqd", p, v_cache.astype(jnp.float32))
    return out[:, :, 0, :].astype(q.dtype)


# ---------------------------------------------------------------------------
# int4 CROSS attention (single-pass, T-lane-major packed nibbles)
# ---------------------------------------------------------------------------

def _int4_cross_kernel(q_ref,  # (sp, H, dk) VMEM
                       k4_ref, ks_ref,  # (sp, H, dk2, T) uint8 / (sp, H, T)
                       v4_ref, vs_ref,
                       out_ref,  # (sp, H, dk)
                       *, T: int, dk: int):
    """softmax((q·(K4−8))·kscale)·((V4−8)·vscale) in one grid step.

    The cross KV is STATIC and re-read on every decode step — at the
    flagship shape it is the dominant decode traffic (≈370 of ≈600
    MB/step at int8), and phase-chunking cannot shrink it. int4 halves
    those bytes, but XLA cannot contract over packed nibbles in one pass
    (either the unpack materializes or both half-dots re-read the packed
    array — measured catastrophic in int4_ablation_r3). In-kernel unpack
    reads the packed bytes exactly once.

    Layout is dk-MAJOR, T-minor: pages are (dk2, T) uint8 → the uint8
    tile is (32, T) with T=256 lanes — zero tile padding (a T-minor
    (T, dk2=32) layout pads lanes 32→128 = 4× VMEM + DMA waste). Byte
    (d, t) packs elements d (low nibble) and d+dk/2 (high nibble),
    biased +8 — split-half packing so the unpack never interleaves
    lanes; the two half-width dots contract over sublanes instead.

    Bias/scale algebra (exact): logits_t = ks_t·(q·nib_t − 8·Σq);
    out_d = (Σ_t w_t·nib_{t,d} − 8·Σ_t w_t)/Σ_t p_t with w = p·vs.
    """
    sp, H, _ = q_ref.shape
    dk2 = dk // 2
    G = sp * H
    q = q_ref[:].reshape(G, dk).astype(jnp.float32)
    q_lo = jax.lax.slice(q, (0, 0), (G, dk2))[:, None, :]   # (G, 1, dk2)
    q_hi = jax.lax.slice(q, (0, dk2), (G, dk))[:, None, :]

    kb = k4_ref[:].reshape(G, dk2, T).astype(jnp.int32)
    k_lo = (kb & 15).astype(jnp.float32)
    k_hi = (kb >> 4).astype(jnp.float32)
    dn_k = (((2,), (1,)), ((0,), (0,)))  # contract dk2, batch G
    raw = (jax.lax.dot_general(q_lo, k_lo, dn_k,
                               preferred_element_type=jnp.float32)
           + jax.lax.dot_general(q_hi, k_hi, dn_k,
                                 preferred_element_type=jnp.float32)
           )[:, 0, :]                                        # (G, T)
    qsum = jnp.sum(q, axis=1, keepdims=True)                 # (G, 1)
    logits = (raw - 8.0 * qsum) * ks_ref[:].reshape(G, T)

    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=1, keepdims=True)                # (G, 1)
    w = p * vs_ref[:].reshape(G, T)                          # (G, T)

    vb = v4_ref[:].reshape(G, dk2, T).astype(jnp.int32)
    v_lo = (vb & 15).astype(jnp.float32)
    v_hi = (vb >> 4).astype(jnp.float32)
    dn_v = (((2,), (2,)), ((0,), (0,)))  # contract T, batch G
    o_lo = jax.lax.dot_general(w[:, None, :], v_lo, dn_v,
                               preferred_element_type=jnp.float32)[:, 0, :]
    o_hi = jax.lax.dot_general(w[:, None, :], v_hi, dn_v,
                               preferred_element_type=jnp.float32)[:, 0, :]
    wsum = jnp.sum(w, axis=1, keepdims=True)                 # (G, 1)
    out = jnp.concatenate([o_lo - 8.0 * wsum, o_hi - 8.0 * wsum], axis=1)
    out = out / jnp.maximum(denom, 1e-30)
    out_ref[:] = out.reshape(sp, H, dk).astype(out_ref.dtype)


def pick_streams_per_tile_cross4(S: int, H: int, dk: int, T: int,
                                 vmem_budget: int = 10 * 2**20) -> int:
    """Largest divisor of S fitting the int4 cross tile in VMEM: packed
    K+V pages (double-buffered) + the f32 nibble planes the unpack
    materializes (~5 live (G, dk2, T) f32 arrays at peak)."""
    dk2 = dk // 2
    per_stream = (4 * H * dk2 * T          # K4+V4 double-buffered, uint8
                  + 5 * H * dk2 * T * 4    # live unpacked f32 planes
                  + 6 * H * T * 4)         # scales + logits/p/w rows
    sp = max(1, min(vmem_budget // per_stream, S))
    while S % sp:
        sp -= 1
    return sp


def int4_cross_attention(q: jnp.ndarray,  # (S, H, dk) or (S, H, 1, dk)
                         k4: jnp.ndarray,  # (S, H, dk//2, T) uint8
                         ks: jnp.ndarray,  # (S, H, T) fp32
                         v4: jnp.ndarray,
                         vs: jnp.ndarray,
                         streams_per_tile: Optional[int] = None,
                         interpret: Optional[bool] = None) -> jnp.ndarray:
    """Cross-attention decode step over split-half-packed int4 KV.

    Build k4/v4/ks/vs once per segment batch with
    ops/kv_quant.quantize_kv4_crosspack (init_cross_kv does this when
    kv_quant == "int8c4p")."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    squeeze = False
    if q.ndim == 4:
        q = q[:, :, 0, :]
        squeeze = True
    S, H, dk = q.shape
    T = k4.shape[-1]
    assert k4.shape == (S, H, dk // 2, T), (k4.shape, (S, H, dk // 2, T))
    sp = streams_per_tile or pick_streams_per_tile_cross4(S, H, dk, T)
    grid = (S // sp,)
    kv_spec = pl.BlockSpec((sp, H, dk // 2, T), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((sp, H, T), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((sp, H, dk), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_int4_cross_kernel, T=T, dk=dk),
        grid=grid,
        in_specs=[q_spec, kv_spec, sc_spec, kv_spec, sc_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((S, H, dk), q.dtype),
        interpret=interpret,
    )(q, k4, ks, v4, vs)
    return out[:, :, None, :] if squeeze else out
