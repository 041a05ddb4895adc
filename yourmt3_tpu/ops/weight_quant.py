"""Quantized decoder weights for autoregressive decode.

Decode steps are HBM-bandwidth-bound; after int8/int4 KV caches
(ops/kv_quant.py) the remaining irreducible traffic is the decoder
weights themselves, re-read from HBM every one of the L sequential
steps (EVIDENCE.md t5_base accounting: weights = 17% of step bytes).
This module builds a side-car `qweights` flax collection from a
restored param tree:

  - "bf16": kernels stored bfloat16. Numerically IDENTICAL to the
    normal path (flax Dense casts its fp32 kernel to bf16 before the
    dot anyway) but guarantees 2-byte HBM reads even when XLA keeps
    the fp32 master in the loop instead of hoisting the convert.
  - "int8": kernels stored int8 with per-output-channel fp32 scales
    (symmetric; scale = colmax(|w|)/127). Dequant is algebraically
    exact — only the int8 rounding of the weights themselves differs
    (~0.4% relative weight error) — and fuses into the matmul output.
    Halves weight bytes again vs bf16.

The collection mirrors the params tree structure, so
`model.apply({"params": p, "qweights": q}, ...)` lets every
QuantDense (models/layers.py) pick up its own entry by module path;
modules without an entry (the whole encoder) read their normal
kernel. Training and checkpoints are untouched — the collection is
derived, never stored.

Capability note: the reference has no analogue (its decode is Python
per-step over fp16/fp32 CUDA weights); this is TPU-first roofline
work on the north-star's per-chip decode throughput.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

MODES = ("none", "bf16", "int8")


def _quantize_kernel(w: np.ndarray, mode: str) -> Dict[str, jnp.ndarray]:
    if mode == "bf16":
        return {"kernel_q": jnp.asarray(w, jnp.bfloat16)}
    # int8, symmetric per-output-channel
    w = np.asarray(w, np.float32)
    scale = np.maximum(np.max(np.abs(w), axis=0), 1e-12) / 127.0  # (dout,)
    q = np.clip(np.rint(w / scale[None, :]), -127, 127).astype(np.int8)
    return {"kernel_q": jnp.asarray(q),
            "kernel_scale": jnp.asarray(scale, jnp.float32)}


def _walk(tree: Any, mode: str) -> Optional[dict]:
    """Mirror a params subtree, emitting {kernel_q[, kernel_scale]} at every
    module that holds a 2-D 'kernel' leaf (i.e. every Dense projection);
    prune branches with nothing to quantize."""
    if not isinstance(tree, dict):
        return None
    out = {}
    k = tree.get("kernel")
    if k is not None and getattr(k, "ndim", 0) == 2:
        out.update(_quantize_kernel(np.asarray(k), mode))
    for name, sub in tree.items():
        if name == "kernel":
            continue
        q = _walk(sub, mode)
        if q:
            out[name] = q
    return out or None


def quantize_decoder_weights(params: dict, mode: str) -> dict:
    """Full param dict ({"params": {...}} or bare tree) → `qweights`
    collection covering ONLY the decoder subtree (the encoder runs once
    per segment and is matmul-bound, not weight-read-bound)."""
    if mode not in MODES or mode == "none":
        raise ValueError(f"weight_quant mode must be one of {MODES[1:]}, "
                         f"got {mode!r}")
    p = params.get("params", params)
    dec = p.get("decoder")
    if dec is None:
        raise ValueError("param tree has no 'decoder' subtree")
    q = _walk(dec, mode)
    return {"decoder": q or {}}
