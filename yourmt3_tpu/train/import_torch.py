"""Reference-checkpoint importer: PyTorch `.ckpt` → our flax param tree.

Capability parity target: SURVEY.md §5.4 "weight importer that maps
reference .ckpt tensors → our param tree (needed for the parity
requirement)", §7 hard-part 3.

The reference stores a Lightning checkpoint whose `state_dict` uses
(modified-)HF T5 naming: `model.encoder.block.N.layer.0.SelfAttention.q.
weight`, `model.decoder.block.N.layer.2.DenseReluDense.wi_0.weight`, etc.
This maps those onto our tree (models/t5.py):

    encoder/layer_N/attn/{q,k,v,o}/kernel        (transposed)
    encoder/layer_N/norm_attn/scale
    encoder/rel_bias/rel_embedding
    decoder/embed/embedding, decoder/lm_head/kernel, ...

Unmatched keys are reported, never silently dropped. Perceiver-TF naming
drifts most in the reference (SURVEY.md §7) — its map lives in
PERCEIVER_RULES and must be re-verified against a real checkpoint when
one is available (none ship in this offline environment).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """torch.load on CPU → {name: np.ndarray}. Accepts Lightning ckpts
    (unwraps 'state_dict') and raw state dicts."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    out = {}
    for k, v in sd.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().to(torch.float32).numpy()
    return out


# (regex on torch name) → (flax path template, transform)
# transform: "t" transpose 2-D, "none" as-is
T5_RULES: List[Tuple[str, str, str]] = [
    # encoder
    (r"encoder\.block\.(\d+)\.layer\.0\.SelfAttention\.([qkvo])\.weight",
     "encoder/layer_{0}/attn/{1}/kernel", "t"),
    (r"encoder\.block\.(\d+)\.layer\.0\.layer_norm\.weight",
     "encoder/layer_{0}/norm_attn/scale", "none"),
    (r"encoder\.block\.(\d+)\.layer\.1\.DenseReluDense\.wi_0\.weight",
     "encoder/layer_{0}/ff/wi_0/kernel", "t"),
    (r"encoder\.block\.(\d+)\.layer\.1\.DenseReluDense\.wi_1\.weight",
     "encoder/layer_{0}/ff/wi_1/kernel", "t"),
    (r"encoder\.block\.(\d+)\.layer\.1\.DenseReluDense\.wi\.weight",
     "encoder/layer_{0}/ff/wi/kernel", "t"),
    (r"encoder\.block\.(\d+)\.layer\.1\.DenseReluDense\.wo\.weight",
     "encoder/layer_{0}/ff/wo/kernel", "t"),
    (r"encoder\.block\.(\d+)\.layer\.1\.layer_norm\.weight",
     "encoder/layer_{0}/norm_ff/scale", "none"),
    (r"encoder\.block\.0\.layer\.0\.SelfAttention\.relative_attention_bias\.weight",
     "encoder/rel_bias/rel_embedding", "none"),
    (r"encoder\.final_layer_norm\.weight", "encoder/final_norm/scale", "none"),
    (r"encoder\.proj\.weight", "encoder/input_proj/kernel", "t"),
    # decoder
    (r"decoder\.block\.(\d+)\.layer\.0\.SelfAttention\.([qkvo])\.weight",
     "decoder/layer_{0}/self_attn/{1}/kernel", "t"),
    (r"decoder\.block\.(\d+)\.layer\.0\.layer_norm\.weight",
     "decoder/layer_{0}/norm_self/scale", "none"),
    (r"decoder\.block\.(\d+)\.layer\.1\.EncDecAttention\.([qkvo])\.weight",
     "decoder/layer_{0}/cross_attn/{1}/kernel", "t"),
    (r"decoder\.block\.(\d+)\.layer\.1\.layer_norm\.weight",
     "decoder/layer_{0}/norm_cross/scale", "none"),
    (r"decoder\.block\.(\d+)\.layer\.2\.DenseReluDense\.wi_0\.weight",
     "decoder/layer_{0}/ff/wi_0/kernel", "t"),
    (r"decoder\.block\.(\d+)\.layer\.2\.DenseReluDense\.wi_1\.weight",
     "decoder/layer_{0}/ff/wi_1/kernel", "t"),
    (r"decoder\.block\.(\d+)\.layer\.2\.DenseReluDense\.wo\.weight",
     "decoder/layer_{0}/ff/wo/kernel", "t"),
    (r"decoder\.block\.(\d+)\.layer\.2\.layer_norm\.weight",
     "decoder/layer_{0}/norm_ff/scale", "none"),
    (r"decoder\.block\.0\.layer\.0\.SelfAttention\.relative_attention_bias\.weight",
     "decoder/rel_bias/rel_embedding", "none"),
    (r"decoder\.final_layer_norm\.weight", "decoder/final_norm/scale", "none"),
    (r"(?:shared|decoder\.embed_tokens|embed_tokens)\.weight",
     "decoder/embed/embedding", "none"),
    (r"lm_head\.weight", "decoder/lm_head/kernel", "t"),
]

PERCEIVER_RULES: List[Tuple[str, str, str]] = [
    # (verify) against a real YourMT3+ checkpoint; latent + SCA + T/S blocks
    (r"encoder\.latent(?:s|_array)?(?:\.weight)?$", "encoder/latents", "none"),
    (r"encoder\.pos_emb(?:\.weight)?$", "encoder/time_pos", "none"),
]

STRIP_PREFIXES = ("model.", "module.", "ymt3.", "net.")


def map_state_dict(sd: Dict[str, np.ndarray],
                   extra_rules: Optional[List[Tuple[str, str, str]]] = None
                   ) -> Tuple[Dict[str, np.ndarray], List[str]]:
    """→ ({flax_path: array}, unmatched_names)."""
    rules = T5_RULES + PERCEIVER_RULES + (extra_rules or [])
    mapped: Dict[str, np.ndarray] = {}
    unmatched: List[str] = []
    for name, arr in sd.items():
        n = name
        for p in STRIP_PREFIXES:
            if n.startswith(p):
                n = n[len(p):]
        hit = False
        for pat, tmpl, tf in rules:
            m = re.fullmatch(pat, n)
            if not m:
                continue
            path = tmpl.format(*m.groups())
            v = arr.T if (tf == "t" and arr.ndim == 2) else arr
            mapped[path] = v
            hit = True
            break
        if not hit:
            unmatched.append(name)
    return mapped, unmatched


def apply_to_params(params: Dict[str, Any], mapped: Dict[str, np.ndarray],
                    strict_shapes: bool = True) -> Tuple[Dict[str, Any], List[str]]:
    """Write mapped tensors into a (nested) flax params dict (in a copy).
    → (new_params, list of paths that were applied)."""
    import jax

    flat = {}

    def flatten(tree, prefix=""):
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                flatten(v, p)
            else:
                flat[p] = v

    root = params.get("params", params)
    flatten(root)
    new_flat = dict(flat)
    applied = []
    for path, arr in mapped.items():
        if path not in flat:
            continue
        if flat[path].shape != arr.shape:
            if strict_shapes:
                raise ValueError(f"{path}: shape {arr.shape} vs expected "
                                 f"{flat[path].shape}")
            continue
        new_flat[path] = arr.astype(np.asarray(flat[path]).dtype)
        applied.append(path)

    def unflatten(flat_d):
        out: Dict[str, Any] = {}
        for p, v in flat_d.items():
            parts = p.split("/")
            d = out
            for part in parts[:-1]:
                d = d.setdefault(part, {})
            d[parts[-1]] = v
        return out

    new_root = unflatten(new_flat)
    return ({"params": new_root} if "params" in params else new_root), applied


def import_checkpoint(ckpt_path: str, params: Dict[str, Any],
                      verbose: bool = True) -> Dict[str, Any]:
    """Full pipeline: torch ckpt file → updated flax params."""
    sd = load_torch_state_dict(ckpt_path)
    mapped, unmatched = map_state_dict(sd)
    new_params, applied = apply_to_params(params, mapped)
    if verbose:
        print(f"imported {len(applied)}/{len(mapped)} mapped tensors; "
              f"{len(unmatched)} source keys unmatched")
        for u in unmatched[:20]:
            print("  unmatched:", u)
    return new_params
