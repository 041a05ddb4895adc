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

Parity note: when building the model for IMPORTED Perceiver-TF weights,
pass encoder_abs_pos="none" — the reference PTF encoder carries only the
trainable temporal embedding, while our preset default additionally adds
fixed sinusoids on the time axis (models/perceiver_tf.py; needed to learn
absolute event timing from scratch in few steps). The sinusoid is not a
parameter, so the param-tree mapping itself is identical either way.
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
    # T5 v1.0 (non-gated) FF — the encoder list had this rule but the
    # decoder did not, so v1.0-style decoder FF weights silently never
    # imported (caught by tests/test_hf_parity.py relu variant)
    (r"decoder\.block\.(\d+)\.layer\.2\.DenseReluDense\.wi\.weight",
     "decoder/layer_{0}/ff/wi/kernel", "t"),
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

# Perceiver-TF / conv pre-encoder / projection / conformer rule sets.
#
# NAMING ASSUMPTION (documented, to re-verify against a real YourMT3+
# checkpoint when one is obtainable — none ships in this offline env):
# module names follow the reference's HF-style attribute paths
# (`perceiver_mod.py` / `conv_block.py` / `projection_layer.py` /
# `conformer_mod.py`, SURVEY.md C19/C22/C23/C24). Every rule is exercised
# by tests/test_import_torch.py against a SHAPE-COMPLETE synthetic state
# dict generated by `reference_style_state_dict` (the exact inverse of
# these rules), which asserts that EVERY param of the flagship
# perceiver_tf_mc13(+moe) model is applied with zero unmatched keys —
# so when a real checkpoint appears, only the torch-side *names* can need
# adjustment, never the coverage or the transforms.
PERCEIVER_RULES: List[Tuple[str, str, str]] = [
    # latent array + temporal position embedding
    (r"encoder\.latent(?:s|_array)?(?:\.weight)?", "encoder/latents", "none"),
    (r"encoder\.(?:pos_emb|time_pos_emb)(?:\.weight)?", "encoder/time_pos", "none"),
    # conv pre-encoder (reference PreEncoderBlockRes3B, C19)
    (r"encoder\.pre_encoder\.block\.(\d+)\.(conv_down|conv_a|conv_b)\.weight",
     "encoder/conv_pre/block_{0}/{1}/kernel", "conv"),
    (r"encoder\.pre_encoder\.block\.(\d+)\.(conv_down|conv_a|conv_b)\.bias",
     "encoder/conv_pre/block_{0}/{1}/bias", "none"),
    (r"encoder\.spectral_proj\.weight", "encoder/spectral_proj/kernel", "t"),
    # spectral cross-attention (SCA) stack
    (r"encoder\.sca\.norm_q\.weight", "encoder/sca_norm_q/scale", "none"),
    (r"encoder\.sca\.norm_kv\.weight", "encoder/sca_norm_kv/scale", "none"),
    (r"encoder\.sca\.attention\.([qkvo])\.weight", "encoder/sca/{0}/kernel", "t"),
    (r"encoder\.sca\.ff_norm\.weight", "encoder/sca_ff_norm/scale", "none"),
    (r"encoder\.sca\.ff\.(wi|wo)\.weight", "encoder/sca_ff/{0}/kernel", "t"),
    # alternating temporal/spectral SA blocks (dense-FF variant)
    (r"encoder\.(temporal|spectral)_blocks\.(\d+)\.norm1\.weight",
     "encoder/{0}_{1}/norm_attn/scale", "none"),
    (r"encoder\.(temporal|spectral)_blocks\.(\d+)\.attention\.([qkvo])\.weight",
     "encoder/{0}_{1}/attn/{2}/kernel", "t"),
    (r"encoder\.(temporal|spectral)_blocks\.(\d+)\.norm2\.weight",
     "encoder/{0}_{1}/norm_ff/scale", "none"),
    (r"encoder\.(temporal|spectral)_blocks\.(\d+)\.mlp\.(wi|wo)\.weight",
     "encoder/{0}_{1}/ff/{2}/kernel", "t"),
    # MoE-FF variant: router + pre-stacked expert tensors ((E, d, ff) /
    # (E, ff, d)); per-expert `...experts.{e}.wi.weight` names are stacked
    # into these by `_stack_expert_tensors` before rule matching
    (r"encoder\.(temporal|spectral)_blocks\.(\d+)\.mlp\.router\.weight",
     "encoder/{0}_{1}/ff/router/kernel", "t"),
    (r"encoder\.(temporal|spectral)_blocks\.(\d+)\.mlp\.experts_(wi|wo)",
     "encoder/{0}_{1}/ff/{2}", "none"),
    (r"encoder\.(?:final_norm|layernorm)\.weight", "encoder/final_norm/scale",
     "none"),
]

PROJECTION_RULES: List[Tuple[str, str, str]] = [
    # grouped per-channel latent→memory projection (flagship, C24)
    (r"(?:projection|pre_decoder)\.group_proj\.weight",
     "projection/group_proj/kernel", "t"),
    (r"(?:projection|pre_decoder)\.proj\.weight", "projection/proj/kernel", "t"),
    (r"(?:projection|pre_decoder)\.proj_in\.weight",
     "projection/proj_in/kernel", "t"),
    (r"(?:projection|pre_decoder)\.proj_out\.weight",
     "projection/proj_out/kernel", "t"),
    # depthwise-conv projection variants (config-gated, SURVEY C24)
    (r"(?:projection|pre_decoder)\.dw_conv\.weight",
     "projection/dw_conv/kernel", "dwconv"),
    (r"(?:projection|pre_decoder)\.pw_proj\.weight",
     "projection/pw_proj/kernel", "t"),
    (r"(?:projection|pre_decoder)\.group_dw_conv\.weight",
     "projection/group_dw_conv/kernel", "dwconv"),
]

CONFORMER_RULES: List[Tuple[str, str, str]] = [
    (r"encoder\.input_proj\.weight", "encoder/input_proj/kernel", "t"),
    (r"encoder\.rel_bias\.weight", "encoder/rel_bias/rel_embedding", "none"),
    (r"encoder\.conformer\.(\d+)\.(ffn1|ffn2)\.norm\.weight",
     "encoder/block_{0}/{1}/RMSNorm_0/scale", "none"),
    (r"encoder\.conformer\.(\d+)\.(ffn1|ffn2)\.(wi|wo)\.weight",
     "encoder/block_{0}/{1}/{2}/kernel", "t"),
    (r"encoder\.conformer\.(\d+)\.attn_norm\.weight",
     "encoder/block_{0}/attn_norm/scale", "none"),
    (r"encoder\.conformer\.(\d+)\.attention\.([qkvo])\.weight",
     "encoder/block_{0}/attn/{1}/kernel", "t"),
    (r"encoder\.conformer\.(\d+)\.conv\.norm\.weight",
     "encoder/block_{0}/conv/RMSNorm_0/scale", "none"),
    (r"encoder\.conformer\.(\d+)\.conv\.(pointwise_in|pointwise_out)\.weight",
     "encoder/block_{0}/conv/{1}/kernel", "t"),
    (r"encoder\.conformer\.(\d+)\.conv\.depthwise\.weight",
     "encoder/block_{0}/conv/depthwise/kernel", "dwconv"),
    (r"encoder\.conformer\.(\d+)\.conv\.conv_norm\.weight",
     "encoder/block_{0}/conv/conv_norm/scale", "none"),
    (r"encoder\.conformer\.(\d+)\.final_norm\.weight",
     "encoder/block_{0}/final_norm/scale", "none"),
]

# learned absolute encoder positions (config encoder_abs_pos="learned")
EXTRA_RULES: List[Tuple[str, str, str]] = [
    (r"encoder\.pos_embed(?:\.weight)?", "encoder/pos_embed", "none"),
]

STRIP_PREFIXES = ("model.", "module.", "ymt3.", "net.")


def _stack_expert_tensors(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Collapse per-expert `<base>.experts.{e}.wi|wo.weight` torch tensors
    ((ff, d) / (d, ff) linear weights) into stacked `<base>.experts_wi`
    (E, d, ff) / `<base>.experts_wo` (E, ff, d) arrays matching our
    MoEFeedForward params (models/layers.py)."""
    groups: Dict[Tuple[str, str], Dict[int, np.ndarray]] = {}
    rest: Dict[str, np.ndarray] = {}
    pat = re.compile(r"(.*)\.experts\.(\d+)\.(wi|wo)\.weight$")
    for k, v in sd.items():
        m = pat.match(k)
        if m:
            groups.setdefault((m.group(1), m.group(3)), {})[int(m.group(2))] = v
        else:
            rest[k] = v
    for (base, which), by_idx in groups.items():
        arrs = [by_idx[i].T for i in sorted(by_idx)]  # torch (out,in) → (in,out)
        rest[f"{base}.experts_{which}"] = np.stack(arrs, axis=0)
    return rest


def _apply_transform(arr: np.ndarray, tf: str) -> np.ndarray:
    if tf == "t" and arr.ndim == 2:
        return arr.T
    if tf == "conv":  # torch Conv2d (out, in, kh, kw) → flax (kh, kw, in, out)
        return arr.transpose(2, 3, 1, 0)
    if tf == "dwconv":  # torch depthwise Conv1d (ch, 1, k) → flax (k, 1, ch)
        return arr.transpose(2, 1, 0)
    return arr


def _invert_transform(arr: np.ndarray, tf: str) -> np.ndarray:
    """flax array → the torch layout a reference ckpt would carry."""
    if tf == "t" and arr.ndim == 2:
        return arr.T
    if tf == "conv":
        return arr.transpose(3, 2, 0, 1)
    if tf == "dwconv":
        return arr.transpose(2, 1, 0)
    return arr


ALL_RULES: List[Tuple[str, str, str]] = (
    T5_RULES + PERCEIVER_RULES + PROJECTION_RULES + CONFORMER_RULES
    + EXTRA_RULES)


def map_state_dict(sd: Dict[str, np.ndarray],
                   extra_rules: Optional[List[Tuple[str, str, str]]] = None
                   ) -> Tuple[Dict[str, np.ndarray], List[str]]:
    """→ ({flax_path: array}, unmatched_names)."""
    rules = ALL_RULES + (extra_rules or [])
    sd = _stack_expert_tensors(sd)
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
            mapped[path] = _apply_transform(arr, tf)
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
            # multi-channel decoder wraps the T5Decoder one level deeper
            # (models/t5.py MultiChannelT5Decoder: decoder/decoder/...)
            alt = re.sub(r"^decoder/", "decoder/decoder/", path)
            if alt in flat:
                path = alt
            else:
                continue
        if flat[path].shape != arr.shape:
            if strict_shapes:
                raise ValueError(f"{path}: shape {arr.shape} vs expected "
                                 f"{flat[path].shape}")
            continue
        # jnp.asarray, not the raw numpy array: host-numpy leaves in a param
        # tree break traced indexing (rel-bias table lookups inside the
        # decode while-loop) and force a host→device re-upload on EVERY
        # jitted call — the same defect class as the round-3 restore_bundle
        # bug (EVIDENCE.md: 3.7× transcribe slowdown).
        import jax.numpy as jnp
        new_flat[path] = jnp.asarray(
            arr.astype(np.asarray(flat[path]).dtype))
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


def flatten_params(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Nested flax params → {slash/path: array} (without 'params' root)."""
    flat: Dict[str, np.ndarray] = {}

    def walk(tree, prefix=""):
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, p)
            else:
                flat[p] = np.asarray(v)

    walk(params.get("params", params))
    return flat


# flax-path regex → (torch name template, transform) — the inverse of
# ALL_RULES, used to synthesize reference-style state dicts for tests and
# as executable documentation of the expected checkpoint naming.
_INVERSE_RULES: List[Tuple[str, str, str]] = [
    # T5 encoder
    (r"encoder/layer_(\d+)/attn/([qkvo])/kernel",
     "encoder.block.{0}.layer.0.SelfAttention.{1}.weight", "t"),
    (r"encoder/layer_(\d+)/norm_attn/scale",
     "encoder.block.{0}.layer.0.layer_norm.weight", "none"),
    (r"encoder/layer_(\d+)/ff/(wi_0|wi_1|wi|wo)/kernel",
     "encoder.block.{0}.layer.1.DenseReluDense.{1}.weight", "t"),
    (r"encoder/layer_(\d+)/norm_ff/scale",
     "encoder.block.{0}.layer.1.layer_norm.weight", "none"),
    (r"encoder/rel_bias/rel_embedding",
     "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight",
     "none"),
    (r"encoder/final_norm/scale", "encoder.final_layer_norm.weight", "none"),
    (r"encoder/input_proj/kernel", "encoder.proj.weight", "t"),
    (r"encoder/pos_embed", "encoder.pos_embed", "none"),
    # T5 decoder (single- or multi-channel nesting)
    (r"decoder/(?:decoder/)?layer_(\d+)/self_attn/([qkvo])/kernel",
     "decoder.block.{0}.layer.0.SelfAttention.{1}.weight", "t"),
    (r"decoder/(?:decoder/)?layer_(\d+)/norm_self/scale",
     "decoder.block.{0}.layer.0.layer_norm.weight", "none"),
    (r"decoder/(?:decoder/)?layer_(\d+)/cross_attn/([qkvo])/kernel",
     "decoder.block.{0}.layer.1.EncDecAttention.{1}.weight", "t"),
    (r"decoder/(?:decoder/)?layer_(\d+)/norm_cross/scale",
     "decoder.block.{0}.layer.1.layer_norm.weight", "none"),
    (r"decoder/(?:decoder/)?layer_(\d+)/ff/(wi_0|wi_1|wi|wo)/kernel",
     "decoder.block.{0}.layer.2.DenseReluDense.{1}.weight", "t"),
    (r"decoder/(?:decoder/)?layer_(\d+)/norm_ff/scale",
     "decoder.block.{0}.layer.2.layer_norm.weight", "none"),
    (r"decoder/(?:decoder/)?rel_bias/rel_embedding",
     "decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight",
     "none"),
    (r"decoder/(?:decoder/)?final_norm/scale",
     "decoder.final_layer_norm.weight", "none"),
    (r"decoder/(?:decoder/)?embed/embedding", "shared.weight", "none"),
    (r"decoder/(?:decoder/)?lm_head/kernel", "lm_head.weight", "t"),
    # Perceiver-TF encoder
    (r"encoder/conv_pre/block_(\d+)/(conv_down|conv_a|conv_b)/kernel",
     "encoder.pre_encoder.block.{0}.{1}.weight", "conv"),
    (r"encoder/conv_pre/block_(\d+)/(conv_down|conv_a|conv_b)/bias",
     "encoder.pre_encoder.block.{0}.{1}.bias", "none"),
    (r"encoder/spectral_proj/kernel", "encoder.spectral_proj.weight", "t"),
    (r"encoder/latents", "encoder.latent_array", "none"),
    (r"encoder/time_pos", "encoder.pos_emb", "none"),
    (r"encoder/sca_norm_q/scale", "encoder.sca.norm_q.weight", "none"),
    (r"encoder/sca_norm_kv/scale", "encoder.sca.norm_kv.weight", "none"),
    (r"encoder/sca/([qkvo])/kernel", "encoder.sca.attention.{0}.weight", "t"),
    (r"encoder/sca_ff_norm/scale", "encoder.sca.ff_norm.weight", "none"),
    (r"encoder/sca_ff/(wi|wo)/kernel", "encoder.sca.ff.{0}.weight", "t"),
    (r"encoder/(temporal|spectral)_(\d+)/norm_attn/scale",
     "encoder.{0}_blocks.{1}.norm1.weight", "none"),
    (r"encoder/(temporal|spectral)_(\d+)/attn/([qkvo])/kernel",
     "encoder.{0}_blocks.{1}.attention.{2}.weight", "t"),
    (r"encoder/(temporal|spectral)_(\d+)/norm_ff/scale",
     "encoder.{0}_blocks.{1}.norm2.weight", "none"),
    (r"encoder/(temporal|spectral)_(\d+)/ff/(wi|wo)/kernel",
     "encoder.{0}_blocks.{1}.mlp.{2}.weight", "t"),
    (r"encoder/(temporal|spectral)_(\d+)/ff/router/kernel",
     "encoder.{0}_blocks.{1}.mlp.router.weight", "t"),
    (r"encoder/(temporal|spectral)_(\d+)/ff/(wi|wo)",
     "encoder.{0}_blocks.{1}.mlp.experts_{2}", "none"),
    # projection
    (r"projection/group_proj/kernel", "projection.group_proj.weight", "t"),
    (r"projection/proj/kernel", "projection.proj.weight", "t"),
    (r"projection/proj_in/kernel", "projection.proj_in.weight", "t"),
    (r"projection/proj_out/kernel", "projection.proj_out.weight", "t"),
    (r"projection/dw_conv/kernel", "projection.dw_conv.weight", "dwconv"),
    (r"projection/pw_proj/kernel", "projection.pw_proj.weight", "t"),
    (r"projection/group_dw_conv/kernel",
     "projection.group_dw_conv.weight", "dwconv"),
    # conformer
    (r"encoder/block_(\d+)/(ffn1|ffn2)/RMSNorm_0/scale",
     "encoder.conformer.{0}.{1}.norm.weight", "none"),
    (r"encoder/block_(\d+)/(ffn1|ffn2)/(wi|wo)/kernel",
     "encoder.conformer.{0}.{1}.{2}.weight", "t"),
    (r"encoder/block_(\d+)/attn_norm/scale",
     "encoder.conformer.{0}.attn_norm.weight", "none"),
    (r"encoder/block_(\d+)/attn/([qkvo])/kernel",
     "encoder.conformer.{0}.attention.{1}.weight", "t"),
    (r"encoder/block_(\d+)/conv/RMSNorm_0/scale",
     "encoder.conformer.{0}.conv.norm.weight", "none"),
    (r"encoder/block_(\d+)/conv/(pointwise_in|pointwise_out)/kernel",
     "encoder.conformer.{0}.conv.{1}.weight", "t"),
    (r"encoder/block_(\d+)/conv/depthwise/kernel",
     "encoder.conformer.{0}.conv.depthwise.weight", "dwconv"),
    (r"encoder/block_(\d+)/conv/conv_norm/scale",
     "encoder.conformer.{0}.conv.conv_norm.weight", "none"),
    (r"encoder/block_(\d+)/final_norm/scale",
     "encoder.conformer.{0}.final_norm.weight", "none"),
    (r"encoder/rel_bias/rel_embedding", "encoder.rel_bias.weight", "none"),
]


def reference_style_state_dict(params: Dict[str, Any], prefix: str = "model."
                               ) -> Dict[str, np.ndarray]:
    """Synthesize a reference-style torch state dict covering EVERY param
    of `params`, using the naming ALL_RULES expects (tests + executable
    documentation of the naming assumption). Raises on any param with no
    inverse rule — so model/importer coverage can never drift apart."""
    flat = flatten_params(params)
    out: Dict[str, np.ndarray] = {}
    missing: List[str] = []
    for path, arr in flat.items():
        for pat, tmpl, tf in _INVERSE_RULES:
            m = re.fullmatch(pat, path)
            if not m:
                continue
            out[prefix + tmpl.format(*m.groups())] = _invert_transform(arr, tf)
            break
        else:
            missing.append(path)
    if missing:
        raise ValueError(f"no inverse import rule for params: {missing}")
    return out


def import_checkpoint(ckpt_path: str, params: Dict[str, Any],
                      verbose: bool = True,
                      require_complete: bool = False) -> Dict[str, Any]:
    """Full pipeline: torch ckpt file → updated flax params.

    require_complete=True asserts EVERY target param received a tensor —
    the parity-import mode (a silently-random flagship param is worse
    than a loud failure)."""
    sd = load_torch_state_dict(ckpt_path)
    return import_state_dict(sd, params, verbose=verbose,
                             require_complete=require_complete)


def import_state_dict(sd: Dict[str, np.ndarray], params: Dict[str, Any],
                      verbose: bool = True,
                      require_complete: bool = False) -> Dict[str, Any]:
    mapped, unmatched = map_state_dict(sd)
    new_params, applied = apply_to_params(params, mapped)
    if verbose:
        print(f"imported {len(applied)}/{len(mapped)} mapped tensors; "
              f"{len(unmatched)} source keys unmatched")
        for u in unmatched[:20]:
            print("  unmatched:", u)
    if require_complete:
        missing = sorted(set(flatten_params(params)) - set(applied))
        if unmatched or missing:
            raise ValueError(
                f"incomplete import: {len(unmatched)} source keys unmatched "
                f"({unmatched[:5]}...), {len(missing)} target params not "
                f"applied ({missing[:5]}...)")
    return new_params
