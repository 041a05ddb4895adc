"""Model architecture configuration + presets.

Capability parity target: reference `config/config.py` `model_cfg`
(SURVEY.md C1): T5-small/base presets, encoder_type t5|perceiver-tf|
conformer, multi-channel decoder sizing.

TPU-first: every dimension here is static; compute dtype defaults to
bfloat16 (MXU-native) with fp32 params and fp32 layernorm/softmax
accumulation.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    name: str = "t5_small"
    encoder_type: str = "t5"  # "t5" | "perceiver-tf" | "conformer"
    decoder_type: str = "t5"  # "t5" | "multi-t5"

    vocab_size: int = 596  # overwritten from TaskManager at build time
    num_channels: int = 1  # decoding channels (multi-channel decoder)

    # shared transformer dims
    d_model: int = 512
    d_kv: int = 64
    num_heads: int = 6
    # DECODER grouped-query attention: number of K/V heads shared by the
    # num_heads query heads (None ⇒ num_heads, plain MHA). Single-token
    # decode is HBM-bound on self-KV-cache reads (~95% of flagship step
    # bytes at B=32 — EVIDENCE.md roofline), so kv_heads=1 (MQA) cuts the
    # dominant traffic num_heads×. Decoder-only: the encoder runs full MHA
    # (its attention is compute-bound and runs once per segment).
    decoder_kv_heads: Optional[int] = None
    d_ff: int = 1024
    ff_act: str = "gated-gelu"  # "gated-gelu" | "relu" | "gated-silu" | "moe"
    dropout_rate: float = 0.05

    # encoder (t5/conformer)
    num_encoder_layers: int = 8
    # decoder
    num_decoder_layers: int = 8
    # relative attention (T5 style)
    rel_attn_num_buckets: int = 32
    rel_attn_max_distance: int = 128
    # absolute position signal for the encoder: event timing is ABSOLUTE
    # within a segment (shift tokens), which relative bias cannot resolve —
    # MT3 uses absolute sinusoids for exactly this reason. Measured here:
    # without it, teacher-forced shift-token accuracy stalls at 7%.
    # "sinusoidal" | "sinusoidal_per_block" | "learned" | "none".
    # "sinusoidal_per_block" (conformer only) re-injects the sinusoid at
    # every block input — the round-3 probe measured the conformer's
    # input-only anchor washing out (1/11 shift sensitivity); a distinct
    # value so checkpoint meta disambiguates the two forwards.
    encoder_abs_pos: str = "sinusoidal"

    # Perceiver-TF encoder (SURVEY.md C22)
    ptf_num_latents: int = 24  # K latents per frame block
    ptf_d_latent: int = 128
    ptf_num_blocks: int = 3  # alternating temporal/spectral SA blocks
    ptf_sca_use_query_residual: bool = True
    ptf_ff_act: str = "gelu"
    ptf_num_moe_experts: int = 0  # 0 ⇒ dense FF
    ptf_moe_topk: int = 2
    ptf_pos_enc: str = "trainable"  # "trainable" | "rope" | "alibi"
    ptf_attention_to_channel: bool = True  # project latent groups → channels

    # conv pre-encoder (SURVEY.md C19)
    use_conv_pre_encoder: bool = False
    conv_channels: int = 128

    # projection encoder→decoder (SURVEY.md C24)
    # "linear" | "mlp" | "depthwise-conv" (t5/conformer) |
    # "group-linear" | "group-conv" (perceiver-tf)
    proj_type: str = "linear"

    # decoding
    max_target_length: int = 1024
    decoder_start_token_id: int = 0  # PAD doubles as BOS (T5 convention)
    use_pallas_decode: bool = False  # paged-KV decode attention kernel (TPU)
    # Quantized KV caches for autoregressive decode (self + cross).
    # Decode attention is HBM-bound on cache reads (measured ~75% of the
    # flagship step); per-position-scaled int8 halves that traffic with
    # ~0.7% relative logit error. "int4" halves it again (nibble-packed,
    # ~3.6% row-max error — measure F1 before trusting). "int8c4" keeps
    # the self cache int8 and packs only the STEP-INVARIANT cross KV to
    # int4 (the dominant reads of short multi-channel decodes).
    # "int8c4p" = int8 self + PALLAS int4 cross (split-half packed,
    # in-kernel unpack: the packed bytes are read once per step).
    # "none" | "int8" | "int8c4" | "int8c4p" | "int4".
    kv_quant: str = "none"
    # Quantized DECODER WEIGHTS for decode (ops/weight_quant.py): after
    # quantized KV caches, weights are the remaining per-step HBM traffic
    # (measured 17% of t5_base step bytes). "bf16" is numerically
    # identical to the normal path (Dense casts fp32→bf16 pre-dot anyway)
    # but guarantees 2-byte reads in the decode loop; "int8" halves that
    # again with per-output-channel scales (~0.4% relative weight error).
    # Decode-time only — training and checkpoints always use the fp32
    # master weights. "none" | "bf16" | "int8".
    weight_quant: str = "none"

    # dtypes
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"

    def __post_init__(self):
        if (self.encoder_abs_pos == "sinusoidal_per_block"
                and self.encoder_type != "conformer"):
            # only the conformer forward implements per-block re-injection;
            # the T5/Perceiver encoders check == "sinusoidal" and would
            # silently run with NO absolute positions at all, reproducing
            # the documented shift-accuracy stall (ADVICE r4).
            raise ValueError(
                "encoder_abs_pos='sinusoidal_per_block' requires "
                f"encoder_type='conformer' (got {self.encoder_type!r}); "
                "use 'sinusoidal' for t5/perceiver-tf encoders")
        if self.weight_quant not in ("none", "bf16", "int8"):
            raise ValueError(
                f"weight_quant must be 'none'|'bf16'|'int8', "
                f"got {self.weight_quant!r}")
        if self.decoder_kv_heads is not None:
            if (self.decoder_kv_heads < 1
                    or self.num_heads % self.decoder_kv_heads):
                raise ValueError(
                    f"decoder_kv_heads={self.decoder_kv_heads} must divide "
                    f"num_heads={self.num_heads}")
            if (self.decoder_kv_heads != self.num_heads
                    and (self.use_pallas_decode
                         or self.kv_quant == "int8c4p")):
                # the paged/int4-cross Pallas kernels index caches by query
                # head; grouped-KV support is dense-path only (which is the
                # measured-fastest path for multi-channel decodes anyway)
                raise ValueError(
                    "decoder_kv_heads (GQA/MQA) supports the dense decode "
                    "paths only: use use_pallas_decode=False and kv_quant "
                    "in ('none','int8','int8c4','int4')")
        if self.kv_quant == "int4" and self.use_pallas_decode:
            # the paged Pallas path has no int4 kernel: decode_step would
            # hand its ('table', rel_bias) marker to int4_decode_attention,
            # which expects an additive bias array → TypeError under jit.
            # Reject the combination at config time instead.
            raise ValueError(
                "kv_quant='int4' has no paged Pallas kernel; use "
                "use_pallas_decode=False (dense int4) or kv_quant='int8'/"
                "'int8c4' for the paged path")

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


# --- presets ---------------------------------------------------------------

T5_SMALL = ModelConfig(name="t5_small")

T5_BASE = ModelConfig(
    name="t5_base", d_model=768, num_heads=12, d_ff=2048,
    num_encoder_layers=12, num_decoder_layers=12,
)

# tiny config for tests / smoke runs
T5_TINY = ModelConfig(
    name="t5_tiny", d_model=64, d_kv=16, num_heads=4, d_ff=128,
    num_encoder_layers=2, num_decoder_layers=2, max_target_length=64,
)

# mid config: fast compile, enough capacity for smoke-training runs
T5_MINI = ModelConfig(
    name="t5_mini", d_model=256, d_kv=64, num_heads=4, d_ff=512,
    num_encoder_layers=4, num_decoder_layers=4,
)

# YourMT3+ flagship: Perceiver-TF encoder + 13-channel T5 decoder
PERCEIVER_TF_MC13 = ModelConfig(
    name="perceiver_tf_mc13", encoder_type="perceiver-tf", decoder_type="multi-t5",
    num_channels=13, ptf_num_latents=26, ptf_d_latent=128,
    ptf_num_blocks=3, proj_type="group-linear", max_target_length=256,
    use_conv_pre_encoder=True,
)

PERCEIVER_TF_MC13_MOE = PERCEIVER_TF_MC13.replace(
    name="perceiver_tf_mc13_moe", ptf_num_moe_experts=8, ptf_moe_topk=2)

# MQA flagship: 1 shared K/V head in the decoder. Single-token decode is
# HBM-bound on self-cache reads (EVIDENCE.md: ~95% of step bytes at the
# tuned batch); 6 query heads sharing one K/V head cuts that traffic 6×.
# Decoder-only — encoder/cross quality anchors are unchanged; must be
# validated by a trained-eval before replacing the MHA flagship.
PERCEIVER_TF_MC13_MQA = PERCEIVER_TF_MC13.replace(
    name="perceiver_tf_mc13_mqa", decoder_kv_heads=1)

# GQA middle point: 2 K/V heads (3× self-read cut, closer-to-MHA quality)
PERCEIVER_TF_MC13_GQA2 = PERCEIVER_TF_MC13.replace(
    name="perceiver_tf_mc13_gqa2", decoder_kv_heads=2)

CONFORMER_SMALL = ModelConfig(
    name="conformer_small", encoder_type="conformer",
    use_conv_pre_encoder=True,
    encoder_abs_pos="sinusoidal_per_block",
)

PRESETS = {
    m.name: m for m in (
        T5_TINY, T5_MINI, T5_SMALL, T5_BASE, PERCEIVER_TF_MC13,
        PERCEIVER_TF_MC13_MOE, PERCEIVER_TF_MC13_MQA,
        PERCEIVER_TF_MC13_GQA2, CONFORMER_SMALL,
    )
}


def get_model_config(name: str) -> ModelConfig:
    try:
        return PRESETS[name]
    except KeyError:
        raise KeyError(f"unknown model preset {name!r}; known: {sorted(PRESETS)}")
