"""Init-scale lock for the T5 attention convention.

T5 drops the 1/sqrt(d_kv) attention scaling and compensates in the QUERY
projection's init (std = (d_model*d_kv)^-0.5 — mesh-tf / HF T5Attention;
reference model/t5mod.py inherits it, SURVEY.md C20). If the compensation
is missing, attention logits at init have std ~ sqrt(d_kv) ≈ 8 for
d_kv=64 — a near-saturated softmax that measurably stalled the 12+12
layer t5_base (runs/t5base_r3) while shallow presets trained through it.

This test locks the convention: unit-RMS inputs through a freshly
initialized MultiHeadAttention must produce O(1) attention logits.
"""

import jax
import jax.numpy as jnp
import numpy as np

from yourmt3_tpu.models.layers import MultiHeadAttention


def _init_logit_std(d_model: int, d_kv: int, heads: int, seed: int = 0):
    mha = MultiHeadAttention(heads, d_kv, d_model, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (4, 32, d_model))
    params = mha.init(jax.random.PRNGKey(seed), x, x)

    def logits(p, xq, xkv):
        def f(m):
            q = m._split(m.q(xq))
            k = m._split(m.k(xkv))
            return jnp.einsum("bhqd,bhkd->bhqk", q, k)
        return nn_apply(mha, p, f)

    out = logits(params, x, x)
    return float(jnp.std(out))


def nn_apply(module, params, fn):
    return module.apply(params, method=fn)


def test_query_init_compensates_missing_attention_scale():
    # t5_base shape: d_model=768, d_kv=64, 12 heads
    std = _init_logit_std(768, 64, 12)
    # properly folded init → logits std ~= 1 (inputs are unit-variance);
    # the un-compensated init would read ~sqrt(64)=8.
    assert 0.3 < std < 2.5, f"init attention logit std {std} is mis-scaled"


def test_query_init_scale_tracks_d_kv():
    # the compensation must scale with d_kv, not be a fixed constant
    stds = [_init_logit_std(256, dkv, 4) for dkv in (16, 64)]
    for s in stds:
        assert 0.3 < s < 2.5, f"init logit std {s} out of range"
    # ratio between d_kv=64 and d_kv=16 stays O(1) (was ~2x = sqrt(4) before)
    assert stds[1] / stds[0] < 1.8


def test_q_param_std_matches_t5_convention():
    mha = MultiHeadAttention(12, 64, 768, jnp.float32)
    x = jnp.zeros((1, 2, 768))
    params = mha.init(jax.random.PRNGKey(0), x, x)["params"]
    q_std = float(np.std(params["q"]["kernel"]))
    k_std = float(np.std(params["k"]["kernel"]))
    assert abs(q_std - (768 * 64) ** -0.5) / ((768 * 64) ** -0.5) < 0.15
    assert abs(k_std - 768 ** -0.5) / (768 ** -0.5) < 0.15
