"""External parity anchor: our T5 vs a REAL HuggingFace-transformers T5.

The reference model family is HF-T5-lineage (YourMT3+ vendors/modifies HF
`transformers` T5 — SURVEY.md C20; /root/reference/README.md:8 fixes the
family). Every other parity test round-trips our own importer against our
own model; this one instantiates an actual random-init
`transformers.T5ForConditionalGeneration` (T5.1.1 semantics: gated-gelu,
untied embeddings, no attention scale), exports its state_dict through
`train/import_torch.py`, and asserts:

  1. relative-position bias tables match HF's `compute_bias` bit-for-bit
     in bucketing (encoder bidirectional + decoder causal),
  2. encoder outputs match HF's encoder on the same inputs_embeds,
  3. teacher-forced logits match HF's within fp32 tolerance,
  4. greedy token sequences are IDENTICAL to HF `generate`.

If our T5 numerics or the importer's T5 rules drift from the real
reference family, this file fails.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from yourmt3_tpu.config.model import ModelConfig
from yourmt3_tpu.models.decoding import greedy_decode
from yourmt3_tpu.models.ymt3 import YMT3
from yourmt3_tpu.train.import_torch import import_state_dict

VOCAB = 128
D_MODEL = 64
D_KV = 16
HEADS = 4
D_FF = 96
LAYERS = 2
EOS = 1
SEG_T = 12  # encoder length
DEC_L = 10  # teacher-forced decoder length


def build_hf_model():
    cfg = transformers.T5Config(
        vocab_size=VOCAB, d_model=D_MODEL, d_kv=D_KV, d_ff=D_FF,
        num_layers=LAYERS, num_decoder_layers=LAYERS, num_heads=HEADS,
        relative_attention_num_buckets=32, relative_attention_max_distance=128,
        dropout_rate=0.0, feed_forward_proj="gated-gelu",
        tie_word_embeddings=False, decoder_start_token_id=0,
        pad_token_id=0, eos_token_id=EOS, use_cache=True,
    )
    torch.manual_seed(7)
    m = transformers.T5ForConditionalGeneration(cfg)
    m.eval()
    return m


def build_ours(hf_model):
    cfg = ModelConfig(
        name="hf_parity_tiny", encoder_type="t5", decoder_type="t5",
        vocab_size=VOCAB, num_channels=1, d_model=D_MODEL, d_kv=D_KV,
        num_heads=HEADS, d_ff=D_FF, ff_act="gated-gelu", dropout_rate=0.0,
        num_encoder_layers=LAYERS, num_decoder_layers=LAYERS,
        rel_attn_num_buckets=32, rel_attn_max_distance=128,
        encoder_abs_pos="none",  # HF T5 carries no absolute positions
        max_target_length=32, compute_dtype="float32",
    )
    model = YMT3(cfg)
    rng = jax.random.PRNGKey(0)
    feats = jnp.zeros((1, SEG_T, D_MODEL), jnp.float32)
    ids = jnp.zeros((1, 1, DEC_L), jnp.int32)
    params = model.init(rng, feats, ids)

    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    params = import_state_dict(sd, params, verbose=False)

    # HF has no encoder input projection (it takes inputs_embeds directly):
    # make ours the identity so feats == inputs_embeds.
    p = params["params"] if "params" in params else params
    proj = p["encoder"]["input_proj"]["kernel"]
    assert proj.shape == (D_MODEL, D_MODEL)
    p["encoder"]["input_proj"]["kernel"] = jnp.eye(D_MODEL, dtype=jnp.float32)
    return model, params


@pytest.fixture(scope="module")
def pair():
    hf = build_hf_model()
    ours, params = build_ours(hf)
    return hf, ours, params


@pytest.fixture(scope="module")
def feats():
    rng = np.random.default_rng(11)
    return rng.standard_normal((2, SEG_T, D_MODEL)).astype(np.float32) * 0.5


class TestRelativeBias:
    def test_encoder_bias_matches_hf(self, pair):
        hf, ours, params = pair
        with torch.no_grad():
            hf_bias = hf.encoder.block[0].layer[0].SelfAttention.compute_bias(
                SEG_T, SEG_T).numpy()  # (1, H, T, T)
        sub = {"params": params["params"]["encoder"]["rel_bias"]}
        from yourmt3_tpu.models.layers import RelativePositionBias
        rb = RelativePositionBias(HEADS, 32, 128, bidirectional=True,
                                  dtype=jnp.float32)
        ours_bias = np.asarray(rb.apply(sub, SEG_T, SEG_T))
        np.testing.assert_allclose(ours_bias, hf_bias, atol=1e-5)

    def test_decoder_bias_matches_hf(self, pair):
        hf, ours, params = pair
        with torch.no_grad():
            hf_bias = hf.decoder.block[0].layer[0].SelfAttention.compute_bias(
                DEC_L, DEC_L).numpy()
        sub = {"params": params["params"]["decoder"]["rel_bias"]}
        from yourmt3_tpu.models.layers import RelativePositionBias
        rb = RelativePositionBias(HEADS, 32, 128, bidirectional=False,
                                  dtype=jnp.float32)
        ours_bias = np.asarray(rb.apply(sub, DEC_L, DEC_L))
        np.testing.assert_allclose(ours_bias, hf_bias, atol=1e-5)


class TestForwardParity:
    def test_encoder_output_matches_hf(self, pair, feats):
        hf, ours, params = pair
        with torch.no_grad():
            hf_out = hf.encoder(
                inputs_embeds=torch.from_numpy(feats)).last_hidden_state.numpy()
        memory = ours.apply(params, jnp.asarray(feats), method=YMT3.encode)
        ours_out = np.asarray(memory[:, 0])  # (B, T, D)
        assert ours_out.shape == hf_out.shape
        denom = np.abs(hf_out).max()
        np.testing.assert_allclose(ours_out, hf_out, atol=2e-4 * denom)

    def test_teacher_forced_logits_match_hf(self, pair, feats):
        hf, ours, params = pair
        rng = np.random.default_rng(5)
        dec_ids = rng.integers(2, VOCAB, size=(2, DEC_L)).astype(np.int64)
        dec_ids[:, 0] = 0  # decoder start
        with torch.no_grad():
            hf_logits = hf(inputs_embeds=torch.from_numpy(feats),
                           decoder_input_ids=torch.from_numpy(dec_ids),
                           ).logits.numpy()
        ours_logits = np.asarray(ours.apply(
            params, jnp.asarray(feats),
            jnp.asarray(dec_ids[:, None, :].astype(np.int32))))[:, 0]
        assert ours_logits.shape == hf_logits.shape
        denom = np.abs(hf_logits).max()
        np.testing.assert_allclose(ours_logits, hf_logits,
                                   atol=3e-4 * max(denom, 1.0))

    def test_greedy_tokens_identical_to_hf_generate(self, pair, feats):
        hf, ours, params = pair
        max_new = 24
        with torch.no_grad():
            hf_seq = hf.generate(
                inputs_embeds=torch.from_numpy(feats),
                max_new_tokens=max_new, min_new_tokens=0, do_sample=False,
                num_beams=1, eos_token_id=EOS, pad_token_id=0,
                decoder_start_token_id=0).numpy()
        memory = ours.apply(params, jnp.asarray(feats), method=YMT3.encode)
        ours_seq = np.asarray(
            greedy_decode(ours, params, memory, max_length=max_new,
                          eos_id=EOS))[:, 0]  # (B, max_new)
        # HF output row 0 is the decoder_start token; ours starts after it.
        hf_body = hf_seq[:, 1:]
        for b in range(ours_seq.shape[0]):
            n = min(hf_body.shape[1], ours_seq.shape[1])
            assert ours_seq[b, :n].tolist() == hf_body[b, :n].tolist(), (
                b, ours_seq[b, :n], hf_body[b, :n])


class TestCheckpointFileAndVariants:
    def test_lightning_style_ckpt_file_round_trip(self, pair, feats,
                                                  tmp_path):
        """The reference ships Lightning .ckpt files ('state_dict' key,
        'model.' prefixes). Save the REAL HF T5 that way, import through
        import_checkpoint (the file-path entry), and require identical
        teacher-forced logits to the in-memory import."""
        hf, ours, params = pair
        from yourmt3_tpu.train.import_torch import import_checkpoint
        sd = {f"model.{k}": v for k, v in hf.state_dict().items()}
        path = str(tmp_path / "ref.ckpt")
        torch.save({"state_dict": sd, "epoch": 3}, path)

        model2, params2 = build_ours_fresh()
        params2 = import_checkpoint(path, params2, verbose=False)
        p2 = params2["params"] if "params" in params2 else params2
        p2["encoder"]["input_proj"]["kernel"] = jnp.eye(D_MODEL,
                                                        dtype=jnp.float32)
        rng = np.random.default_rng(5)
        dec_ids = rng.integers(2, VOCAB, size=(2, DEC_L)).astype(np.int32)
        dec_ids[:, 0] = 0
        a = np.asarray(ours.apply(params, jnp.asarray(feats),
                                  jnp.asarray(dec_ids[:, None, :])))
        b = np.asarray(model2.apply(params2, jnp.asarray(feats),
                                    jnp.asarray(dec_ids[:, None, :])))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_t5_v1_0_relu_variant_matches_hf(self, feats):
        """T5 v1.0 semantics (plain relu FF via wi/wo) — the importer's
        DenseReluDense.wi rule — must also match the real HF forward."""
        cfg = transformers.T5Config(
            vocab_size=VOCAB, d_model=D_MODEL, d_kv=D_KV, d_ff=D_FF,
            num_layers=LAYERS, num_decoder_layers=LAYERS, num_heads=HEADS,
            dropout_rate=0.0, feed_forward_proj="relu",
            tie_word_embeddings=False, decoder_start_token_id=0,
            pad_token_id=0, eos_token_id=EOS)
        torch.manual_seed(9)
        hf = transformers.T5ForConditionalGeneration(cfg)
        hf.eval()

        mcfg = ModelConfig(
            name="hf_parity_relu", encoder_type="t5", decoder_type="t5",
            vocab_size=VOCAB, num_channels=1, d_model=D_MODEL, d_kv=D_KV,
            num_heads=HEADS, d_ff=D_FF, ff_act="relu", dropout_rate=0.0,
            num_encoder_layers=LAYERS, num_decoder_layers=LAYERS,
            encoder_abs_pos="none", max_target_length=32,
            compute_dtype="float32")
        model = YMT3(mcfg)
        feats0 = jnp.zeros((1, SEG_T, D_MODEL), jnp.float32)
        ids0 = jnp.zeros((1, 1, DEC_L), jnp.int32)
        params = model.init(jax.random.PRNGKey(1), feats0, ids0)
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        params = import_state_dict(sd, params, verbose=False)
        p = params["params"] if "params" in params else params
        p["encoder"]["input_proj"]["kernel"] = jnp.eye(D_MODEL,
                                                       dtype=jnp.float32)
        rng = np.random.default_rng(6)
        dec_ids = rng.integers(2, VOCAB, size=(2, DEC_L)).astype(np.int64)
        dec_ids[:, 0] = 0
        with torch.no_grad():
            hf_logits = hf(inputs_embeds=torch.from_numpy(feats),
                           decoder_input_ids=torch.from_numpy(dec_ids),
                           ).logits.numpy()
        ours_logits = np.asarray(model.apply(
            params, jnp.asarray(feats),
            jnp.asarray(dec_ids[:, None, :].astype(np.int32))))[:, 0]
        denom = np.abs(hf_logits).max()
        np.testing.assert_allclose(ours_logits, hf_logits,
                                   atol=3e-4 * max(denom, 1.0))


def build_ours_fresh():
    cfg = ModelConfig(
        name="hf_parity_tiny2", encoder_type="t5", decoder_type="t5",
        vocab_size=VOCAB, num_channels=1, d_model=D_MODEL, d_kv=D_KV,
        num_heads=HEADS, d_ff=D_FF, ff_act="gated-gelu", dropout_rate=0.0,
        num_encoder_layers=LAYERS, num_decoder_layers=LAYERS,
        rel_attn_num_buckets=32, rel_attn_max_distance=128,
        encoder_abs_pos="none", max_target_length=32,
        compute_dtype="float32")
    model = YMT3(cfg)
    feats = jnp.zeros((1, SEG_T, D_MODEL), jnp.float32)
    ids = jnp.zeros((1, 1, DEC_L), jnp.int32)
    return model, model.init(jax.random.PRNGKey(2), feats, ids)
