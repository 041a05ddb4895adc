"""Trainer checkpoint/resume + preemption safety (SURVEY.md §5.3/§5.4)."""

import os

import numpy as np
import pytest

from yourmt3_tpu.config.audio import AudioConfig

TINY_AUDIO = AudioConfig(input_frames=4095, n_fft=512, hop_length=128,
                         n_mels=64)


def const_batches(tm, batch_size=4):
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((batch_size, TINY_AUDIO.input_frames)).astype(np.float32) * 0.1
    labels = rng.integers(3, tm.vocab_size,
                          (batch_size, tm.num_decoding_channels,
                           tm.max_token_length)).astype(np.int32)
    while True:
        yield {"audio": audio, "labels": labels}


class TestResume:
    @pytest.mark.slow
    def test_checkpoint_resume_continues(self, tmp_path):
        from yourmt3_tpu.api import init_model, load_checkpoint
        from yourmt3_tpu.train.trainer import train
        bundle = init_model("t5_tiny", "mt3_full_plus", audio_cfg=TINY_AUDIO)
        it = const_batches(bundle.task_manager)
        d = str(tmp_path / "ck")
        bundle = train(bundle, it, total_steps=3, log_every=10, ckpt_every=3,
                       ckpt_dir=d, spec_augment=False, warmup_steps=1)
        assert os.path.exists(os.path.join(d, "last", "ymt3_meta.json"))
        b2 = load_checkpoint(os.path.join(d, "last"), audio_cfg=TINY_AUDIO)
        l0 = [np.asarray(x) for x in
              __import__("jax").tree_util.tree_leaves(bundle.params)]
        l1 = [np.asarray(x) for x in
              __import__("jax").tree_util.tree_leaves(b2.params)]
        assert all(np.allclose(a, b) for a, b in zip(l0, l1))

    def test_resume_restores_opt_state_and_step(self, tmp_path):
        """resume_from continues the STEP COUNTER and optimizer state, so
        the LR schedule picks up where the prior run stopped (preemption-
        safe resume, SURVEY §5.4)."""
        import jax
        import jax.numpy as jnp
        from yourmt3_tpu.api import init_model, load_checkpoint
        from yourmt3_tpu.train.trainer import MetricLogger, train
        bundle = init_model("t5_tiny", "mt3_full_plus", audio_cfg=TINY_AUDIO)
        it = const_batches(bundle.task_manager)
        d = str(tmp_path / "ck3")
        train(bundle, it, total_steps=3, log_every=1, ckpt_every=3,
              ckpt_dir=d, spec_augment=False, warmup_steps=1)
        b2 = load_checkpoint(os.path.join(d, "last"), audio_cfg=TINY_AUDIO)

        steps_logged = []

        class Probe:
            def log(self, step, metrics, prefix=""):
                steps_logged.append(step)

            def close(self):
                pass

        train(b2, const_batches(b2.task_manager), total_steps=5, log_every=1,
              ckpt_every=0, ckpt_dir=d, spec_augment=False, warmup_steps=1,
              resume_from=os.path.join(d, "last"), logger=Probe())
        # continued at step 4, not 1 (schedule position preserved)
        assert steps_logged == [4, 5], steps_logged

    @pytest.mark.slow
    def test_preemption_writes_final_ckpt(self, tmp_path):
        from yourmt3_tpu.api import init_model
        from yourmt3_tpu.train.trainer import train
        from yourmt3_tpu.utils.preemption import PreemptionGuard
        bundle = init_model("t5_tiny", "mt3_full_plus", audio_cfg=TINY_AUDIO)
        d = str(tmp_path / "ck2")

        hits = []

        class Probe:
            def log(self, step, metrics, prefix=""):
                hits.append(step)
                if step >= 2:
                    PreemptionGuard.instance().request()

            def close(self):
                pass

        try:
            train(bundle, const_batches(bundle.task_manager), total_steps=50,
                  log_every=1, ckpt_every=0, ckpt_dir=d, spec_augment=False,
                  warmup_steps=1, logger=Probe())
        finally:
            PreemptionGuard.instance().reset()
        # stopped early (well before 50) and wrote the final checkpoint
        assert max(hits) < 10
        assert os.path.exists(os.path.join(d, "last", "ymt3_meta.json"))


class TestFullModelCfgInMeta:
    @pytest.mark.slow
    def test_dim_overrides_survive_restore(self, tmp_path):
        """Checkpoint metadata carries the FULL ModelConfig: a model
        trained with dim overrides (not a bare preset) must reload from
        the path alone. Regression: meta used to store only the preset
        NAME, so overridden dims mismatched the on-disk param tree."""
        import jax
        from yourmt3_tpu.api import init_model, load_checkpoint
        from yourmt3_tpu.train.checkpoint import save_bundle
        bundle = init_model("t5_tiny", "mt3_full_plus", audio_cfg=TINY_AUDIO,
                            d_model=48, d_kv=12, num_heads=2, d_ff=96,
                            num_encoder_layers=1, num_decoder_layers=2)
        d = str(tmp_path / "ovr")
        save_bundle(d, bundle, step=7)
        b2 = load_checkpoint(d, audio_cfg=TINY_AUDIO)
        assert b2.cfg.d_model == 48 and b2.cfg.num_decoder_layers == 2
        l0 = [np.asarray(x) for x in jax.tree_util.tree_leaves(bundle.params)]
        l1 = [np.asarray(x) for x in jax.tree_util.tree_leaves(b2.params)]
        assert all(np.allclose(a, b) for a, b in zip(l0, l1))
