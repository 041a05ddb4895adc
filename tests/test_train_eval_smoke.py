"""End-to-end smoke (SURVEY.md §4.5): synth dataset → training steps →
loss drops → full-file eval produces F1 numbers → transcribe → MIDI.

Uses a miniature audio config so the 1-core CPU test host stays fast; the
code path is identical to the full-size pipeline.
"""

import os

import numpy as np
import pytest

from yourmt3_tpu.config.audio import AudioConfig

TINY_AUDIO = AudioConfig(input_frames=4095, n_fft=512, hop_length=128,
                         n_mels=64)


@pytest.fixture(scope="module")
def synth_data(tmp_path_factory):
    from yourmt3_tpu.data.preprocess.synth import build_synth_dataset
    root = str(tmp_path_factory.mktemp("synthds"))
    return build_synth_dataset(root, n_tracks=2, duration=2.0,
                               programs=(0,), with_drums=True)


@pytest.fixture(scope="module")
def tiny_bundle():
    from yourmt3_tpu.api import init_model
    return init_model("t5_tiny", "mt3_full_plus", audio_cfg=TINY_AUDIO)


@pytest.mark.slow
class TestTrainingLoop:
    def test_loss_decreases_and_eval_runs(self, synth_data, tiny_bundle, tmp_path):
        from yourmt3_tpu.data.dataset_train import TrainDataset
        from yourmt3_tpu.data.dataset_eval import AudioFileDataset
        from yourmt3_tpu.eval.evaluator import evaluate_file_dataset
        from yourmt3_tpu.train.trainer import train

        bundle = tiny_bundle
        ds = TrainDataset([synth_data["train"]], bundle.task_manager,
                          TINY_AUDIO, stem_submix=False, seed=0)
        it = ds.batches(batch_size=4, prefetch=1)

        losses = []

        class Probe:
            def log(self, step, metrics, prefix=""):
                if "loss" in metrics:
                    losses.append(metrics["loss"])

            def close(self):
                pass

        bundle = train(bundle, it, total_steps=30, log_every=5, ckpt_every=0,
                       ckpt_dir=str(tmp_path), base_lr=3e-3, warmup_steps=5,
                       spec_augment=False, logger=Probe())
        assert losses[-1] < losses[0], losses  # overfit tiny data a bit

        eval_ds = AudioFileDataset(synth_data["test"], TINY_AUDIO)
        res = evaluate_file_dataset(bundle, eval_ds,
                                    eval_program_vocab="gm_instr_class",
                                    eval_drum_vocab="gm_drum_8class",
                                    batch_size=2, verbose=False)
        # untrained-ish model: just assert the machinery yields sane fields
        for k in ("onset_f1", "offset_f1", "multi_f1", "drum_f1"):
            assert 0.0 <= res[k] <= 1.0
        assert res["num_tracks"] == 2

    def test_labels_roundtrip_from_dataset(self, synth_data, tiny_bundle):
        """Dataset-produced labels must decode back to (a subset of) the
        chart — proves the tokenize path the trainer consumes."""
        from yourmt3_tpu.data.dataset_train import TrainDataset
        bundle = tiny_bundle
        ds = TrainDataset([synth_data["train"]], bundle.task_manager,
                          TINY_AUDIO, stem_submix=False, seed=3)
        audio, labels, _shift = ds.sample_segment()
        assert audio.shape == (TINY_AUDIO.input_frames,)
        assert labels.shape == (1, bundle.task_manager.max_token_length)
        notes, err = bundle.task_manager.tokenizer.decode_segment(labels[0], 0.0)
        # a random crop's tie section declares notes that began before the
        # crop — standalone decode counts those as tie_without_active_note
        # (it synthesizes the onset at the boundary); no other errors allowed.
        assert (err.invalid_events == err.dropped_events
                == err.unmatched_offsets == err.nonmonotonic_shifts == 0), err


class TestCLISurfaces:
    def test_transcribe_cli(self, synth_data, tmp_path, monkeypatch):
        from yourmt3_tpu.cli.transcribe import main
        from yourmt3_tpu.data.indexes import load_file_list
        wav = load_file_list(synth_data["test"])["tracks"][0]["audio_file"]
        out = str(tmp_path / "midi_out")
        # t5_tiny random model on the tiny audio cfg isn't reachable via CLI
        # presets; use full default cfg but tiny model for speed
        main([wav, "-m", "t5_tiny", "-o", out, "-b", "2"])
        assert any(f.endswith(".mid") for f in os.listdir(out))
