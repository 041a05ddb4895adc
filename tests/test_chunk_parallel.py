"""Chunk-parallel song streaming over the virtual 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yourmt3_tpu.api import init_model, transcribe_audio_array
from yourmt3_tpu.config.audio import AudioConfig
from yourmt3_tpu.parallel.chunk_stream import transcribe_song_chunk_parallel
from yourmt3_tpu.parallel.mesh import make_mesh

TINY_AUDIO = AudioConfig(input_frames=4095, n_fft=512, hop_length=128,
                         n_mels=64)


class TestChunkParallel:
    def test_sharded_matches_single_device(self):
        assert len(jax.devices()) == 8
        bundle = init_model("t5_tiny", "mt3_full_plus", audio_cfg=TINY_AUDIO)
        rng = np.random.default_rng(0)
        song = (rng.standard_normal(int(TINY_AUDIO.sample_rate * 3.1)) * 0.1
                ).astype(np.float32)

        mesh = make_mesh(n_data=8)
        notes_sharded, err_s = transcribe_song_chunk_parallel(
            bundle, song, mesh, segments_per_device=2)
        notes_single, err_u = transcribe_audio_array(bundle, song,
                                                     batch_size=4)
        key = lambda n: (round(n.onset, 3), n.is_drum, n.program, n.pitch)
        assert sorted(map(key, notes_sharded)) == sorted(map(key, notes_single))

    def test_empty_song(self):
        bundle = init_model("t5_tiny", "mt3_full_plus", audio_cfg=TINY_AUDIO)
        song = np.zeros(100, np.float32)
        notes, err = transcribe_song_chunk_parallel(bundle, song,
                                                    make_mesh(n_data=8),
                                                    segments_per_device=1)
        assert isinstance(notes, list)


class TestEvalSweepChunkParallel:
    def test_evaluate_file_dataset_f1_identical_sharded(self, tmp_path):
        """BASELINE config 5: the eval sweep run chunk-parallel over the
        8-device mesh must produce METRICS identical to single-device."""
        from yourmt3_tpu.data.dataset_eval import AudioFileDataset
        from yourmt3_tpu.data.preprocess.synth import build_synth_dataset
        from yourmt3_tpu.eval.evaluator import evaluate_file_dataset

        out = build_synth_dataset(str(tmp_path), n_tracks=2, duration=2.5,
                                  splits=("test",), seed=5,
                                  dataset_name="cp")
        bundle = init_model("t5_tiny", "mt3_full_plus",
                            audio_cfg=TINY_AUDIO)
        ds = AudioFileDataset(out["test"], TINY_AUDIO)
        single = evaluate_file_dataset(bundle, ds, batch_size=4,
                                       verbose=False)
        ds2 = AudioFileDataset(out["test"], TINY_AUDIO)
        sharded = evaluate_file_dataset(bundle, ds2, verbose=False,
                                        mesh=make_mesh(n_data=8),
                                        segments_per_device=2)
        assert set(single) == set(sharded)
        for k in single:
            assert single[k] == pytest.approx(sharded[k], abs=1e-9), k

    def test_eval_beam_size_passthrough_and_mesh_exclusion(self):
        """evaluate_file_dataset(beam_size>1) must decode through the beam
        path (single-device), and the chunk-parallel mesh path must reject
        beam>1 loudly (it is greedy-only)."""
        from yourmt3_tpu.eval.evaluator import evaluate_file_dataset

        bundle = init_model("t5_tiny", "mt3_full_plus", audio_cfg=TINY_AUDIO)
        seg_s = TINY_AUDIO.input_frames / TINY_AUDIO.sample_rate
        segs = np.zeros((2, TINY_AUDIO.input_frames), np.float32)
        ds = [("trk", segs, [0.0, seg_s], [])]
        out = evaluate_file_dataset(bundle, ds, verbose=False, batch_size=2,
                                    beam_size=2)
        assert out["num_tracks"] == 1.0
        with pytest.raises(ValueError, match="beam"):
            evaluate_file_dataset(bundle, ds, verbose=False,
                                  mesh=make_mesh(n_data=8), beam_size=2)

    def test_mesh_eval_rejects_noncontiguous_slicing(self):
        """The mesh path re-slices the flat song on device, so a dataset
        with overlapping (or otherwise non-grid) segments must be rejected
        loudly instead of silently evaluating corrupted audio."""
        from yourmt3_tpu.eval.evaluator import evaluate_file_dataset

        bundle = init_model("t5_tiny", "mt3_full_plus", audio_cfg=TINY_AUDIO)
        seg_s = TINY_AUDIO.input_frames / TINY_AUDIO.sample_rate
        segs = np.zeros((3, TINY_AUDIO.input_frames), np.float32)
        overlapping = [("trk", segs, [0.0, seg_s / 2, seg_s], [])]
        with pytest.raises(ValueError, match="contiguous"):
            evaluate_file_dataset(bundle, overlapping, verbose=False,
                                  mesh=make_mesh(n_data=8))

pytestmark = pytest.mark.slow
