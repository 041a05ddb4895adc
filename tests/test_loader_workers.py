"""Multi-producer host loader: concurrent correctness + scaling
(VERDICT round-1 item 9; reference gets this from torch DataLoader
worker processes, SURVEY.md C14)."""

import os
import time

import numpy as np
import pytest

from yourmt3_tpu.data.dataset_train import TrainDataset
from yourmt3_tpu.data.preprocess.synth import build_synth_dataset
from yourmt3_tpu.tokens.task_manager import TaskManager


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("loadercorpus"))
    out = build_synth_dataset(root, n_tracks=6, duration=4.0,
                              splits=("train",), seed=11,
                              dataset_name="ldr")
    return out["train"]


def _valid_batch(tm, batch):
    assert batch["audio"].shape == (4, tm.audio_cfg.input_frames)
    assert batch["audio"].dtype == np.float32
    assert batch["labels"].shape == (4, tm.num_decoding_channels,
                                     tm.max_token_length)
    # labels must be in-vocab ids
    assert batch["labels"].min() >= 0
    assert batch["labels"].max() < tm.vocab_size
    # every segment's labels must decode (tie rows from mid-note crops
    # legitimately report unmatched-tie counts when decoded standalone)
    for row in batch["labels"]:
        notes, _ = tm.detokenize_song(row[None], [0.0])
        assert isinstance(notes, list)


@pytest.mark.slow
def test_multiworker_batches_are_valid(corpus):
    tm = TaskManager("mt3_full_plus")
    ds = TrainDataset([corpus], tm, seed=0)
    it = ds.batches(4, num_workers=4)
    for _ in range(12):
        _valid_batch(tm, next(it))


@pytest.mark.slow
def test_multiworker_process_batches_are_valid(corpus):
    """Process workers (the default for num_workers>1: tokenization is
    pure Python, threads hit the GIL) must deliver well-formed batches."""
    tm = TaskManager("mt3_full_plus")
    ds = TrainDataset([corpus], tm, seed=0)
    it = ds.batches(4, num_workers=2, use_processes=True)
    for _ in range(6):
        _valid_batch(tm, next(it))


@pytest.mark.skipif((os.cpu_count() or 1) < 4,
                    reason="scaling needs ≥4 cores (single-core CI host "
                           "cannot exhibit producer parallelism)")
def test_multiworker_production_rate_scales(corpus):
    """4 process producers must beat 1 inline producer on wall-clock
    batch production (conservative 1.5× floor so CI timing noise and a
    loaded host can't flake it)."""
    tm = TaskManager("mt3_full_plus")

    def rate(workers, procs):
        ds = TrainDataset([corpus], tm, seed=0, cache_tracks=16)
        it = ds.batches(4, num_workers=workers, use_processes=procs)
        for _ in range(4):
            next(it)  # warm caches / spin up workers
        n = 30
        t0 = time.perf_counter()
        for _ in range(n):
            next(it)
        return n / (time.perf_counter() - t0)

    r1 = rate(1, False)
    r4 = rate(4, True)
    assert r4 > 1.5 * r1, (r1, r4)
