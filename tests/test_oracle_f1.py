"""Oracle F1 probe (VERDICT round-1 item 5): ground-truth notes →
tokenize_song → detokenize_song → mir_eval-semantics F1 must be ~1.0 on
FULL songs with ties (long notes crossing 2.048 s segment boundaries).

This isolates the token/detok pipeline from the model: if this holds,
any offset-F1 gap in end-to-end eval is a model/data effect, not a
decode defect. (Verified: the round-1 offset cliff (0.109 vs onset
0.392 zero-shot) was a data-observability effect — the old synth
envelope decayed to silence long before the labeled offset.)
"""

import numpy as np
import pytest

from yourmt3_tpu.data.preprocess.synth import random_chart
from yourmt3_tpu.eval.metrics import evaluate_track
from yourmt3_tpu.tokens.task_manager import TaskManager


@pytest.mark.parametrize("task", ["mt3_full_plus", "mc13_full_plus_256"])
def test_oracle_tokens_give_perfect_f1(task):
    tm = TaskManager(task)
    rng = np.random.default_rng(7)
    duration = 30.0
    notes = random_chart(rng, duration=duration, density=4.0)
    # ensure the probe actually exercises tie carry: some notes must span
    # a segment boundary
    seg = tm.audio_cfg.segment_seconds
    assert any(int(n.onset / seg) != int(n.offset / seg)
               for n in notes if not n.is_drum)
    starts = [i * seg for i in range(int(np.ceil(duration / seg)))]
    ids = tm.tokenize_song(notes, starts)
    dec, err = tm.detokenize_song(ids, starts)
    assert err.total() == 0
    res = evaluate_track(dec, notes)
    assert res.onset_f1 is not None and res.onset_f1 > 0.999
    assert res.offset_f1 is not None and res.offset_f1 > 0.999
    assert res.drum_f1 is not None and res.drum_f1 > 0.999
