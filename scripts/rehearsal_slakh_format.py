"""End-to-end rehearsal on a Slakh-shaped FLAC tree (VERDICT r3 item 6).

Mirrors scripts/rehearsal_real_format.py (GuitarSet) for the second
headline workload (reference README badges name Slakh2100): builds a
miniature slakh2100_flac_redux-shaped dataset — per-track metadata.yaml,
per-stem MIDI, per-stem FLAC audio and a FLAC mix, audio rendered so the
annotations are acoustically observable — archives it, then drives the
EXACT user workflow with zero hand-editing:

  1. python -m yourmt3_tpu.cli.install_dataset slakh --url file://<zip>
     (FLAC decoded by the first-party csrc/audio decoder or its Python
     fallback; stems registered for submix augmentation)
  2. python -m yourmt3_tpu.cli.train  (100 steps, t5_tiny, CPU)
  3. python -m yourmt3_tpu.cli.test   (metrics JSON)

Writes runs/rehearsal_slakh/rehearsal.log + eval_test.json as committed
proof. F1 after 100 CPU steps is ~0 by design — this is an
install→train→eval *pipeline* proof on reference-format data.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tarfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np

from flac_encoder_util import write_flac
from yourmt3_tpu.data.preprocess.synth import render_notes
from yourmt3_tpu.tokens import note_event2midi
from yourmt3_tpu.tokens.dataclasses import Note

WORK = "/root/ymt3_data/rehearsal_slakh"
HOME = os.path.join(WORK, "home")
RUN_DIR = os.path.join(REPO, "runs", "rehearsal_slakh")
SR = 16000
DUR = 8.0

# per-stem instrument plan: (stem_id, program, is_drum, inst_class)
STEM_PLAN = [
    ("S00", 0, False, "Piano"),
    ("S01", 32, False, "Bass"),
    ("S02", 128, True, "Drums"),
]


def _stem_notes(rng, program: int, is_drum: bool) -> list:
    notes = []
    for _ in range(14):
        onset = float(rng.uniform(0.05, DUR - 0.4))
        if is_drum:
            notes.append(Note(True, 128, onset, onset + 0.01,
                              int(rng.choice([36, 38, 42])), 100))
        else:
            lo, hi = (28, 52) if program == 32 else (45, 84)
            notes.append(Note(False, program, onset,
                              onset + float(rng.uniform(0.2, 0.9)),
                              int(rng.integers(lo, hi)), 100))
    notes.sort(key=lambda n: n.onset)
    return notes


def build_tree(root: str) -> None:
    rng = np.random.default_rng(11)
    plan = {"train": 3, "validation": 1, "test": 2}
    idx = 0
    for split, n_tracks in plan.items():
        for _ in range(n_tracks):
            idx += 1
            tdir = os.path.join(root, split, f"Track{idx:05d}")
            os.makedirs(os.path.join(tdir, "MIDI"), exist_ok=True)
            os.makedirs(os.path.join(tdir, "stems"), exist_ok=True)
            mix = np.zeros(int(SR * DUR), np.float32)
            meta_lines = ["audio_dir: stems", "midi_dir: MIDI", "stems:"]
            for stem_id, prog, is_drum, klass in STEM_PLAN:
                notes = _stem_notes(rng, prog, is_drum)
                audio = render_notes(notes, SR, DUR, seed=idx * 7 + prog)
                write_flac(os.path.join(tdir, "stems", f"{stem_id}.flac"),
                           audio, SR)
                mix = mix + audio
                note_event2midi(notes,
                                os.path.join(tdir, "MIDI", f"{stem_id}.mid"))
                meta_lines += [
                    f"  {stem_id}:",
                    f"    inst_class: {klass}",
                    f"    program_num: {0 if is_drum else prog}",
                    f"    is_drum: {'true' if is_drum else 'false'}",
                    "    audio_rendered: true",
                ]
            peak = float(np.abs(mix).max())
            if peak > 1.0:
                mix = mix / peak
            write_flac(os.path.join(tdir, "mix.flac"), mix, SR)
            with open(os.path.join(tdir, "metadata.yaml"), "w") as f:
                f.write("\n".join(meta_lines) + "\n")


def run(cmd, log, env=None) -> None:
    log.write(f"\n$ {' '.join(cmd)}\n")
    log.flush()
    e = dict(os.environ)
    e["YMT3_DATA_HOME"] = HOME
    e["JAX_PLATFORMS"] = "cpu"
    if env:
        e.update(env)
    r = subprocess.run(cmd, stdout=log, stderr=subprocess.STDOUT, env=e,
                       cwd=REPO)
    if r.returncode != 0:
        raise SystemExit(f"FAILED ({r.returncode}): {' '.join(cmd)}")


def main() -> None:
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(RUN_DIR, exist_ok=True)
    tree = os.path.join(WORK, "slakh_mini")
    build_tree(tree)
    # the real distribution is a .tar.gz (slakh2100_flac_redux.tar.gz)
    arch = os.path.join(WORK, "slakh_mini.tar.gz")
    with tarfile.open(arch, "w:gz") as t:
        t.add(tree, arcname="slakh_mini")

    with open(os.path.join(RUN_DIR, "rehearsal.log"), "w") as log:
        log.write("# install -> train -> eval rehearsal on a Slakh-shaped "
                  "FLAC tree (metadata.yaml + per-stem MIDI/FLAC); zero "
                  "hand-editing\n")
        py = sys.executable
        run([py, "-m", "yourmt3_tpu.cli.install_dataset", "slakh",
             "--url", f"file://{arch}", "--data-home", HOME], log)
        run([py, "-m", "yourmt3_tpu.cli.train", "rehearsal_slakh",
             "-d", "slakh", "-m", "t5_tiny", "-t", "mt3_full_plus_256",
             "-b", "4", "-s", "100", "-lr", "1e-3", "--warmup-steps", "20",
             "--ckpt-every", "100", "--cpu",
             "--ckpt-dir", RUN_DIR], log)
        run([py, "-m", "yourmt3_tpu.cli.test",
             "-ckpt", os.path.join(RUN_DIR, "last"),
             "-d", "slakh", "--split", "test", "--cpu", "-b", "4",
             "--output-json", os.path.join(RUN_DIR, "eval_test.json")], log)
        with open(os.path.join(RUN_DIR, "eval_test.json")) as f:
            json.load(f)  # must parse
        log.write("\nREHEARSAL OK\n")
    print("rehearsal complete; artifacts in", RUN_DIR)


if __name__ == "__main__":
    main()
