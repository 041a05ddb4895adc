"""End-to-end rehearsal on reference-format data (VERDICT r2 item 8).

Builds a miniature GuitarSet-shaped dataset (real jams annotations + audio
rendered so the annotations are acoustically observable), archives it,
then drives the REAL user workflow with zero hand-editing:

  1. python -m yourmt3_tpu.cli.install_dataset guitarset --url file://<zip>
  2. python -m yourmt3_tpu.cli.train  (100 steps, t5_tiny, CPU)
  3. python -m yourmt3_tpu.cli.test   (metrics JSON)

Writes runs/rehearsal/rehearsal.log + eval_test.json as committed proof.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from yourmt3_tpu.data.audio_io import write_wav
from yourmt3_tpu.data.preprocess.synth import render_notes
from yourmt3_tpu.tokens.dataclasses import Note

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/root/ymt3_data/rehearsal"
HOME = os.path.join(WORK, "home")
RUN_DIR = os.path.join(REPO, "runs", "rehearsal")
SR = 16000
DUR = 8.0


def build_tree(root: str) -> None:
    """GuitarSet layout: annotation/<id>.jams + audio_mono-mic/<id>_mic.wav.
    Players 00-03 → train, 04 → validation, 05 → test (converter's split)."""
    rng = np.random.default_rng(7)
    os.makedirs(os.path.join(root, "annotation"), exist_ok=True)
    os.makedirs(os.path.join(root, "audio_mono-mic"), exist_ok=True)
    for player in range(6):
        for take in range(3 if player <= 3 else 2):
            base = f"{player:02d}_BN{take}-129-Eb_comp"
            notes = []
            for _ in range(20):
                onset = float(rng.uniform(0.05, DUR - 0.4))
                notes.append(Note(False, 24, onset,
                                  onset + float(rng.uniform(0.15, 0.9)),
                                  int(rng.integers(45, 78)), 100))
            notes.sort(key=lambda n: n.onset)
            audio = render_notes(notes, SR, DUR, seed=player * 10 + take)
            write_wav(os.path.join(root, "audio_mono-mic", base + "_mic.wav"),
                      audio, SR)
            jams = {"annotations": [{
                "namespace": "note_midi",
                "annotation_metadata": {"data_source": "0"},
                "data": [{"time": n.onset, "duration": n.offset - n.onset,
                          "value": float(n.pitch), "confidence": None}
                         for n in notes]}]}
            with open(os.path.join(root, "annotation", base + ".jams"), "w") as f:
                json.dump(jams, f)


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
    tree = os.path.join(WORK, "GuitarSet")
    build_tree(tree)
    arch = os.path.join(WORK, "guitarset_mini.zip")
    with zipfile.ZipFile(arch, "w") as z:
        for root, _, files in os.walk(tree):
            for fn in files:
                full = os.path.join(root, fn)
                z.write(full, os.path.relpath(full, WORK))

    with open(os.path.join(RUN_DIR, "rehearsal.log"), "w") as log:
        log.write("# install -> train -> eval rehearsal on reference-format "
                  "(GuitarSet jams) data; zero hand-editing\n")
        py = sys.executable
        run([py, "-m", "yourmt3_tpu.cli.install_dataset", "guitarset",
             "--url", f"file://{arch}", "--data-home", HOME], log)
        run([py, "-m", "yourmt3_tpu.cli.train", "rehearsal",
             "-d", "guitarset", "-m", "t5_tiny", "-t", "mt3_full_plus_256",
             "-b", "4", "-s", "100", "-lr", "1e-3", "--warmup-steps", "20",
             "--ckpt-every", "100", "--cpu",
             "--ckpt-dir", RUN_DIR], log)
        run([py, "-m", "yourmt3_tpu.cli.test",
             "-ckpt", os.path.join(RUN_DIR, "last"),
             "-d", "guitarset", "--split", "test", "--cpu", "-b", "4",
             "--output-json", os.path.join(RUN_DIR, "eval_test.json")], log)
        log.write("\nREHEARSAL OK\n")
    print("rehearsal complete; artifacts in", RUN_DIR)


if __name__ == "__main__":
    main()
