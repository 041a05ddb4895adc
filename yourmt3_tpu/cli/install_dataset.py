"""Dataset installation CLI.

Capability parity target: reference `install_dataset.py` (SURVEY.md C16,
§3.4): download + convert each dataset into the unified index. Downloads
(zenodo/gdrive) require network, unavailable here — this CLI converts an
already-downloaded local tree; the download URLs are documented per
dataset for online use.
"""

from __future__ import annotations

import argparse

DOWNLOAD_HINTS = {
    "maestro": "https://magenta.tensorflow.org/datasets/maestro (v3.0.0)",
    "slakh": "https://zenodo.org/record/4599666 (slakh2100_flac_redux; convert FLAC→WAV)",
    "guitarset": "https://zenodo.org/record/3371780",
    "enstdrums_dtp": "https://perso.telecom-paristech.fr/grichard/ENST-drums/",
    "enstdrums_dtm": "same as enstdrums_dtp",
    "egmd": "https://magenta.tensorflow.org/datasets/e-gmd",
    "urmp": "https://labsites.rochester.edu/air/projects/URMP.html",
    "mir_st500": "https://github.com/york135/singing_transcription_ICASSP2021",
    "cmedia": "MIREX CMedia singing transcription set",
    "mir1k": "https://sites.google.com/site/unvoicedsoundseparation/mir-1k",
    "rwc_pop": "RWC Popular Music Database (AIST) + aligned MIDI",
    "idmt_smt_bass": "https://www.idmt.fraunhofer.de/en/publications/datasets/bass.html",
    "synth": "generated locally (no download)",
}


def main(argv=None) -> None:
    from ..config.data_presets import data_home
    from ..data.preprocess.converters import CONVERTERS

    p = argparse.ArgumentParser(description="Convert a dataset to ymt3 indexes")
    p.add_argument("dataset", choices=sorted(list(CONVERTERS) + ["synth"]))
    p.add_argument("--source", help="path to the downloaded dataset root")
    p.add_argument("--data-home", default=None,
                   help=f"index output root (default $YMT3_DATA_HOME)")
    p.add_argument("--synth-tracks", type=int, default=8)
    args = p.parse_args(argv)
    home = args.data_home or data_home()

    if args.dataset == "synth":
        from ..data.preprocess.synth import build_synth_dataset
        out = build_synth_dataset(home, n_tracks=args.synth_tracks)
        print(out)
        return
    if not args.source:
        raise SystemExit(
            f"--source required. Download first: {DOWNLOAD_HINTS[args.dataset]}")
    out = CONVERTERS[args.dataset](args.source, home)
    print(out)


if __name__ == "__main__":
    main()
