"""Downloader (data/download.py): fetch/resume/checksum/extract — tested
offline via file:// URLs, plus the install CLI end-to-end with a local
archive (SURVEY C16: the reference's install_dataset.py downloads;
round 1 shipped hints only)."""

import hashlib
import os
import tarfile
import zipfile

import numpy as np
import pytest

from yourmt3_tpu.data.download import (DownloadError, download, extract,
                                       fetch_and_extract, sha256_file)


def _make_file(path, size=100_000, seed=0):
    data = np.random.default_rng(seed).bytes(size)
    with open(path, "wb") as f:
        f.write(data)
    return data


class TestDownload:
    def test_file_url_roundtrip_and_checksum(self, tmp_path):
        src = tmp_path / "src.bin"
        data = _make_file(str(src))
        want = hashlib.sha256(data).hexdigest()
        dest = str(tmp_path / "out" / "dl.bin")
        got = download(f"file://{src}", dest, sha256=want)
        assert got == dest
        assert sha256_file(dest) == want

    def test_checksum_mismatch_raises(self, tmp_path):
        src = tmp_path / "src.bin"
        _make_file(str(src))
        with pytest.raises(DownloadError):
            download(f"file://{src}", str(tmp_path / "d.bin"),
                     sha256="0" * 64)
        assert not os.path.exists(tmp_path / "d.bin")

    def test_existing_valid_dest_skips_fetch(self, tmp_path):
        src = tmp_path / "src.bin"
        data = _make_file(str(src))
        dest = str(tmp_path / "dl.bin")
        download(f"file://{src}", dest)
        os.remove(src)  # source gone: a second call must not refetch
        assert download(f"file://{src}", dest) == dest

    def test_partial_restart(self, tmp_path):
        """file:// ignores Range → a stale .part must restart cleanly."""
        src = tmp_path / "src.bin"
        data = _make_file(str(src))
        dest = str(tmp_path / "dl.bin")
        with open(dest + ".part", "wb") as f:
            f.write(b"garbage")
        download(f"file://{src}", dest,
                 sha256=hashlib.sha256(data).hexdigest())
        assert sha256_file(dest) == hashlib.sha256(data).hexdigest()


class TestExtract:
    def test_zip_and_tar(self, tmp_path):
        for kind in ("zip", "tar.gz"):
            adir = tmp_path / f"a_{kind}"
            adir.mkdir()
            (adir / "x.txt").write_text("hello")
            arch = str(tmp_path / f"a.{kind}")
            if kind == "zip":
                with zipfile.ZipFile(arch, "w") as z:
                    z.write(adir / "x.txt", "top/x.txt")
            else:
                with tarfile.open(arch, "w:gz") as t:
                    t.add(adir / "x.txt", "top/x.txt")
            out = extract(arch, str(tmp_path / f"out_{kind}"))
            assert open(os.path.join(out, "top", "x.txt")).read() == "hello"

    def test_path_traversal_rejected(self, tmp_path):
        arch = str(tmp_path / "evil.tar")
        (tmp_path / "p.txt").write_text("x")
        with tarfile.open(arch, "w") as t:
            t.add(tmp_path / "p.txt", "../../evil.txt")
        with pytest.raises(DownloadError):
            extract(arch, str(tmp_path / "out"))


class TestInstallCliDownload:
    def test_install_via_local_archive_url(self, tmp_path):
        """install_dataset --url file://...zip end-to-end: fetch, extract,
        convert (guitarset converter over a tiny fixture tree)."""
        import sys
        sys.path.insert(0, os.path.dirname(__file__))
        from yourmt3_tpu.cli.install_dataset import main
        # tiny guitarset-shaped tree: audio_mono-mic/*.wav + annotation jams
        from yourmt3_tpu.data.audio_io import write_wav
        import json
        tree = tmp_path / "gs"
        (tree / "annotation").mkdir(parents=True)
        (tree / "audio_mono-mic").mkdir()
        name = "00_BN1-129-Eb_comp"
        sr = 16000
        write_wav(str(tree / "audio_mono-mic" / f"{name}_mic.wav"),
                  np.zeros(sr, np.float32), sr)
        jams = {"annotations": [
            {"namespace": "note_midi",
             "annotation_metadata": {"data_source": "0"},
             "data": [{"time": 0.1, "duration": 0.4, "value": 52.0,
                       "confidence": None}]}]}
        with open(tree / "annotation" / f"{name}.jams", "w") as f:
            json.dump(jams, f)
        arch = str(tmp_path / "gs.zip")
        with zipfile.ZipFile(arch, "w") as z:
            for root, _, files in os.walk(tree):
                for fn in files:
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, tmp_path))
        home = str(tmp_path / "home")
        main(["guitarset", "--url", f"file://{arch}", "--data-home", home])
        idx = os.path.join(home, "yourmt3_indexes",
                           "guitarset_train_file_list.json")
        assert os.path.exists(idx)
