"""Demo-surface test (SURVEY.md C31/L7, reference README.md:9-10).

gradio / yt-dlp are absent in this offline environment, so the Gradio UI
cannot launch here — but the `run()` closure inside build_demo IS the
public demo plumbing (upload-or-YouTube → transcribe → servable MIDI) and
must not rot untested. Fake modules stand in for gradio/yt_dlp; the
transcription path underneath is the real one.
"""

import os
import sys
import types

import numpy as np
import pytest

from yourmt3_tpu.data.audio_io import write_wav


@pytest.fixture()
def fake_gradio(monkeypatch):
    """A minimal gradio stand-in that records the Interface fn."""
    captured = {}
    gr = types.ModuleType("gradio")

    class _Comp:
        def __init__(self, *a, **k):
            pass

    class _Interface:
        def __init__(self, fn=None, **k):
            captured["fn"] = fn
            captured["kwargs"] = k

        def launch(self, **k):
            captured["launched"] = k

    gr.Audio = _Comp
    gr.Textbox = _Comp
    gr.File = _Comp
    gr.Interface = _Interface
    monkeypatch.setitem(sys.modules, "gradio", gr)
    return captured


@pytest.fixture(scope="module")
def tiny_bundle():
    from yourmt3_tpu.api import init_model
    return init_model("t5_tiny", task="mt3_full_plus_256",
                      num_encoder_layers=1, num_decoder_layers=1)


def _wav(path, seconds=2.2):
    sr = 16000
    t = np.arange(int(sr * seconds)) / sr
    write_wav(path, (0.2 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), sr)


class TestBuildDemo:
    def test_requires_gradio_with_clear_error(self, monkeypatch):
        monkeypatch.setitem(sys.modules, "gradio", None)
        from yourmt3_tpu import app
        with pytest.raises(RuntimeError, match="gradio"):
            app.build_demo(bundle=object())

    def test_run_transcribes_uploaded_audio(self, fake_gradio, tiny_bundle,
                                            tmp_path):
        from yourmt3_tpu import app
        app.build_demo(bundle=tiny_bundle)
        run = fake_gradio["fn"]
        wav = str(tmp_path / "in.wav")
        _wav(wav)
        out = run(wav, "")
        assert os.path.exists(out) and out.endswith(".mid")
        # the MIDI parses back through our own reader
        from yourmt3_tpu.tokens import midi2note
        midi2note(out)  # random-init model may emit zero notes; must parse

    def test_run_requires_some_input(self, fake_gradio, tiny_bundle):
        from yourmt3_tpu import app
        app.build_demo(bundle=tiny_bundle)
        with pytest.raises(ValueError, match="audio file or a YouTube URL"):
            fake_gradio["fn"](None, "")

    def test_youtube_branch_uses_yt_dlp(self, fake_gradio, tiny_bundle,
                                        monkeypatch, tmp_path):
        """The URL branch must route through fetch_youtube_audio and then
        transcribe whatever audio it produced."""
        from yourmt3_tpu import app

        ytdlp = types.ModuleType("yt_dlp")

        class _YDL:
            def __init__(self, opts):
                self.opts = opts

            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

            def download(self, urls):
                # honor the outtmpl directory like the real yt-dlp would
                outdir = os.path.dirname(self.opts["outtmpl"])
                _wav(os.path.join(outdir, "audio.wav"))

        ytdlp.YoutubeDL = _YDL
        monkeypatch.setitem(sys.modules, "yt_dlp", ytdlp)
        app.build_demo(bundle=tiny_bundle)
        out = fake_gradio["fn"](None, "https://youtu.be/fake")
        assert os.path.exists(out) and out.endswith(".mid")

    def test_youtube_without_ytdlp_errors_clearly(self, monkeypatch):
        monkeypatch.setitem(sys.modules, "yt_dlp", None)
        from yourmt3_tpu import app
        with pytest.raises(RuntimeError, match="yt-dlp"):
            app.fetch_youtube_audio("https://youtu.be/x", "/tmp")


class TestTranscribeCliUrl:
    def test_url_is_fetched_and_transcribed(self, monkeypatch, tmp_path):
        """--url must actually route through yt-dlp and transcribe the
        fetched audio (regression: the CLI used to import yt_dlp and then
        drop the URL on the floor)."""
        ytdlp = types.ModuleType("yt_dlp")

        class _YDL:
            def __init__(self, opts):
                self.opts = opts

            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

            def download(self, urls):
                outdir = os.path.dirname(self.opts["outtmpl"])
                _wav(os.path.join(outdir, "audio.wav"))

        ytdlp.YoutubeDL = _YDL
        monkeypatch.setitem(sys.modules, "yt_dlp", ytdlp)
        from yourmt3_tpu.cli import transcribe as cli
        out_dir = str(tmp_path / "out")
        cli.main(["--url", "https://youtu.be/fake", "-m", "t5_tiny",
                  "-t", "mt3_full_plus_256", "-o", out_dir, "--cpu"])
        mids = [f for f in os.listdir(out_dir) if f.endswith(".mid")]
        assert mids, os.listdir(out_dir)
