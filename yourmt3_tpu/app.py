"""Demo app surface: Gradio UI + YouTube ingestion.

Capability parity target: reference HF-Space `app.py`
(SURVEY.md C31/L7; README.md:9-10 proves the surfaces): upload audio OR
paste a YouTube URL → transcribed MIDI download. Both gradio and yt-dlp
are optional deps (absent in this offline build environment) — the module
degrades with clear errors and the core path is importable regardless.
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional

from .api import ModelBundle, init_model, load_checkpoint, transcribe


def fetch_youtube_audio(url: str, out_dir: str) -> str:
    """YouTube URL → wav path (requires yt-dlp + ffmpeg + network)."""
    try:
        import yt_dlp
    except ImportError as e:
        raise RuntimeError(
            "YouTube ingestion requires yt-dlp (network environment)") from e
    opts = {
        "format": "bestaudio/best",
        "outtmpl": os.path.join(out_dir, "audio.%(ext)s"),
        "postprocessors": [{"key": "FFmpegExtractAudio",
                            "preferredcodec": "wav"}],
        "quiet": True,
    }
    with yt_dlp.YoutubeDL(opts) as ydl:
        ydl.download([url])
    return os.path.join(out_dir, "audio.wav")


def build_demo(bundle: Optional[ModelBundle] = None,
               checkpoint: Optional[str] = None):
    """→ a gradio.Interface (call .launch() to serve)."""
    try:
        import gradio as gr
    except ImportError as e:
        raise RuntimeError("the demo UI requires gradio; use "
                           "`python -m yourmt3_tpu.cli.transcribe` instead") from e
    if bundle is None:
        bundle = (load_checkpoint(checkpoint) if checkpoint
                  else init_model("t5_small", "mt3_full_plus"))

    def run(audio_file, youtube_url):
        with tempfile.TemporaryDirectory() as td:
            if youtube_url:
                audio_file = fetch_youtube_audio(youtube_url, td)
            if not audio_file:
                raise ValueError("provide an audio file or a YouTube URL")
            out = os.path.join(td, "transcription.mid")
            transcribe(bundle, audio_file, out)
            # copy out of the tempdir so gradio can serve it
            final = os.path.join(tempfile.gettempdir(),
                                 os.path.basename(out))
            with open(out, "rb") as f_in, open(final, "wb") as f_out:
                f_out.write(f_in.read())
            return final

    return gr.Interface(
        fn=run,
        inputs=[gr.Audio(type="filepath", label="Audio file"),
                gr.Textbox(label="…or YouTube URL")],
        outputs=gr.File(label="MIDI transcription"),
        title="YourMT3-TPU: multi-task multi-track music transcription",
    )


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("-ckpt", "--checkpoint", default=None)
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args()
    build_demo(checkpoint=args.checkpoint).launch(server_port=args.port)


if __name__ == "__main__":
    main()
