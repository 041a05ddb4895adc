"""One-shot transcription CLI: audio file(s) → MIDI.

Capability parity target: reference HF-Space/Colab surface
(SURVEY.md C31, §3.3; README.md:8-10 proves the surfaces). The YouTube
path of the reference (yt-dlp) needs network — gated behind --url and an
informative error offline.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    from ..utils.jax_setup import setup_jax
    setup_jax()
    p = argparse.ArgumentParser(description="Transcribe audio → MIDI")
    p.add_argument("inputs", nargs="*", help="audio files (wav)")
    p.add_argument("--url", default=None,
                   help="YouTube URL (requires network + yt-dlp; reference "
                        "README.md:10 surface)")
    p.add_argument("-ckpt", "--checkpoint", default=None,
                   help="checkpoint dir; omit for a randomly-initialized "
                        "model (smoke only)")
    p.add_argument("-m", "--model", default="t5_small")
    p.add_argument("-t", "--task", default="mt3_full_plus")
    p.add_argument("-o", "--output-dir", default=".")
    p.add_argument("-b", "--batch-size", type=int, default=8)
    p.add_argument("--subtask", default=None)
    p.add_argument("--decode-path", choices=("fast", "exact"),
                   default="exact",
                   help="exact = bf16 KV decode (default: bit-faithful "
                        "outputs); fast = int8/paged KV (measured ≤0.7 "
                        "onset-F1 pts, ~1.5× throughput)")
    p.add_argument("--beam-size", type=int, default=1,
                   help=">1 decodes with batched beam search (greedy is "
                        "the reference default; beam is a quality knob)")
    p.add_argument("--repetition-guard", type=int, default=0,
                   help="force-EOS a stream after N consecutive identical "
                        "tokens (degenerate greedy cutoff; 0 = off, else "
                        ">= 2)")
    p.add_argument("--repair-beam", type=int, default=2,
                   help="validate-and-repair decode (DEFAULT ON): segments "
                        "the detokenizer rejects are re-decoded with beam "
                        "search of this width and kept only if errors drop "
                        "— clean MIDI out by default; 0 = raw greedy "
                        "(token-identical to pre-r5 default)")
    p.add_argument("--weight-quant", default=None,
                   choices=("none", "bf16", "int8"),
                   help="decoder-weight decode format (bf16 = exact at "
                        "halved weight HBM reads; int8 = ~0.4%% weight "
                        "rounding at a quarter)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from ..api import (fast_decode_overrides, init_model, load_checkpoint,
                       transcribe)
    from ..tokens.task_manager import TaskManager

    inputs = list(args.inputs)
    if args.url:
        try:
            import yt_dlp  # noqa: F401
        except ImportError:
            raise SystemExit("YouTube ingestion requires yt-dlp + network; "
                             "unavailable in this environment. Pass a local "
                             "audio file instead.")
        import tempfile

        from ..app import fetch_youtube_audio
        dl_dir = tempfile.mkdtemp(prefix="ymt3_yt_")
        inputs.append(fetch_youtube_audio(args.url, dl_dir))
    if not inputs:
        raise SystemExit("no input files")

    wq = {"weight_quant": args.weight_quant} if args.weight_quant else {}
    if args.checkpoint:
        # Restore ONCE; kv_quant/use_pallas_decode/weight_quant never change
        # the param tree, so the fast path only needs a rebuilt model object
        # — a second restore doubled load time + peak host memory (ADVICE r2).
        bundle = load_checkpoint(args.checkpoint)
        ov = dict(wq)
        if args.decode_path == "fast":
            ov.update(fast_decode_overrides(
                bundle.task_manager.num_decoding_channels,
                bundle.task_manager.max_token_length))
            ov.update(wq)  # explicit flag wins over the fast preset
            print("note: --decode-path fast (int8 KV) is active — outputs "
                  "can differ from the exact bf16 path by ≤0.7 onset-F1 pts")
        if ov:
            bundle.with_decode_overrides(**ov)
    else:
        tm = TaskManager(args.task)
        ov = (fast_decode_overrides(tm.num_decoding_channels,
                                    tm.max_token_length)
              if args.decode_path == "fast" else {})
        ov.update(wq)
        bundle = init_model(args.model, args.task, **ov)
    os.makedirs(args.output_dir, exist_ok=True)
    for path in inputs:
        out = os.path.join(
            args.output_dir,
            os.path.splitext(os.path.basename(path))[0] + ".mid")
        mid = transcribe(bundle, path, out, batch_size=args.batch_size,
                         subtask=args.subtask, beam_size=args.beam_size,
                         repetition_guard=args.repetition_guard,
                         repair_beam=args.repair_beam)
        print(f"{path} -> {mid}")


if __name__ == "__main__":
    main()
