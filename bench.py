"""Benchmark: full-song transcription throughput per chip.

Default run prints ONE JSON line (the driver contract):
  {"metric": ..., "value": N, "unit": "audio_seconds_per_second_per_chip",
   "vs_baseline": N, "p50_latency_ms": N}

Headline = the FLAGSHIP config (BASELINE config 3: Perceiver-TF encoder +
13-channel T5 decoder, the YourMT3+ model) under WORST-CASE decode: EOS is
banned so every stream runs all 256 steps — a trained model early-exits
and is strictly faster. p50_latency_ms is the median single-batch latency
for one 2.048 s segment batch (B=1) through the same jitted path.

`python bench.py --matrix` additionally measures every BASELINE config
(t5_small, t5_base B=64, drums, flagship) and writes BENCH_MATRIX.json.

Decode-path selection (measured on v5e-1, worst-case floors):
  - multi-channel short decode (mc13, L=256/ch): int8 KV dense — 52.9 vs
    34.3 bf16-dense / 35.2 bf16-paged / 43.9 int8-paged (the kernel's
    sustained bandwidth loses to XLA's fusions at many short streams)
  - single-channel long decode (L=1024): int8 PAGED kernel (∝pos reads
    at half the bytes) — t5_small 84.8 vs 58.5 bf16-paged / 36.4
    bf16-dense; t5_base B=64: 32.8 vs 21.2 bf16-paged
"""

import json
import sys
import time

import numpy as np

TARGET = 50.0  # audio-seconds/sec/chip (BASELINE.md)

# Hardware-measured decode-loop tuning (phases × unroll), written by
# scripts/bench_phase_ablation.py after an on-chip grid sweep. Keyed by
# "<model_preset>/<task>". Both knobs are token-identical to the default
# (tested) PROVIDED the phase span stays a whole number of unroll groups —
# greedy_decode asserts (max_length/phases) % unroll == 0 and rejects any
# entry that would cross a phase boundary mid-unroll.
TUNING_FILE = "artifacts/decode_tuning.json"


def load_decode_tuning() -> dict:
    import os
    if os.path.exists(TUNING_FILE):
        with open(TUNING_FILE) as f:
            return json.load(f)
    return {}


def decode_path_overrides(num_channels: int, max_len: int) -> dict:
    """Fastest measured decode path per shape (see module docstring;
    shared with the user-facing CLIs via the library)."""
    from yourmt3_tpu.api import fast_decode_overrides
    return fast_decode_overrides(num_channels, max_len)


def build(model_preset, task, overrides):
    import jax.numpy as jnp
    from yourmt3_tpu.api import init_model
    return init_model(model_preset, task, **overrides)


def measure(bundle, batch, max_length, n_iters=3, ban_eos=True, unroll=1, phases=1):
    import functools

    import jax
    import jax.numpy as jnp
    from yourmt3_tpu.models.decoding import greedy_decode
    from yourmt3_tpu.models.ymt3 import YMT3

    ac = bundle.audio_cfg
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((batch, ac.input_frames)),
                        jnp.float32) * 0.1

    @jax.jit
    def run(params, audio):
        feats = bundle.frontend(audio)
        memory = bundle.model.apply(params, feats, method=YMT3.encode)
        return greedy_decode(bundle.model, params, memory, max_length,
                             ban_eos=ban_eos, unroll=unroll, phases=phases)

    out = run(bundle.params, audio)
    _ = np.asarray(out)  # materialize: repeated identical dispatches can be
    # deduped/pipelined on this host, so every timed iteration must fetch
    ts = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        out = run(bundle.params, audio)
        _ = np.asarray(out)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    return batch * ac.segment_seconds / med, med


def bench_config(model_preset, task, batch, max_length=None, n_iters=3,
                 extra_overrides=None, loop_overrides=None):
    from yourmt3_tpu.tokens.task_manager import TaskManager
    from yourmt3_tpu.config.audio import DEFAULT_AUDIO
    tm = TaskManager(task, DEFAULT_AUDIO)
    L = tm.max_token_length if max_length is None else min(
        max_length, tm.max_token_length)
    ov = decode_path_overrides(tm.num_decoding_channels, L)
    extra = dict(extra_overrides or {})
    tune = load_decode_tuning().get(f"{model_preset}/{task}", {})
    # Promoted tuning outranks the generic fast-path defaults (which
    # pre-set kv_quant, so a membership test against ov would silently
    # drop the promotion); explicit extra_overrides outrank both.
    # weight_quant/kv_quant/decoder_kv_heads enter the tuning file only
    # via quality-gated promotion (scripts/r11_mqa_promote.sh).
    for k in ("weight_quant", "decoder_kv_heads", "kv_quant"):
        if k in tune and k not in extra:
            ov[k] = tune[k]
    ov.update(extra)
    bundle = build(model_preset, task, ov)
    phases, unroll = tune.get("phases", 1), tune.get("unroll", 1)
    if loop_overrides:
        phases = loop_overrides.get("phases", phases)
        unroll = loop_overrides.get("unroll", unroll)
    thr, lat = measure(bundle, batch, L, n_iters, phases=phases,
                       unroll=unroll)
    # p50 single-batch latency for ONE segment (B=1)
    _, lat1 = measure(bundle, 1, L, n_iters=5, phases=phases, unroll=unroll)
    return {
        "config": f"{model_preset}/{task}",
        "batch": batch, "max_length": L,
        "decode_path": {**ov, **({"phases": phases, "unroll": unroll}
                                 if tune else {})},
        "audio_s_per_s_per_chip": round(thr, 3),
        "batch_latency_ms": round(lat * 1e3, 1),
        "p50_segment_latency_ms": round(lat1 * 1e3, 1),
        "vs_baseline": round(thr / TARGET, 4),
        "worst_case": True,
    }


def bench_transcribe_path(ckpt: str, song_seconds: float = 120.0,
                          batch_size: int = 16, early_exit: bool = False,
                          density: float = 3.0, extra_overrides=None):
    # early_exit=False default: the plain decode already stops when ALL
    # streams finish; chunked per-stream compaction only wins when decode
    # lengths are long AND variable (measured: 71.6 vs 33.7 audio-s/s on
    # uniformly short ≤65-token segments)
    """Time the PUBLIC API path end-to-end — frontend→encode→decode→
    on-device detok prep→host merge — on a synthetic song, with a TRAINED
    checkpoint so EOS early-exit is realistic (the worst-case numbers
    elsewhere ban EOS). This is what `api.transcribe` actually delivers."""
    import numpy as np
    from yourmt3_tpu.api import load_checkpoint, transcribe_audio_array
    from yourmt3_tpu.data.preprocess.synth import random_chart, render_notes

    bundle = load_checkpoint(ckpt)
    ov = decode_path_overrides(bundle.task_manager.num_decoding_channels,
                               bundle.task_manager.max_token_length)
    ov.update(extra_overrides or {})
    bundle.with_decode_overrides(**ov)  # params unchanged (ADVICE r2)
    sr = bundle.audio_cfg.sample_rate
    rng = np.random.default_rng(0)
    chart = random_chart(rng, song_seconds, density=density)
    audio = render_notes(chart, sr, song_seconds, seed=123)
    # warm (compile) on the FULL song shape: the detok extract program and
    # the final ragged batch chunk compile per shape, so a short warm-up
    # audio left compiles inside the timed region (steady-state is what a
    # server delivers; the first-song compile cost is reported nowhere
    # else but is bounded: decode/encode programs are batch-shaped and
    # detok extract is bucket-padded)
    transcribe_audio_array(bundle, audio, batch_size=batch_size,
                           early_exit=early_exit)
    t0 = time.perf_counter()
    notes, err = transcribe_audio_array(bundle, audio, batch_size=batch_size,
                                        early_exit=early_exit)
    dt = time.perf_counter() - t0
    return {
        "config": f"transcribe_path[{bundle.cfg.name},B={batch_size},"
                  f"early_exit={early_exit},density={density}]",
        "audio_s_per_s_per_chip": round(song_seconds / dt, 3),
        "vs_baseline": round(song_seconds / dt / TARGET, 4),
        "notes": len(notes), "decode_errors": err.total(),
        "worst_case": False,
    }


def bench_early_exit_regime(ckpt: str, batch_size: int = 16):
    """The workload early-exit claims to win on: LONG + VARIABLE decode
    lengths in the same batch. Most segments are sparse (EOS after tens of
    tokens); a minority are ultra-dense (hundreds of tokens). Plain decode
    runs every stream in a batch to the batch max; early-exit retires
    finished streams between chunks. Measures both on the PUBLIC api path
    (VERDICT r2 item 4)."""
    import numpy as np
    from yourmt3_tpu.api import load_checkpoint, transcribe_audio_array
    from yourmt3_tpu.data.preprocess.synth import random_chart, render_notes
    from yourmt3_tpu.models.ymt3 import YMT3

    bundle = load_checkpoint(ckpt)
    ov = decode_path_overrides(bundle.task_manager.num_decoding_channels,
                               bundle.task_manager.max_token_length)
    bundle.with_decode_overrides(**ov)
    sr = bundle.audio_cfg.sample_rate
    seg_s = bundle.audio_cfg.segment_seconds
    rng = np.random.default_rng(0)
    # 32 segments: 3/4 sparse (density 1.5 notes/s), 1/4 ultra-dense (40/s)
    n_seg = 32
    song_seconds = n_seg * seg_s
    pieces = []
    for i in range(n_seg):
        dens = 40.0 if i % 4 == 0 else 1.5
        chart = random_chart(rng, seg_s, density=dens)
        pieces.append(render_notes(chart, sr, seg_s, seed=100 + i))
    audio = np.concatenate(pieces)[: int(song_seconds * sr)]

    rows = []
    for early in (False, True):
        transcribe_audio_array(bundle, audio,
                               batch_size=batch_size, early_exit=early)  # warm
        # full-shape warm: see bench_transcribe_path
        t0 = time.perf_counter()
        notes, err = transcribe_audio_array(bundle, audio,
                                            batch_size=batch_size,
                                            early_exit=early)
        dt = time.perf_counter() - t0
        rows.append({
            "config": f"early_exit_regime[{bundle.cfg.name},B={batch_size},"
                      f"early_exit={early}]",
            "audio_s_per_s_per_chip": round(song_seconds / dt, 3),
            "vs_baseline": round(song_seconds / dt / TARGET, 4),
            "notes": len(notes), "decode_errors": err.total(),
            "worst_case": False,
        })
        print(json.dumps(rows[-1]), file=sys.stderr)
    return rows


# (ckpt dir, data preset) pairs for --eval-suite; rows whose checkpoint
# is missing on disk are skipped with a note (the suite is runnable on any
# host that has some of the trained runs).
EVAL_SUITE = (
    ("runs/t5base_r4/last", "synth_big"),
    ("runs/drums_r4/last", "synth_drum"),
    ("runs/drums_r5/last", "synth_drum"),
    ("runs/conformer_r4/last", "synth_big"),
    ("runs/mc13_r6/last", "synth_mc"),
    ("runs/mc13_mc3/last", "synth_mc3"),
)


def bench_eval_suite(max_tracks=None, batch_size=8, use_mesh=True):
    """BASELINE config-5 analogue: the full synthetic eval suite (every
    trained model family × its corpus) run data-parallel over the
    available device mesh, emitting ONE F1+throughput table
    (artifacts/eval_suite.json). On a v5e slice the mesh data axis spans
    the slice (whole songs stream chunk-parallel); on the 1-chip/CPU host
    it degrades to data=1/virtual-8 with identical metrics
    (tests/test_chunk_parallel.py locks sharded ≡ single-device)."""
    import os

    import jax
    from yourmt3_tpu.api import load_checkpoint
    from yourmt3_tpu.config.data_presets import get_data_preset
    from yourmt3_tpu.data.dataset_eval import AudioFileDataset
    from yourmt3_tpu.eval.evaluator import evaluate_file_dataset
    from yourmt3_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=len(jax.devices())) if use_mesh else None
    rows = []
    for ckpt, preset_name in EVAL_SUITE:
        if not os.path.isdir(os.path.join(ckpt, "params")):
            print(json.dumps({"config": ckpt, "skipped": "no checkpoint"}),
                  file=sys.stderr)
            continue
        bundle = load_checkpoint(ckpt)
        ov = decode_path_overrides(bundle.task_manager.num_decoding_channels,
                                   bundle.task_manager.max_token_length)
        bundle.with_decode_overrides(**ov)
        preset = get_data_preset(preset_name)
        for entry, idx in zip(preset.entries, preset.index_files("test")):
            ds = AudioFileDataset(idx, bundle.audio_cfg,
                                  max_tracks=max_tracks)
            audio_s = sum(t.get("duration", 0.0) for t in ds.tracks) or None
            t0 = time.perf_counter()
            res = evaluate_file_dataset(
                bundle, ds, eval_program_vocab=entry.eval_program_vocab,
                eval_drum_vocab=entry.eval_drum_vocab,
                batch_size=batch_size, verbose=False, mesh=mesh)
            dt = time.perf_counter() - t0
            row = {
                "config": f"{bundle.cfg.name}/{entry.dataset}",
                "ckpt": ckpt, "step": None,
                "mesh_data": mesh.shape["data"] if mesh else 1,
                "num_tracks": res.get("num_tracks"),
                "onset_f1": res.get("onset_f1"),
                "offset_f1": res.get("offset_f1"),
                "multi_f1": res.get("multi_f1"),
                "drum_f1": res.get("drum_f1"),
                "decode_errors": res.get("decode_errors"),
                "wall_s": round(dt, 1),
                "audio_s_per_s": (round(audio_s / dt, 2) if audio_s else None),
            }
            rows.append(row)
            print(json.dumps(row), file=sys.stderr)
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/eval_suite.json", "w") as f:
        json.dump(rows, f, indent=1)
    return rows


def main():
    from yourmt3_tpu.utils.jax_setup import setup_jax
    setup_jax()

    if "--eval-suite" in sys.argv:
        max_tracks = None
        for a in sys.argv[1:]:
            if a.startswith("--max-tracks="):
                max_tracks = int(a.split("=", 1)[1])
        rows = bench_eval_suite(max_tracks=max_tracks)
        print(json.dumps(rows))
        return

    ckpt = None
    early_exit = False
    regime = False
    tbatch = 16
    density = 3.0
    extra = {}
    for a in sys.argv[1:]:
        if a.startswith("--transcribe-ckpt="):
            ckpt = a.split("=", 1)[1]
        elif a == "--early-exit":
            early_exit = True
        elif a == "--early-exit-regime":
            regime = True
        elif a.startswith("--transcribe-batch="):
            tbatch = int(a.split("=", 1)[1])
        elif a.startswith("--song-density="):
            density = float(a.split("=", 1)[1])
        elif a.startswith("--weight-quant="):
            extra["weight_quant"] = a.split("=", 1)[1]
        elif a.startswith("--kv-quant="):
            extra["kv_quant"] = a.split("=", 1)[1]
        elif a.startswith("--kv-heads="):
            # decoder GQA/MQA probe: shared K/V heads (config/model.py)
            extra["decoder_kv_heads"] = int(a.split("=", 1)[1])
    if ckpt:
        if regime:
            rows = bench_early_exit_regime(ckpt, batch_size=tbatch)
            print(json.dumps(rows))
            return
        row = bench_transcribe_path(ckpt, batch_size=tbatch,
                                    early_exit=early_exit, density=density,
                                    extra_overrides=extra)
        print(json.dumps(row))
        return

    matrix_mode = "--matrix" in sys.argv
    model_preset = "perceiver_tf_mc13"
    task = "mc13_full_plus_256"
    batch = None  # default: the tuned batch from decode_tuning.json, else 16
    loop_ov = {}  # --phases/--unroll: override the tuned loop schedule
    for a in sys.argv[1:]:
        if a.startswith("--model="):
            model_preset = a.split("=", 1)[1]
        elif a.startswith("--task="):
            task = a.split("=", 1)[1]
        elif a.startswith("--batch="):
            batch = int(a.split("=", 1)[1])
        elif a.startswith("--phases="):
            loop_ov["phases"] = int(a.split("=", 1)[1])
        elif a.startswith("--unroll="):
            loop_ov["unroll"] = int(a.split("=", 1)[1])
    if batch is None:
        # decode throughput is stream-parallel: the batch-size sweep
        # (scripts/bench_batch_sweep.py) measures the per-chip optimum and
        # promotes it here; worst-case semantics (EOS banned, full L) are
        # unchanged and p50 single-segment latency is still reported.
        batch = load_decode_tuning().get(f"{model_preset}/{task}", {}).get(
            "batch", 16)

    if matrix_mode:
        rows = [
            # BASELINE config 1: t5_small, single segment
            bench_config("t5_small", "mt3_full_plus", 1, extra_overrides=extra),
            # throughput-shape t5_small (round-1 headline shape)
            bench_config("t5_small", "mt3_full_plus", 16, extra_overrides=extra),
            # BASELINE config 2: t5_base, batch-64 chunked full song
            bench_config("t5_base", "mt3_full_plus", 64, extra_overrides=extra),
            # BASELINE config 4: drum-vocab decode path
            bench_config("t5_small", "drums_only", 16, extra_overrides=extra),
            # MoE-FF flagship variant (YourMT3+ named feature, SURVEY C22)
            bench_config("perceiver_tf_mc13_moe", "mc13_full_plus_256", 16,
                         extra_overrides=extra),
            # BASELINE config 3 (flagship/headline)
            bench_config("perceiver_tf_mc13", "mc13_full_plus_256", 16,
                         extra_overrides=extra),
        ]
        with open("BENCH_MATRIX.json", "w") as f:
            json.dump(rows, f, indent=1)
        for r in rows:
            print(json.dumps(r), file=sys.stderr)
        head = rows[-1]
    else:
        head = bench_config(model_preset, task, batch, extra_overrides=extra,
                            loop_overrides=loop_ov)

    print(json.dumps({
        "metric": (f"full_song_transcription_throughput"
                   f"[{head['config']},B={head['batch']},"
                   f"L={head['max_length']},worst_case]"),
        "value": head["audio_s_per_s_per_chip"],
        "unit": "audio_seconds_per_second_per_chip",
        "vs_baseline": head["vs_baseline"],
        "p50_latency_ms": head["p50_segment_latency_ms"],
    }))


if __name__ == "__main__":
    main()
