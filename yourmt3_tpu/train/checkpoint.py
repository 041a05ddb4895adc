"""Checkpoint save/restore via Orbax (SURVEY.md §5.4).

Capability parity target: reference Lightning `ModelCheckpoint` (top-k +
last, full optimizer state, resume) — here: Orbax checkpointing with
atomic writes (preemption-safe, v5e preemptions are routine), metadata
sidecar carrying preset/task names so `api.load_checkpoint(path)` can
rebuild the exact bundle.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

META_NAME = "ymt3_meta.json"


def save_bundle(path: str, bundle, step: int = 0,
                opt_state: Optional[Any] = None) -> None:
    """Write params (+ optional optimizer state) and bundle metadata."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    # persist ONLY the master params: derived collections (weight_quant's
    # "qweights" side-car) are rebuilt from them at restore time
    ckptr.save(os.path.join(path, "params"),
               {"params": bundle.params["params"]}, force=True)
    if opt_state is not None:
        ckptr.save(os.path.join(path, "opt_state"), opt_state, force=True)
    ckptr.wait_until_finished()
    meta = {
        "model_preset": bundle.cfg.name,
        "task": bundle.task_manager.task.name,
        "step": int(step),
        # FULL audio config: a non-default frontend (f_min/f_max/power/
        # log_offset/mel options...) must restore exactly (ADVICE r1)
        "audio": dataclasses.asdict(bundle.audio_cfg),
        # FULL model config: a preset NAME alone loses training-time dim
        # overrides (e.g. init_model(..., d_model=256)) and the restore
        # target then mismatches the on-disk param tree
        "model": dataclasses.asdict(bundle.cfg),
    }
    with open(os.path.join(path, META_NAME), "w") as f:
        json.dump(meta, f, indent=2)


def restore_bundle(path: str, model_preset: Optional[str] = None,
                   task: Optional[str] = None, audio_cfg=None,
                   **cfg_overrides):
    """cfg_overrides: inference-time ModelConfig fields (e.g.
    use_pallas_decode / kv_quant decode paths) — they never change the
    param tree, so the restored weights apply unchanged."""
    from ..api import init_model
    from ..config.audio import AudioConfig
    path = os.path.abspath(path)
    meta_path = os.path.join(path, META_NAME)
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    preset = model_preset or meta.get("model_preset", "t5_small")
    task = task or meta.get("task", "mt3_full_plus")
    if audio_cfg is None:
        a = meta.get("audio", {})
        audio_cfg = AudioConfig(**a) if a else AudioConfig()
    model_cfg = None
    if model_preset is None and meta.get("model"):
        # full serialized ModelConfig (newer checkpoints): reconstructing
        # from it preserves training-time dim overrides the preset name
        # alone would lose. Ignore unknown keys so configs written by a
        # newer code version still load.
        from ..config.model import ModelConfig
        known = {f.name for f in dataclasses.fields(ModelConfig)}
        kw = {k: v for k, v in meta["model"].items() if k in known}
        # Back-compat: checkpoints written before encoder_abs_pos existed
        # were trained WITHOUT the absolute sinusoid the new default adds
        # to the Perceiver-TF forward — restoring them under the new
        # default would silently change their forward pass. Missing key =
        # old behavior ("none"); the fix applies only to configs that
        # recorded it.
        if (kw.get("encoder_type") == "perceiver-tf"
                and "encoder_abs_pos" not in meta["model"]):
            kw["encoder_abs_pos"] = "none"
            print("note: pre-encoder_abs_pos checkpoint — restoring with "
                  "encoder_abs_pos='none' to match its training forward")
        if (kw.get("encoder_type") == "conformer"
                and kw.get("encoder_abs_pos") == "sinusoidal"):
            # Conformer checkpoints written in the window between the
            # per-block-injection commit and the config gate record
            # 'sinusoidal' meta but were TRAINED with per-block injection;
            # restoring input-only silently changes their forward (ADVICE
            # r4). The meta alone cannot distinguish the two trainings, so
            # warn instead of remapping.
            print("warning: conformer checkpoint with "
                  "encoder_abs_pos='sinusoidal' — if it was trained in the "
                  "pre-gate window (per-block injection), restore with "
                  "model_cfg.replace(encoder_abs_pos='sinusoidal_per_block')"
                  " to match its training forward")
        model_cfg = ModelConfig(**kw)
    bundle = init_model(preset, task, audio_cfg, model_cfg=model_cfg,
                        **cfg_overrides)
    ckptr = ocp.StandardCheckpointer()
    # restore target = the "params" collection only: derived collections
    # (e.g. the weight_quant "qweights" side-car) are never checkpointed
    target = jax.tree_util.tree_map(
        np.asarray, {"params": bundle.params["params"]})
    restored = ckptr.restore(os.path.join(path, "params"), target)
    # device-resident params: orbax hands back host numpy arrays, and a
    # numpy param tree is re-uploaded host→device on EVERY jitted call
    # (measured ~0.5 s/call for a 15 M-param model on this host — it
    # silently dominated the transcribe path)
    bundle.params = jax.tree_util.tree_map(jnp.asarray, restored)
    if bundle.cfg.weight_quant != "none":
        # rebuild the derived quantized weights from the RESTORED params
        bundle.with_decode_overrides()
    return bundle


def restore_opt_state(path: str, target) -> Any:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.join(os.path.abspath(path), "opt_state"), target)
