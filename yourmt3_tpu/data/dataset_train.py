"""Training dataset: weighted multi-dataset segment sampler → batches.

Capability parity target: reference `utils/datasets_train.py`
(SURVEY.md C14): pick (file, offset) from index, load audio crop + notes
slice, apply stem submix, tokenize per segment; collate to
(B, input_frames) audio + (B, C, L) token ids. The reference uses torch
DataLoader workers; here a thread prefetcher feeds numpy batches (JAX
consumes host numpy directly; on 1 process the GIL-free I/O is in numpy/
C++ audio decode).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..config.audio import AudioConfig, DEFAULT_AUDIO
from ..tokens.dataclasses import Note


def dataclasses_replace_pitch(n: Note, semitones: int) -> Note:
    """Pitched notes transpose; drums are unaffected by pitch shift."""
    if n.is_drum:
        return n
    return Note(n.is_drum, n.program, n.onset, n.offset,
                n.pitch + semitones, n.velocity)
from ..tokens.task_manager import TaskManager
from .audio_io import load_audio_file
from .augment import audio_random_submix
from .indexes import load_file_list, load_notes


class _TrackCache:
    """Small LRU of decoded track audio (host RAM)."""

    def __init__(self, capacity: int = 8):
        self.capacity = capacity
        self._d: Dict[str, np.ndarray] = {}
        self._order: List[str] = []
        self._lock = threading.Lock()

    def get(self, path: str, sample_rate: int) -> np.ndarray:
        with self._lock:
            if path in self._d:
                self._order.remove(path)
                self._order.append(path)
                return self._d[path]
        audio, _ = load_audio_file(path, sample_rate)
        with self._lock:
            self._d[path] = audio
            self._order.append(path)
            while len(self._order) > self.capacity:
                self._d.pop(self._order.pop(0), None)
        return audio


class TrainDataset:
    """One (possibly weighted multi-)dataset segment sampler."""

    def __init__(
        self,
        file_lists: Sequence[str],  # index JSON paths
        task_manager: TaskManager,
        audio_cfg: AudioConfig = DEFAULT_AUDIO,
        weights: Optional[Sequence[float]] = None,
        stem_submix: bool = True,
        pitch_shift_semitones: Sequence[int] = (),  # e.g. (-2,-1,0,1,2)
        align_crops: bool = False,  # crop starts on the segment grid
        seed: int = 0,
        cache_tracks: int = 8,
    ):
        self.tm = task_manager
        self.ac = audio_cfg
        self.rng = np.random.default_rng(seed)
        self.stem_submix = stem_submix
        self.pitch_shift_semitones = tuple(pitch_shift_semitones)
        self.align_crops = align_crops
        self.cache = _TrackCache(cache_tracks)
        self.datasets = [load_file_list(p) for p in file_lists]
        w = np.asarray(weights if weights is not None
                       else [1.0] * len(self.datasets), np.float64)
        self.weights = w / w.sum()
        self._notes_cache: Dict[str, List[Note]] = {}

    # ------------------------------------------------------------------
    def _load_track_notes(self, path: str) -> List[Note]:
        if path not in self._notes_cache:
            if len(self._notes_cache) > 256:
                self._notes_cache.clear()
            self._notes_cache[path] = load_notes(path)
        return self._notes_cache[path]

    def sample_segment(self) -> Tuple[np.ndarray, np.ndarray, int]:
        """→ (audio (input_frames,) f32, labels (C, L) i32, pitch_shift_idx).

        When pitch-shift augmentation is on, labels carry the SHIFTED
        pitches and the returned index selects the matching on-device
        audio shift (ops/pitchshift.batched_pitch_shift) — reference
        pitchshift_layer semantics (SURVEY.md C18) split host/device."""
        ds = self.datasets[int(self.rng.choice(len(self.datasets),
                                               p=self.weights))]
        track = ds["tracks"][int(self.rng.integers(0, len(ds["tracks"])))]
        sr = self.ac.sample_rate
        seg_len = self.ac.input_frames

        use_stems = (self.stem_submix and track.get("stem_files"))
        if use_stems:
            names = list(track["stem_files"].keys())
            stems_audio = [self.cache.get(track["stem_files"][n], sr)
                           for n in names]
            stems_notes = [self._load_track_notes(track["stem_notes"][n])
                           for n in names]
            audio, notes = audio_random_submix(stems_audio, stems_notes,
                                               self.rng)
        else:
            audio = self.cache.get(track["audio_file"], sr)
            notes = self._load_track_notes(track["notes_file"])

        if len(audio) <= seg_len:
            start = 0
            crop = np.zeros(seg_len, np.float32)
            crop[: len(audio)] = audio
        else:
            if self.align_crops:
                n_seg = max(1, (len(audio) - 1) // seg_len)
                start = int(self.rng.integers(0, n_seg)) * seg_len
            else:
                start = int(self.rng.integers(0, len(audio) - seg_len))
            crop = np.zeros(seg_len, np.float32)
            avail = audio[start: start + seg_len]
            crop[: len(avail)] = avail
        t0 = start / sr
        shift_idx = 0
        if self.pitch_shift_semitones:
            shift_idx = int(self.rng.integers(0, len(self.pitch_shift_semitones)))
            s = self.pitch_shift_semitones[shift_idx]
            if s:
                notes = [dataclasses_replace_pitch(n, s) for n in notes]
                notes = [n for n in notes if 0 <= n.pitch <= 127]
        labels = self.tm.tokenize_segment(notes, t0)  # (C, L)
        return crop, labels, shift_idx

    def batches(self, batch_size: int, prefetch: int = 2
                ) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite prefetched batch iterator."""

        def make_batch() -> Dict[str, np.ndarray]:
            audio = np.empty((batch_size, self.ac.input_frames), np.float32)
            labels = np.empty((batch_size, self.tm.num_decoding_channels,
                               self.tm.max_token_length), np.int32)
            shifts = np.zeros(batch_size, np.int32)
            for i in range(batch_size):
                a, l, s = self.sample_segment()
                audio[i], labels[i], shifts[i] = a, l, s
            batch = {"audio": audio, "labels": labels}
            if self.pitch_shift_semitones:
                batch["pitch_shift_idx"] = shifts
            return batch

        q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                try:
                    q.put(make_batch(), timeout=1.0)
                except queue.Full:
                    continue

        th = threading.Thread(target=worker, daemon=True)
        th.start()
        try:
            while True:
                yield q.get()
        finally:
            stop.set()
