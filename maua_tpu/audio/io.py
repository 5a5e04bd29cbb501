"""Host-side audio IO: decoding, caching, butterworth filtering.

Rebuild of `audioreactive/audio.py` (load_audio :15-48, butterworth
low/high/band-pass :96-111) and the disk-cache decorator
(`audioreactive/__init__.py:9-28`). Decoding uses scipy for wav and
the ffmpeg binary when present (no torchaudio/librosa in this stack);
anything else raises with a clear message.
"""

from __future__ import annotations

import functools
import os
import shutil
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from ..utility import WORKSPACE, content_hash


def _ensure_dir(p: str):
    os.makedirs(p, exist_ok=True)
    return p


def cache_to_workspace(name: str):
    """Disk-cache a feature function keyed on argument content
    (`audioreactive/__init__.py:9-28`)."""

    def decorator(fn):
        @functools.wraps(fn)
        def wrapper(*args, cache: bool = True, **kwargs):
            if not cache:
                return fn(*args, **kwargs)
            key = content_hash(name, *[a for a in args if isinstance(a, (int, float, str, bool, np.ndarray))],
                               *[f"{k}={v}" for k, v in sorted(kwargs.items()) if isinstance(v, (int, float, str, bool))])
            cache_dir = _ensure_dir(os.path.join(WORKSPACE, "feature_cache"))
            path = os.path.join(cache_dir, f"{name}_{key}.npz")
            if os.path.exists(path):
                with np.load(path, allow_pickle=True) as z:
                    vals = [z[f"arr_{i}"] for i in range(len(z.files))]
                return vals[0] if len(vals) == 1 else tuple(vals)
            out = fn(*args, **kwargs)
            vals = out if isinstance(out, tuple) else (out,)
            np.savez(path, *[np.asarray(v) for v in vals])
            return out

        return wrapper

    return decorator


def _decode_ffmpeg(path: str, sr: Optional[int], offset: float, duration: float) -> Tuple[np.ndarray, int]:
    target_sr = sr or 22050
    cmd = ["ffmpeg", "-v", "quiet"]
    if offset:
        cmd += ["-ss", str(offset)]
    cmd += ["-i", path]
    if duration > 0:
        cmd += ["-t", str(duration)]
    cmd += ["-f", "f32le", "-ac", "1", "-ar", str(target_sr), "-"]
    raw = subprocess.run(cmd, capture_output=True, check=True).stdout
    return np.frombuffer(raw, np.float32).copy(), target_sr


def load_audio(
    audio_file: str, offset: float = 0.0, duration: float = -1.0, sr: Optional[int] = None, cache: bool = True
) -> Tuple[np.ndarray, int, float]:
    """Load an audio file -> (mono float32 signal, sr, duration)
    (`audioreactive/audio.py:15-48`). Caches decoded audio to the
    workspace like the reference."""
    cache_dir = _ensure_dir(os.path.join(WORKSPACE, "audio_cache"))
    stem = Path(audio_file.replace("/", "_")).stem
    cache_file = os.path.join(
        cache_dir,
        stem
        + ("" if duration == -1 else f"_length{duration}")
        + ("" if offset == 0 else f"_start{offset}")
        + ("" if sr is None else f"_sr{sr}")
        + ".npz",
    )
    if cache and os.path.exists(cache_file):
        with np.load(cache_file) as z:
            audio, srate = z["audio"], int(z["sr"])
        return audio, srate, len(audio) / srate

    ext = Path(audio_file).suffix.lower()
    if ext == ".wav":
        from scipy.io import wavfile

        srate, data = wavfile.read(audio_file)
        if data.dtype.kind == "i":
            data = data.astype(np.float32) / np.iinfo(data.dtype).max
        elif data.dtype.kind == "u":
            data = (data.astype(np.float32) - 128.0) / 128.0
        else:
            data = data.astype(np.float32)
        if data.ndim == 2:
            data = data.mean(axis=1)
        if offset:
            data = data[int(offset * srate):]
        if duration > 0:
            data = data[: int(duration * srate)]
        audio = np.ascontiguousarray(data, np.float32)
    elif shutil.which("ffmpeg"):
        audio, srate = _decode_ffmpeg(audio_file, sr, offset, duration)
    else:
        raise RuntimeError(
            f"cannot decode {audio_file}: only .wav is supported without an ffmpeg binary on PATH"
        )

    if cache:
        np.savez(cache_file, audio=audio, sr=srate)
    return audio, srate, len(audio) / srate


def _butter(audio: np.ndarray, sr: int, kind: str, freqs, db_per_octave: int = 12) -> np.ndarray:
    from scipy import signal as ss

    sos = ss.butter(db_per_octave, freqs, kind, fs=sr, output="sos")
    return ss.sosfilt(sos, audio).astype(np.float32)


def low_pass(audio, sr, fmax: float = 200.0, db_per_octave: int = 12):
    """(`audioreactive/audio.py:96-99`)"""
    return _butter(np.asarray(audio), sr, "low", fmax, db_per_octave)


def high_pass(audio, sr, fmin: float = 3000.0, db_per_octave: int = 12):
    """(`audioreactive/audio.py:102-105`)"""
    return _butter(np.asarray(audio), sr, "high", fmin, db_per_octave)


def band_pass(audio, sr, fmin: float = 200.0, fmax: float = 3000.0, db_per_octave: int = 12):
    """(`audioreactive/audio.py:108-111`)"""
    return _butter(np.asarray(audio), sr, "band", [fmin, fmax], db_per_octave)
