"""Frequency/unit conversions and filterbank construction.

Rebuild of `rosa/convert.py` (power_to_db :7-12, hz_to_mel :15-41,
mel_to_hz :44-66, cq_to_chroma :69-126, hz_to_octs/midi :129-136)
using librosa's (Slaney-style) algorithm definitions. Filterbanks are
built in numpy (host, trace-time constants); conversions are jittable.
"""

from __future__ import annotations

import math
import re
from typing import Optional

import jax.numpy as jnp
import numpy as np


def power_to_db(magnitude, ref_value=1.0, amin=1e-10, top_db: Optional[float] = 80.0):
    """(`rosa/convert.py:7-12`)"""
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, magnitude))
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(amin, ref_value))
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, log_spec.max() - top_db)
    return log_spec


def amplitude_to_db(magnitude, ref_value=1.0, amin=1e-5, top_db: Optional[float] = 80.0):
    return power_to_db(jnp.square(magnitude), ref_value=ref_value**2, amin=amin**2, top_db=top_db)


def db_to_power(db):
    return jnp.power(10.0, 0.1 * db)


_MIN_LOG_HZ = 1000.0
_F_SP = 200.0 / 3
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = math.log(6.4) / 27.0


def hz_to_mel(frequencies, htk: bool = False):
    """(`rosa/convert.py:15-41`)"""
    f = jnp.asarray(frequencies, jnp.float32)
    if htk:
        return 2595.0 * jnp.log10(1.0 + f / 700.0)
    linear = f / _F_SP
    logpart = _MIN_LOG_MEL + jnp.log(jnp.maximum(f, 1e-10) / _MIN_LOG_HZ) / _LOGSTEP
    return jnp.where(f >= _MIN_LOG_HZ, logpart, linear)


def mel_to_hz(mels, htk: bool = False):
    """(`rosa/convert.py:44-66`)"""
    m = jnp.asarray(mels, jnp.float32)
    if htk:
        return 700.0 * (jnp.power(10.0, m / 2595.0) - 1.0)
    linear = _F_SP * m
    logpart = _MIN_LOG_HZ * jnp.exp(_LOGSTEP * (m - _MIN_LOG_MEL))
    return jnp.where(m >= _MIN_LOG_MEL, logpart, linear)


def _hz_to_mel_np(f, htk=False):
    f = np.asarray(f, np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    linear = f / _F_SP
    logpart = _MIN_LOG_MEL + np.log(np.maximum(f, 1e-10) / _MIN_LOG_HZ) / _LOGSTEP
    return np.where(f >= _MIN_LOG_HZ, logpart, linear)


def _mel_to_hz_np(m, htk=False):
    m = np.asarray(m, np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    linear = _F_SP * m
    logpart = _MIN_LOG_HZ * np.exp(_LOGSTEP * (m - _MIN_LOG_MEL))
    return np.where(m >= _MIN_LOG_MEL, logpart, linear)


def mel_frequencies(n_mels: int = 128, fmin: float = 0.0, fmax: float = 11025.0, htk: bool = False):
    """Host-side (numpy) mel band centers — safe to call at trace time."""
    mels = np.linspace(float(_hz_to_mel_np(fmin, htk)), float(_hz_to_mel_np(fmax, htk)), n_mels)
    return _mel_to_hz_np(mels, htk)


def hz_to_octs(frequencies, tuning: float = 0.0, bins_per_octave: int = 12):
    """(`rosa/convert.py:129-131`)"""
    A440 = 440.0 * 2.0 ** (tuning / bins_per_octave)
    return jnp.log2(jnp.asarray(frequencies) / (A440 / 16.0))


def hz_to_midi(frequencies):
    return 12.0 * (np.log2(np.asarray(frequencies, np.float64)) - np.log2(440.0)) + 69.0


def midi_to_hz(notes):
    return 440.0 * 2.0 ** ((np.asarray(notes, np.float64) - 69.0) / 12.0)


_NOTE_MAP = {"C": 0, "D": 2, "E": 4, "F": 5, "G": 7, "A": 9, "B": 11}


def note_to_midi(note: str) -> float:
    """Parse notes like 'C1', 'A#4', 'Db3' (librosa convention:
    octave -1 starts at midi 0)."""
    m = re.match(r"^([A-Ga-g])([#b♯♭!]*)(-?\d+)?$", note)
    if not m:
        raise ValueError(f"bad note {note!r}")
    pitch = _NOTE_MAP[m.group(1).upper()]
    for acc in m.group(2):
        pitch += 1 if acc in "#♯" else -1
    octave = int(m.group(3)) if m.group(3) is not None else 0
    return 12 * (octave + 1) + pitch


def note_to_hz(note: str) -> float:
    """(`rosa/convert.py:135-136`) e.g. note_to_hz('C1') = 32.70"""
    return float(midi_to_hz(note_to_midi(note)))


def fft_frequencies(sr: float, n_fft: int) -> np.ndarray:
    return np.linspace(0, sr / 2, 1 + n_fft // 2)


def cqt_frequencies(n_bins: int, fmin: float, bins_per_octave: int = 12, tuning: float = 0.0) -> np.ndarray:
    correction = 2.0 ** (tuning / bins_per_octave)
    return correction * fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)


def tempo_frequencies(n_bins: int, hop_length: int = 512, sr: float = 22050) -> np.ndarray:
    """BPM of each autocorrelation lag (librosa.tempo_frequencies)."""
    bin_frequencies = np.zeros(n_bins)
    bin_frequencies[0] = np.inf
    bin_frequencies[1:] = 60.0 * sr / (hop_length * np.arange(1.0, n_bins))
    return bin_frequencies


def fourier_tempo_frequencies(sr: float = 22050, win_length: int = 384, hop_length: int = 512) -> np.ndarray:
    return fft_frequencies(sr=sr * 60 / hop_length, n_fft=win_length)


# --------------------------------------------------------- filterbanks
def mel_filterbank(
    sr: float, n_fft: int, n_mels: int = 128, fmin: float = 0.0, fmax: Optional[float] = None, htk: bool = False
) -> np.ndarray:
    """Slaney mel filterbank (n_mels, 1 + n_fft//2)
    (`rosa/spectral.py:84-110`)."""
    if fmax is None:
        fmax = sr / 2.0
    fftfreqs = fft_frequencies(sr, n_fft)
    mel_f = np.asarray(mel_frequencies(n_mels + 2, fmin, fmax, htk))
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2:] - mel_f[:-2])
    return (weights * enorm[:, None]).astype(np.float32)


def chroma_filterbank(
    sr: float,
    n_fft: int,
    n_chroma: int = 12,
    tuning: float = 0.0,
    ctroct: float = 5.0,
    octwidth: float = 2.0,
    base_c: bool = True,
) -> np.ndarray:
    """STFT-bin -> chroma projection (librosa.filters.chroma)."""
    wts = np.zeros((n_chroma, n_fft))
    frequencies = np.linspace(0, sr, n_fft, endpoint=False)[1:]
    frqbins = n_chroma * np.asarray(hz_to_octs(frequencies, tuning=tuning, bins_per_octave=n_chroma))
    frqbins = np.concatenate(([frqbins[0] - 1.5 * n_chroma], frqbins))
    binwidthbins = np.concatenate((np.maximum(frqbins[1:] - frqbins[:-1], 1.0), [1]))
    D = np.subtract.outer(frqbins, np.arange(0, n_chroma, dtype="d")).T
    n_chroma2 = np.round(float(n_chroma) / 2)
    D = np.remainder(D + n_chroma2 + 10 * n_chroma, n_chroma) - n_chroma2
    wts = np.exp(-0.5 * (2 * D / np.tile(binwidthbins, (n_chroma, 1))) ** 2)
    wts /= np.sqrt(np.sum(wts**2, axis=0, keepdims=True))
    if octwidth is not None:
        wts *= np.tile(np.exp(-0.5 * (((frqbins / n_chroma - ctroct) / octwidth) ** 2)), (n_chroma, 1))
    if base_c:
        wts = np.roll(wts, -3 * (n_chroma // 12), axis=0)
    return np.ascontiguousarray(wts[:, : int(1 + n_fft / 2)], dtype=np.float32)


def cq_to_chroma(
    n_input: int,
    bins_per_octave: int = 12,
    n_chroma: int = 12,
    fmin: Optional[float] = None,
    base_c: bool = True,
) -> np.ndarray:
    """CQT-bin -> chroma aggregation matrix (`rosa/convert.py:69-126`)."""
    n_merge = float(bins_per_octave) / n_chroma
    if fmin is None:
        fmin = note_to_hz("C1")
    cq_to_ch = np.repeat(np.eye(n_chroma), int(round(n_merge)), axis=1)
    cq_to_ch = np.roll(cq_to_ch, -int(n_merge // 2), axis=1)
    n_octaves = int(np.ceil(float(n_input) / bins_per_octave))
    cq_to_ch = np.tile(cq_to_ch, (1, n_octaves))[:, :n_input]
    midi_0 = hz_to_midi(fmin) % 12
    roll = midi_0 if base_c else midi_0 - 9
    roll = int(np.round(roll * (n_chroma / 12.0)))
    return np.roll(cq_to_ch, roll, axis=0).astype(np.float32)
