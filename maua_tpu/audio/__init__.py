"""Differentiable MIR in JAX — the rebuild of the reference's
"rosa" GPU-librosa (`maua/audiovisual/audioreactive/selfsupervised/
features/rosa/*`, SURVEY.md section 2.5) plus the high-level
audioreactive feature wrappers (`audioreactive/mir.py`, `audio.py`).

All features are jittable functions over fixed-shape signals; the
host-side pieces (file decode, caching) live in `io.py`.
"""

from .convert import hz_to_mel, mel_to_hz, power_to_db, amplitude_to_db, note_to_hz  # noqa: F401
from .spectral import (  # noqa: F401
    stft,
    istft,
    dct,
    spectrogram,
    melspectrogram,
    mel_filterbank,
    magphase,
    softmask,
    hpss,
    rms,
    mfcc,
    spectral_contrast,
    spectral_flatness,
)
