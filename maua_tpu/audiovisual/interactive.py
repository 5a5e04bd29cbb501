"""Interactive segmentation-driven patch evolution REPL.

Rebuild of `maua/audiovisual/interactive.py:24-350`: segment the
track, give each section a random Patch, then evolve sections with
REPL commands (more/less intense, re-randomize style/motion, copy
between sections) with EMA crossfades between section boundaries
(`EMAFade` :114+).
"""

from __future__ import annotations

import copy
from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.signal import gaussian_filter
from .selfsupervised.mir import retrieve_music_information
from .selfsupervised.patch import Patch


class EMAFade:
    """Exponential crossfade between per-section sequences
    (`interactive.py:114+`)."""

    def __init__(self, decay: float = 0.9):
        self.decay = decay
        self.state = None

    def __call__(self, value: jax.Array) -> jax.Array:
        if self.state is None or self.state.shape != value.shape:
            self.state = value
        self.state = self.decay * self.state + (1 - self.decay) * value
        return self.state


class InteractiveSession:
    """Command-driven per-section patch evolution
    (`interactive.py:24-350`)."""

    COMMANDS = ("more", "less", "style", "motion", "copy", "show", "render", "quit")

    def __init__(self, audio, sr, n_sections: int = 5, fps: float = 24, seed: int = 0):
        self.fps = fps
        self.features, self.segmentations, self.tempo = retrieve_music_information(audio, sr)
        length = next(iter(self.features.values())).shape[0]
        # section boundaries from the coarsest segmentation
        key = next(k for k in self.segmentations if k[1] == min(kk for (_, kk) in self.segmentations))
        labels = np.asarray(self.segmentations[key])
        bounds = [0] + list(1 + np.flatnonzero(labels[:-1] != labels[1:])) + [length]
        self.sections = list(zip(bounds[:-1], bounds[1:]))[:n_sections] or [(0, length)]
        self.patches: List[Patch] = [
            Patch(self.features, self.segmentations, self.tempo, fps=fps, seed=seed + i)
            for i in range(len(self.sections))
        ]
        self.fade = EMAFade()

    def apply(self, command: str, section: int = 0) -> str:
        """Apply one evolution command to a section's patch."""
        p = self.patches[section]
        if command == "more":
            p.update_intensity(1.5)
            return f"section {section}: more intense"
        if command == "less":
            p.update_intensity(0.4)
            return f"section {section}: less intense"
        if command == "style":
            p.randomize_latent_patches()
            return f"section {section}: new style mapping"
        if command == "motion":
            p.randomize_noise_patches()
            return f"section {section}: new motion mapping"
        if command.startswith("copy"):
            src = int(command.split()[-1]) if " " in command else (section + 1) % len(self.patches)
            self.patches[section] = copy.deepcopy(self.patches[src])
            return f"section {section}: copied from {src}"
        if command == "show":
            return repr(p)
        return f"unknown command; options: {self.COMMANDS}"

    def realize(self, latent_palette: jax.Array, noise_sizes=None) -> jax.Array:
        """Concatenate per-section latent sequences with EMA-smoothed
        section crossfades; returns (T, L, D)."""
        pieces = []
        for (lo, hi), p in zip(self.sections, self.patches):
            lats, _ = p(latent_palette, noise_sizes=noise_sizes or [4])
            pieces.append(lats[lo:hi])
        seq = jnp.concatenate(pieces, axis=0)
        return gaussian_filter(seq, 2.0, causal=0.0)

    def repl(self, input_fn=input, print_fn=print):
        """Blocking REPL loop (`interactive.py` main loop)."""
        print_fn(f"{len(self.sections)} sections; commands: {self.COMMANDS} (e.g. 'more 2')")
        while True:
            try:
                line = input_fn("> ").strip()
            except (EOFError, KeyboardInterrupt):
                break
            if not line:
                continue
            parts = line.split()
            cmd = parts[0]
            if cmd == "quit":
                break
            section = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else 0
            print_fn(self.apply(cmd if cmd != "copy" else line, section))
