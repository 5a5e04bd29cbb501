"""Realtime viewer: latent random-walk synthesis streamed to a window.

Rebuild of `maua/audiovisual/render/gpu2gl.py` (zero-copy CUDA-GL
blit :17-104 + latent random-walk RealtimeModule :107-162). TPUs have
no GL interop, so the TPU-native design keeps the random walk and
synthesis fully on device (one jitted step) and streams frames to the
host over an async device->host queue into a cv2 window (or any frame
callback).
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp


class RealtimeModule:
    """Smooth latent random walk -> frames (`gpu2gl.py:107-162`)."""

    def __init__(self, synthesizer: Callable, num_ws: int, w_dim: int, momentum: float = 0.95,
                 step_size: float = 0.05, key=None):
        self.synthesizer = synthesizer
        self.key = key if key is not None else jax.random.PRNGKey(0)
        self.key, sub = jax.random.split(self.key)
        self.w = jax.random.normal(sub, (1, num_ws, w_dim))
        self.v = jnp.zeros_like(self.w)
        self.momentum = momentum
        self.step_size = step_size

        def _step(w, v, key):
            noise = jax.random.normal(key, w.shape)
            v = momentum * v + (1 - momentum) * noise
            w = w + step_size * v
            img = synthesizer(w)
            img8 = jnp.clip((img + 1.0) * 127.5, 0, 255).astype(jnp.uint8)
            return w, v, img8

        self._step = jax.jit(_step)
        self._pending = None

    def _dispatch(self):
        self.key, sub = jax.random.split(self.key)
        self.w, self.v, img = self._step(self.w, self.v, sub)
        from ..ops.video import presplit, submit_fetches

        return submit_fetches(presplit(img[0]))

    def frame(self) -> np.ndarray:
        """One-frame-latency double buffering: frame N+1 synthesizes
        while N transfers over parallel fetch streams — the
        device->host link, not synthesis, bounds realtime fps
        (PERFORMANCE.md)."""
        from ..ops.video import gather_fetches

        if self._pending is None:
            self._pending = self._dispatch()
        prev, self._pending = self._pending, self._dispatch()
        return gather_fetches(prev)


def run_realtime(
    synthesizer: Callable,
    num_ws: int,
    w_dim: int,
    frame_callback: Optional[Callable] = None,
    max_frames: Optional[int] = None,
    window_name: str = "maua-tpu",
    target_fps: float = 30.0,
):
    """Viewer loop: device render thread fills a frame queue; the host
    thread displays (cv2) or forwards to `frame_callback`."""
    module = RealtimeModule(synthesizer, num_ws, w_dim)
    q: "queue.Queue[Optional[np.ndarray]]" = queue.Queue(maxsize=4)
    stop = threading.Event()

    def producer():
        n = 0
        while not stop.is_set() and (max_frames is None or n < max_frames):
            q.put(module.frame())
            n += 1
        q.put(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()

    use_cv2 = frame_callback is None
    if use_cv2:
        import cv2

    interval = 1.0 / target_fps
    try:
        while True:
            frame = q.get()
            if frame is None:
                break
            if use_cv2:
                cv2.imshow(window_name, cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
                if cv2.waitKey(max(int(interval * 1000), 1)) & 0xFF == ord("q"):
                    break
            else:
                frame_callback(frame)
                time.sleep(interval)
    finally:
        stop.set()
        try:
            while q.get_nowait() is not None:
                pass
        except queue.Empty:
            pass
        if use_cv2:
            import cv2

            cv2.destroyAllWindows()
