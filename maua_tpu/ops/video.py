"""Threaded video encoding: ffmpeg raw-RGB pipe with audio muxing,
cv2 fallback, plus whole-video helpers.

Rebuild of `maua/ops/video.py` (WriteWorker :15-104, VideoWriter
:107-129, write_video :131-155): a producer queue feeds a writer
thread that pipes raw frames into an ffmpeg subprocess — the process
boundary stays identical; the producer side is fed by device->host
copies from the render loop.
"""

from __future__ import annotations

import os
import queue
import shutil
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def rgb_to_yuv420(rgb):
    """On-device RGB -> planar I420: (B, H, W, 3) uint8 -> (B, 3H/2, W)
    uint8 (BT.601 limited range, 2x2 mean chroma subsampling) — the
    exact byte layout ffmpeg reads as ``-pix_fmt yuv420p`` rawvideo.

    TPU-first replacement for letting ffmpeg's swscale convert rgb24 on
    the host (`maua/ops/video.py:42-77` pipes rgb24): converting on
    device halves device->host transfer bytes (1.5 vs 3 per pixel) —
    the end-to-end bottleneck — and removes the host-side colorspace
    pass from the encoder."""
    import jax.numpy as jnp

    B, H, W, _ = rgb.shape
    if H % 2 or W % 2:
        raise ValueError(f"yuv420p needs even frame dimensions, got {H}x{W}")
    x = rgb.astype(jnp.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    luma = 16.0 + y * (219.0 / 255.0)
    cb = 128.0 + (b - y) * (224.0 / 255.0 * 0.5 / (1.0 - 0.114))
    cr = 128.0 + (r - y) * (224.0 / 255.0 * 0.5 / (1.0 - 0.299))
    sub = lambda c: c.reshape(B, H // 2, 2, W // 2, 2).mean(axis=(2, 4))
    to8 = lambda p: jnp.clip(jnp.round(p), 0, 255).astype(jnp.uint8)
    flat = jnp.concatenate(
        [to8(luma).reshape(B, -1), to8(sub(cb)).reshape(B, -1), to8(sub(cr)).reshape(B, -1)], axis=1
    )
    return flat.reshape(B, 3 * H // 2, W)


_FETCH_POOL = None
# 8 streams is the sweet spot on the 1-core relay host: an isolated
# probe shows 16 slightly faster on raw fetches, but in the full
# pipeline the extra deserialization threads contend with the C++
# decoder for the single core (measured e2e 26.6 -> 25.9 fps at 16)
_FETCH_STREAMS = int(os.environ.get("MAUA_FETCH_STREAMS", "8"))


def _fetch_pool():
    import concurrent.futures

    global _FETCH_POOL
    if _FETCH_POOL is None:
        _FETCH_POOL = concurrent.futures.ThreadPoolExecutor(max_workers=_FETCH_STREAMS)
    return _FETCH_POOL


def _pipeline_depth() -> int:
    """Outstanding batches in the delivery generators. 2 keeps a second
    chunk's fetches draining through another chunk's slow relay patch
    (bursty transport; interleaved A/B on the e2e bench measured median
    29.4 -> 32.3 fps). MAUA_PIPELINE_DEPTH overrides (1 = the old
    double-buffer)."""
    return max(1, int(os.environ.get("MAUA_PIPELINE_DEPTH", "2")))


def presplit(arr, n_streams: Optional[int] = None):
    """Split a device array into leading-axis slices for parallel
    fetching, dispatching the slice ops NOW.

    Call this when the producing computation is enqueued — device ops
    execute in dispatch order, so slicing lazily at fetch time would
    queue the slices behind every later-dispatched computation and
    serialize the pipeline (the double-buffering killer). Returns a
    list of device arrays for fetch_slices."""
    n = _FETCH_STREAMS if n_streams is None else n_streams
    shape = getattr(arr, "shape", None)
    nbytes = getattr(arr, "nbytes", 0)
    n = min(n, shape[0] if shape else 1)
    if n <= 1 or nbytes < (1 << 20):
        return [arr]
    bounds = np.linspace(0, shape[0], n + 1).astype(int)
    return [arr[a:b] for a, b in zip(bounds[:-1], bounds[1:]) if b > a]


def submit_fetches(slices):
    """Start fetching presplit slices on the thread pool NOW (they
    block in worker threads until the producing computation finishes,
    overlapping both later device work and host-side decode). Returns
    futures for gather_fetches."""
    return [_fetch_pool().submit(np.asarray, s) for s in slices]


def gather_fetches(futs) -> np.ndarray:
    return np.concatenate([f.result() for f in futs], axis=0)


def fetch_slices(slices) -> np.ndarray:
    """Fetch presplit slices over a thread pool and reassemble.

    The axon relay (and gRPC-style transports generally) runs a single
    device->host stream at ~15 MB/s but scales to ~36 MB/s with 8
    concurrent fetches (workspace/profiling/bench_fetch_parallel.py) —
    each slice is its own transfer, so threads overlap the round
    trips."""
    if len(slices) == 1:
        return np.asarray(slices[0])
    return gather_fetches(submit_fetches(slices))


def fetch_parallel(arr, n_streams: Optional[int] = None) -> np.ndarray:
    """presplit + fetch_slices in one call — for one-shot fetches where
    nothing else will be dispatched in between."""
    return fetch_slices(presplit(arr, n_streams))


def pipelined_frames(batches, pix_fmt: str = "rgb24", codec_quality: float = 1.0):
    """Double-buffered device->host frame delivery: dispatch batch N+1
    (JAX dispatch is async) BEFORE fetching batch N, so synthesis and
    the device->host transfer — the e2e bottleneck — overlap. Fetches
    are sliced over parallel streams (fetch_parallel).

    `batches` yields device frame batches, optionally as
    (batch, n_valid) tuples when the tail is padded.

    pix_fmt="yuv420p" converts uint8 RGB batches to planar I420 on
    device first (rgb_to_yuv420) — half the bytes of rgb24 — and
    yields (3H/2, W) uint8 frames.

    pix_fmt="dct" compresses each batch on device with the DPCM DCT
    codec (ops/framecodec): ~2-4x fewer bytes again at >=40 dB vs the
    I420 frame. The codec self-calibrates on the first batch (fetched
    raw once); yields (3H/2, W) uint8 I420 frames decoded on host.
    Falls back to yuv420p for non-16-aligned frames."""
    if pix_fmt == "dct":
        yield from _dct_pipelined_frames(batches, codec_quality)
        return
    import collections

    depth = _pipeline_depth()
    q: "collections.deque" = collections.deque()
    for item in batches:
        batch, n = item if isinstance(item, tuple) else (item, None)
        if pix_fmt == "yuv420p":
            batch = rgb_to_yuv420(batch)
        # slice + start fetching NOW: the worker threads block on the
        # device while the main thread keeps dispatching/consuming
        q.append((submit_fetches(presplit(batch)), n))
        if len(q) > depth:
            prev, prev_n = q.popleft()
            prev = gather_fetches(prev)
            for i in range(prev.shape[0] if prev_n is None else prev_n):
                yield prev[i]
    while q:
        prev, prev_n = q.popleft()
        prev = gather_fetches(prev)
        for i in range(prev.shape[0] if prev_n is None else prev_n):
            yield prev[i]


def _dct_pipelined_frames(batches, quality: float):
    """DPCM DCT delivery: each batch is one chunk (frame 0 intra, the
    rest closed-loop deltas). Calibration statistics run ON DEVICE
    (framecodec.calibrate_chunk_device — ~400 KB of histograms fetched
    instead of the raw first chunk); the first batch then flows through
    the normal encoded path like every other chunk."""
    import itertools

    import jax
    import jax.numpy as jnp

    from . import framecodec as fc

    it = iter(batches)
    first = next(it, None)
    if first is None:
        return
    fbatch, fn = first if isinstance(first, tuple) else (first, None)
    H, W = fbatch.shape[1], fbatch.shape[2]
    if H % 16 or W % 16:
        yield from pipelined_frames(itertools.chain([first], it), "yuv420p")
        return

    codec = fc.calibrate_chunk_device(jnp.asarray(fbatch), quality=quality)
    encode = jax.jit(lambda x: fc.encode_chunk(x, codec))
    it = itertools.chain([first], it)

    import collections

    depth = _pipeline_depth()
    q: "collections.deque" = collections.deque()
    for item in it:
        batch, n = item if isinstance(item, tuple) else (item, None)
        intra, deltas = encode(batch)  # async dispatch BEFORE fetching earlier chunks
        q.append((submit_fetches([intra] + presplit(deltas)), n))
        if len(q) > depth:
            yield from _emit_chunk(q.popleft(), codec)
    while q:
        yield from _emit_chunk(q.popleft(), codec)


def _emit_chunk(pending, codec):
    from . import framecodec as fc

    futs, n = pending
    intra = futs[0].result()
    deltas = np.concatenate([f.result() for f in futs[1:]], axis=0) if len(futs) > 1 else None
    frames = fc.decode_chunk(intra, deltas, codec)
    for i in range(frames.shape[0] if n is None else n):
        yield frames[i]


class WriteWorker(threading.Thread):
    """Drains a frame queue into an ffmpeg rawvideo pipe
    (`maua/ops/video.py:15-104`)."""

    def __init__(
        self,
        output_file: str,
        output_size: Tuple[int, int],
        fps: float,
        audio_file: Optional[str] = None,
        audio_offset: float = 0.0,
        audio_duration: Optional[float] = None,
        ffmpeg_preset: str = "slow",
        crf: int = 17,
        pix_fmt: str = "rgb24",
    ):
        super().__init__(daemon=True)
        self.q: "queue.Queue[Optional[bytes]]" = queue.Queue(maxsize=64)
        parent = os.path.dirname(os.path.abspath(output_file))
        os.makedirs(parent, exist_ok=True)
        w, h = output_size
        cmd = ["ffmpeg", "-y", "-v", "warning"]
        cmd += ["-f", "rawvideo", "-pix_fmt", pix_fmt, "-s", f"{w}x{h}", "-r", str(fps), "-i", "-"]
        if audio_file is not None:
            if audio_offset:
                cmd += ["-ss", str(audio_offset)]
            cmd += ["-i", audio_file]
            if audio_duration is not None:
                cmd += ["-t", str(audio_duration)]
            cmd += ["-map", "0:v", "-map", "1:a", "-c:a", "aac", "-shortest"]
        if pix_fmt == "rgb24":
            # yuv420p requires even dimensions; pad odd inputs by one
            # black row/column instead of failing at encode time
            # (pre-converted yuv420p input is even by construction)
            cmd += ["-vf", "pad=ceil(iw/2)*2:ceil(ih/2)*2"]
        cmd += ["-c:v", "libx264", "-preset", ffmpeg_preset, "-crf", str(crf), "-pix_fmt", "yuv420p", output_file]
        self.proc = subprocess.Popen(cmd, stdin=subprocess.PIPE)

    def run(self):
        broken = False
        while True:
            item = self.q.get()
            if item is None:
                break
            if broken:
                continue  # keep draining so writers don't block
            try:
                self.proc.stdin.write(item)
            except (BrokenPipeError, OSError):
                broken = True
        try:
            self.proc.stdin.close()
        except (BrokenPipeError, OSError):
            pass
        self.proc.wait()

    def write(self, frame_bytes: bytes):
        self.q.put(frame_bytes)

    def close(self):
        self.q.put(None)
        self.join()
        if self.proc.returncode not in (0, None):
            raise RuntimeError(f"ffmpeg exited with code {self.proc.returncode}")


class _CV2Worker:
    """Fallback writer when no ffmpeg binary exists (mp4v via OpenCV;
    no audio muxing). Accepts rgb24 or planar yuv420p frames — the
    latter keeps the on-device I420/DCT delivery path (half/quarter the
    device->host bytes, the e2e bottleneck) usable on ffmpeg-less
    hosts."""

    def __init__(self, output_file: str, output_size: Tuple[int, int], fps: float,
                 audio_file=None, pix_fmt: str = "rgb24", **_):
        import cv2

        if audio_file is not None:
            print(f"warning: no ffmpeg binary found — writing {output_file} WITHOUT the audio track {audio_file}")
        self.cv2 = cv2
        self.size = output_size
        self.pix_fmt = pix_fmt
        os.makedirs(os.path.dirname(os.path.abspath(output_file)), exist_ok=True)
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        self.writer = cv2.VideoWriter(output_file, fourcc, fps, output_size)

    def start(self):
        pass

    def write(self, frame_bytes: bytes):
        w, h = self.size
        if self.pix_fmt == "yuv420p":
            yuv = np.frombuffer(frame_bytes, np.uint8).reshape(h * 3 // 2, w)
            self.writer.write(self.cv2.cvtColor(yuv, self.cv2.COLOR_YUV2BGR_I420))
            return
        frame = np.frombuffer(frame_bytes, np.uint8).reshape(h, w, 3)
        self.writer.write(self.cv2.cvtColor(frame, self.cv2.COLOR_RGB2BGR))

    def close(self):
        self.writer.release()


class VideoWriter:
    """Context-managed threaded writer (`maua/ops/video.py:107-129`).

    write() accepts float arrays in `value_range` (NHWC or HWC) or raw
    bytes."""

    def __init__(
        self,
        output_file: str,
        output_size: Tuple[int, int],
        fps: float = 24,
        audio_file: Optional[str] = None,
        audio_offset: float = 0.0,
        audio_duration: Optional[float] = None,
        value_range: Tuple[float, float] = (-1.0, 1.0),
        pix_fmt: str = "rgb24",
        **kwargs,
    ):
        self.output_size = output_size
        self.value_range = value_range
        self.pix_fmt = pix_fmt
        have_ffmpeg = ffmpeg_available()
        if pix_fmt not in ("rgb24", "yuv420p") and not have_ffmpeg:
            raise ValueError(f"pix_fmt={pix_fmt!r} requires the ffmpeg rawvideo pipe (no ffmpeg binary found)")
        cls = WriteWorker if have_ffmpeg else _CV2Worker
        kwargs["pix_fmt"] = pix_fmt
        self.worker = cls(
            output_file, output_size, fps, audio_file=audio_file, audio_offset=audio_offset,
            audio_duration=audio_duration, **kwargs,
        )
        self.worker.start()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def write(self, frame):
        if isinstance(frame, bytes):
            self.worker.write(frame)
            return
        arr = np.asarray(frame)
        if arr.ndim == 4:
            for f in arr:
                self.write(f)
            return
        if arr.dtype != np.uint8:
            mn, mx = self.value_range
            arr = (np.clip(arr, mn, mx) - mn) / (mx - mn)
            arr = np.round(arr * 255).astype(np.uint8)
        self.worker.write(arr.tobytes())

    def close(self):
        self.worker.close()


def write_video(frames, output_file: str, fps: float = 24, value_range=(-1, 1), audio_file=None, **kw):
    """Write a (T, H, W, C) array to disk (`maua/ops/video.py:131-155`)."""
    frames = np.asarray(frames)
    t, h, w, _ = frames.shape
    with VideoWriter(output_file, (w, h), fps, audio_file=audio_file, value_range=value_range, **kw) as v:
        for f in frames:
            v.write(f)


def read_video(path: str, max_frames: Optional[int] = None) -> Tuple[np.ndarray, float]:
    """Decode a video to (T, H, W, 3) float32 [0,1] + fps (decord in
    the reference, `super/video/frame_by_frame.py:22-34`; cv2 here)."""
    import cv2

    if not os.path.exists(path):
        raise FileNotFoundError(path)
    cap = cv2.VideoCapture(path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 24.0
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok or (max_frames is not None and len(frames) >= max_frames):
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    if not frames:
        raise ValueError(f"could not decode any frames from {path!r}")
    return np.stack(frames).astype(np.float32) / 255.0, fps
