"""OOM guard rails: catch device out-of-memory and retry smaller.

The reference survives VRAM exhaustion at three loop sites — super
upscale (`maua/super/image/single.py:91-96` copy-original-and-continue),
the noise pyramid (`maua/GAN/wrappers/stylegan2.py:204-211` CPU
fallback), and the diffusion SR step (`maua/diffusion/image.py:171-177`
skip upscale). On TPU the analogous failure is XLA's
RESOURCE_EXHAUSTED (HBM or scoped VMEM); these helpers catch it and
walk a ladder of smaller configurations (halve batch / halve tile /
skip) instead of dying mid-render — v5e limits are real (bench notes
batch 64 OOMs at 1024^2).
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

_OOM_MARKERS = (
    "RESOURCE_EXHAUSTED",
    "Out of memory",
    "out of memory",
    "OOM",
    "Attempting to reserve",
    "exceeds the limit",  # Mosaic scoped-vmem
)


def is_oom_error(e: BaseException) -> bool:
    if isinstance(e, MemoryError):
        return True
    msg = str(e)
    return any(m in msg for m in _OOM_MARKERS)


def run_with_oom_fallback(attempts: Iterable[Tuple[str, Callable]], verbose: bool = True):
    """Try each (description, thunk) in order; an OOM moves to the next
    rung, any other error re-raises. Raises the last OOM if every rung
    fails."""
    last: Optional[BaseException] = None
    for desc, thunk in attempts:
        try:
            return thunk()
        except Exception as e:  # noqa: BLE001 - filtered below
            if not is_oom_error(e):
                raise
            last = e
            if verbose:
                print(f"device OOM at {desc}; retrying smaller")
    raise last  # every rung OOMed


def shrinking_batches(n: int, batch_size: int, min_batch: int = 1):
    """Yield candidate batch sizes batch_size, batch_size//2, ...,
    min_batch for halve-and-retry loops."""
    b = batch_size
    while True:
        yield b
        if b <= min_batch:
            return
        b = max(b // 2, min_batch)
