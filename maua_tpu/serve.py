"""Warm-model inference serving: micro-batched, static-shape, HTTP.

The reference is an offline art toolkit; this module is the
production-serving layer of the TPU rebuild (no reference counterpart
— it exists because this framework targets deployment, not just
offline rendering). The design follows from two TPU facts:

1. XLA compiles per shape: a warm model must see ONE batch shape,
   ever, or interactive traffic triggers recompiles (minutes on a
   1-core TPU-VM host for big generators).
2. TPU throughput comes from batch: a v5e synthesizes a batch-8
   StyleGAN2 1024 grid in barely more time than batch-1, so serving
   requests one-by-one wastes most of the chip.

`MicroBatcher` bridges interactive traffic to those constraints: a
worker thread drains the request queue up to a fixed `max_batch`
(waiting at most `max_wait_ms` after the first request arrives), pads
the tail by repeating the last row so the jitted function always sees
the same static shape, runs ONE device call, and distributes
per-request slices. Tail latency is bounded by
max_wait + device step; occupancy rides free slots.

Services adapt request JSON -> fixed-shape arrays -> PNG:

- `GANImageService`   {"seed"|"z", "truncation"} -> StyleGAN2/3 frame
- `UpscaleService`    {"image": base64 png/jpeg} -> upscaled image
                      (max_batch=1: request sizes vary, so batching
                      would force recompiles; the batcher still
                      serializes device access)

HTTP front end (stdlib ThreadingHTTPServer, zero dependencies):

    POST /v1/<service>   JSON body -> image/png
    GET  /healthz        JSON metrics (served, p50/p95 ms, occupancy)

CLI: ``python -m maua_tpu serve --model_file G.pkl --port 8080``.
"""

from __future__ import annotations

import base64
import io
import json
import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from typing import Callable, Dict, Optional

import numpy as np


# ------------------------------------------------------------- metrics


class ServiceMetrics:
    """Thread-safe serving counters + latency percentiles."""

    def __init__(self, window: int = 1024):
        self._lock = threading.Lock()
        self.served = 0
        self.errors = 0
        self.batches = 0
        self.occupancy_sum = 0
        self.max_occupancy = 0
        self._latencies_ms: deque = deque(maxlen=window)

    def record_batch(self, occupancy: int) -> None:
        with self._lock:
            self.batches += 1
            self.occupancy_sum += occupancy
            self.max_occupancy = max(self.max_occupancy, occupancy)

    def record_request(self, latency_s: float, error: bool = False) -> None:
        with self._lock:
            if error:
                self.errors += 1
            else:
                self.served += 1
                self._latencies_ms.append(latency_s * 1e3)

    def snapshot(self) -> Dict:
        with self._lock:
            lats = np.asarray(self._latencies_ms, np.float64)
            return {
                "served": self.served,
                "errors": self.errors,
                "batches": self.batches,
                "mean_occupancy": round(self.occupancy_sum / max(self.batches, 1), 3),
                "max_occupancy": self.max_occupancy,
                "p50_ms": round(float(np.percentile(lats, 50)), 2) if lats.size else None,
                "p95_ms": round(float(np.percentile(lats, 95)), 2) if lats.size else None,
            }


# --------------------------------------------------------- micro-batch


class MicroBatcher:
    """Coalesce single requests into fixed-shape device batches.

    ``run_batch`` receives a dict of arrays stacked on axis 0 and
    padded to exactly ``max_batch`` rows (static shape -> one XLA
    compile) and returns an array (or dict of arrays) with the same
    leading dim; each submitter's Future resolves to its row.
    """

    _CLOSE = object()

    def __init__(
        self,
        run_batch: Callable[[Dict[str, np.ndarray]], np.ndarray],
        max_batch: int = 8,
        max_wait_ms: float = 15.0,
        metrics: Optional[ServiceMetrics] = None,
    ):
        assert max_batch >= 1
        self._run = run_batch
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        self.metrics = metrics or ServiceMetrics()
        self._q: "queue.Queue" = queue.Queue()
        self._thread = threading.Thread(target=self._worker, daemon=True, name="maua-microbatch")
        self._closed = False
        self._thread.start()

    def submit(self, request: Dict[str, np.ndarray]) -> Future:
        """request: dict of arrays, each with leading dim 1."""
        if self._closed:
            raise RuntimeError("MicroBatcher is closed")
        fut: Future = Future()
        self._q.put((request, fut, time.perf_counter()))
        return fut

    def close(self) -> None:
        if not self._closed:
            self._closed = True
            self._q.put(self._CLOSE)
            self._thread.join()

    # ------------------------------------------------------------ worker
    def _worker(self) -> None:
        while True:
            item = self._q.get()
            if item is self._CLOSE:
                return
            batch = [item]
            deadline = time.perf_counter() + self.max_wait_s
            while len(batch) < self.max_batch:
                timeout = deadline - time.perf_counter()
                if timeout <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is self._CLOSE:
                    self._execute(batch)
                    return
                batch.append(nxt)
            self._execute(batch)

    def _execute(self, batch) -> None:
        requests = [b[0] for b in batch]
        n = len(requests)
        self.metrics.record_batch(n)
        try:
            stacked = {
                k: np.concatenate([np.asarray(r[k]) for r in requests], axis=0)
                for k in requests[0]
            }
            pad = self.max_batch - n
            if pad:
                stacked = {
                    k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)], axis=0)
                    for k, v in stacked.items()
                }
            out = self._run(stacked)
            if isinstance(out, dict):
                rows = [{k: np.asarray(v)[i] for k, v in out.items()} for i in range(n)]
            else:
                out = np.asarray(out)
                rows = [out[i] for i in range(n)]
        except Exception as e:
            for _, fut, t0 in batch:
                self.metrics.record_request(time.perf_counter() - t0, error=True)
                fut.set_exception(e)
            return
        for (_, fut, t0), row in zip(batch, rows):
            self.metrics.record_request(time.perf_counter() - t0)
            fut.set_result(row)


# ------------------------------------------------------------ services


def _encode_png(img_u8: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.asarray(img_u8)).save(buf, format="PNG")
    return buf.getvalue()


def _find_w_avg(params):
    """Locate the mapping network's running w average in a param tree."""
    if isinstance(params, dict):
        if "w_avg" in params:
            return params["w_avg"]
        for v in params.values():
            found = _find_w_avg(v)
            if found is not None:
                return found
    return None


class GANImageService:
    """seed/z (+ per-request truncation) -> uint8 RGB frame.

    One warm generator, one compiled synthesis shape. Per-request
    truncation is applied as the same `w_avg + psi * (w - w_avg)` lerp
    the mapper uses (`gan/stylegan2.py mapping`), but vectorized over
    the batch so requests with different psi share one device call.
    """

    name = "gan"

    def __init__(
        self,
        generator=None,
        model_file: Optional[str] = None,
        architecture: str = "stylegan2",
        max_batch: int = 8,
        max_wait_ms: float = 15.0,
        mesh=None,
    ):
        if generator is None:
            from .gan.wrappers import get_generator_class

            generator = get_generator_class(architecture)(model_file=model_file)
        self.gen = generator
        self._w_avg = _find_w_avg(self.gen.params)
        # serve one model over a chip mesh: the request batch shards
        # data-parallel on the `data` axis (SURVEY.md section 2.14)
        self.mesh = mesh
        if mesh is not None:
            n_data = mesh.shape["data"]
            if max_batch % n_data:
                max_batch = max(max_batch // n_data, 1) * n_data
        self.metrics = ServiceMetrics()
        self._batcher = MicroBatcher(
            self._run, max_batch=max_batch, max_wait_ms=max_wait_ms, metrics=self.metrics
        )

    def _shard(self, x):
        if self.mesh is None:
            return x
        from .parallel.mesh import shard_batch

        return shard_batch(self.mesh, x)

    def _run(self, batch: Dict[str, np.ndarray]) -> np.ndarray:
        import jax.numpy as jnp

        ws = self.gen.mapper(self._shard(jnp.asarray(batch["z"], jnp.float32)))
        psi = jnp.asarray(batch["truncation"], jnp.float32)[:, None, None]
        if self._w_avg is not None:
            ws = self._w_avg + psi * (ws - self._w_avg)
        img = self.gen.synthesizer(ws)
        img_u8 = jnp.clip((img + 1.0) * 127.5, 0, 255).astype(jnp.uint8)
        return np.asarray(img_u8)

    def request_from_json(self, payload: Dict) -> Dict[str, np.ndarray]:
        if "z" in payload:
            z = np.asarray(payload["z"], np.float32).reshape(1, self.gen.z_dim)
        else:
            seed = int(payload.get("seed", 0))
            z = np.random.RandomState(seed).randn(1, self.gen.z_dim).astype(np.float32)
        psi = np.asarray([float(payload.get("truncation", 1.0))], np.float32)
        return {"z": z, "truncation": psi}

    def submit(self, payload: Dict) -> Future:
        return self._batcher.submit(self.request_from_json(payload))

    def render_png(self, payload: Dict, timeout: float = 300.0) -> bytes:
        return _encode_png(self.submit(payload).result(timeout=timeout))

    def warmup(self, timeout: float = 1200.0) -> None:
        """Compile the batch program before accepting traffic."""
        self.submit({"seed": 0}).result(timeout=timeout)

    def close(self) -> None:
        self._batcher.close()


class ArtifactGANService:
    """Serve frames from a StableHLO export (`export.export_generator`
    with truncation=None) — the deployment mode where the serving
    process ships NO model code, only the runtime and one artifact.

    The artifact fixes the batch shape, so the micro-batcher's
    max_batch is read from its signature rather than configured.
    """

    name = "gan"

    def __init__(self, artifact: str, max_wait_ms: float = 15.0):
        import re

        from .export import exported_meta, load_exported

        self._call = load_exported(artifact)
        meta = exported_meta(artifact)
        if len(meta["in_avals"]) != 2:
            raise ValueError(
                f"artifact {artifact!r} must have the (z, psi) signature "
                f"(export_generator(truncation=None)); got {meta['in_avals']}"
            )
        m = re.search(r"\[(\d+),(\d+)\]", meta["in_avals"][0].replace(" ", ""))
        if m is None:
            raise ValueError(f"cannot parse z shape from {meta['in_avals'][0]!r}")
        batch, self.z_dim = int(m.group(1)), int(m.group(2))
        self.metrics = ServiceMetrics()
        self._batcher = MicroBatcher(
            self._run, max_batch=batch, max_wait_ms=max_wait_ms, metrics=self.metrics
        )

    def _run(self, batch: Dict[str, np.ndarray]) -> np.ndarray:
        return np.asarray(
            self._call(batch["z"].astype(np.float32), batch["truncation"].astype(np.float32))
        )

    def request_from_json(self, payload: Dict) -> Dict[str, np.ndarray]:
        if "z" in payload:
            z = np.asarray(payload["z"], np.float32).reshape(1, self.z_dim)
        else:
            seed = int(payload.get("seed", 0))
            z = np.random.RandomState(seed).randn(1, self.z_dim).astype(np.float32)
        psi = np.asarray([float(payload.get("truncation", 1.0))], np.float32)
        return {"z": z, "truncation": psi}

    def submit(self, payload: Dict) -> Future:
        return self._batcher.submit(self.request_from_json(payload))

    def render_png(self, payload: Dict, timeout: float = 300.0) -> bytes:
        return _encode_png(self.submit(payload).result(timeout=timeout))

    def warmup(self, timeout: float = 1200.0) -> None:
        self.submit({"seed": 0}).result(timeout=timeout)

    def close(self) -> None:
        self._batcher.close()


def text2img_fn(p) -> Callable:
    """Build the batched text->image program over an SD-class
    processor: `(tokens (B,L) i32, seeds (B,) u32, scales (B,) f32) ->
    uint8 frames`. The whole sampler scan is one jittable (and
    `export.export_diffusion`-able) function; per-request cfg scales
    broadcast as (B,1,1,1) through `cfg_denoiser`."""
    import jax
    import jax.numpy as jnp

    from .diffusion.wrappers import cfg_denoiser
    from .text.clip_text import encode_text, tokenize

    sigmas = jnp.asarray(np.asarray(p.get_sigmas(0.0, 1.0)))
    ds = p.vae_cfg.downscale
    h = w = p.image_size // ds
    zc = p.vae_cfg.z_channels
    uncond_tok = jnp.asarray(tokenize("", p.text_cfg.context_length))
    ancestral = p.sampler_name in ("euler_ancestral", "dpm_2_ancestral")

    def run(tokens, seeds, scales):
        cond = encode_text(p.text_params, tokens, p.text_cfg)
        uncond = encode_text(p.text_params, uncond_tok, p.text_cfg)
        model_fn = cfg_denoiser(p.denoiser, cond, uncond, scales[:, None, None, None])
        noise = jax.vmap(lambda s: jax.random.normal(jax.random.PRNGKey(s), (h, w, zc)))(seeds)
        x = noise * sigmas[0]
        if ancestral:
            out = p.sample_fn(model_fn, x, sigmas, key=jax.random.PRNGKey(seeds[0]))
        else:
            out = p.sample_fn(model_fn, x, sigmas)
        img = p.decode(out)
        return jnp.clip((img + 1.0) * 127.5, 0, 255).astype(jnp.uint8)

    return run


class DiffusionImageService:
    """text (+ seed, cfg_scale) -> image via a warm SD-class processor.

    Different prompts batch into ONE CFG denoise scan: texts tokenize
    to the model's fixed context length at request time, conditions
    encode as a batch, and per-request cfg_scale rides as a (B,1,1,1)
    broadcast through `cfg_denoiser`. Per-request seeds drive
    independent initial noise, so results are deterministic per
    (text, seed) regardless of co-batched traffic — except ancestral
    samplers, whose in-loop noise is shared per batch.

    Serving runs the full unguided schedule (t_start=0 -> image); grad
    guidance needs per-request targets and stays on the offline path.
    """

    name = "diffusion"

    def __init__(
        self,
        processor=None,
        max_batch: int = 4,
        max_wait_ms: float = 100.0,
        **processor_kwargs,
    ):
        if processor is None:
            from .diffusion.image import get_diffusion_model

            processor = get_diffusion_model("stable", **processor_kwargs)
        self.proc = processor
        self.metrics = ServiceMetrics()
        self._jit_run = None
        self._batcher = MicroBatcher(
            self._run, max_batch=max_batch, max_wait_ms=max_wait_ms, metrics=self.metrics
        )

    def _build(self):
        import jax

        return jax.jit(text2img_fn(self.proc))

    def _run(self, batch: Dict[str, np.ndarray]) -> np.ndarray:
        import jax.numpy as jnp

        if self._jit_run is None:
            self._jit_run = self._build()
        return np.asarray(
            self._jit_run(
                jnp.asarray(batch["tokens"], jnp.int32),
                jnp.asarray(batch["seed"], jnp.uint32),
                jnp.asarray(batch["cfg_scale"], jnp.float32),
            )
        )

    def request_from_json(self, payload: Dict) -> Dict[str, np.ndarray]:
        from .text.clip_text import tokenize

        tokens = tokenize(str(payload.get("text", "")), self.proc.text_cfg.context_length)
        seed = np.asarray([int(payload.get("seed", 0))], np.uint32)
        scale = np.asarray([float(payload.get("cfg_scale", self.proc.cfg_scale))], np.float32)
        return {"tokens": tokens, "seed": seed, "cfg_scale": scale}

    def submit(self, payload: Dict) -> Future:
        return self._batcher.submit(self.request_from_json(payload))

    def render_png(self, payload: Dict, timeout: float = 600.0) -> bytes:
        return _encode_png(self.submit(payload).result(timeout=timeout))

    def warmup(self, timeout: float = 1200.0) -> None:
        """Compile the batch program before accepting traffic."""
        self.submit({"text": "", "seed": 0}).result(timeout=timeout)

    def close(self) -> None:
        self._batcher.close()


class UpscaleService:
    """base64 image -> upscaled image through a warm `super` model.

    Request sizes vary, so max_batch defaults to 1 (a new spatial
    shape means a new XLA program anyway); the batcher still
    serializes access to the single device.
    """

    name = "upscale"

    def __init__(self, model_name: str = "RealESRGAN-x4plus", tile: int = 0, max_wait_ms: float = 0.0):
        from .super.image import Upscaler

        self.upscaler = Upscaler(model_name, tile=tile)
        self.metrics = ServiceMetrics()
        self._batcher = MicroBatcher(self._run, max_batch=1, max_wait_ms=max_wait_ms, metrics=self.metrics)

    def _run(self, batch: Dict[str, np.ndarray]) -> np.ndarray:
        out = self.upscaler(batch["image"].astype(np.float32) / 255.0)
        return np.asarray(np.clip(np.asarray(out), 0, 1) * 255.0).astype(np.uint8)

    def request_from_json(self, payload: Dict) -> Dict[str, np.ndarray]:
        from PIL import Image

        raw = base64.b64decode(payload["image"])
        arr = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"), np.uint8)
        return {"image": arr[None]}

    def submit(self, payload: Dict) -> Future:
        return self._batcher.submit(self.request_from_json(payload))

    def render_png(self, payload: Dict, timeout: float = 300.0) -> bytes:
        return _encode_png(self.submit(payload).result(timeout=timeout))

    def close(self) -> None:
        self._batcher.close()


# ----------------------------------------------------------------- http


def make_http_server(services: Dict[str, object], host: str = "127.0.0.1", port: int = 8080):
    """ThreadingHTTPServer over the given {route-name: service} map."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _json(self, code: int, obj: Dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/healthz", "/metrics"):
                self._json(200, {name: svc.metrics.snapshot() for name, svc in services.items()})
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            parts = [p for p in self.path.split("/") if p]
            name = parts[-1] if parts else ""
            svc = services.get(name)
            if svc is None:
                self._json(404, {"error": f"unknown service {name!r}", "services": sorted(services)})
                return
            try:
                length = int(self.headers.get("Content-Length", 0) or 0)
                payload = json.loads(self.rfile.read(length) or b"{}")
                png = svc.render_png(payload)
            except Exception as e:
                self._json(400, {"error": str(e)})
                return
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(png)))
            self.end_headers()
            self.wfile.write(png)

    return ThreadingHTTPServer((host, port), Handler)


def main(args=None):
    import argparse

    # fmt: off
    parser = argparse.ArgumentParser(description="warm-model inference server (micro-batched)")
    parser.add_argument("--model_file", default=None, type=str, help="GAN checkpoint (random init if omitted)")
    parser.add_argument("--artifact", default=None, type=str, help="serve /v1/gan from a StableHLO export instead of a checkpoint")
    parser.add_argument("--architecture", default="stylegan2", choices=["stylegan2", "stylegan3"])
    parser.add_argument("--upscale_model", default=None, type=str, help="also serve /v1/upscale with this super model")
    parser.add_argument("--diffusion", action="store_true", help="also serve /v1/diffusion (SD-class text-to-image)")
    parser.add_argument("--timesteps", default=20, type=int, help="diffusion steps for /v1/diffusion")
    parser.add_argument("--sampler", default="euler", type=str, help="sampler for /v1/diffusion")
    parser.add_argument("--host", default="127.0.0.1", type=str)
    parser.add_argument("--port", default=8080, type=int)
    parser.add_argument("--max_batch", default=8, type=int)
    parser.add_argument("--max_wait_ms", default=15.0, type=float)
    parser.add_argument("--warmup", action="store_true", help="compile the batch program before accepting traffic")
    args = parser.parse_args(args)
    # fmt: on

    services: Dict[str, object] = {}
    if args.artifact:
        services[ArtifactGANService.name] = ArtifactGANService(
            args.artifact, max_wait_ms=args.max_wait_ms
        )
    else:
        services[GANImageService.name] = GANImageService(
            model_file=args.model_file, architecture=args.architecture,
            max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        )
    if args.upscale_model:
        services[UpscaleService.name] = UpscaleService(args.upscale_model)
    if args.diffusion:
        services[DiffusionImageService.name] = DiffusionImageService(
            timesteps=args.timesteps, sampler=args.sampler
        )
    if args.warmup:
        for name, svc in services.items():
            warm = getattr(svc, "warmup", None)
            if warm is not None:
                warm()
                print(f"warmup compile done: {name}")

    server = make_http_server(services, host=args.host, port=args.port)
    print(f"serving {sorted(services)} on http://{args.host}:{server.server_address[1]} "
          f"(POST /v1/<service>, GET /healthz)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        for svc in services.values():
            svc.close()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
