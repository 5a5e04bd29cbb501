"""Headline benchmark: 1024x1024 StyleGAN2 audio-reactive frame synthesis.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 30 fps (BASELINE.md north star: >= 30
frames/sec/chip for 1024^2 StyleGAN2 video on TPU v5e).

The benchmark mirrors the hot loop of the audio-reactive pipeline
(SURVEY.md section 3.2) the TPU-native way: one jitted `lax.scan` over
frame batches through the exact space-to-depth fast synthesis path
(gan/fast_synthesis.py), per-frame w latents + per-frame noise buffers
resident on device (the reference streams noise host->device per
batch; here the pyramid lives in HBM), frames reduced to uint8 on
device. Sync via scalar fetch (block_until_ready is unreliable on the
axon relay platform).
"""

import json
import subprocess
import sys
import time
from typing import Optional

import numpy as np


def _preflight(timeout: Optional[float] = None, attempts: int = 3, backoff: float = 90.0) -> None:
    """Probe the device in a SUBPROCESS with a hard timeout.

    The axon relay can wedge such that every device->host fetch blocks
    forever inside the plugin (dispatch still succeeds). A wedged fetch
    holds the GIL, so an in-process watchdog thread cannot fire — the
    probe must be a separate process. Wedges usually clear within
    minutes, so retry with backoff before giving up; failing with a
    clear message beats hanging until the driver's timeout.

    The timeout must cover first-fetch INIT, not just a healthy fetch:
    under relay contention backend init alone measures 90-300+ s (a
    wedge-shaped slow start, not a wedge), so probing with a 120 s
    limit aborted benches the hardware could have run. A real wedge
    blocks FOREVER, so a generous window costs nothing on healthy runs
    (the probe returns as soon as it prints) and only delays the abort
    on genuinely dead relays. MAUA_PREFLIGHT_TIMEOUT overrides.
    """
    import os

    if timeout is None:
        timeout = float(os.environ.get("MAUA_PREFLIGHT_TIMEOUT", "600"))
    probe = (
        "import jax, jax.numpy as jnp, numpy as np;"
        "np.asarray(jnp.arange(4)); print('PROBE_OK')"
    )
    for attempt in range(attempts):
        try:
            out = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True, text=True, timeout=timeout
            )
            if "PROBE_OK" in out.stdout:
                return
            err = f"device probe failed rc={out.returncode}\n{out.stderr[-2000:]}"
        except subprocess.TimeoutExpired:
            err = (f"device fetch hung > {timeout:.0f}s — axon relay is wedged "
                   "(dispatch works, fetches block; see PERFORMANCE.md)")
        if attempt + 1 < attempts:
            print(f"bench.py preflight: {err}; retrying in {backoff:.0f}s "
                  f"({attempt + 1}/{attempts})", file=sys.stderr)
            time.sleep(backoff)
    print(f"bench.py preflight: {err}. No honest benchmark is possible; aborting.",
          file=sys.stderr)
    raise SystemExit(3)


def main():
    _preflight()

    # 12 fetch streams with the depth-2 pipeline: extra streams ride
    # through per-stream relay stalls (A/B: worst trial 29.1 vs 23.6
    # fps at 8 streams; medians equal). Must be set before
    # maua_tpu.ops.video is (transitively) imported.
    import os

    os.environ.setdefault("MAUA_FETCH_STREAMS", "12")

    import jax

    from maua_tpu.utility import enable_compilation_cache

    enable_compilation_cache()  # opt-in via MAUA_COMPILE_CACHE
    import jax.numpy as jnp

    from maua_tpu.gan import fast_synthesis as fs
    from maua_tpu.gan import stylegan2 as sg2

    resolution = int(os.environ.get("MAUA_BENCH_RES", "1024"))
    batch = int(os.environ.get("MAUA_BENCH_BATCH", "56"))
    n_batches = int(os.environ.get("MAUA_BENCH_CHUNKS", "12"))
    cfg = sg2.SG2Config(img_resolution=resolution, dtype="bfloat16")
    params = sg2.init_params(jax.random.PRNGKey(0), cfg)
    plan = fs.build_fast_plan(params, cfg)

    # per-frame noise pyramid, device-resident (cell-packed for the
    # fast blocks); audio-reactive patches modulate these buffers
    key = jax.random.PRNGKey(3)
    noises = {}
    for res in cfg.block_resolutions:
        for c in (["conv1"] if res == 4 else ["conv0", "conv1"]):
            key, sub = jax.random.split(key)
            if res in plan["blocks"]:
                noises[f"b{res}.{c}"] = jax.random.normal(sub, (batch, res // 2, res // 2, 4, 1), jnp.bfloat16)
            else:
                noises[f"b{res}.{c}"] = jax.random.normal(sub, (batch, res, res, 1))

    def render_chunk(params, base_ws, noises, keys):
        def body(carry, k):
            ws = base_ws + 0.1 * jax.random.normal(k, base_ws.shape, jnp.float32)
            img = fs.synthesis_fast(params, plan, ws, cfg, noises=noises)
            img8 = jnp.clip((img + 1.0) * 127.5, 0, 255).astype(jnp.uint8)
            return carry + jnp.sum(img8.astype(jnp.uint32)), img8[:, ::4, ::4]

        checksum, frames = jax.lax.scan(body, jnp.uint32(0), keys)
        return checksum, frames

    render = jax.jit(render_chunk)
    base_ws = jax.random.normal(jax.random.PRNGKey(1), (batch, cfg.num_ws, cfg.w_dim), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(2), n_batches)

    checksum, _ = render(params, base_ws, noises, keys)
    float(checksum)  # sync

    times = []
    for trial in range(3):
        keys = jax.random.split(jax.random.PRNGKey(4 + trial), n_batches)
        t0 = time.perf_counter()
        checksum, _ = render(params, base_ws, noises, keys)
        float(checksum)
        times.append(time.perf_counter() - t0)

    fps = batch * n_batches / min(times)

    # end-to-end fps: frames delivered to the HOST as I420 (what the
    # ffmpeg encode pipe consumes), the production path
    # (ops/video.pipelined_frames pix_fmt="dct"): on-device DPCM DCT
    # compression (ops/framecodec) shipping ~3-4x fewer bytes than
    # I420 at >=40 dB, fetched over parallel relay streams
    # (fetch_parallel), decoded on host by the C++ kernel
    # (native/framecodec.cpp), double-buffered against synthesis.
    from maua_tpu.ops import framecodec as fc
    from maua_tpu.ops.video import presplit, rgb_to_yuv420, submit_fetches

    # long chunks amortize the intra frame + per-chunk sync overhead
    # (measured grid: batch 48 ran 30.4/29.6 fps vs batch 32's noisier
    # 33.2/15.8 under the same relay weather; bpp also drops 8.31->8.28)
    e2e_batch = int(os.environ.get("MAUA_BENCH_E2E_BATCH", "48"))
    e2e_batch = min(batch, e2e_batch)

    # e2e workload = BASELINE config #3: latent-INTERPOLATION video
    # (`audioreactive/latent.py:105-162` recipe) — a smooth slerp loop
    # through keyframe w's, which is what audio-reactive patches
    # actually render (spline loops + gaussian-filtered envelopes).
    # Chunk c renders frames [c*B, (c+1)*B) of the loop. Noise buffers
    # stay fixed across the loop: patches evolve noise smoothly
    # (LoopNoise-style rotations change the noise component ~2 gray
    # levels/frame at 24 fps — below one quantizer step, so it does
    # not change the delivery rate being measured).
    kf = base_ws[:4]  # 4 keyframe latents
    # 2 s per keyframe transition at 24 fps (typical tempo-synced latent
    # loops run one keyframe per musical bar)
    loop_frames = 192

    def _ws_at(t_idx):
        # t in [0, 4) across the loop; slerp-ish lerp between keyframes
        # (w-space interpolation; exact slerp vs lerp is irrelevant to
        # the compute/delivery being measured)
        t = t_idx.astype(jnp.float32) / loop_frames * 4.0
        i0 = jnp.floor(t).astype(jnp.int32) % 4
        i1 = (i0 + 1) % 4
        frac = (t - jnp.floor(t))[:, None, None]
        smooth = frac * frac * (3.0 - 2.0 * frac)  # smoothstep easing
        return (1.0 - smooth) * kf[i0] + smooth * kf[i1]

    # MAUA_BENCH_NOISE=rotate renders with PER-FRAME noise modulation
    # (LoopNoise-style Gaussian-preserving rotation between two noise
    # states over the latent loop, the audio-reactive patch behavior —
    # `maua/audiovisual/patches/primitives/noise.py:6-58`) instead of
    # fixed buffers, to measure what per-frame noise costs the
    # delivery rate (bpp goes up with the delta statistics).
    noise_mode = os.environ.get("MAUA_BENCH_NOISE", "fixed")
    noises2 = None
    if noise_mode == "rotate":
        key2 = jax.random.PRNGKey(7)
        noises2 = {}
        for k, v in noises.items():
            key2, sub = jax.random.split(key2)
            noises2[k] = jax.random.normal(sub, v.shape, v.dtype)

    def render_frames(params, noises_b, c, noises2_b=None):
        idx = c * e2e_batch + jnp.arange(e2e_batch)
        nb = noises_b
        if noises2_b is not None:
            theta = (idx.astype(jnp.float32) / loop_frames * 2.0 * np.pi)
            nb = {}
            for k in noises_b:
                t = theta.reshape((-1,) + (1,) * (noises_b[k].ndim - 1))
                nb[k] = (jnp.cos(t) * noises_b[k].astype(jnp.float32)
                         + jnp.sin(t) * noises2_b[k].astype(jnp.float32)).astype(noises_b[k].dtype)
        img = fs.synthesis_fast(params, plan, _ws_at(idx), cfg, noises=nb)
        return jnp.clip((img + 1.0) * 127.5, 0, 255).astype(jnp.uint8)

    from maua_tpu.ops.video import fetch_parallel

    noises_b = {k: v[:e2e_batch] for k, v in noises.items()}
    if noise_mode == "rotate":
        noises2_b = {k: v[:e2e_batch] for k, v in noises2.items()}
        render_rgb = jax.jit(lambda p, n, c: render_frames(p, n, c, noises2_b))
        print("bench.py e2e: per-frame LoopNoise rotation ON", file=sys.stderr)
    else:
        render_rgb = jax.jit(render_frames)
    # calibrate on the FULL first chunk: the latent loop's smoothstep
    # pacing means an 8-frame prefix samples only the slowest deltas —
    # ranges/escape capacity calibrated there starve on the mid-segment
    # speed peak (measured: V-plane capacity blowout, PSNR 40.4 -> 31
    # dB across one chunk pre-closed-loop). Statistics run ON DEVICE
    # (fc.calibrate_chunk_device): only ~400 KB of histograms cross the
    # link instead of the raw chunk, and the 40-60 s of single-core
    # numpy statistics disappear.
    rgb0_dev = render_rgb(params, noises_b, jnp.int32(0))
    # I420 reference of the gate chunk — codec-independent, fetch once
    ref0 = fetch_parallel(rgb_to_yuv420(render_rgb(params, noises_b, jnp.int32(2))))

    # Calibrate + PSNR-gate, AUTO-TUNING the quantizer both ways: the
    # contract is >= 40 dB, and every dB above it is bits the 1-core
    # host must fetch AND decode for nothing (~5% of the stream per
    # 0.65 dB, measured round 4: 41.15 dB delivered vs the 40.5
    # target = the whole remaining gap to 30 fps at 44 MB/s). A
    # uniform quantizer moves PSNR by -20*log10(quality), so one
    # predictive step lands within ~0.1 dB; the loop re-calibrates
    # finer OR coarser until delivered PSNR sits in aim +- band, with
    # the 40.0 dB floor still hard (refuse, never ship lossier).
    quality = float(os.environ.get("MAUA_BENCH_DCT_QUALITY", "1.19"))
    psnr_aim = float(os.environ.get("MAUA_BENCH_PSNR_AIM", "40.4"))
    psnr_band = 0.35
    for cal_attempt in range(4):
        codec = fc.calibrate_chunk_device(rgb0_dev, quality=quality)
        encode = jax.jit(lambda x: fc.encode_chunk(x, codec))
        print(f"bench.py e2e: codec {codec.bits_per_pixel(e2e_batch):.2f} bits/pixel "
              f"(I420 is 12), chunk {codec.chunk_bytes(e2e_batch)/1e6:.2f} MB "
              f"at quality {quality:.3f}", file=sys.stderr)

        # warmup + stage probe for this calibration
        sync = jax.jit(lambda a, b: jnp.sum(a.astype(jnp.uint32)) + jnp.sum(b[::977].astype(jnp.uint32)))
        intra_d, deltas_d = encode(render_rgb(params, noises_b, jnp.int32(1)))
        float(sync(intra_d, deltas_d))  # compile encode + sync programs
        t0 = time.perf_counter()
        intra_d, deltas_d = encode(render_rgb(params, noises_b, jnp.int32(2)))
        float(sync(intra_d, deltas_d))
        t_synth_enc = time.perf_counter() - t0
        t0 = time.perf_counter()
        slices_h = [np.asarray(intra_d)] + [np.asarray(s) for s in presplit(deltas_d)]
        t_fetch = time.perf_counter() - t0
        deltas_h = np.concatenate(slices_h[1:])
        dec0 = fc.decode_chunk(slices_h[0], deltas_h, codec)  # includes any native build
        t0 = time.perf_counter()
        dec0 = fc.decode_chunk(slices_h[0], deltas_h, codec)
        t_decode = time.perf_counter() - t0
        print(f"bench.py e2e stages (warm, {e2e_batch} frames): synth+encode {t_synth_enc:.3f}s, "
              f"serial fetch {t_fetch:.3f}s ({len(deltas_h.view(np.uint8)) / max(t_fetch, 1e-9) / 1e6:.1f} MB/s), "
              f"host decode {t_decode:.3f}s ({t_decode / e2e_batch * 1e3:.1f} ms/frame, "
              f"native={fc._NATIVE_CHUNK_FN is not None})", file=sys.stderr)
        mse = np.mean((dec0.astype(np.float64) - ref0.astype(np.float64)) ** 2)
        psnr = 10 * np.log10(255.0**2 / max(mse, 1e-12))
        print(f"bench.py e2e: delivered-frame PSNR {psnr:.2f} dB", file=sys.stderr)
        if abs(psnr - psnr_aim) <= psnr_band and psnr >= 40.0:
            break
        if cal_attempt < 3:
            quality *= 10.0 ** ((psnr - psnr_aim) / 20.0)
            print(f"bench.py e2e: PSNR outside {psnr_aim}±{psnr_band} dB — "
                  f"re-calibrating at quality {quality:.3f}", file=sys.stderr)
    if psnr < 40.0:
        print(f"bench.py: delivered-frame PSNR {psnr:.2f} dB < 40 after recalibration — "
              "refusing to report a lossy e2e number", file=sys.stderr)
        raise SystemExit(4)

    def render_chunk_packed(c):
        # presplit dispatches the slice ops NOW (so later-dispatched
        # chunks don't queue ahead of this chunk's transfers) and the
        # fetch threads start immediately — transfers overlap both the
        # next chunk's device work and the previous chunk's host decode
        intra, deltas = encode(render_rgb(params, noises_b, jnp.int32(c)))
        return submit_fetches([intra] + presplit(deltas))

    stage_stats = {"fetch_bytes": 0, "fetch_s": 0.0, "decode_s": 0.0, "frames": 0}

    def fetch_decode(futs):
        t0 = time.perf_counter()
        intra = futs[0].result()
        deltas = np.concatenate([f.result() for f in futs[1:]]) if len(futs) > 1 else None
        t1 = time.perf_counter()
        out = fc.decode_chunk(intra, deltas, codec)
        stage_stats["fetch_s"] += t1 - t0
        stage_stats["decode_s"] += time.perf_counter() - t1
        stage_stats["fetch_bytes"] += intra.nbytes + (deltas.nbytes if deltas is not None else 0)
        stage_stats["frames"] += e2e_batch
        return out

    [f.result() for f in render_chunk_packed(1)]  # warm the packed path

    # 8 chunks x 3 trials: a longer window amortizes the pipeline-fill
    # cost (first chunk's synthesis+encode has nothing to overlap) to
    # ~2%, so the number reflects the steady-state delivery rate a
    # minutes-long render actually runs at. Per-trial stage stats print
    # so a slow run is attributable (fetch wait vs host decode).
    # TWO chunks stay in flight: the relay's throughput is bursty
    # (measured 26-46 MB/s across one day), and a second outstanding
    # chunk's fetch threads keep draining through another chunk's slow
    # patch — interleaved A/B measured median 29.4 -> 32.3 fps
    # (workspace/profiling/bench_e2e_ab.py).
    import collections

    pipe_depth = int(os.environ.get("MAUA_BENCH_PIPE_DEPTH", "2"))
    n_e2e = 8
    e2e_times = []
    eff_rates = []
    for trial in range(3):
        for k in stage_stats:
            stage_stats[k] = 0
        t0 = time.perf_counter()
        q = collections.deque()
        for i in range(min(pipe_depth, n_e2e)):
            q.append(render_chunk_packed(i))
        for i in range(pipe_depth, n_e2e):
            nxt = render_chunk_packed(i)  # async dispatch
            fetch_decode(q.popleft())  # fetch+decode overlap the dispatched batches
            q.append(nxt)
        while q:
            fetch_decode(q.popleft())
        dt = time.perf_counter() - t0
        e2e_times.append(dt)
        eff_rates.append(stage_stats["fetch_bytes"] / max(stage_stats["fetch_s"], 1e-9) / 1e6)
        print(f"bench.py e2e trial {trial}: {n_e2e * e2e_batch / dt:.1f} fps | "
              f"fetch wait {stage_stats['fetch_s']:.2f}s "
              f"({stage_stats['fetch_bytes'] / max(stage_stats['fetch_s'], 1e-9) / 1e6:.1f} MB/s eff) | "
              f"decode {stage_stats['decode_s'] / stage_stats['frames'] * 1e3:.1f} ms/frame",
              file=sys.stderr)
    e2e_fps = n_e2e * e2e_batch / min(e2e_times)

    # --- StyleGAN3 fps, driver-visible: a time-budgeted run of the
    # second synthesis family so its number lands in the driver's
    # artifact instead of being self-reported (bench_sg3.py remains the
    # full standalone bench). MAUA_BENCH_SG3=0 skips; any failure here
    # must not cost the headline numbers.
    if os.environ.get("MAUA_BENCH_SG3", "1") == "1":
        try:
            from maua_tpu.gan import stylegan3 as sg3
            from maua_tpu.profiling import mfu as _mfu, sg3_frame_flops

            sg3_batch = int(os.environ.get("MAUA_BENCH_SG3_BATCH", "8"))
            sg3_chunks = int(os.environ.get("MAUA_BENCH_SG3_CHUNKS", "3"))
            cfg3 = sg3.SG3Config(img_resolution=1024, dtype="bfloat16")
            params3 = jax.device_put(sg3.init_params(jax.random.PRNGKey(0), cfg3))

            def render3(params3, ws0, keys):
                def body(carry, k):
                    ws = ws0 + 0.1 * jax.random.normal(k, ws0.shape, jnp.float32)
                    img = sg3.synthesis(params3, ws, cfg3)
                    img8 = jnp.clip((img + 1.0) * 127.5, 0, 255).astype(jnp.uint8)
                    return carry + jnp.sum(img8.astype(jnp.uint32)), ()

                return jax.lax.scan(body, jnp.uint32(0), keys)[0]

            render3 = jax.jit(render3)
            ws0 = jax.random.normal(jax.random.PRNGKey(1),
                                    (sg3_batch, cfg3.num_ws, cfg3.w_dim), jnp.float32)
            float(render3(params3, ws0, jax.random.split(jax.random.PRNGKey(2), sg3_chunks)))
            t3 = []
            for trial in range(2):
                keys3 = jax.random.split(jax.random.PRNGKey(4 + trial), sg3_chunks)
                t0 = time.perf_counter()
                float(render3(params3, ws0, keys3))
                t3.append(time.perf_counter() - t0)
            sg3_fps = sg3_batch * sg3_chunks / min(t3)
            fl3 = sg3_frame_flops(cfg3)
            print(json.dumps({
                "metric": "stylegan3_1024_frames_per_sec_per_chip",
                "value": round(sg3_fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(sg3_fps / 30.0, 3),
                "mfu": round(_mfu(fl3 * sg3_fps, 1.0), 3),
            }))
        except Exception as e:
            print(f"bench.py: SG3 section failed ({type(e).__name__}: {e}); "
                  "headline numbers unaffected", file=sys.stderr)

    # MFU: analytic model FLOPs per frame over achieved frame rate,
    # against the v5e bf16 peak (MFU accounting, PERFORMANCE.md)
    from maua_tpu.profiling import mfu, sg2_frame_flops

    frame_flops = sg2_frame_flops(cfg)
    print(json.dumps({
        "metric": f"stylegan2_{resolution}_e2e_frames_per_sec_per_chip",
        "value": round(e2e_fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(e2e_fps / 30.0, 3),
        "delivered_psnr_db": round(psnr, 2),
        "codec_bits_per_pixel": round(codec.bits_per_pixel(e2e_batch), 2),
        # transport context: the e2e number is relay-weather-bound
        # (measured 13.7-32.1 fps across one day on identical code);
        # this attributes any capture to its transport conditions
        "fetch_mb_s_eff": round(sorted(eff_rates)[1], 1),
    }))
    print(json.dumps({
        "metric": f"stylegan2_{resolution}_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
        "model_tflops_per_s": round(frame_flops * fps / 1e12, 1),
        "mfu": round(mfu(frame_flops * fps, 1.0), 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
