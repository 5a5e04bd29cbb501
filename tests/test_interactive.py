"""Depth tests for the interactive tool
(reference: maua/audiovisual/interactive.py:24-350)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maua_tpu.audiovisual.interactive import (
    EMAFade,
    InteractiveSession,
    sections_from_labels,
    segment_audio,
)


@pytest.fixture(scope="module")
def session():
    sr = 22050
    t = np.arange(sr * 4) / sr
    audio = (0.3 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    return InteractiveSession(audio, sr, segmentation={0.0: 0, 1.0: 1, 2.0: 0, 3.0: 2},
                              seed=0, palette_size=5, latent_dim=16)


def test_manual_segmentation_timeline(session):
    # ABAC pattern -> 3 unique sections, 4 timeline bounds
    assert [lbl for lbl, _, _ in session.sections] == [0, 1, 2]
    assert session.bound_labels == [0, 1, 0, 2]
    assert len(session.bound_times) == 5


def test_intensity_commands_track_state(session):
    i0 = session.intensity[0]
    session.apply("1", 0)
    assert session.intensity[0] == pytest.approx(i0 + 0.111)
    session.apply("2", 0)
    assert session.intensity[0] == pytest.approx(i0)


def test_style_commands(session):
    p0 = np.asarray(session.palettes[1])
    session.apply("different_style", 1)
    assert not np.array_equal(np.asarray(session.palettes[1]), p0)
    p1 = np.asarray(session.palettes[1])
    session.apply("similar_style", 1)
    p2 = np.asarray(session.palettes[1])
    # permutation: same rows as a multiset, possibly different order
    a = np.sort(p1.reshape(p1.shape[0], -1), axis=0)
    b = np.sort(p2.reshape(p2.shape[0], -1), axis=0)
    np.testing.assert_allclose(a, b)


def test_motion_commands_and_revert(session):
    lbl = 2
    before = [dict(d) for d in session.patches[lbl].latent_patches]
    session.apply("different_style_motion", lbl)
    after = [dict(d) for d in session.patches[lbl].latent_patches]
    assert before != after
    session.apply("revert", lbl)
    reverted = [dict(d) for d in session.patches[lbl].latent_patches]
    assert reverted == after != before or reverted == before  # revert pops the pre-command snapshot
    # structure motion randomizes noise patches
    nb = [dict(d) for d in session.patches[lbl].noise_patches]
    session.apply("7", lbl)
    assert [dict(d) for d in session.patches[lbl].noise_patches] != nb


def test_preview_and_patch_save(session, tmp_path):
    path = str(tmp_path / "patch.json")
    lats, noises = session.preview(0, noise_sizes=[4], preview_frames=10, save_patch=path)
    assert lats.shape[0] == 10
    assert (tmp_path / "patch.json").exists()
    assert len(noises) > 0


def test_ema_fade_crossfades_boundary():
    fade = EMAFade(4)
    total = 12
    a = np.zeros((4, 3))
    b = np.ones((4, 3))
    # first section: last 4 frames ramp into the carried average
    out_end = np.asarray(fade(a, 8, total))
    assert fade.avg is not None
    # next section start: frames fade out of the carried average
    out_start = np.asarray(fade(b, 0, total))
    assert out_start[0].max() < 1.0  # still pulled toward the avg
    # middle frames untouched
    fade2 = EMAFade(2)
    mid = np.asarray(fade2(b, 4, 12))
    np.testing.assert_array_equal(mid, b)


def test_render_final_stitches_timeline(session):
    calls = []

    def synth(latents, noises):
        calls.append((np.asarray(latents).shape[0], sorted(noises)))
        return np.zeros((latents.shape[0], 8, 8, 3), np.uint8)

    frames = sum(batch.shape[0] for batch in session.render_final(synth, batch_size=8, fade_time=0.25))
    # timeline covers all four bounds (ABAC), ~4s * fps frames
    assert frames >= 0.9 * len(session.labels)
    assert all(ns == calls[0][1] for _, ns in calls)  # consistent noise keys


def test_generate_interactive_end_to_end(tmp_path):
    """Full REPL driver (`interactive.py:145-346`): scripted commands
    evolve each section, then the stitched EMA-crossfaded video renders
    and decodes."""
    import scipy.io.wavfile

    from maua_tpu.audiovisual.interactive import generate_interactive
    from maua_tpu.gan.stylegan2 import SG2Config
    from maua_tpu.ops.video import read_video

    sr = 22050
    t = np.arange(sr * 3) / sr
    audio = (0.3 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    wav = str(tmp_path / "i.wav")
    scipy.io.wavfile.write(wav, sr, (audio * 32767).astype(np.int16))

    script = iter(["1", "3", "next", "7", "next"])
    printed = []
    cfg = SG2Config(img_resolution=32, channel_base=2048, channel_max=64, num_fp16_res=0)
    out = generate_interactive(
        wav, output_file=str(tmp_path / "i.mp4"), fps=2, seed=0,
        segmentation={0.0: 0, 1.5: 1}, batch_size=4, out_size=(32, 32),
        fade_time=0.5, palette_size=4, stylegan_kwargs={"cfg": cfg, "dtype": "float32"},
        input_fn=lambda _: next(script), print_fn=printed.append,
    )
    video, _ = read_video(out)
    assert video.shape[1:] == (32, 32, 3)
    assert video.shape[0] >= 4
    assert np.asarray(video).std() > 0.01
    assert any("more_intense" in str(p) for p in printed)
