"""Tests for flow-consistent video style transfer and the multires
schedule (reference: maua/style/video.py, maua/style/image_multires.py)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from maua_tpu.style import multires as style_multires
from maua_tpu.style import video as style_video


def _make_video(path, t=3, size=32):
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 8, (size, size))
    rs = np.random.RandomState(0)
    base = (rs.rand(size, size, 3) * 255).astype(np.uint8)
    for i in range(t):
        writer.write(np.roll(base, i * 2, axis=1)[:, :, ::-1])
    writer.release()
    return str(path)


def _style_img(tmp_path, size=32):
    rs = np.random.RandomState(1)
    img = (rs.rand(size, size, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "style.png")
    cv2.imwrite(p, img[:, :, ::-1])
    return p


def test_video_transfer_end_to_end(tmp_path):
    """Multi-pass flow-consistent optimization produces finite frames
    of the right shape and does not blow up over passes
    (`maua/style/video.py:25-200`)."""
    vid = _make_video(tmp_path / "in.mp4", t=3, size=32)
    sty = _style_img(tmp_path)
    out = style_video.transfer(
        vid, [sty], size=32, n_passes=2, n_iters=3, max_frames=3,
        flow_models=("farneback",), verbose=False,
    )
    assert out.shape[0] == 3 and out.shape[3] == 3
    assert np.all(np.isfinite(out))
    assert out.min() >= -1.001 and out.max() <= 1.001


def test_transfer_multires_schedule(tmp_path):
    """Coarse-to-fine schedule chains scales, feeding each scale's
    output into the next (`maua/style/image_multires.py:14`)."""
    rs = np.random.RandomState(2)
    content = str(tmp_path / "c.png")
    cv2.imwrite(content, (rs.rand(48, 48, 3) * 255).astype(np.uint8))
    sty = _style_img(tmp_path, 48)
    out = style_multires.transfer_multires(
        content, [sty], sizes=(16, 24), n_iters_per_scale=(2, 2),
        tv_weight=0.0, verbose=False,
    )
    out = np.asarray(out)
    assert out.shape[1:3] == (24, 24)
    assert np.all(np.isfinite(out))


def test_transfer_multires_video(tmp_path):
    """Video coarse-to-fine: first scale starts from content, later
    scales start from the upsampled previous-scale result
    (`maua/style/video_multires.py:12`)."""
    vid = _make_video(tmp_path / "in.mp4", t=2, size=32)
    sty = _style_img(tmp_path)
    out = style_multires.transfer_multires_video(
        vid, [sty], sizes=(16, 24), n_iters_per_scale=(2, 2),
        first_scale_passes=1, passes_per_scale=1, max_frames=2,
        flow_models=("farneback",), verbose=False,
    )
    out = np.asarray(out)
    assert out.shape[0] == 2 and out.shape[1:3] == (24, 24)
    assert np.all(np.isfinite(out))


def test_video_transfer_init_and_blend_options(tmp_path):
    """init_type=prev_warped + histogram matching + random start frame
    exercise the reference's pass options (`maua/style/video.py:120-160`)."""
    vid = _make_video(tmp_path / "in.mp4", t=2, size=32)
    sty = _style_img(tmp_path)
    out = style_video.transfer(
        vid, [sty], size=32, n_passes=2, n_iters=2, max_frames=2,
        flow_models=("farneback",), verbose=False,
        init_type="prev_warped", match_hist="avg", start_random_frame=True,
        temporal_loss_after=0, blend_factor=0.5,
    )
    assert out.shape[0] == 2 and np.all(np.isfinite(out))


def test_parse_kwarg_list():
    """CLI kwarg parsing accepts both reference triplets and key=value
    pairs (`maua/style/image.py:121-135`)."""
    from maua_tpu.utility import parse_kwarg_list

    assert parse_kwarg_list([]) == {}
    assert parse_kwarg_list(["pooling", "str", "max", "shift", "int", "2"]) == {"pooling": "max", "shift": 2}
    assert parse_kwarg_list(["lr=0.1", "name=adam"]) == {"lr": 0.1, "name": "adam"}
    with pytest.raises(ValueError):
        parse_kwarg_list(["a", "b"])
    with pytest.raises(ValueError):
        parse_kwarg_list(["a", "badtype", "b"])


def test_video_transfer_vqgan_parameterization(tmp_path):
    """Video NST can optimize in a VQGAN z-space instead of pixels
    (`maua/style/video.py:99` parameterization choice)."""
    vid = _make_video(tmp_path / "in.mp4", t=2, size=32)
    sty = _style_img(tmp_path)
    out = style_video.transfer(
        vid, [sty], size=32, n_passes=1, n_iters=2, max_frames=2,
        flow_models=("farneback",), verbose=False, parameterization="vqgan",
    )
    assert out.shape[0] == 2 and np.all(np.isfinite(out))
