"""Packed-RGBA output path (ops/pallas/rgb_kernel.py + dataloader API).

The RGBA fast path must be byte-identical to the XLA decode-to-RGB path
(which is itself oracle-tested): same float constants, op order, and
Rust-`as u8` saturation (reference lib.rs:378-391)."""

from __future__ import annotations

import numpy as np
import pytest

from pfv_tpu.dataloader import (decode_video_rgb, decode_video_rgba,
                                rgba_view)
from pfv_tpu.encoding import encode_video
from pfv_tpu.utils.synth import synth_yuv_frame


def _clip(w, h, f):
    ys, us, vs = map(
        np.stack, zip(*[synth_yuv_frame(t, w, h) for t in range(f)])
    )
    return encode_video(ys, us, vs, 30, 3, keyframes=3)


@pytest.mark.parametrize(
    "w,h,env",
    [
        (128, 96, {"PFV_STEP": "1"}),    # pallas canvas->RGBA kernel
        (128, 96, {"PFV_STEP": "0"}),    # XLA _rgba_xla twin
        (136, 90, {"PFV_STEP": "0"}),    # odd geometry (XLA fallback)
        # width > 512: the expand matrices split into output-lane chunks
        # (k > 1) to fit scoped VMEM (r5 hardware OOM at 1080p); 640 ->
        # k = 5 chunks of 128 lanes
        (640, 96, {"PFV_STEP": "1"}),
    ],
)
def test_rgba_matches_rgb(w, h, env, monkeypatch):
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    data = _clip(w, h, 5)
    rgba = np.asarray(decode_video_rgba(data))
    rgb = np.asarray(decode_video_rgb(data))
    assert rgba.dtype == np.uint32 and rgba.shape == rgb.shape[:3]
    v4 = rgba_view(rgba)
    assert (v4[..., :3] == rgb).all()
    assert (v4[..., 3] == 255).all()


def test_rgba_gop_concurrent(monkeypatch):
    monkeypatch.setenv("PFV_GOP_CONCURRENT", "1")
    monkeypatch.setenv("PFV_STEP", "1")
    data = _clip(128, 96, 6)
    a = np.asarray(decode_video_rgba(data))
    monkeypatch.setenv("PFV_GOP_CONCURRENT", "0")
    b = np.asarray(decode_video_rgba(data))
    assert (a == b).all()


def test_gated_ladders_exact(monkeypatch):
    """Mask-gated MC ladders decode bit-identically to the plain kernel
    (and the scalar reference)."""
    from pfv_tpu import runtime
    from pfv_tpu.dataloader import _demux_packed_to_device, decode_video_yuv

    monkeypatch.setenv("PFV_STEP", "1")
    monkeypatch.setenv("PFV_LADDER", "gated")
    data = _clip(256, 128, 8)  # cw % 128 == 0: pstep-eligible
    info, _ = _demux_packed_to_device(data, 0)
    assert info["decode_mode"] == "pstep_gated"
    y, u, v = (np.asarray(p) for p in decode_video_yuv(data))
    n, ry, ru, rv, _ = runtime.ref_decode(data)
    assert (y == ry).all() and (u == ru).all() and (v == rv).all()
