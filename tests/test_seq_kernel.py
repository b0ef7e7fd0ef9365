"""Whole-clip sequential step kernel (make_step_seq) bit-exactness tests.

The seq kernel replaces the per-frame lax.scan with ONE pallas_call over
grid (F, gch); the frame dependency rides the output buffer via manual
band DMA (double-buffered reads and writes). These tests force the
non-GOP pstep path (PFV_GOP_CONCURRENT=0, PFV_SEQ=1) and assert exact
pixel equality against the native scalar reference decoder, in interpret
mode on the CPU test backend.
"""

from __future__ import annotations

import numpy as np
import pytest

from pfv_tpu import runtime
from pfv_tpu.encoding import encode_video
from pfv_tpu.utils.synth import synth_yuv_frame


def _clip(w, h, f, t0=0):
    ys, us, vs = map(
        np.stack, zip(*[synth_yuv_frame(t + t0, w, h) for t in range(f)])
    )
    return ys, us, vs


def _decode_seq(data, monkeypatch, ladder):
    """Route decode_video_yuv through the seq kernel (fresh decoder cache
    so the env gates are re-read)."""
    from pfv_tpu import dataloader

    monkeypatch.setenv("PFV_STEP", "1")
    monkeypatch.setenv("PFV_SEQ", "1")
    monkeypatch.setenv("PFV_GOP_CONCURRENT", "0")
    monkeypatch.setenv("PFV_UNITS", "0")  # the DENSE seq kernel is under
    # test here; the units (in-kernel densify) twin has its own module
    monkeypatch.setenv("PFV_LADDER", ladder)
    dataloader._make_decoder.cache_clear()
    try:
        return tuple(
            np.asarray(p) for p in dataloader.decode_video_yuv(data)
        )
    finally:
        dataloader._make_decoder.cache_clear()


@pytest.mark.parametrize("ladder", ["plain", "gated", "barrel"])
def test_seq_kernel_matches_reference(ladder, monkeypatch):
    # keyframes=4 puts an I-frame mid-stream: exercises the band-prefetch
    # skip for intra frames and the resume after it
    ys, us, vs = _clip(128, 96, 7)
    data = encode_video(ys, us, vs, 30, quality=2, keyframes=4)
    y, u, v = _decode_seq(data, monkeypatch, ladder)
    n, ry, ru, rv, _ = runtime.ref_decode(data)
    assert (y == ry).all() and (u == ru).all() and (v == rv).all()


def test_seq_kernel_long_gop(monkeypatch):
    # one keyframe only: every P frame reads the band from the previous
    # frame's freshly written stripes (the DMA ordering contract)
    ys, us, vs = _clip(128, 96, 6, t0=3)
    data = encode_video(ys, us, vs, 30, quality=4, keyframes=100)
    y, u, v = _decode_seq(data, monkeypatch, "plain")
    n, ry, ru, rv, _ = runtime.ref_decode(data)
    assert (y == ry).all() and (u == ru).all() and (v == rv).all()


def test_gopcat_seq_matches_reference(monkeypatch):
    # uniform keyframe interval routes through the GOP-width-concat seq
    # path (G GOPs side by side in one wide canvas, one pallas_call);
    # 7 frames at keyframes=4 -> (G=2, L=4) with one pad frame
    from pfv_tpu import dataloader

    monkeypatch.setenv("PFV_STEP", "1")
    monkeypatch.setenv("PFV_SEQ", "1")
    # units preempts GOP-concat since r5 (measured 2.4x faster); force
    # the scatter family so the concat routing under test engages
    monkeypatch.setenv("PFV_UNITS", "0")
    monkeypatch.delenv("PFV_GOP_CONCURRENT", raising=False)
    dataloader._make_decoder.cache_clear()
    ys, us, vs = _clip(128, 96, 7)
    data = encode_video(ys, us, vs, 30, quality=2, keyframes=4)
    info = dataloader._demux_packed_to_device(data, 0)[0]
    assert info["gop_shape"] == (2, 4)   # the path under test is taken
    try:
        y, u, v = (np.asarray(p)
                   for p in dataloader.decode_video_yuv(data))
    finally:
        dataloader._make_decoder.cache_clear()
    n, ry, ru, rv, _ = runtime.ref_decode(data)
    assert (y == ry).all() and (u == ru).all() and (v == rv).all()


def test_gopcat_three_gops(monkeypatch):
    # G=3 exercises a non-power-of-two GOP lane offset in the scatter
    # remap (sd's shape: the reference speed-test workload decodes as
    # (3, 60) GOPs)
    from pfv_tpu import dataloader

    monkeypatch.setenv("PFV_STEP", "1")
    monkeypatch.setenv("PFV_SEQ", "1")
    monkeypatch.setenv("PFV_UNITS", "0")
    monkeypatch.delenv("PFV_GOP_CONCURRENT", raising=False)
    dataloader._make_decoder.cache_clear()
    ys, us, vs = _clip(128, 96, 9, t0=5)
    data = encode_video(ys, us, vs, 30, quality=3, keyframes=3)
    info = dataloader._demux_packed_to_device(data, 0)[0]
    assert info["gop_shape"] == (3, 3)
    try:
        y, u, v = (np.asarray(p)
                   for p in dataloader.decode_video_yuv(data))
    finally:
        dataloader._make_decoder.cache_clear()
    n, ry, ru, rv, _ = runtime.ref_decode(data)
    assert (y == ry).all() and (u == ru).all() and (v == rv).all()


def test_seq_kernel_sb2(monkeypatch):
    # 128x128 -> gch=12, gly=8: sb=2 divides both (6 grid steps/frame,
    # two stripes per step share one band window)
    from pfv_tpu import dataloader

    monkeypatch.setenv("PFV_SB", "2")
    assert dataloader._pick_sb(12, 8) == 2
    ys, us, vs = _clip(128, 128, 6, t0=2)
    data = encode_video(ys, us, vs, 30, quality=2, keyframes=100)
    y, u, v = _decode_seq(data, monkeypatch, "plain")
    n, ry, ru, rv, _ = runtime.ref_decode(data)
    assert (y == ry).all() and (u == ru).all() and (v == rv).all()


def test_seq_kernel_sb3_gated(monkeypatch):
    # 96x144: gch = 9 + ... -> gly=9, chroma 80/16=5 -> gch=14? use
    # 144x144: gly=9, gchc=5 -> gch=14 (no sb>1); pick 128x192 instead:
    # gly=12, gchc=6 -> gch=18, sb=3 -> 6 steps/frame
    from pfv_tpu import dataloader

    monkeypatch.setenv("PFV_SB", "3")
    assert dataloader._pick_sb(18, 12) == 3
    ys, us, vs = _clip(128, 192, 5, t0=7)
    data = encode_video(ys, us, vs, 30, quality=3, keyframes=3)
    y, u, v = _decode_seq(data, monkeypatch, "gated")
    n, ry, ru, rv, _ = runtime.ref_decode(data)
    assert (y == ry).all() and (u == ru).all() and (v == rv).all()
