"""Fused step-kernel (ops/pallas/step_kernel.py) bit-exactness tests.

The kernel runs in interpreter mode on the CPU test backend; every test
asserts exact pixel equality against the native scalar reference decoder
(and transitively the pure-XLA paths, which are oracle-tested elsewhere).
"""

from __future__ import annotations

import io

import numpy as np
import pytest

import jax.numpy as jnp

from pfv_tpu import runtime
from pfv_tpu.dataloader import _qidx_uniform, get_decoder
from pfv_tpu.encoding import encode_video
from pfv_tpu.utils.synth import synth_yuv_frame

# this module pins the per-frame scan form of the step kernel (the
# fallback and the GOP-vmap building block); the whole-clip seq form is
# covered by test_seq_kernel.py
import os

os.environ["PFV_SEQ"] = "0"


def _clip(w, h, f, t0=0):
    ys, us, vs = map(
        np.stack, zip(*[synth_yuv_frame(t + t0, w, h) for t in range(f)])
    )
    return ys, us, vs


def _decode_pstep(data, mode="pstep"):
    """Decode through the full pstep chain: native v2 demux (stripe-layout
    unit stream) -> packed meta -> device scatter -> fused step kernel
    (interpret mode on the CPU test backend). Builds the demux tables
    directly so non-128-lane geometries are covered too (the production
    gate restricts those to the XLA paths on real hardware)."""
    from pfv_tpu.dataloader import _pstep_tables

    hdr, _ = runtime.parse_header(data)
    tables = _pstep_tables(hdr["width"], hdr["height"])
    info, deltas, vals, bh, ftype, qidx = runtime.demux_file_sparse_packed(
        data, pstep_tables=tables
    )
    dec = get_decoder(info["width"], info["height"], info["qtables"], mode)
    n = bh.size + ftype.size + qidx.size
    meta = np.empty(n, dtype=np.uint16)
    meta[: bh.size] = bh.ravel()
    meta[bh.size : bh.size + ftype.size] = ftype
    meta[bh.size + ftype.size :] = qidx.ravel()
    return dec.decode_yuv_packed(
        jnp.asarray(deltas), jnp.asarray(vals), jnp.asarray(meta)
    )


def _assert_matches_reference(data, mode="pstep"):
    y, u, v = (np.asarray(p) for p in _decode_pstep(data, mode))
    n, ry, ru, rv, _ = runtime.ref_decode(data)
    assert y.shape == ry.shape
    assert (y == ry).all(), "Y mismatch"
    assert (u == ru).all(), "U mismatch"
    assert (v == rv).all(), "V mismatch"


@pytest.mark.parametrize(
    "w,h",
    [
        (128, 96),     # lane-aligned fused canvas
        (512, 384),    # the reference's speed-test geometry
        (136, 90),     # cw > luma width: dead filler columns in the Y region
        (112, 112),    # chroma region wider than luma region
    ],
)
def test_step_kernel_geometries(w, h):
    ys, us, vs = _clip(w, h, 6)
    data = encode_video(ys, us, vs, 30, 3, keyframes=3)
    _assert_matches_reference(data)


@pytest.mark.parametrize("quality", [0, 2, 7, 10])
def test_step_kernel_quality_sweep(quality):
    ys, us, vs = _clip(128, 96, 5)
    data = encode_video(ys, us, vs, 30, quality, keyframes=5)
    _assert_matches_reference(data)


def test_step_kernel_deep_gop():
    """Long P-chain: reconstruction drift would compound over 15 frames."""
    ys, us, vs = _clip(144, 128, 16)
    data = encode_video(ys, us, vs, 30, 4, keyframes=16)
    _assert_matches_reference(data)


@pytest.mark.parametrize("mode", ["pstep_gated", "pstep_barrel"])
def test_step_kernel_mc_ladders(mode):
    """The gated and barrel MC ladder variants of the scan-form step
    kernel are bit-exact twins of the plain 33-way select ladders."""
    ys, us, vs = _clip(144, 128, 6, t0=4)
    data = encode_video(ys, us, vs, 30, 4, keyframes=6)
    _assert_matches_reference(data, mode)


def test_step_kernel_drop_frames():
    """Drop frames decode as repeat-previous; the step must not disturb
    the carried canvas (reference dec.rs:188-201, quirk Q8)."""
    from pfv_tpu import Encoder, VideoFrame

    w, h = 128, 96
    buf = io.BytesIO()
    enc = Encoder(buf, w, h, 30, 4)
    for t in range(5):
        y, u, v = synth_yuv_frame(t, w, h)
        f = VideoFrame(w, h, y, u, v)
        if t == 2:
            enc.encode_dropframe()
        (enc.encode_iframe if t == 0 else enc.encode_pframe)(f)
    enc.finish()
    _assert_matches_reference(buf.getvalue())


def test_qidx_uniform_gate():
    ftype = np.array([1, 2, 2, 1, 2], dtype=np.uint8)
    qidx = np.array(
        [[0, 1, 1], [2, 3, 3], [2, 3, 3], [0, 1, 1], [2, 3, 3]], np.uint8
    )
    assert _qidx_uniform(ftype, qidx)
    bad = qidx.copy()
    bad[2] = (2, 3, 2)  # U != V
    assert not _qidx_uniform(ftype, bad)
    bad2 = qidx.copy()
    bad2[4] = (0, 1, 1)  # P frames disagree
    assert not _qidx_uniform(ftype, bad2)
