"""Units-fed seq kernel (make_step_seq_units) bit-exactness tests.

The units path replaces the XLA scatter densify + dense coefficient
pipeline with IN-KERNEL densify: the native tile demux
(runtime.demux_file_sparse_tiles) buckets units per (frame, stripe) tile
in fixed-size chunks, and the kernel accumulates each stripe's (64, 2*scp)
coefficient tile from compare-built one-hot factors multiplied on the MXU
(exact: integer values << 2^24 in f32 accumulation). These tests force the
path (PFV_GOP_CONCURRENT=0 + pstep geometry => _units_wanted) and assert
exact pixel equality against the native scalar reference decoder, in
interpret mode on the CPU test backend.
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


def _decode_units(data, monkeypatch, ladder="auto", sb=None):
    from pfv_tpu import dataloader

    monkeypatch.setenv("PFV_STEP", "1")
    monkeypatch.setenv("PFV_SEQ", "1")
    monkeypatch.setenv("PFV_UNITS", "1")
    monkeypatch.setenv("PFV_GOP_CONCURRENT", "0")
    if ladder != "auto":
        monkeypatch.setenv("PFV_LADDER", ladder)
    if sb is not None:
        monkeypatch.setenv("PFV_SB", str(sb))
    dataloader._make_decoder.cache_clear()
    try:
        info, args = dataloader._demux_packed_to_device(data, 0)
        assert info.get("units", 0) > 0, "units path not taken"
        assert len(args) == 3  # (units, coff, meta)
        return tuple(
            np.asarray(p) for p in dataloader.decode_video_yuv(data)
        )
    finally:
        dataloader._make_decoder.cache_clear()


def _assert_ref(data, got):
    n, ry, ru, rv, _ = runtime.ref_decode(data)
    y, u, v = got
    assert (y == ry).all() and (u == ru).all() and (v == rv).all()


@pytest.mark.parametrize("ladder", ["plain", "barrel"])
def test_units_matches_reference(ladder, monkeypatch):
    # keyframes=4 puts an I-frame mid-stream (dense unit tiles) between
    # P-frames (sparse tiles, many empty); 256 wide => pstep-eligible
    ys, us, vs = _clip(256, 128, 7)
    data = encode_video(ys, us, vs, 30, quality=2, keyframes=4)
    _assert_ref(data, _decode_units(data, monkeypatch, ladder))


def test_units_long_gop_gated(monkeypatch):
    # single keyframe: every P band read chains through freshly written
    # stripes; gated ladders exercise the scratch-VMEM MC variant next
    # to the in-kernel densify's own scratch
    ys, us, vs = _clip(128, 96, 6, t0=3)
    data = encode_video(ys, us, vs, 30, quality=4, keyframes=100)
    _assert_ref(data, _decode_units(data, monkeypatch, "gated"))


def test_units_sb2(monkeypatch):
    # sb=2: two stripes (= two unit tiles) share one grid step; each
    # densifies into the shared acc scratch sequentially
    from pfv_tpu import dataloader

    monkeypatch.setenv("PFV_SB", "2")
    assert dataloader._pick_sb(12, 8) == 2
    ys, us, vs = _clip(128, 128, 5, t0=2)
    data = encode_video(ys, us, vs, 30, quality=2, keyframes=100)
    _assert_ref(data, _decode_units(data, monkeypatch, "plain", sb=2))


def test_units_multichunk_tiles(monkeypatch):
    # quality=0 keeps many coefficients => tiles span several chunks,
    # exercising the double-buffered chunk DMA loop (nch > 1)
    from pfv_tpu import dataloader

    ys, us, vs = _clip(256, 128, 4, t0=7)
    data = encode_video(ys, us, vs, 30, quality=0, keyframes=4)
    tt = dataloader._tile_tables(256, 128)
    _, _, coff, _, _, _ = runtime.demux_file_sparse_tiles(
        data, tt, chunk=dataloader._UNITS_CHUNK)
    assert int(np.diff(coff).max()) > 1, "clip too sparse for the test"
    _assert_ref(data, _decode_units(data, monkeypatch))


def test_tile_demux_matches_pstep_chain(monkeypatch):
    # the tile demux's bucketed units scatter-add to exactly the dense
    # tensor the pstep delta chain produces (order-free equivalence)
    from pfv_tpu import dataloader as dl

    W, H = 256, 128
    ys, us, vs = _clip(W, H, 5)
    data = encode_video(ys, us, vs, 30, quality=1, keyframes=3)

    off, r_of_zz, row_span = dl._pstep_tables(W, H)
    info, deltas, vals, bh, ftype, qidx = runtime.demux_file_sparse_packed(
        data, 0, pstep_tables=(off, r_of_zz, row_span))
    f = ftype.shape[0]
    pos = np.cumsum(deltas.astype(np.int64))
    keep = (vals != 0) & (pos < f * 64 * row_span)
    dense = np.zeros(f * 64 * row_span, np.int32)
    np.add.at(dense, pos[keep], vals[keep].astype(np.int32))

    tt = dl._tile_tables(W, H)
    gch = tt[3]
    rs = row_span // gch
    info3, units, coff, bh3, ft3, qi3 = runtime.demux_file_sparse_tiles(
        data, tt, chunk=64)
    assert np.array_equal(bh, bh3)
    assert np.array_equal(ftype, ft3) and np.array_equal(qidx, qi3)
    got = np.zeros((f, gch, 64, rs), np.int32)
    for t in range(f * gch):
        a, b = int(coff[t]), int(coff[t + 1])
        if a == b:
            continue
        ww = units[a:b].reshape(-1).astype(np.int64)
        ii = ww >> 16
        # low 16 bits: the i8 addend sign-extended to u16
        vv = ((ww & 0xFFFF) ^ 0x8000) - 0x8000
        fi, s = divmod(t, gch)
        np.add.at(got[fi, s], (ii >> 10, ii & 1023), vv)
    want = dense.reshape(f, 64, gch, rs).transpose(0, 2, 1, 3)
    assert np.array_equal(got, want)
