"""Quantization bit-exactness, quirk Q1 asymmetry, q-table derivation."""

import numpy as np
import pytest

from oracle import pfv_oracle as oracle


@pytest.fixture(scope="module")
def jnp():
    import jax.numpy as jnp

    return jnp


def test_quantize_dequantize_match_oracle(jnp):
    from pfv_tpu.ops.quant import dequantize, quantize

    rng = np.random.default_rng(3)
    m = rng.integers(-(1 << 21), 1 << 21, size=(64, 64), dtype=np.int32)
    q = rng.integers(1, 100, size=64, dtype=np.int32)

    got_q = np.asarray(quantize(jnp.asarray(m), jnp.asarray(q)))
    for i in range(m.shape[0]):
        assert got_q[i].tolist() == oracle.quantize(m[i].tolist(), q.tolist())

    zz = rng.integers(-2000, 2000, size=(64, 64)).astype(np.int16)
    got_d = np.asarray(dequantize(jnp.asarray(zz), jnp.asarray(q)))
    for i in range(zz.shape[0]):
        assert got_d[i].tolist() == oracle.dequantize(zz[i].tolist(), q.tolist())


def test_q1_asymmetry_is_preserved():
    """Quantize indexes tables row-major, dequantize by zigzag slot; a
    'mathematically clean' symmetric implementation would break bitstream
    parity (SURVEY.md Q1: they disagree at 56 of 64 positions)."""
    from pfv_tpu.ops.quant import DCT_SCALE_FACTOR, INV_ZIGZAG_TABLE

    iz = INV_ZIGZAG_TABLE
    disagree = (DCT_SCALE_FACTOR[iz] != DCT_SCALE_FACTOR[np.arange(64)]).sum()
    assert disagree == 56


def test_derive_q_tables_matches_oracle():
    from pfv_tpu.ops.quant import derive_q_tables

    for quality in range(11):
        got = derive_q_tables(quality)
        want = oracle.derive_q_tables(quality)
        for k in ("intra_l", "intra_c", "inter_l", "inter_c"):
            assert got[k].tolist() == want[k], (quality, k)


def test_quality_zero_tables_all_one():
    """quality 0 -> qscale 0 -> every entry clamps to 1 (quirk Q4)."""
    from pfv_tpu.ops.quant import derive_q_tables

    t = derive_q_tables(0)
    for k in t:
        assert (t[k] == 1).all()


def test_blocks_layout_roundtrip(jnp):
    from pfv_tpu.ops.blocks import (
        blocks_to_plane,
        blocks_to_subblocks,
        plane_to_blocks,
        subblocks_to_blocks,
    )

    rng = np.random.default_rng(4)
    plane = rng.integers(0, 256, size=(48, 64), dtype=np.uint8)
    blocks = plane_to_blocks(jnp.asarray(plane))
    # raster order: block 1 is x=16..32 of the top row
    np.testing.assert_array_equal(np.asarray(blocks[1]), plane[0:16, 16:32])
    back = np.asarray(blocks_to_plane(blocks, 48, 64))
    np.testing.assert_array_equal(back, plane)

    sub = blocks_to_subblocks(blocks)
    # subblock order TL, TR, BL, BR (common.rs:141-152)
    np.testing.assert_array_equal(np.asarray(sub[1][0]), plane[0:8, 16:24])
    np.testing.assert_array_equal(np.asarray(sub[1][1]), plane[0:8, 24:32])
    np.testing.assert_array_equal(np.asarray(sub[1][2]), plane[8:16, 16:24])
    np.testing.assert_array_equal(np.asarray(sub[1][3]), plane[8:16, 24:32])
    np.testing.assert_array_equal(np.asarray(subblocks_to_blocks(sub)), np.asarray(blocks))


def test_rgb_to_yuv_np_matches_device(jnp):
    from pfv_tpu.ops.color import rgb_to_yuv, rgb_to_yuv_np

    rng = np.random.default_rng(30)
    rgb = rng.integers(0, 256, size=(37, 53, 3)).astype(np.uint8)
    got = rgb_to_yuv_np(rgb)
    want = rgb_to_yuv(jnp.asarray(rgb))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, np.asarray(w))
