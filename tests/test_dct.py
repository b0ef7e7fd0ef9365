"""Integer DCT/iDCT bit-exactness vs the independent oracle.

Mirrors the reference's transform tests (lib.rs:36-94) and extends them with
randomized differential checks (the reference's golden fixtures are LFS
stubs, so the oracle stands in as ground truth).
"""

import numpy as np
import pytest

from oracle import pfv_oracle as oracle


@pytest.fixture(scope="module")
def jnp():
    import jax.numpy as jnp

    return jnp


def test_tdiv_pow2_matches_rust_division(jnp):
    from pfv_tpu.ops.dct import tdiv_pow2

    x = np.arange(-1000, 1000, dtype=np.int32)
    for k in (1, 2, 4):
        got = np.asarray(tdiv_pow2(jnp.asarray(x), k))
        want = np.array([oracle.tdiv(int(v), 1 << k) for v in x], dtype=np.int32)
        np.testing.assert_array_equal(got, want)


def test_fdct8_idct8_match_oracle(jnp):
    from pfv_tpu.ops.dct import fdct8, idct8

    rng = np.random.default_rng(0)
    vecs = rng.integers(-(128 << 8), 128 << 8, size=(256, 8), dtype=np.int32)
    got_f = np.asarray(fdct8(jnp.asarray(vecs)))
    got_i = np.asarray(idct8(jnp.asarray(vecs)))
    for i in range(vecs.shape[0]):
        assert got_f[i].tolist() == oracle.fdct8([int(v) for v in vecs[i]])
        assert got_i[i].tolist() == oracle.idct8([int(v) for v in vecs[i]])


def test_fdct2d_idct2d_match_oracle(jnp):
    from pfv_tpu.ops.dct import fdct2d, idct2d

    rng = np.random.default_rng(1)
    ms = rng.integers(-(128 << 8), 128 << 8, size=(64, 8, 8), dtype=np.int32)
    got_f = np.asarray(fdct2d(jnp.asarray(ms)))
    got_i = np.asarray(idct2d(jnp.asarray(ms)))
    for i in range(ms.shape[0]):
        flat = [int(v) for v in ms[i].reshape(-1)]
        assert got_f[i].reshape(-1).tolist() == oracle.fdct2d(flat)
        assert got_i[i].reshape(-1).tolist() == oracle.idct2d(flat)


def test_dct_encode_regression_block(jnp):
    """The overflow-regression block from the reference (lib.rs:57-94)."""
    from pfv_tpu.ops.dct import fdct2d, idct2d
    from pfv_tpu.ops.quant import dequantize, quantize

    qtable = np.array(
        [5, 10, 11, 13, 16, 16, 18, 21, 10, 10, 13, 15, 16, 18, 21, 23,
         11, 13, 16, 16, 18, 21, 21, 23, 13, 13, 16, 16, 18, 21, 23, 25,
         13, 16, 16, 18, 20, 21, 25, 30, 16, 16, 18, 20, 21, 25, 30, 36,
         16, 16, 18, 21, 23, 28, 35, 43, 16, 18, 21, 23, 28, 35, 43, 51],
        dtype=np.int32,
    )
    px = [44, 42, 43, 43, 46, 49, 42, 33, 36, 49, 56, 47, 42, 41, 36, 28,
          36, 48, 57, 52, 42, 35, 29, 23, 36, 35, 41, 48, 45, 32, 25, 24,
          32, 27, 30, 39, 41, 32, 25, 26, 26, 27, 29, 30, 31, 31, 27, 23,
          29, 27, 27, 27, 30, 31, 26, 20, 35, 23, 19, 27, 34, 30, 22, 16]

    m = (np.array(px, dtype=np.int32) - 128) << 8
    f = fdct2d(jnp.asarray(m.reshape(1, 8, 8)))
    q = quantize(f.reshape(1, 64), jnp.asarray(qtable))
    d = dequantize(q, jnp.asarray(qtable))
    out = idct2d(d.reshape(1, 8, 8))
    out_px = (np.asarray(out).reshape(-1) >> 8) + 128

    # differential vs oracle
    o = oracle.quantize(oracle.fdct2d([(p - 128) << 8 for p in px]), qtable.tolist())
    assert np.asarray(q).reshape(-1).tolist() == o
    o2 = oracle.idct2d(oracle.dequantize(o, qtable.tolist()))
    np.testing.assert_array_equal(out_px, (np.array(o2) >> 8) + 128)

    # quality sanity: round trip should stay close to the input
    assert np.abs(out_px - np.array(px)).mean() < 6


def test_intra_roundtrip_quality(jnp):
    """decode(encode(x)) stays close to x at fine quantization."""
    from pfv_tpu.ops.iframe import decode_blocks, encode_blocks

    rng = np.random.default_rng(2)
    # smooth-ish blocks: random low-frequency content
    base = rng.integers(40, 216, size=(32, 1, 1), dtype=np.int32)
    grad = rng.integers(-3, 4, size=(32, 16, 16), dtype=np.int32).cumsum(axis=1)
    blocks = np.clip(base + grad, 0, 255).astype(np.uint8)

    q = jnp.asarray(np.ones(64, dtype=np.int32))
    coeffs = encode_blocks(jnp.asarray(blocks), q)
    recon = np.asarray(decode_blocks(coeffs, q))
    err = np.abs(recon.astype(int) - blocks.astype(int))
    assert err.max() <= 16 and err.mean() < 2.0
