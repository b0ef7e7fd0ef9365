"""Entropy layer: C++ runtime vs pure-python oracle, byte-identical payloads.

Mirrors the reference's entropy tests (lib.rs:96-239) plus cross-implementation
mux equality — the strongest available stand-in for golden fixtures.
"""

import numpy as np

from oracle import pfv_oracle as oracle
from pfv_tpu import runtime


def _random_sparse_coeffs(rng, n_blocks):
    """Realistically sparse zigzag coefficients: mostly zeros, some runs."""
    c = rng.integers(-300, 300, size=(n_blocks, 256))
    mask = rng.random(size=c.shape) < 0.85
    c[mask] = 0
    c[:, 0] = rng.integers(-1200, 1200, size=n_blocks)  # DC usually nonzero
    return c.astype(np.int16)


def test_rle_literal_from_reference():
    """The literal sequence from test_entropy (lib.rs:98)."""
    data = [10, 0, 0, 5, 3, 0, 0, 0, 0, -10]
    seq = oracle.rle_encode(data)
    assert seq == [
        (0, 5, 10),  # 10 -> 4 magnitude bits + sign
        (2, 4, 5),
        (0, 3, 3),
        (4, 5, -10),
    ]


def test_rle_long_runs_flush():
    """Runs cap at 15 with (15,0) fillers; trailing run flushes (Q6)."""
    data = [0] * 40 + [7] + [0] * 20
    seq = oracle.rle_encode(data)
    assert seq == [(15, 0, 0), (15, 0, 0), (10, 4, 7), (15, 0, 0), (5, 0, 0)]


def test_huffman_tie_breaking_deterministic():
    """Equal frequencies resolve by the reference's stable ordering (Q2)."""
    table = [5, 5, 5, 5, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    codes, _ = oracle.huffman_from_table(table)
    assert sorted(codes.keys()) == [0, 1, 2, 3]
    # all codes 2 bits, prefix-free
    assert all(length == 2 for _, length in codes.values())
    assert len({v & 3 for v, _ in codes.values()}) == 4


def test_iframe_payload_cpp_matches_oracle_bytes():
    rng = np.random.default_rng(5)
    coeffs = _random_sparse_coeffs(rng, 24)
    qidx = (0, 1, 1)
    got = runtime.encode_iframe_payload(coeffs, qidx)
    want = oracle.encode_iframe_payload(
        [coeffs[i].tolist() for i in range(coeffs.shape[0])], qidx
    )
    assert got == want


def test_iframe_payload_roundtrip_cpp():
    rng = np.random.default_rng(6)
    coeffs = _random_sparse_coeffs(rng, 24)
    payload = runtime.encode_iframe_payload(coeffs, (0, 1, 1))
    dec, qidx = runtime.decode_iframe_payload(payload, 24)
    np.testing.assert_array_equal(dec, coeffs)
    assert qidx.tolist() == [0, 1, 1]


def test_iframe_payload_cross_decode():
    """C++-encoded payload decodes identically through the python oracle."""
    rng = np.random.default_rng(7)
    coeffs = _random_sparse_coeffs(rng, 8)
    payload = runtime.encode_iframe_payload(coeffs, (0, 1, 1))
    o_coeffs, o_qidx = oracle.decode_iframe_payload(payload, 8)
    np.testing.assert_array_equal(
        np.array(o_coeffs, dtype=np.int16).reshape(8, 256), coeffs
    )
    assert o_qidx == [0, 1, 1]


def test_pframe_payload_cpp_matches_oracle_bytes():
    rng = np.random.default_rng(8)
    n = 30
    coeffs = _random_sparse_coeffs(rng, n)
    mvx = rng.integers(-15, 16, size=n).astype(np.int8)
    mvy = rng.integers(-15, 16, size=n).astype(np.int8)
    has_coeff = (rng.random(n) < 0.6).astype(np.uint8)
    qidx = (2, 3, 3)

    got = runtime.encode_pframe_payload(coeffs, mvx, mvy, has_coeff, qidx)
    blocks = [
        (int(mvx[i]), int(mvy[i]), coeffs[i].tolist() if has_coeff[i] else None)
        for i in range(n)
    ]
    want = oracle.encode_pframe_payload(blocks, qidx)
    assert got == want


def test_pframe_payload_roundtrip_cpp():
    rng = np.random.default_rng(9)
    n = 30
    coeffs = _random_sparse_coeffs(rng, n)
    mvx = rng.integers(-15, 16, size=n).astype(np.int8)
    mvy = rng.integers(-15, 16, size=n).astype(np.int8)
    has_coeff = (rng.random(n) < 0.6).astype(np.uint8)

    payload = runtime.encode_pframe_payload(coeffs, mvx, mvy, has_coeff, (2, 3, 3))
    d_coeffs, d_mvx, d_mvy, d_hc, d_qidx = runtime.decode_pframe_payload(payload, n)

    np.testing.assert_array_equal(d_hc, has_coeff)
    np.testing.assert_array_equal(d_mvx, mvx)
    np.testing.assert_array_equal(d_mvy, mvy)
    assert d_qidx.tolist() == [2, 3, 3]
    want = coeffs.copy()
    want[has_coeff == 0] = 0  # skipped blocks carry no coefficients
    np.testing.assert_array_equal(d_coeffs, want)


def test_all_zero_coefficients():
    """A fully-zero frame exercises the degenerate 2-symbol tree."""
    coeffs = np.zeros((6, 256), dtype=np.int16)
    payload = runtime.encode_iframe_payload(coeffs, (0, 1, 1))
    dec, _ = runtime.decode_iframe_payload(payload, 6)
    np.testing.assert_array_equal(dec, coeffs)
    want = oracle.encode_iframe_payload([[0] * 256] * 6, (0, 1, 1))
    assert payload == want


def test_corrupt_payload_raises():
    import pytest

    with pytest.raises(ValueError):
        runtime.decode_iframe_payload(b"\x00" * 8, 4)


def test_sparse_payload_encoders_byte_identical():
    """The sparse-input payload encoders (O(nonzeros) mux fast path) must
    produce byte-identical payloads to the dense encoders, including
    skipped-block entries (ignored) and explicit zero values (merged into
    runs)."""
    rng = np.random.default_rng(77)
    n = 24
    coeffs = rng.integers(-300, 300, size=(n, 256)).astype(np.int16)
    coeffs[rng.random(size=coeffs.shape) < 0.85] = 0
    coeffs[3] = 0  # an all-zero block
    coeffs[4, 255] = 100  # nonzero in the last slot (no trailing run)

    flat = coeffs.reshape(-1)
    idx = np.flatnonzero(flat).astype(np.int32)
    val = flat[idx]

    want = runtime.encode_iframe_payload(coeffs, (0, 1, 1))
    got = runtime.encode_iframe_payload_sparse(idx, val, n, (0, 1, 1))
    assert got == want

    # explicit zeros in the sparse list merge into runs (no-op)
    idx2 = np.sort(np.concatenate([idx, np.array([3 * 256 + 9], np.int32)]))
    val2 = flat[idx2]
    assert runtime.encode_iframe_payload_sparse(idx2, val2, n, (0, 1, 1)) == want

    mvx = rng.integers(-15, 16, size=n).astype(np.int8)
    mvy = rng.integers(-15, 16, size=n).astype(np.int8)
    hc = (rng.random(n) < 0.6).astype(np.uint8)
    want_p = runtime.encode_pframe_payload(coeffs, mvx, mvy, hc, (2, 3, 3))
    # dense encoder ignores skipped blocks' coefficients; feed the sparse
    # encoder the full list (incl. skipped-block entries) to prove it
    # ignores them identically
    got_p = runtime.encode_pframe_payload_sparse(idx, val, mvx, mvy, hc,
                                                 (2, 3, 3))
    assert got_p == want_p
