"""Motion search + P-frame pipeline vs the scalar oracle."""

import numpy as np
import pytest

from oracle import pfv_oracle as oracle


@pytest.fixture(scope="module")
def jnp():
    import jax.numpy as jnp

    return jnp


def _shifted_scene(rng, h, w):
    """A reference plane and a current plane that is mostly a shifted copy."""
    ref = rng.integers(0, 256, size=(h + 32, w + 32), dtype=np.uint8)
    ref = ((ref.astype(int) + np.roll(ref, 1, 0) + np.roll(ref, 1, 1)) // 3).astype(
        np.uint8
    )
    sy, sx = rng.integers(0, 20, size=2)
    cur = ref[sy : sy + h, sx : sx + w].copy()
    noise = rng.integers(-4, 5, size=cur.shape)
    cur = np.clip(cur.astype(int) + noise, 0, 255).astype(np.uint8)
    return cur, ref[16 : 16 + h, 16 : 16 + w].copy()


def test_motion_search_matches_oracle(jnp):
    from pfv_tpu.ops.blocks import block_origins, plane_to_blocks
    from pfv_tpu.ops.motion import motion_search

    rng = np.random.default_rng(10)
    for trial in range(4):
        h, w = 64, 80
        cur, ref = _shifted_scene(rng, h, w)
        by, bx = block_origins(h, w)
        blocks = plane_to_blocks(jnp.asarray(cur))
        mvx, mvy, err, win = motion_search(
            blocks, jnp.asarray(ref), jnp.asarray(by), jnp.asarray(bx)
        )
        mvx, mvy, err, win = map(np.asarray, (mvx, mvy, err, win))

        for i in range(len(by)):
            src = cur[by[i] : by[i] + 16, bx[i] : bx[i] + 16]
            odx, ody, oerr, oslice = oracle.block_search(
                src, ref, int(bx[i]), int(by[i]), 8
            )
            assert (mvx[i], mvy[i]) == (odx, ody), (trial, i)
            assert err[i] == oerr, (trial, i)
            np.testing.assert_array_equal(win[i], oslice)


def test_motion_bounds_respected(jnp):
    """Blocks at plane edges never produce out-of-range windows."""
    from pfv_tpu.ops.blocks import block_origins, plane_to_blocks
    from pfv_tpu.ops.motion import motion_search

    rng = np.random.default_rng(11)
    h, w = 48, 48
    cur = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    ref = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    by, bx = block_origins(h, w)
    mvx, mvy, _, _ = motion_search(
        plane_to_blocks(jnp.asarray(cur)), jnp.asarray(ref),
        jnp.asarray(by), jnp.asarray(bx),
    )
    sx = bx + np.asarray(mvx)
    sy = by + np.asarray(mvy)
    assert (sx >= 0).all() and (sx <= w - 16).all()
    assert (sy >= 0).all() and (sy <= h - 16).all()
    assert (np.abs(np.asarray(mvx)) <= 15).all()
    assert (np.abs(np.asarray(mvy)) <= 15).all()


def test_pframe_encode_matches_oracle(jnp):
    from pfv_tpu.ops.blocks import block_origins, plane_to_blocks
    from pfv_tpu.ops.pframe import encode_plane_delta

    rng = np.random.default_rng(12)
    h, w = 64, 80
    cur, ref = _shifted_scene(rng, h, w)
    q = np.maximum(1, (np.array(oracle.Q_TABLE_INTER) // 2)).astype(np.int32)
    quality = 2
    px_err = np.float32(quality) * np.float32(1.5)
    min_err = np.float32(px_err * px_err * np.float32(256.0))

    by, bx = block_origins(h, w)
    coeffs, mvx, mvy, has_coeff, = encode_plane_delta(
        plane_to_blocks(jnp.asarray(cur)), jnp.asarray(ref),
        jnp.asarray(by), jnp.asarray(bx), jnp.asarray(q), jnp.float32(min_err),
    )
    coeffs, mvx, mvy, has_coeff = map(np.asarray, (coeffs, mvx, mvy, has_coeff))

    for i in range(len(by)):
        src = cur[by[i] : by[i] + 16, bx[i] : bx[i] + 16]
        odx, ody, ocoeffs = oracle.encode_block_delta(
            src, ref, int(bx[i]), int(by[i]), q.tolist(), float(px_err)
        )
        assert (mvx[i], mvy[i]) == (odx, ody), i
        assert bool(has_coeff[i]) == (ocoeffs is not None), i
        if ocoeffs is not None:
            assert coeffs[i].reshape(-1).tolist() == ocoeffs, i


def test_pframe_decode_matches_oracle(jnp):
    from pfv_tpu.ops.blocks import block_origins
    from pfv_tpu.ops.pframe import decode_delta_blocks

    rng = np.random.default_rng(13)
    h, w = 48, 64
    ref = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    n = (h // 16) * (w // 16)
    by, bx = block_origins(h, w)
    q = [max(1, v) for v in oracle.Q_TABLE_INTER]

    coeffs = rng.integers(-40, 40, size=(n, 256))
    coeffs[rng.random(size=coeffs.shape) < 0.8] = 0
    coeffs = coeffs.astype(np.int16)
    mvx = rng.integers(-15, 16, size=n).astype(np.int32)
    mvy = rng.integers(-15, 16, size=n).astype(np.int32)
    # clamp motion so windows stay in bounds (encoder guarantees this)
    mvx = np.clip(mvx, -bx, w - 16 - bx)
    mvy = np.clip(mvy, -by, h - 16 - by)
    has_coeff = rng.random(n) < 0.7

    got = np.asarray(
        decode_delta_blocks(
            jnp.asarray(coeffs.reshape(n, 4, 64)),
            jnp.asarray(np.array(q, dtype=np.int32)),
            jnp.asarray(ref),
            jnp.asarray(by), jnp.asarray(bx),
            jnp.asarray(mvy), jnp.asarray(mvx),
            jnp.asarray(has_coeff),
        )
    )
    for i in range(n):
        want = oracle.decode_block_delta(
            coeffs[i].tolist() if has_coeff[i] else None,
            int(mvx[i]), int(mvy[i]), ref, int(bx[i]), int(by[i]), q,
        )
        np.testing.assert_array_equal(got[i], want)


def test_predict_blocks_mxu_matches_gather(jnp):
    """The one-hot-matmul MC twin must be bit-exact with the gather
    formulation over its whole domain (|mv| <= 16, window in-plane),
    including plane-edge blocks."""
    import numpy as np

    from pfv_tpu.ops.blocks import block_origins
    from pfv_tpu.ops.motion import gather_predictions, predict_blocks_mxu

    rng = np.random.default_rng(5)
    h, w = 96, 128
    ref = jnp.asarray(rng.integers(0, 256, size=(h, w)).astype(np.uint8))
    by, bx = block_origins(h, w)
    n = by.shape[0]
    mvy = rng.integers(-16, 17, size=n).astype(np.int32)
    mvx = rng.integers(-16, 17, size=n).astype(np.int32)
    # clamp so every window stays inside the plane (decoder precondition)
    mvy = np.clip(mvy, -by, h - 16 - by)
    mvx = np.clip(mvx, -bx, w - 16 - bx)

    want = gather_predictions(ref, jnp.asarray(by), jnp.asarray(bx),
                              jnp.asarray(mvy), jnp.asarray(mvx))
    got = predict_blocks_mxu(ref, jnp.asarray(mvy), jnp.asarray(mvx))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_foreign_large_mv_stream_uses_gather_path():
    """A legal stream with |mv| > 16 (in-plane window; the reference
    decodes it via slice indexing) must still decode exactly — the
    dataloader falls back to the gather MC path via mv_absmax."""
    import struct

    import numpy as np

    from pfv_tpu import runtime
    from pfv_tpu.dataloader import decode_video_yuv
    from pfv_tpu.frame import pad16
    from pfv_tpu.ops.quant import derive_q_tables

    w, h = 96, 64
    yb = (pad16(h) // 16) * (pad16(w) // 16)
    cb = (pad16(h // 2) // 16) * (pad16(w // 2) // 16)
    nb = yb + 2 * cb

    rng = np.random.default_rng(9)
    iframe_coeffs = rng.integers(-30, 30, size=(nb, 256)).astype(np.int16)
    iframe_coeffs[rng.random(size=iframe_coeffs.shape) < 0.8] = 0
    iframe = runtime.encode_iframe_payload(iframe_coeffs, (0, 1, 1))

    mvx = np.zeros(nb, dtype=np.int8)
    mvy = np.zeros(nb, dtype=np.int8)
    mvx[0] = 40   # block 0 at origin: window at x=40 — legal, beyond MXU range
    mvy[nb - 1] = -16  # last chroma block: pull up (chroma plane is 32 tall)
    pframe = runtime.encode_pframe_payload(
        np.zeros((nb, 256), dtype=np.int16), mvx, mvy,
        np.zeros(nb, dtype=np.uint8), (2, 3, 3),
    )

    qt = derive_q_tables(2)
    data = bytearray()
    data += b"PFVIDEO\0"
    data += struct.pack("<IHHHH", 211, w, h, 30, 4)
    for k in ("intra_l", "intra_c", "inter_l", "inter_c"):
        data += qt[k].astype("<u2").tobytes()
    for ptype, payload in ((1, iframe), (2, pframe)):
        data += struct.pack("<BI", ptype, len(payload)) + payload
    data += struct.pack("<BI", 0, 0)
    data = bytes(data)

    info, *_ = runtime.demux_file_sparse_packed(data)
    assert info["mv_absmax"] == 40

    n, ry, ru, rv, _ = runtime.ref_decode(data)
    ys, us, vs = (np.asarray(a) for a in decode_video_yuv(data))
    np.testing.assert_array_equal(ys, ry)
    np.testing.assert_array_equal(us, ru)
    np.testing.assert_array_equal(vs, rv)
