"""Randomized differential property test: pipeline vs oracle vs scalar C++.

Random geometries, qualities and keyframe schedules; every triple must agree
byte-for-byte on encode and pixel-for-pixel on decode. Broadens the fixed
test vectors the same way the reference relies on corpus goldens.
"""

import numpy as np
import pytest


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_config_differential(seed):
    import io

    from oracle import pfv_oracle as oracle
    from pfv_tpu import Decoder, Encoder, VideoFrame, runtime
    from pfv_tpu.utils.synth import synth_yuv_frame

    rng = np.random.default_rng(100 + seed)
    w = int(rng.integers(2, 7)) * 16
    h = int(rng.integers(2, 6)) * 16
    if rng.random() < 0.5:  # sometimes non-multiple-of-16 dims
        w -= 2 * int(rng.integers(0, 4))
        h -= 2 * int(rng.integers(0, 4))
    quality = int(rng.integers(0, 11))
    n_frames = int(rng.integers(2, 7))
    keys = rng.random(n_frames) < 0.4
    keys[0] = True

    frames = [synth_yuv_frame(t, w, h, seed=500 + seed) for t in range(n_frames)]

    buf = io.BytesIO()
    enc = Encoder(buf, w, h, 30, quality)
    oenc = oracle.OracleEncoder(w, h, 30, quality)
    for t, (y, u, v) in enumerate(frames):
        f = VideoFrame(w, h, y, u, v)
        if keys[t]:
            enc.encode_iframe(f)
            oenc.encode_iframe(y, u, v)
        else:
            enc.encode_pframe(f)
            oenc.encode_pframe(y, u, v)
    enc.finish()
    data = buf.getvalue()
    assert data == oenc.finish(), (w, h, quality, keys)

    dec = Decoder(io.BytesIO(data))
    got = []
    while dec.advance_frame(lambda f: got.append((f.plane_y, f.plane_u, f.plane_v))):
        pass
    n, ry, ru, rv, _ = runtime.ref_decode(data)
    assert n == len(got) == n_frames
    for i in range(n):
        np.testing.assert_array_equal(got[i][0], ry[i], err_msg=f"{i} Y")
        np.testing.assert_array_equal(got[i][1], ru[i], err_msg=f"{i} U")
        np.testing.assert_array_equal(got[i][2], rv[i], err_msg=f"{i} V")


@pytest.mark.parametrize("pattern", ["zeros", "max", "checker", "impulse", "vstripes"])
def test_extreme_content_byte_identity(pattern):
    """Adversarial pixel patterns (incl. max high-frequency energy — the
    zone of the reference's historical fixed-point overflow, lib.rs:59)
    must encode byte-identically to the oracle and decode consistently."""
    import io

    from oracle import pfv_oracle as oracle
    from pfv_tpu import Decoder, Encoder, VideoFrame, runtime

    w, h = 48, 32
    y = np.zeros((h, w), np.uint8)
    if pattern == "max":
        y[:] = 255
    elif pattern == "checker":
        y[::2, ::2] = 255
        y[1::2, 1::2] = 255
    elif pattern == "impulse":
        y[7, 11] = 255
    elif pattern == "vstripes":
        y[:, ::2] = 255
    u = np.full((h // 2, w // 2), 0 if pattern == "max" else 255, np.uint8)
    v = np.full((h // 2, w // 2), 128, np.uint8)

    for quality in (0, 5, 10):
        buf = io.BytesIO()
        enc = Encoder(buf, w, h, 30, quality)
        oenc = oracle.OracleEncoder(w, h, 30, quality)
        enc.encode_iframe(VideoFrame(w, h, y, u, v))
        oenc.encode_iframe(y, u, v)
        enc.encode_pframe(VideoFrame(w, h, y, u, v))  # static -> all skips
        oenc.encode_pframe(y, u, v)
        enc.finish()
        data = buf.getvalue()
        assert data == oenc.finish(), (pattern, quality)

        n, ry, ru, rv, _ = runtime.ref_decode(data)
        dec = Decoder(io.BytesIO(data))
        got = []
        while dec.advance_frame(lambda f: got.append(f.plane_y)):
            pass
        assert n == len(got) == 2
        np.testing.assert_array_equal(got[0], ry[0])
        np.testing.assert_array_equal(got[1], ry[1])
