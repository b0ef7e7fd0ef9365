"""Batch encoder == streaming Encoder, byte for byte."""

import io

import numpy as np
import pytest

W, H, FPS, QUALITY = 96, 64, 30, 3
N_FRAMES = 9


@pytest.fixture(scope="module")
def clip():
    from pfv_tpu.utils.synth import synth_yuv_frame

    ys, us, vs = [], [], []
    for t in range(N_FRAMES):
        y, u, v = synth_yuv_frame(t, W, H)
        ys.append(y)
        us.append(u)
        vs.append(v)
    return np.stack(ys), np.stack(us), np.stack(vs)


def _streaming_encode(clip, quality, interval):
    from pfv_tpu import Encoder, VideoFrame

    ys, us, vs = clip
    buf = io.BytesIO()
    enc = Encoder(buf, W, H, FPS, quality)
    for t in range(N_FRAMES):
        f = VideoFrame(W, H, ys[t], us[t], vs[t])
        (enc.encode_iframe if t % interval == 0 else enc.encode_pframe)(f)
    enc.finish()
    return buf.getvalue()


@pytest.mark.parametrize("quality,interval", [(3, 4), (0, 3), (8, 9)])
def test_encode_video_byte_identical(clip, quality, interval):
    from pfv_tpu.encoding import encode_video

    want = _streaming_encode(clip, quality, interval)
    got = encode_video(*clip, framerate=FPS, quality=quality, keyframes=interval)
    assert got == want


def test_encode_video_explicit_keyframe_mask(clip):
    from pfv_tpu.dataloader import decode_video_yuv
    from pfv_tpu.encoding import encode_video

    mask = np.zeros(N_FRAMES, bool)
    mask[[0, 2, 7]] = True
    data = encode_video(*clip, framerate=FPS, quality=4, keyframes=mask)
    ys, us, vs = map(np.asarray, decode_video_yuv(data))
    assert ys.shape == (N_FRAMES, H, W)
    # decoded output stays close to source
    mse = np.mean((ys.astype(np.float64) - clip[0].astype(np.float64)) ** 2)
    assert 10 * np.log10(255.0**2 / mse) > 26


def test_encode_video_gops_byte_identical(clip):
    from pfv_tpu.encoding import encode_video, encode_video_gops

    want = encode_video(*clip, framerate=FPS, quality=3, keyframes=4)
    got = encode_video_gops(*clip, framerate=FPS, quality=3, keyframes=4)
    assert got == want


def test_encode_video_gops_sharded(clip):
    from pfv_tpu.encoding import encode_video, encode_video_gops
    from pfv_tpu.parallel.streams import make_stream_mesh

    mesh = make_stream_mesh(4, axis="gops")
    want = encode_video(*clip, framerate=FPS, quality=4, keyframes=3)
    got = encode_video_gops(
        *clip, framerate=FPS, quality=4, keyframes=3, mesh=mesh
    )
    assert got == want


def test_nnz_guess_overflow_fallback(clip):
    """Sparse content then dense content at the same geometry/quality: the
    guess cap overflows and the exact fallback keeps byte-identity."""
    import numpy as np

    from pfv_tpu.encoding import _make_encoder, encode_video

    _make_encoder.cache_clear()
    ys, us, vs = clip
    # very sparse first (coarse quality on smooth content): primes the guess
    smooth = (np.zeros_like(ys) + 128, np.zeros_like(us) + 128,
              np.zeros_like(vs) + 128)
    a1 = encode_video(*smooth, framerate=FPS, quality=10, keyframes=9)
    # now dense content at the same (geometry, quality): guess must overflow
    noisy = tuple(
        (np.random.default_rng(7).integers(0, 256, p.shape)).astype(np.uint8)
        for p in (ys, us, vs)
    )
    got = encode_video(*noisy, framerate=FPS, quality=10, keyframes=9)
    _make_encoder.cache_clear()  # fresh encoder: exact path from scratch
    want = encode_video(*noisy, framerate=FPS, quality=10, keyframes=9)
    assert got == want
