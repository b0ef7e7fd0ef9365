"""Dataloader mode: threaded demux + device scan decode vs streaming Decoder."""

import io

import numpy as np
import pytest

W, H, FPS, QUALITY = 96, 64, 30, 4
N_FRAMES = 9


@pytest.fixture(scope="module")
def encoded():
    from pfv_tpu import Encoder, VideoFrame
    from pfv_tpu.utils.synth import synth_yuv_frame

    buf = io.BytesIO()
    enc = Encoder(buf, W, H, FPS, QUALITY)
    for t in range(N_FRAMES):
        y, u, v = synth_yuv_frame(t, W, H)
        f = VideoFrame(W, H, y, u, v)
        if t % 4 == 0:
            enc.encode_iframe(f)
        else:
            enc.encode_pframe(f)
        if t == 5:
            enc.encode_dropframe()  # must be skipped by demux
    enc.finish()
    return buf.getvalue()


def test_demux_file_matches_per_packet(encoded):
    from pfv_tpu import runtime

    info, coeffs, mvx, mvy, has_coeff, ftype, qidx = runtime.demux_file(encoded)
    assert coeffs.shape[0] == N_FRAMES  # drop frame emits nothing
    assert ftype.tolist() == [1, 2, 2, 2, 1, 2, 2, 2, 1]
    assert (qidx[0] == [0, 1, 1]).all() and (qidx[1] == [2, 3, 3]).all()
    # I-frames: all blocks coded, zero motion
    assert (has_coeff[0] == 1).all() and (mvx[0] == 0).all()

    # threaded demux == single-threaded demux
    _, c2, *_ = runtime.demux_file(encoded, num_threads=4)
    np.testing.assert_array_equal(coeffs, c2)


def test_sparse_demux_matches_dense(encoded):
    from pfv_tpu import runtime

    info, coeffs, mvx, mvy, hc, ftype, qidx = runtime.demux_file(encoded)
    info2, idx, val, mvx2, mvy2, hc2, ftype2, qidx2 = runtime.demux_file_sparse(
        encoded
    )
    np.testing.assert_array_equal(mvx, mvx2)
    np.testing.assert_array_equal(mvy, mvy2)
    np.testing.assert_array_equal(hc, hc2)
    np.testing.assert_array_equal(ftype, ftype2)
    np.testing.assert_array_equal(qidx, qidx2)
    dense = np.zeros(coeffs.size, dtype=np.int16)
    dense[idx] = val
    np.testing.assert_array_equal(dense.reshape(coeffs.shape), coeffs)
    assert (val != 0).all()
    assert (np.diff(idx) > 0).all()  # strictly increasing flat indices

    # threaded == single-threaded
    _, idx4, val4, *_ = runtime.demux_file_sparse(encoded, num_threads=4)
    np.testing.assert_array_equal(idx, idx4)
    np.testing.assert_array_equal(val, val4)


def test_scan_decode_matches_streaming_decoder(encoded):
    from pfv_tpu import Decoder
    from pfv_tpu.dataloader import decode_video_yuv

    ys, us, vs = map(np.asarray, decode_video_yuv(encoded))
    assert ys.shape == (N_FRAMES, H, W)

    dec = Decoder(io.BytesIO(encoded))
    got = []
    while dec.advance_frame(lambda f: got.append((f.plane_y, f.plane_u, f.plane_v))):
        pass
    assert len(got) == N_FRAMES
    for i, (y, u, v) in enumerate(got):
        np.testing.assert_array_equal(ys[i], y, err_msg=f"frame {i} Y")
        np.testing.assert_array_equal(us[i], u, err_msg=f"frame {i} U")
        np.testing.assert_array_equal(vs[i], v, err_msg=f"frame {i} V")


def test_rgb_output_matches_frame_to_rgb(encoded):
    from pfv_tpu import Decoder, VideoFrame
    from pfv_tpu.dataloader import decode_video_rgb

    rgb = np.asarray(decode_video_rgb(encoded))
    assert rgb.shape == (N_FRAMES, H, W, 3) and rgb.dtype == np.uint8

    dec = Decoder(io.BytesIO(encoded))
    frames = []
    while dec.advance_frame(lambda f: frames.append(f)):
        pass
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(rgb[i], f.to_rgb(), err_msg=f"frame {i}")


def test_video_dataloader_pipelined(encoded):
    import jax
    import numpy as np

    from pfv_tpu.dataloader import decode_video_rgb
    from pfv_tpu.loader import VideoDataLoader, decode_many_rgb

    want = np.asarray(decode_video_rgb(encoded))
    outs = decode_many_rgb([encoded] * 3)
    assert len(outs) == 3
    for o in outs:
        np.testing.assert_array_equal(np.asarray(o), want)

    # iterator form, mixed with a second geometry
    import io

    from pfv_tpu import Encoder, VideoFrame
    from pfv_tpu.utils.synth import synth_yuv_frame

    buf = io.BytesIO()
    enc = Encoder(buf, 64, 48, 30, 5)
    y, u, v = synth_yuv_frame(0, 64, 48)
    enc.encode_iframe(VideoFrame(64, 48, y, u, v))
    enc.finish()
    other = buf.getvalue()

    shapes = [o.shape for o in VideoDataLoader([encoded, other, encoded])]
    assert shapes == [(N_FRAMES, H, W, 3), (1, 48, 64, 3), (N_FRAMES, H, W, 3)]


def test_chunked_decode_matches(encoded):
    import numpy as np

    from pfv_tpu.dataloader import decode_video_rgb, decode_video_rgb_chunks

    want = np.asarray(decode_video_rgb(encoded))
    # tiny chunk cap forces multiple chunks (keyframes every 4 of 9 frames)
    got_parts = list(decode_video_rgb_chunks(encoded, max_frames_per_chunk=5))
    assert len(got_parts) >= 2
    pos = 0
    for start, chunk in got_parts:
        assert start == pos
        chunk = np.asarray(chunk)
        np.testing.assert_array_equal(chunk, want[pos : pos + chunk.shape[0]])
        pos += chunk.shape[0]
    assert pos == want.shape[0]

    # chunk cap smaller than one GOP is rejected
    import pytest

    with pytest.raises(ValueError):
        list(decode_video_rgb_chunks(encoded, max_frames_per_chunk=2))


def test_loader_propagates_worker_errors(encoded):
    import pytest

    from pfv_tpu.loader import VideoDataLoader

    it = iter(VideoDataLoader([encoded, b"NOT A PFV FILE"]))
    first = next(it)
    assert first.shape == (N_FRAMES, H, W, 3)
    with pytest.raises(ValueError):
        for _ in it:
            pass
