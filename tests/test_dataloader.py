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


def test_split_units_recombine_large_values():
    """The 3-byte unit stream spans |v| > 127 across same-position repeat
    units; the device scatter-add and the 3-array reconstruction must both
    recombine them exactly (incl. the format's 15-bit extremes)."""
    import struct

    from pfv_tpu import runtime
    from pfv_tpu.frame import pad16
    from pfv_tpu.ops.quant import derive_q_tables

    w, h = 64, 48
    yb = (pad16(h) // 16) * (pad16(w) // 16)
    cb = (pad16(h // 2) // 16) * (pad16(w // 2) // 16)
    nb = yb + 2 * cb

    coeffs = np.zeros((nb, 256), dtype=np.int16)
    coeffs[0, 0] = 16383      # 129 repeat units
    coeffs[0, 1] = -16383
    coeffs[1, 7] = 128        # exactly one unit past i8
    coeffs[1, 8] = -129
    coeffs[2, 255] = 509      # block-gap + multi-unit
    coeffs[nb - 1, 0] = -200
    payload = runtime.encode_iframe_payload(coeffs, (0, 1, 1))

    qt = derive_q_tables(2)
    data = bytearray()
    data += b"PFVIDEO\0"
    data += struct.pack("<IHHHH", 211, w, h, 30, 4)
    for k in ("intra_l", "intra_c", "inter_l", "inter_c"):
        data += qt[k].astype("<u2").tobytes()
    for _ in range(2):
        data += struct.pack("<BI", 1, len(payload)) + payload
    data += struct.pack("<BI", 0, 0)
    data = bytes(data)

    # split form recombines per position
    info, deltas, vals, bh, ftype, qidx = runtime.demux_file_sparse_packed(data)
    assert np.abs(vals.astype(np.int32)).max() <= 127
    info2, idx, val, *_ = runtime.demux_file_sparse(data)
    dense = np.zeros(2 * nb * 256, dtype=np.int16)
    dense[idx] = val
    np.testing.assert_array_equal(dense.reshape(2, nb, 256)[0], coeffs)
    np.testing.assert_array_equal(dense.reshape(2, nb, 256)[1], coeffs)

    # device path decodes it identically to the scalar decoder
    from pfv_tpu.dataloader import decode_video_yuv

    n, ry, ru, rv, _ = runtime.ref_decode(data)
    ys, us, vs = (np.asarray(a) for a in decode_video_yuv(data))
    np.testing.assert_array_equal(ys, ry)
    np.testing.assert_array_equal(us, ru)
    np.testing.assert_array_equal(vs, rv)


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
