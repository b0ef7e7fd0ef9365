"""Multi-stream sharded decode over the 8-device virtual mesh."""

import io

import numpy as np
import pytest

W, H, FPS, QUALITY = 64, 48, 30, 4
N_FRAMES = 5
N_STREAMS = 8


@pytest.fixture(scope="module")
def streams():
    from pfv_tpu import Encoder, VideoFrame
    from pfv_tpu.utils.synth import synth_yuv_frame

    datas = []
    for s in range(N_STREAMS):
        buf = io.BytesIO()
        enc = Encoder(buf, W, H, FPS, QUALITY)
        for t in range(N_FRAMES):
            y, u, v = synth_yuv_frame(t, W, H, seed=1000 + s)
            f = VideoFrame(W, H, y, u, v)
            (enc.encode_iframe if t == 0 else enc.encode_pframe)(f)
        enc.finish()
        datas.append(buf.getvalue())
    return datas


def test_sharded_decode_matches_single_stream(streams):
    import jax

    from pfv_tpu.dataloader import decode_video_rgb
    from pfv_tpu.parallel.streams import decode_stream_batch_rgb, make_stream_mesh

    assert len(jax.devices()) == 8
    mesh = make_stream_mesh(8)
    rgb, global_mean = decode_stream_batch_rgb(streams, mesh)
    assert rgb.shape == (N_STREAMS, N_FRAMES, H, W, 3)
    # output is actually sharded across the mesh
    assert len(rgb.sharding.device_set) == 8

    rgb_host = np.asarray(rgb)
    for s in (0, 3, 7):
        want = np.asarray(decode_video_rgb(streams[s]))
        np.testing.assert_array_equal(rgb_host[s], want, err_msg=f"stream {s}")

    want_mean = rgb_host.astype(np.float64).mean()
    assert abs(float(global_mean) - want_mean) < 0.5


def test_mesh_subsets(streams):
    """Sharded decode works on a 4-device sub-mesh (2 streams per device)."""
    from pfv_tpu.dataloader import decode_video_rgb
    from pfv_tpu.parallel.streams import decode_stream_batch_rgb, make_stream_mesh

    mesh = make_stream_mesh(4)
    rgb, _ = decode_stream_batch_rgb(streams, mesh)
    assert rgb.shape == (N_STREAMS, N_FRAMES, H, W, 3)
    want = np.asarray(decode_video_rgb(streams[5]))
    np.testing.assert_array_equal(np.asarray(rgb)[5], want)


def test_graft_entry_single_and_multichip():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.shape == (4, 48, 64, 3)

    ge.dryrun_multichip(8)


def test_gop_sharded_decode_matches(streams):
    """GOP-parallel decode (single chip and sharded mesh) == serial decode."""
    import io

    import numpy as np

    from pfv_tpu import Encoder, VideoFrame
    from pfv_tpu.dataloader import decode_video_rgb
    from pfv_tpu.parallel.gops import decode_video_rgb_gops
    from pfv_tpu.parallel.streams import make_stream_mesh
    from pfv_tpu.utils.synth import synth_yuv_frame

    # a clip with several GOPs of uneven lengths
    buf = io.BytesIO()
    enc = Encoder(buf, W, H, FPS, 4)
    schedule = [1, 2, 2, 1, 2, 2, 2, 1, 2, 1, 2, 2]  # 4 GOPs: 3,4,2,3
    for t, k in enumerate(schedule):
        y, u, v = synth_yuv_frame(t, W, H, seed=77)
        f = VideoFrame(W, H, y, u, v)
        (enc.encode_iframe if k == 1 else enc.encode_pframe)(f)
    enc.finish()
    data = buf.getvalue()

    want = np.asarray(decode_video_rgb(data))

    got_single = np.asarray(decode_video_rgb_gops(data))
    np.testing.assert_array_equal(got_single, want)

    mesh = make_stream_mesh(4, axis="gops")
    got_sharded = np.asarray(decode_video_rgb_gops(data, mesh=mesh))
    np.testing.assert_array_equal(got_sharded, want)


def test_stream_batch_geometry_mismatch(streams):
    import io

    import pytest

    from pfv_tpu import Encoder, VideoFrame
    from pfv_tpu.parallel.streams import stack_streams
    from pfv_tpu.utils.synth import synth_yuv_frame

    buf = io.BytesIO()
    enc = Encoder(buf, 32, 32, FPS, 4)
    y, u, v = synth_yuv_frame(0, 32, 32)
    enc.encode_iframe(VideoFrame(32, 32, y, u, v))
    enc.finish()
    with pytest.raises(ValueError, match="geometry"):
        stack_streams([streams[0], buf.getvalue()])
