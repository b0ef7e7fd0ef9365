"""Semantic motion-estimation tests on panning content.

Beyond bit-exactness (test_motion.py), these check the search is *effective*:
on a rigid pan, most blocks should find the true displacement, P-frames
should be far smaller than I-frames, and encode stays byte-identical to the
oracle on motion-heavy content.
"""

import io

import numpy as np

from oracle import pfv_oracle as oracle

W, H = 128, 96


def _pan_clip(n, dx=3, dy=1):
    from pfv_tpu.ops.color import rgb_to_yuv_np
    from pfv_tpu.utils.synth import synth_pan_frame

    frames = []
    for t in range(n):
        y, u, v = rgb_to_yuv_np(synth_pan_frame(t, W, H, dx=dx, dy=dy))
        frames.append((y, u[::2, ::2].copy(), v[::2, ::2].copy()))
    return frames


def test_motion_vectors_track_the_pan():
    import jax.numpy as jnp

    from pfv_tpu.ops.blocks import block_origins, plane_to_blocks
    from pfv_tpu.ops.motion import motion_search

    clip = _pan_clip(2, dx=3, dy=1)
    ref, cur = clip[0][0], clip[1][0]  # luma planes, world pans by (3, 1)
    by, bx = block_origins(H, W)
    mvx, mvy, err, _ = motion_search(
        plane_to_blocks(jnp.asarray(cur)), jnp.asarray(ref),
        jnp.asarray(by), jnp.asarray(bx),
    )
    mvx, mvy, err = map(np.asarray, (mvx, mvy, err))
    # interior blocks (whose window stays in frame) must find a perfect
    # (zero-error) match; the 8px-periodic texture means aliased vectors can
    # tie the true (3, 1), and any zero-error window is optimal for the codec
    interior = (
        (bx + 3 >= 0) & (bx + 3 <= W - 16) & (by + 1 >= 0) & (by + 1 <= H - 16)
    )
    perfect = err == 0
    exact = (mvx == 3) & (mvy == 1) & perfect
    # the 4-step log search is a heuristic (the reference's, common.rs:154):
    # it finds the exact displacement for most blocks; misses land nearby
    assert np.median(err[interior]) == 0
    assert exact[interior].mean() > 0.5, exact[interior].mean()


def test_pan_pframes_compress_well():
    from pfv_tpu import Encoder, VideoFrame

    clip = _pan_clip(5)
    buf = io.BytesIO()
    enc = Encoder(buf, W, H, 30, 3)
    for t, (y, u, v) in enumerate(clip):
        f = VideoFrame(W, H, y, u, v)
        (enc.encode_iframe if t == 0 else enc.encode_pframe)(f)
    enc.finish()
    stats = enc.stats
    i_bytes = stats[0]["payload_bytes"]
    p_bytes = [s["payload_bytes"] for s in stats[1:]]
    # motion compensation should make P-frames tiny relative to the I-frame
    assert max(p_bytes) < i_bytes / 2, (i_bytes, p_bytes)
    assert all(s["skip_pct"] > 30 for s in stats[1:]), stats


def test_pan_content_byte_identical_to_oracle():
    from pfv_tpu import Encoder, VideoFrame

    clip = _pan_clip(4, dx=5, dy=2)
    buf = io.BytesIO()
    enc = Encoder(buf, W, H, 30, 2)
    oenc = oracle.OracleEncoder(W, H, 30, 2)
    for t, (y, u, v) in enumerate(clip):
        f = VideoFrame(W, H, y, u, v)
        if t == 0:
            enc.encode_iframe(f)
            oenc.encode_iframe(y, u, v)
        else:
            enc.encode_pframe(f)
            oenc.encode_pframe(y, u, v)
    enc.finish()
    assert buf.getvalue() == oenc.finish()
