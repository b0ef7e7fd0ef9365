"""Deterministic synthetic video corpus.

The reference's test corpus (test_frames/*.png, test2.pfv) ships as Git LFS
pointer stubs, so the rebuild regenerates its own deterministic footage
(SURVEY.md §7 step 1): smooth gradients + moving rectangles + a bouncing
ball + mild seeded noise — enough structure for the DCT to bite on and
enough motion for the P-frame search to matter.
"""

from __future__ import annotations

import numpy as np


def synth_rgb_frame(t: int, width: int, height: int, seed: int = 1234) -> np.ndarray:
    """Frame t of the deterministic synthetic clip, (H, W, 3) uint8."""
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)

    # slow-moving background gradient
    r = 96 + 64 * np.sin(0.013 * xx + 0.05 * t)
    g = 96 + 64 * np.sin(0.017 * yy - 0.04 * t)
    b = 96 + 64 * np.sin(0.011 * (xx + yy) + 0.03 * t)
    img = np.stack([r, g, b], axis=-1)

    # moving rectangle (translating, constant texture -> motion-compensable)
    rng = np.random.default_rng(seed)
    tex = rng.integers(0, 255, size=(64, 96, 3)).astype(np.float32)
    tex = (tex + np.roll(tex, 1, 0) + np.roll(tex, 1, 1) + np.roll(tex, 2, 1)) / 4
    rx = int(40 + 3.0 * t) % max(1, width - 96) if width > 96 else 0
    ry = int(30 + 1.5 * t) % max(1, height - 64) if height > 64 else 0
    rh, rw = min(64, height - ry), min(96, width - rx)
    img[ry : ry + rh, rx : rx + rw] = tex[:rh, :rw]

    # bouncing ball
    bx = width / 2 + (width / 2 - 40) * np.sin(0.11 * t)
    by = height / 2 + (height / 2 - 40) * np.sin(0.07 * t + 1.0)
    mask = (xx - bx) ** 2 + (yy - by) ** 2 < 30.0**2
    img[mask] = np.array([230.0, 40.0, 40.0])

    # mild per-frame deterministic noise
    nrng = np.random.default_rng(seed * 100003 + t)
    img += nrng.normal(0.0, 2.0, size=img.shape).astype(np.float32)

    return np.clip(img, 0, 255).astype(np.uint8)


def synth_pan_frame(t: int, width: int, height: int, seed: int = 99,
                    dx: int = 3, dy: int = 1) -> np.ndarray:
    """Frame t of a panning-camera clip: a fixed textured world sampled
    through a window translating by (dx, dy) px/frame — ideal content for
    exercising motion estimation (most blocks should match at (-dx, -dy))."""
    rng = np.random.default_rng(seed)
    wh, ww = height + 256, width + 256
    # multi-octave value noise: correlation at every scale gives the 4-step
    # log search an SSD gradient at each of its step sizes (like natural
    # footage), while the finest octave makes the true match unique
    world = np.full((wh, ww, 3), 128.0, dtype=np.float32)
    for scale, amp in ((64, 48.0), (32, 28.0), (16, 16.0), (8, 9.0), (4, 5.0)):
        g = rng.normal(0, amp, size=(wh // scale + 3, ww // scale + 3, 3))
        g = g.repeat(scale, axis=0).repeat(scale, axis=1)
        for axis in (0, 1):  # box-blur at the octave's own scale
            g = (g + np.roll(g, scale // 2, axis) +
                 np.roll(g, -(scale // 2), axis)) / 3
        world += g[:wh, :ww]
    world += rng.normal(0, 2.5, size=(wh, ww, 3))
    world = np.clip(world, 0, 255)
    ox = (16 + dx * t) % (ww - width)
    oy = (16 + dy * t) % (wh - height)
    return world[oy : oy + height, ox : ox + width].astype(np.uint8)


def synth_pan_clip(
    n_frames: int, width: int, height: int, seed: int = 99,
    dx: int = 3, dy: int = 1, t0: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Frames t0 .. t0+n_frames of the panning clip as 4:2:0 YUV stacks.

    Same frames as synth_pan_frame(t, ...) for each t, but the textured
    world is built once and sliced per frame — the per-frame cost is just
    the window copy + RGB->YUV, so 1080p corpora synthesize in seconds.
    Dense texture at every scale makes this the codec's worst-case content
    (high coefficient density -> entropy-decode-bound)."""
    from pfv_tpu.ops.color import rgb_to_yuv_np

    rng = np.random.default_rng(seed)
    wh, ww = height + 256, width + 256
    world = np.full((wh, ww, 3), 128.0, dtype=np.float32)
    for scale, amp in ((64, 48.0), (32, 28.0), (16, 16.0), (8, 9.0), (4, 5.0)):
        g = rng.normal(0, amp, size=(wh // scale + 3, ww // scale + 3, 3))
        g = g.repeat(scale, axis=0).repeat(scale, axis=1)
        for axis in (0, 1):
            g = (g + np.roll(g, scale // 2, axis) +
                 np.roll(g, -(scale // 2), axis)) / 3
        world += g[:wh, :ww]
    world += rng.normal(0, 2.5, size=(wh, ww, 3))
    world = np.clip(world, 0, 255)

    ys, us, vs = [], [], []
    for t in range(t0, t0 + n_frames):
        ox = (16 + dx * t) % (ww - width)
        oy = (16 + dy * t) % (wh - height)
        rgb = world[oy : oy + height, ox : ox + width].astype(np.uint8)
        y, u, v = rgb_to_yuv_np(rgb)
        ys.append(y)
        us.append(u[::2, ::2].copy())
        vs.append(v[::2, ::2].copy())
    return np.stack(ys), np.stack(us), np.stack(vs)


def synth_yuv_frame(
    t: int, width: int, height: int, seed: int = 1234
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Frame t as 4:2:0 (Y, U, V) uint8 planes (pure host/numpy path).

    Uses the numpy twin of the codec's RGB->YUV conversion and the standard
    point-decimation (quirk Q11) so it never touches the device.
    """
    from pfv_tpu.ops.color import rgb_to_yuv_np

    y, u, v = rgb_to_yuv_np(synth_rgb_frame(t, width, height, seed))
    return y, u[::2, ::2].copy(), v[::2, ::2].copy()
