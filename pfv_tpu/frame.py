"""VideoFrame / plane containers (host side).

Mirrors the reference's pixel data model (/root/reference/src/plane.rs,
/root/reference/src/frame.rs): 4:2:0 planar YCbCr, chroma half-size each
axis, planes stored as uint8 numpy arrays (H, W). Padding to macroblock
multiples happens on device at codec boundaries.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def pad16(x: int) -> int:
    """Padded dimension (frame.rs:29-30)."""
    return x + (16 - x % 16) % 16


@dataclass
class VideoFrame:
    """A 4:2:0 video frame: Y at (height, width), U/V at half size each axis.

    Mirrors frame.rs:3-60. `new` fills chroma with 128 (neutral);
    `from_planes` accepts full-resolution chroma and point-decimates it
    (quirk Q11: no averaging).
    """

    width: int
    height: int
    plane_y: np.ndarray
    plane_u: np.ndarray
    plane_v: np.ndarray

    @classmethod
    def new(cls, width: int, height: int) -> "VideoFrame":
        assert width % 2 == 0 and height % 2 == 0
        return cls(
            width,
            height,
            np.zeros((height, width), dtype=np.uint8),
            np.full((height // 2, width // 2), 128, dtype=np.uint8),
            np.full((height // 2, width // 2), 128, dtype=np.uint8),
        )

    @classmethod
    def new_padded(cls, width: int, height: int) -> "VideoFrame":
        """Planes independently padded to multiples of 16 (frame.rs:28-49)."""
        cw, ch = width // 2, height // 2
        return cls(
            width,
            height,
            np.zeros((pad16(height), pad16(width)), dtype=np.uint8),
            np.full((pad16(ch), pad16(cw)), 128, dtype=np.uint8),
            np.full((pad16(ch), pad16(cw)), 128, dtype=np.uint8),
        )

    @classmethod
    def from_planes(
        cls,
        width: int,
        height: int,
        plane_y: np.ndarray,
        plane_u: np.ndarray,
        plane_v: np.ndarray,
    ) -> "VideoFrame":
        """Full-resolution planes; chroma is point-decimated (frame.rs:51-60)."""
        assert plane_y.shape == (height, width)
        assert plane_u.shape == (height, width)
        assert plane_v.shape == (height, width)
        return cls(
            width,
            height,
            np.asarray(plane_y, dtype=np.uint8),
            np.asarray(plane_u, dtype=np.uint8)[::2, ::2].copy(),
            np.asarray(plane_v, dtype=np.uint8)[::2, ::2].copy(),
        )

    @classmethod
    def from_rgb(cls, rgb: np.ndarray) -> "VideoFrame":
        """(H, W, 3) uint8 RGB -> 4:2:0 frame (lib.rs:337-358 semantics)."""
        import jax.numpy as jnp

        from pfv_tpu.ops.color import rgb_to_yuv

        h, w, _ = rgb.shape
        y, u, v = rgb_to_yuv(jnp.asarray(rgb))
        return cls.from_planes(w, h, np.asarray(y), np.asarray(u), np.asarray(v))

    def to_rgb(self) -> np.ndarray:
        """-> (H, W, 3) uint8 RGB, chroma nearest-neighbor doubled
        (lib.rs:360-395 semantics)."""
        import jax.numpy as jnp

        from pfv_tpu.ops.color import double_plane, yuv_to_rgb

        u = double_plane(jnp.asarray(self.plane_u))[: self.height, : self.width]
        v = double_plane(jnp.asarray(self.plane_v))[: self.height, : self.width]
        return np.asarray(yuv_to_rgb(jnp.asarray(self.plane_y), u, v))
