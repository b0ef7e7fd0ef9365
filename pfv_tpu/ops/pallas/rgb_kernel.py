"""Fused YUV 4:2:0 -> packed RGBA8888 conversion as one Pallas TPU kernel.

Why: the XLA epilogue (chroma jnp.repeat x2 + float convert + stack to
(F, H, W, 3) u8) costs ~60 ms/clip at 1080p — the interleaved minor-3
layout tiles as T(8,128) with the 3 padded to 128, so every producer pays
a pathological relayout. Packing RGBA into one u32 lane per pixel keeps
the minor dimension = W (tiling-native); the host views the fetched
(F, H, W) u32 buffer as (F, H, W, 4) u8 for free (little-endian byte
order R, G, B, A — the layout SDL2/GL texture uploads want; the
reference's demo paints to an RGBA window surface).

Math is the bit-exact twin of ops.color.yuv_to_rgb (reference
lib.rs:378-391): f32 JPEG YCbCr constants with the reference's operation
order, Rust `as u8` saturation (truncate toward zero, clamp 0..=255).
Chroma is point-sampled 4:2:0 (quirk Q11): nearest-neighbor doubling —
lanes double through one-hot MXU expand matrices (no unaligned lane
windows, the thing Mosaic rejects), rows double through a sublane
interleave reshape.

Input is the fused decode canvas (F, chh, cw) (Y on top, U|V side by
side below — the dataloader layout), so decode -> RGBA needs no
intermediate YUV materialization.
"""

from __future__ import annotations

import functools
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rgba_kernel(w: int, y_ref, c_ref, eu_ref, ev_ref, out_ref):
    """One grid step: 32 output rows from a (1, 32, cw) luma block and its
    matching (1, 16, cw) chroma block (U and V extracted by the one-hot
    expand matrices, so no in-kernel lane slicing)."""
    f = jnp.float32
    # Mosaic has no direct u8 -> float casts; hop through i32
    y = y_ref[0, :, :w].astype(jnp.int32).astype(f)     # (32, w)
    c = c_ref[0].astype(jnp.int32).astype(jnp.bfloat16)  # (16, cw)

    def expand(e_ref):
        # (16, cw) chroma rows -> (16, w) doubled U or V lanes on the MXU;
        # exact: inputs are integers 0..255, one nonzero term per lane
        return jnp.dot(c, e_ref[...], preferred_element_type=f)

    uu = expand(eu_ref) - f(128.0)                      # (16, w)
    vv = expand(ev_ref) - f(128.0)

    def rowdouble(t):
        # (16, w) -> (32, w) nearest-neighbor row doubling
        return jnp.stack([t, t], axis=1).reshape(32, w)

    uf = rowdouble(uu)
    vf = rowdouble(vv)

    def sat(x):
        # Rust `f32 as u8`: truncate toward zero, saturate to [0, 255] —
        # after the clip, the float->int cast truncates (i32 hop: Mosaic
        # lacks direct f32 -> u32)
        return jnp.clip(x, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint32)

    # identical float op order to yuv_to_rgb (lib.rs:385-387)
    r = sat(y + f(1.402) * vf)
    g = sat(y - f(0.344136) * uf - f(0.714136) * vf)
    b = sat(y + f(1.772) * uf)
    out_ref[0] = r | (g << 8) | (b << 16) | jnp.uint32(0xFF000000)


@lru_cache(maxsize=16)
def make_canvas_rgba(height: int, width: int, chh: int, cw: int,
                     ly0: int, lc1: int, interpret: bool = False):
    """Build (F, chh, cw) u8 decode canvases -> (F, H, W) u32 RGBA.

    H pads to a 32-row multiple internally (sliced off); the canvas row
    layout is Y at rows [0, ly0), chroma below with V starting at lane
    lc1. Requires width % 128 == 0 and ly0 % 16 == 0 (both hold whenever
    the pstep decode path is active)."""
    assert width % 128 == 0 and ly0 % 16 == 0
    hp = (height + 31) // 32 * 32
    grid_rows = hp // 32
    kernel = functools.partial(_rgba_kernel, width)

    # one-hot lane-expand matrices: Eu[j, c] = (j == c//2) pulls doubled U
    # from the full chroma row; Ev[j, c] = (j == lc1 + c//2) pulls V —
    # full-width contractions instead of unaligned lane windows. Kept as
    # host numpy (this builder is cached across jit traces; a jnp
    # constant here would leak the first trace's tracer).
    j = np.arange(cw)[:, None]
    c2 = np.arange(width)[None, :] // 2
    eu_np = (j == c2).astype(np.float32)
    ev_np = (j == lc1 + c2).astype(np.float32)

    def convert(canvases):
        eu = jnp.asarray(eu_np, dtype=jnp.bfloat16)
        ev = jnp.asarray(ev_np, dtype=jnp.bfloat16)
        fdim = canvases.shape[0]
        if canvases.shape[1] < hp:
            canvases = jnp.pad(
                canvases, ((0, 0), (0, hp - canvases.shape[1]), (0, 0)))
        out = pl.pallas_call(
            kernel,
            grid=(fdim, grid_rows),
            in_specs=[
                pl.BlockSpec((1, 32, cw), lambda f, i: (f, i, 0),
                             memory_space=pltpu.VMEM),
                # chroma rows for luma rows [32i, 32i+32) start at
                # canvas row ly0 + 16i
                pl.BlockSpec((1, 16, cw),
                             lambda f, i: (f, ly0 // 16 + i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cw, width), lambda f, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cw, width), lambda f, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 32, width), lambda f, i: (f, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((fdim, hp, width), jnp.uint32),
            interpret=interpret,
        )(canvases, canvases, eu, ev)
        return out[:, :height]

    return convert
