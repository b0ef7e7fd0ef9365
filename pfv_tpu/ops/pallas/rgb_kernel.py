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
    """One grid step: 32 rows x one lane-chunk of output from a
    (1, 32, wc) luma block and the full (1, 16, cw) chroma row (U and V
    extracted by the per-chunk one-hot expand matrices, so no in-kernel
    lane slicing). w here is the CHUNK width: the expand matrices are
    (cw, wc) slices — at 1080p the full (1920, 1920) pair was 2 x 7.4 MB
    of VMEM and, double-buffered, blew the scoped-vmem budget on real
    hardware (r5: kernel-vmem-stack-oom); chunking the output lanes
    bounds them to (cw, wc<=512)."""
    f = jnp.float32
    # Mosaic has no direct u8 -> float casts; hop through i32
    y = y_ref[0, :, :w].astype(jnp.int32).astype(f)     # (32, wc)
    c = c_ref[0].astype(jnp.int32).astype(jnp.bfloat16)  # (16, cw)

    def expand(e_ref):
        # (16, cw) chroma rows -> (16, wc) doubled U or V lanes on the
        # MXU; exact: integer inputs 0..255, one nonzero term per lane
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

    # Output-lane chunking (VMEM bound): pick the smallest chunk count k
    # dividing width/128 such that the per-chunk expand matrices
    # (cw, width/k) bf16 stay small; k=1 falls back to the full-width
    # form (small geometries). 1080p: width/128 = 15 -> k = 5, chunks of
    # 384 lanes, matrices 2 x 1.47 MB instead of 2 x 7.4 MB.
    w128 = width // 128
    k = 1
    for cand in range(1, w128 + 1):
        if w128 % cand == 0 and width // cand <= 512:
            k = cand
            break
    wc = width // k
    kernel = functools.partial(_rgba_kernel, wc)

    # one-hot lane-expand matrices: Eu[j, c] = (j == c//2) pulls doubled U
    # from the full chroma row; Ev[j, c] = (j == lc1 + c//2) pulls V —
    # full-width contractions instead of unaligned lane windows (which
    # Mosaic rejects; lc1 is not 128-aligned). Kept as host numpy (this
    # builder is cached across jit traces; a jnp constant here would leak
    # the first trace's tracer).
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
            grid=(fdim, grid_rows, k),
            in_specs=[
                pl.BlockSpec((1, 32, wc), lambda f, i, j: (f, i, j),
                             memory_space=pltpu.VMEM),
                # chroma rows for luma rows [32i, 32i+32) start at
                # canvas row ly0 + 16i; full row (U/V extraction is in
                # the expand contraction, not lane slicing)
                pl.BlockSpec((1, 16, cw),
                             lambda f, i, j: (f, ly0 // 16 + i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cw, wc), lambda f, i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cw, wc), lambda f, i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 32, wc), lambda f, i, j: (f, i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((fdim, hp, width), jnp.uint32),
            interpret=interpret,
        )(canvases, canvases, eu, ev)
        return out[:, :height]

    return convert
