"""Fused forward-DCT Pallas kernel: pixels -> transform coefficients.

Same lane-packed layout as idct_kernel: subblocks on the 128-lane axis,
(8, 8) element grid on the leading axes. Bit-exact twin of
pfv_tpu.ops.dct.fdct2d with the (px - 128) << 8 centering fused in
(reference /root/reference/src/common.rs:287-298, dct.rs:176-239).
Quantization (gather + multiply + truncating divide) stays in XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pfv_tpu.ops.blocks import blocks_to_subblocks
from pfv_tpu.ops.dct import FP_BITS, tdiv_pow2
from pfv_tpu.ops.quant import quantize

_TILE_X = 512


def _fdct8_ax(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    def g(j):
        return x[j] if axis == 0 else x[:, j]

    i0, i1, i2, i3, i4, i5, i6, i7 = (g(j) for j in range(8))
    a0 = i0 + i7
    a1 = i1 + i6
    a2 = i2 + i5
    a3 = i3 + i4
    a4 = i0 - i7
    a5 = i1 - i6
    a6 = i2 - i5
    a7 = i3 - i4
    b0 = a0 + a3
    b1 = a1 + a2
    b2 = a0 - a3
    b3 = a1 - a2
    c0 = b0 + b1
    c1 = b0 - b1
    c2 = b2 + tdiv_pow2(b2, 2) + tdiv_pow2(b3, 1)
    c3 = tdiv_pow2(b2, 1) - b3 - tdiv_pow2(b3, 2)
    b4 = tdiv_pow2(a7, 2) + a4 + tdiv_pow2(a4, 2) - tdiv_pow2(a4, 4)
    b7 = tdiv_pow2(a4, 2) - a7 - tdiv_pow2(a7, 2) + tdiv_pow2(a7, 4)
    b5 = a5 + a6 - tdiv_pow2(a6, 2) - tdiv_pow2(a6, 4)
    b6 = a6 - a5 + tdiv_pow2(a5, 2) + tdiv_pow2(a5, 4)
    c4 = b4 + b5
    c5 = b4 - b5
    c6 = b6 + b7
    c7 = b6 - b7
    d4 = c4
    d5 = c5 + c7
    d6 = c5 - c7
    d7 = c6
    out = [c0, d4, c2, d6, c1, d5, c3, d7]
    return jnp.stack(out, axis=axis)


def _fdct_kernel(px_ref, m_ref):
    px = px_ref[:].astype(jnp.int32).reshape(8, 8, px_ref.shape[-1])
    m = (px - 128) << FP_BITS
    m = _fdct8_ax(m, 1)  # rows pass first (common.rs:294)
    m = _fdct8_ax(m, 0)  # then columns
    m_ref[:] = m.reshape(64, -1)


def fdct_packed(px_packed: jnp.ndarray) -> jnp.ndarray:
    """(64, X) u8 row-major subblock pixels -> (64, X) i32 DCT coeffs."""
    x = px_packed.shape[-1]
    assert x % _TILE_X == 0, x
    return pl.pallas_call(
        _fdct_kernel,
        grid=(x // _TILE_X,),
        in_specs=[
            pl.BlockSpec((64, _TILE_X), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (64, _TILE_X), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((64, x), jnp.int32),
        interpret=jax.default_backend() == "cpu",
    )(px_packed)


def encode_blocks_pallas(blocks: jnp.ndarray, q_table: jnp.ndarray) -> jnp.ndarray:
    """Pallas twin of pfv_tpu.ops.iframe.encode_blocks.

    (N, 16, 16) uint8 macroblocks -> (N, 4, 64) int16 zigzag coefficients.
    """
    n = blocks.shape[0]
    sub = blocks_to_subblocks(blocks)  # (N, 4, 8, 8) u8
    x = n * 4
    xp = ((x + _TILE_X - 1) // _TILE_X) * _TILE_X
    packed = jnp.transpose(sub.reshape(x, 64))  # (64, X) u8
    if xp != x:
        packed = jnp.pad(packed, ((0, 0), (0, xp - x)))
    m = fdct_packed(packed)  # (64, XP) i32
    m = jnp.transpose(m[:, :x]).reshape(n, 4, 64)
    return quantize(m, q_table)
