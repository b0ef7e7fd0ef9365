"""Fused inverse-DCT Pallas kernel: dequantized coefficients -> pixels.

Lane-packed formulation: subblocks ride the 128-lane axis. The (N, 4, 64)
row-major coefficient tensor is transposed to (64, N*4) so every butterfly
add/shift runs at full VPU width; inside the kernel the 64-row axis reshapes
to (8, 8) giving contiguous (8, X) slices for both the column pass (axis 0)
and the row pass (axis 1).

Bit-exact twin of pfv_tpu.ops.dct.idct2d + the (x >> 8) + 128 clamp
(reference /root/reference/src/dct.rs:241-293, common.rs:313-325); tests
assert element equality against the jnp oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pfv_tpu.ops.blocks import subblocks_to_blocks
from pfv_tpu.ops.dct import FP_BITS, tdiv_pow2
from pfv_tpu.ops.quant import dequantize

_TILE_X = 512  # lanes of subblocks per kernel program


def _idct8_ax(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """idct butterflies along `axis` of (8, 8, X); ops are (8, X) wide."""

    def g(j):
        return x[j] if axis == 0 else x[:, j]

    c0, d4, c2, d6, c1, d5, c3, d7 = (g(j) for j in range(8))
    c4 = d4
    c5 = d5 + d6
    c7 = d5 - d6
    c6 = d7
    b4 = c4 + c5
    b5 = c4 - c5
    b6 = c6 + c7
    b7 = c6 - c7
    b0 = c0 + c1
    b1 = c0 - c1
    b2 = c2 + tdiv_pow2(c2, 2) + tdiv_pow2(c3, 1)
    b3 = tdiv_pow2(c2, 1) - c3 - tdiv_pow2(c3, 2)
    a4 = tdiv_pow2(b7, 2) + b4 + tdiv_pow2(b4, 2) - tdiv_pow2(b4, 4)
    a7 = tdiv_pow2(b4, 2) - b7 - tdiv_pow2(b7, 2) + tdiv_pow2(b7, 4)
    a5 = b5 - b6 + tdiv_pow2(b6, 2) + tdiv_pow2(b6, 4)
    a6 = b6 + b5 - tdiv_pow2(b5, 2) - tdiv_pow2(b5, 4)
    a0 = b0 + b2
    a1 = b1 + b3
    a2 = b1 - b3
    a3 = b0 - b2
    out = [a0 + a4, a1 + a5, a2 + a6, a3 + a7, a3 - a7, a2 - a6, a1 - a5, a0 - a4]
    return jnp.stack(out, axis=axis)


def _idct_kernel(m_ref, px_ref):
    m = m_ref[:].reshape(8, 8, m_ref.shape[-1])  # (row, col, subblocks)
    m = _idct8_ax(m, 0)  # columns pass (common.rs:315)
    m = _idct8_ax(m, 1)  # rows pass
    px = jnp.clip((m >> FP_BITS) + 128, 0, 255)
    px_ref[:] = px.reshape(64, -1).astype(jnp.uint8)


def idct_clamp_packed(m_packed: jnp.ndarray) -> jnp.ndarray:
    """(64, X) i32 row-major dequantized coeffs -> (64, X) u8 pixels.

    X must be a multiple of _TILE_X (pad with anything; garbage in, garbage
    out in the padded lanes).
    """
    x = m_packed.shape[-1]
    assert x % _TILE_X == 0, x
    return pl.pallas_call(
        _idct_kernel,
        grid=(x // _TILE_X,),
        in_specs=[
            pl.BlockSpec((64, _TILE_X), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (64, _TILE_X), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((64, x), jnp.uint8),
        interpret=jax.default_backend() == "cpu",
    )(m_packed)


def decode_blocks_pallas(coeffs: jnp.ndarray, q_table: jnp.ndarray) -> jnp.ndarray:
    """Pallas twin of pfv_tpu.ops.iframe.decode_blocks.

    (N, 4, 64) int16 zigzag coeffs -> (N, 16, 16) uint8 macroblocks.
    Dequantization (a constant-permutation gather + two multiplies) stays in
    XLA; the butterfly-heavy iDCT + clamp runs in the kernel.
    """
    n = coeffs.shape[0]
    m = dequantize(coeffs, q_table)  # (N, 4, 64) i32 row-major
    x = n * 4
    xp = ((x + _TILE_X - 1) // _TILE_X) * _TILE_X
    packed = jnp.transpose(m.reshape(x, 64))  # (64, X)
    if xp != x:
        packed = jnp.pad(packed, ((0, 0), (0, xp - x)))
    px = idct_clamp_packed(packed)  # (64, XP) u8
    sub = jnp.transpose(px[:, :x]).reshape(n, 4, 8, 8)
    return subblocks_to_blocks(sub)
