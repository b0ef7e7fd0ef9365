"""Quantization / dequantization + zigzag tables, bit-exact to PFV v2.1.1.

Reference: /root/reference/src/dct.rs:1-99. Reproduces SURVEY.md quirk Q1:
quantize indexes the scale factor and q-table by *row-major* element position,
while dequantize indexes them by the *zigzag slot* — the two disagree at 56 of
64 positions, and the de-facto bitstream format requires the asymmetry.

All ops are batched over arbitrary leading axes; coefficients travel as
(..., 64) arrays: row-major order for spatial-domain matrices, zigzag order
for quantized bitstream coefficients.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pfv_tpu.ops.dct import FP_BITS

# 24.8 fixed-point scale factors applied at both encode and decode
# (reference dct.rs:4-13).
DCT_SCALE_FACTOR = np.array(
    [
        32, 37, 34, 26, 32, 26, 34, 37,
        37, 43, 39, 31, 37, 31, 39, 43,
        34, 39, 35, 28, 34, 28, 35, 39,
        26, 31, 28, 22, 26, 22, 28, 31,
        32, 37, 34, 26, 32, 26, 34, 37,
        26, 31, 28, 22, 26, 22, 28, 31,
        34, 39, 35, 28, 34, 28, 35, 39,
        37, 43, 39, 31, 37, 31, 39, 43,
    ],
    dtype=np.int32,
)

# Base quantization tables (reference dct.rs:16-37).
Q_TABLE_INTRA = np.array(
    [
        8, 16, 19, 22, 26, 27, 29, 34,
        16, 16, 22, 24, 27, 29, 34, 37,
        19, 22, 26, 27, 29, 34, 34, 38,
        22, 22, 26, 27, 29, 34, 37, 40,
        22, 26, 27, 29, 32, 35, 40, 48,
        26, 27, 29, 32, 35, 40, 48, 58,
        26, 27, 29, 34, 38, 46, 56, 69,
        27, 29, 35, 38, 46, 56, 69, 83,
    ],
    dtype=np.int32,
)

Q_TABLE_INTER = np.full(64, 16, dtype=np.int32)

# ZIGZAG_TABLE[i] = row-major element index written to zigzag slot i
# (reference dct.rs:44-47).
ZIGZAG_TABLE = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int32,
)

# INV_ZIGZAG_TABLE[i] = zigzag slot holding row-major element i
# (reference dct.rs:39-42).
INV_ZIGZAG_TABLE = np.array(
    [
        0, 1, 5, 6, 14, 15, 27, 28, 2, 4, 7, 13, 16, 26, 29, 42,
        3, 8, 12, 17, 25, 30, 41, 43, 9, 11, 18, 24, 31, 40, 44, 53,
        10, 19, 23, 32, 39, 45, 52, 54, 20, 22, 33, 38, 46, 51, 55, 60,
        21, 34, 37, 47, 50, 56, 59, 61, 35, 36, 48, 49, 57, 58, 62, 63,
    ],
    dtype=np.int32,
)

assert (ZIGZAG_TABLE[INV_ZIGZAG_TABLE] == np.arange(64)).all()
assert (INV_ZIGZAG_TABLE[ZIGZAG_TABLE] == np.arange(64)).all()


def trunc_div(n: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Signed integer division truncating toward zero (Rust `/`), d > 0."""
    q = jnp.abs(n) // d
    return jnp.where(n < 0, -q, q)


def quantize(m: jnp.ndarray, q_table: jnp.ndarray) -> jnp.ndarray:
    """Quantize row-major DCT coefficients (..., 64) i32 -> zigzag (..., 64) i16.

    out[..., i] = ((m[idx] * SCALE[idx]) >> 16) / q[idx], idx = ZIGZAG_TABLE[i]
    — both SCALE and q indexed by the row-major position (dct.rs:88-99).
    The arithmetic shift (floor) and truncating division are both exact.
    """
    idx = ZIGZAG_TABLE
    n = (m[..., idx] * DCT_SCALE_FACTOR[idx]) >> (FP_BITS * 2)
    d = jnp.broadcast_to(q_table, m.shape)[..., idx]
    return trunc_div(n, d).astype(jnp.int16)


def dequantize(qm: jnp.ndarray, q_table: jnp.ndarray) -> jnp.ndarray:
    """Dequantize zigzag coefficients (..., 64) i16 -> row-major (..., 64) i32.

    out[..., i] = qm[iz] * SCALE[iz] * q[iz], iz = INV_ZIGZAG_TABLE[i] — SCALE
    and q indexed by the *zigzag slot*, not the row-major position
    (dct.rs:75-86, quirk Q1). int32 products wrap, matching release Rust.
    """
    iz = INV_ZIGZAG_TABLE
    val = qm[..., iz].astype(jnp.int32) * DCT_SCALE_FACTOR[iz]
    q = jnp.broadcast_to(q_table, qm.shape)[..., iz].astype(jnp.int32)
    return val * q


def derive_q_tables(quality: int) -> dict[str, np.ndarray]:
    """Derive the 4 encoder q-tables from a quality level 0..=10.

    Mirrors enc.rs:40-51 exactly, including f32 arithmetic and the truncating
    f32->i32 cast: table = max(base * qscale * {0.5 luma | 1.0 chroma}, 1.0).
    Note quality is inverted (quirk Q4): higher = coarser quantization.
    """
    if not 0 <= quality <= 10:
        raise ValueError("quality must be in 0..=10")
    qscale = np.float32(quality) * np.float32(0.25)

    def derive(base: np.ndarray, lum_scale: bool) -> np.ndarray:
        x = base.astype(np.float32) * qscale
        if lum_scale:
            x = x * np.float32(0.5)
        return np.maximum(x, np.float32(1.0)).astype(np.int32)

    return {
        "intra_l": derive(Q_TABLE_INTRA, True),
        "intra_c": derive(Q_TABLE_INTRA, False),
        "inter_l": derive(Q_TABLE_INTER, True),
        "inter_c": derive(Q_TABLE_INTER, False),
    }
