"""Motion-compensated reconstruction as a Pallas kernel.

Per macroblock: fetch the prediction window at (block origin + motion
vector) from the reference plane (resident in VMEM), then reconstruct —
copy for skip blocks, residual-apply for coded inter blocks, pass-through
for intra blocks (reference common.rs:254-285, 98-105). Motion vectors ride
scalar prefetch so window addresses are known before the body runs.

Bit-exact twin of the `where`-composition in pfv_tpu.dataloader's step
(gather_predictions + apply_residuals).

Status: interpret-mode only (CPU-validated). Mosaic cannot lower the
arbitrary-offset (16, 16) VMEM window loads this formulation needs ("cannot
statically prove that index in dimension 0 is a multiple of 8" — motion
vectors are ±15, unaligned by nature), while XLA's gather handles arbitrary
offsets and measures ~25 µs for a full 1080p plane (see PARITY.md). The XLA
formulation is therefore the production path on TPU; this kernel remains as
the correctness cross-check and as documentation of the design trade-off.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_B = 64  # macroblocks per kernel program


def _mc_kernel(sy_ref, sx_ref, mode_ref, res_ref, ref_ref, out_ref):
    t = pl.program_id(0)

    def body(j, carry):
        b = t * _TILE_B + j
        y0 = sy_ref[b]
        x0 = sx_ref[b]
        mode = mode_ref[b]
        win = ref_ref[pl.ds(y0, 16), pl.ds(x0, 16)].astype(jnp.int32)
        res = res_ref[j].astype(jnp.int32)
        applied = jnp.clip(win + (res - 128) * 2, 0, 255)
        out = jnp.where(mode == 2, res, jnp.where(mode == 1, applied, win))
        out_ref[j] = out.astype(jnp.uint8)
        return carry

    jax.lax.fori_loop(0, _TILE_B, body, 0)


def mc_reconstruct_pallas(
    res_blocks: jnp.ndarray,
    ref_plane: jnp.ndarray,
    by: jnp.ndarray,
    bx: jnp.ndarray,
    mv_y: jnp.ndarray,
    mv_x: jnp.ndarray,
    has_coeff: jnp.ndarray,
    is_intra: jnp.ndarray,
) -> jnp.ndarray:
    """(N,16,16) u8 decoded residual/intra blocks -> reconstructed blocks.

    mode per block: 2 = intra (res are pixels), 1 = inter w/ residual,
    0 = skip (copy prediction window).
    """
    n = res_blocks.shape[0]
    npad = ((n + _TILE_B - 1) // _TILE_B) * _TILE_B

    sy = (by.astype(jnp.int32) + mv_y.astype(jnp.int32))
    sx = (bx.astype(jnp.int32) + mv_x.astype(jnp.int32))
    mode = jnp.where(
        jnp.asarray(is_intra, jnp.int32) != 0,
        2,
        has_coeff.astype(jnp.int32),
    )
    if npad != n:
        pad = npad - n
        sy = jnp.pad(sy, (0, pad))
        sx = jnp.pad(sx, (0, pad))
        mode = jnp.pad(mode, (0, pad))
        res_blocks = jnp.pad(res_blocks, ((0, pad), (0, 0), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(npad // _TILE_B,),
        in_specs=[
            pl.BlockSpec(
                (_TILE_B, 16, 16),
                lambda i, sy, sx, md: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole ref plane
        ],
        out_specs=pl.BlockSpec(
            (_TILE_B, 16, 16),
            lambda i, sy, sx, md: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        _mc_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((npad, 16, 16), jnp.uint8),
        interpret=True,  # see module docstring: Mosaic cannot lower
        # the unaligned dynamic windows; XLA gather is the device path
    )(sy, sx, mode, res_blocks, ref_plane)
    return out[:n]
