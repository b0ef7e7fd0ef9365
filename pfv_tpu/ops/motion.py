"""Motion estimation: batched 4-step logarithmic block search.

TPU-native reformulation of the reference's recursive per-block search
(/root/reference/src/common.rs:154-236). The recursion over step sizes
8 -> 4 -> 2 -> 1 is unrolled; at each level all N macroblocks evaluate all 9
candidates as one batched gather + SSD reduction.

Bit-exactness notes (SURVEY.md Q7/Q9):
* SSDs are integer-valued and < 2^24, so i32 accumulation reproduces the
  reference's sequential f32 sums exactly; the early-exit never changes the
  argmin.
* Tie-breaking: the reference tests the center first and requires a strict
  improvement (`err < best_err`, common.rs:189), scanning neighbors in
  (my, mx) row-major order. We reproduce this by composing a lexicographic
  score = err * 16 + candidate_priority.
* Candidates whose 16x16 window would leave the (padded) plane are skipped,
  not clamped (common.rs:170-183). The center is always in bounds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Candidate offsets in priority order: center first (tested first), then the
# 3x3 neighborhood in the reference's loop order (my outer, mx inner,
# skipping the center; common.rs:168-196).
_CAND_MX = np.array([0, -1, 0, 1, -1, 1, -1, 0, 1], dtype=np.int32)
_CAND_MY = np.array([0, -1, -1, -1, 0, 0, 1, 1, 1], dtype=np.int32)

_I32_MAX = np.int32(np.iinfo(np.int32).max)


def _gather_window(ref_plane: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Dynamic 16x16 window at (y, x); out-of-range starts clamp (masked later)."""
    return jax.lax.dynamic_slice(ref_plane, (y, x), (16, 16))


_gather_windows = jax.vmap(jax.vmap(_gather_window, in_axes=(None, 0, 0)), in_axes=(None, 0, 0))


def motion_search(
    cur_blocks: jnp.ndarray,
    ref_plane: jnp.ndarray,
    by: jnp.ndarray,
    bx: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Four-step log search for every macroblock of a plane at once.

    Args:
      cur_blocks: (N, 16, 16) uint8 source macroblocks.
      ref_plane: (H, W) uint8 padded reference plane.
      by, bx: (N,) int32 top-left pixel origin of each block.

    Returns:
      (mv_x, mv_y, best_err, best_window): (N,) i32 motion components
      (window origin minus block origin, range -15..=15), (N,) i32 final SSD
      of the winning window, and (N, 16, 16) uint8 winning windows.
    """
    h, w = ref_plane.shape
    cur = cur_blocks.astype(jnp.int32)
    cy = by.astype(jnp.int32)
    cx = bx.astype(jnp.int32)

    best_err = None
    best_win = None
    for step in (8, 4, 2, 1):
        cand_x = cx[:, None] + _CAND_MX[None, :] * step  # (N, 9)
        cand_y = cy[:, None] + _CAND_MY[None, :] * step
        valid = (
            (cand_x >= 0)
            & (cand_x <= w - 16)
            & (cand_y >= 0)
            & (cand_y <= h - 16)
        )
        wins = _gather_windows(ref_plane, cand_y, cand_x)  # (N, 9, 16, 16) u8
        diff = cur[:, None, :, :] - wins.astype(jnp.int32)
        err = jnp.sum(diff * diff, axis=(-1, -2))  # (N, 9) i32, < 2^24
        prio = jnp.arange(9, dtype=jnp.int32)[None, :]
        score = jnp.where(valid, err * 16 + prio, _I32_MAX)
        best = jnp.argmin(score, axis=1)  # first min -> reference tie-break
        take = lambda a: jnp.take_along_axis(a, best[:, None], axis=1)[:, 0]
        cx = take(cand_x)
        cy = take(cand_y)
        best_err = take(err)
        best_win = jnp.take_along_axis(
            wins, best[:, None, None, None], axis=1
        )[:, 0]

    mv_x = cx - bx.astype(jnp.int32)
    mv_y = cy - by.astype(jnp.int32)
    return mv_x, mv_y, best_err, best_win


def gather_predictions(
    ref_plane: jnp.ndarray,
    by: jnp.ndarray,
    bx: jnp.ndarray,
    mv_y: jnp.ndarray,
    mv_x: jnp.ndarray,
) -> jnp.ndarray:
    """Motion-compensated prediction windows for decode (common.rs:254-261).

    Returns (N, 16, 16) uint8 windows at (by + mv_y, bx + mv_x); coordinates
    are guaranteed in-bounds by the encoder (enc.rs:448-449).
    """
    y = by.astype(jnp.int32) + mv_y.astype(jnp.int32)
    x = bx.astype(jnp.int32) + mv_x.astype(jnp.int32)
    return jax.vmap(_gather_window, in_axes=(None, 0, 0))(ref_plane, y, x)
