"""Fused whole-frame decode step as one Pallas TPU kernel.

One grid step reconstructs one 16-row stripe of the fused YUV canvas
entirely in VMEM: dequantize (Q1 slot-indexed multipliers) -> unzigzag ->
8x8 integer iDCT (trunc-div butterflies, dct.rs:241-293) -> merge subblock
pixels into canvas layout -> motion-compensated prediction from a 48-row
band of the previous canvas (33-way select ladders, common.rs:254-285) ->
residual apply / skip / intra select (common.rs:98-105) -> one u8 write.

Why: the pure-XLA step (dataloader.step_canvas) materializes order-100
canvas-sized HBM intermediates per frame — band selects alone are ~130
full-canvas passes — and measured ~1.8 ms/frame at 1080p, ~10x off the HBM
roofline (BASELINE.md r2). Keeping the band and all intermediates VMEM-
resident reduces per-frame HBM traffic to ~6 bytes/pixel (coeffs in, canvas
band in, canvas out).

Layout contract (produced directly by the native demux's pstep unit
layout — pfv_demux_file_sparse_pstep — via one device scatter; no
relayout program):
* coefficients: (F, 64, gch*2*scp) i16 — row = row-major (unzigzagged)
  slot r, lane = [stripe s][l = 4*gc + 2*sr + sc] padded to 2*scp lanes
  per stripe. Dequant multiplier is per-z (quirk Q1: dequantize indexes
  SCALE and q by the zigzag slot, dct.rs:75-86); the (64, 1) multiplier
  column is permuted to r-order at build time.
* motion/coded maps: (F, gch, cw) i8/u8 per-destination-column dy, dx, hc
  (each block's value repeated over its 16 columns).
* the canvas carry: (gch*16, cw) u8, Y on top, U|V below (dataloader
  fused-canvas layout).

In-plane guarantee: the demux bounds-validates every motion vector against
its own plane region, so no select ever reads across the Y/U/V region
boundaries or outside the canvas — edge bands and pad lanes are dead
values that are never selected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pfv_tpu.ops.dct import FP_BITS, tdiv_pow2


def _idct8_ax(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """idct butterflies along `axis` of (8, 8, X); ops are (8, X) wide.

    Bit-exact twin of ops.dct.idct8 (reference dct.rs:241-293)."""

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


def _merge_mxu(px: jnp.ndarray, k_mat: jnp.ndarray, scp: int,
               cw: int) -> jnp.ndarray:
    """Merge iDCT subblock pixels (8i, 8j, 2*scp) into the (16, cw) stripe.

    Lanes are in the demux's interleaved order l = 4*gc + 2*sr + sc (the
    order that keeps the sparse delta chain monotonic), so the merge is
    out[8*sr + i, 16*gc + 8*sc + j] = px[i, j, l].

    Lane-dim interleaves are where Mosaic hurts: reshape merges are
    unsupported outright, and the transpose route (plane.T -> sublane
    interleave -> transpose back) runs at lane-width 8 — 1/16 vreg
    occupancy — and measured ~0.37 ms/step at 1080p, half the whole
    kernel. Instead, expansion-by-matmul: stack the 8 (8, 2*scp) j-planes
    into one (64, 2*scp) bf16 matrix and multiply by the two constant 0/1
    lane-expansion matrices K_r (2*scp, cw), K_r[l, c] = (sr(l) == r and
    c//8 == 2*(l>>2) + (l&1)). Exact: pixel values 0..255 are exactly
    representable in bf16 and every output lane has exactly one nonzero
    K term. The MXU does the data movement (it is otherwise idle here),
    and only 16 masked adds remain on the VPU.
    """
    stack = jnp.concatenate(
        [px[:, j, :] for j in range(8)], axis=0
    ).astype(jnp.bfloat16)                                        # (64, 2scp)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, cw), 1) % 8
    halves = []
    for r in (0, 1):
        exp = jnp.dot(stack, k_mat[r],
                      preferred_element_type=jnp.float32)         # (64, cw)
        acc = jnp.zeros((8, cw), jnp.float32)
        for j in range(8):
            acc = acc + jnp.where(lane8 == j, exp[8 * j : 8 * j + 8], 0.0)
        halves.append(acc)
    return jnp.concatenate(halves, axis=0).astype(jnp.int32)


def _step_kernel(gly: int, scp: int, cw: int, gated: bool,
                 ft_ref, stab_ref, coeff_ref, up_ref, mid_ref, dn_ref,
                 dy_ref, dx_ref, hc_ref, q_ref, k_ref, out_ref,
                 h_scr, v_scr):
    s = pl.program_id(0)
    intra = ft_ref[0] == 1
    coded = stab_ref[s, 0] != 0   # any coded block in this stripe

    def compute_res():
        # ---- dequant (Q1: multiplier indexed by zigzag slot) ----
        # Rows arrive already unzigzagged (row-major r; the demux applies
        # the permutation when bucketing units), so the (mode, region)
        # multiplier column — selected by the scalar-prefetch index map —
        # is permuted to r-order at build time; no row shuffle here.
        c = coeff_ref[...].astype(jnp.int32)       # (64, 2*scp)
        mult = q_ref[0, 0]                         # (64, 1) i32, r-order
        m = (c * mult).reshape(8, 8, 2 * scp)      # wrapping i32, dct.rs:78-84
        # ---- 8x8 integer iDCT: columns then rows (common.rs:315) ----
        m = _idct8_ax(m, 0)
        m = _idct8_ax(m, 1)
        px = jnp.clip((m >> FP_BITS) + 128, 0, 255)   # (8i, 8j, 2*scp)
        # ---- merge subblock pixels into the (16, cw) stripe ----
        return _merge_mxu(px, k_ref[...], scp, cw)    # (16, cw) i32

    def compute_mc():
        # ---- motion compensation on the VMEM-resident 48-row band ----
        # Horizontal first over the whole band, masks indexed by
        # DESTINATION column (dx is constant per 16-column destination
        # block), then vertical — this ordering needs no neighbor-dy
        # variants: by the time the vertical select runs, every column
        # already holds the dest block's horizontal source.
        #
        # The band rides as row-packed u32 (bitcast is a free vreg
        # reinterpret: u8 row 4s+t = byte t of u32 sublane s, LE — probed
        # on hardware), so each 33-way ladder touches 1/4 the elements
        # the u8 form would (the VPU processes u8 one element per 32-bit
        # lane).
        band = jnp.concatenate(
            [up_ref[...], mid_ref[...], dn_ref[...]], axis=0)
        p = pltpu.bitcast(band, jnp.uint32)        # (12, cw), rows 4s..4s+3
        dxc = dx_ref[0].astype(jnp.int32)          # (1, cw)
        dyc = dy_ref[0].astype(jnp.int32)
        zl = jnp.zeros((12, 16), jnp.uint32)
        pp = jnp.concatenate([zl, p, zl], axis=1)  # (12, cw+32)
        h = p
        for d in range(-16, 17):
            if d == 0:
                continue
            h = jnp.where(dxc == d, pp[:, 16 + d : 16 + d + cw], h)
        # byte-rotated copies: R[b][s] holds rows 4s+b .. 4s+b+3
        hn = jnp.concatenate([h[1:], jnp.zeros((1, cw), jnp.uint32)],
                             axis=0)
        R = [h] + [(h >> (8 * b)) | (hn << (32 - 8 * b)) for b in (1, 2, 3)]
        v = R[0][4:8]                              # dy = 0: rows 16..31
        for d in range(-16, 17):
            if d == 0:
                continue
            s0, b = (16 + d) >> 2, (16 + d) & 3
            v = jnp.where(dyc == d, R[b][s0 : s0 + 4], v)
        return pltpu.bitcast(v, jnp.uint8).astype(jnp.int32)   # (16, cw)

    def compute_mc_gated():
        # Mask-gated ladders: stab carries per-stripe bitmasks of the
        # motion values actually used (bit d+16), so each 33-way select
        # runs only when its d occurs in this stripe. Executed selects
        # pay a VMEM scratch round-trip (~1.5x a raw select), skipped
        # ones cost a scalar test — a large win whenever per-stripe
        # motion is coherent (global pans, static scenes), roughly
        # break-even on per-block-noise motion (the host picks this
        # variant per clip from the stream's motion histogram).
        band = jnp.concatenate(
            [up_ref[...], mid_ref[...], dn_ref[...]], axis=0)
        p = pltpu.bitcast(band, jnp.uint32)
        dxc = dx_ref[0].astype(jnp.int32)
        dyc = dy_ref[0].astype(jnp.int32)
        zl = jnp.zeros((12, 16), jnp.uint32)
        pp = jnp.concatenate([zl, p, zl], axis=1)
        dxlo, dxhi = stab_ref[s, 1], stab_ref[s, 2]
        dylo, dyhi = stab_ref[s, 3], stab_ref[s, 4]

        def bit(mask_lo, mask_hi, d):
            b = d + 16
            return (((mask_lo >> b) if b < 32 else mask_hi) & 1) != 0

        h_scr[...] = p
        for d in range(-16, 17):
            if d == 0:
                continue

            @pl.when(bit(dxlo, dxhi, d))
            def _(d=d):
                h_scr[...] = jnp.where(
                    dxc == d, pp[:, 16 + d : 16 + d + cw], h_scr[...])
        h = h_scr[...]
        hn = jnp.concatenate([h[1:], jnp.zeros((1, cw), jnp.uint32)],
                             axis=0)
        v_scr[...] = h[4:8]
        for b in (0, 1, 2, 3):
            ds = [d for d in range(-16, 17)
                  if d != 0 and ((16 + d) & 3) == b]
            grp = bit(dylo, dyhi, ds[0])
            for d in ds[1:]:
                grp = jnp.logical_or(grp, bit(dylo, dyhi, d))

            @pl.when(grp)
            def _(b=b, ds=ds):
                Rb = h if b == 0 else ((h >> (8 * b)) | (hn << (32 - 8 * b)))
                for d in ds:

                    @pl.when(bit(dylo, dyhi, d))
                    def _(d=d, Rb=Rb):
                        s0 = (16 + d) >> 2
                        v_scr[...] = jnp.where(
                            dyc == d, Rb[s0 : s0 + 4], v_scr[...])
        return pltpu.bitcast(v_scr[...], jnp.uint8).astype(jnp.int32)

    # Per-stripe content gating (scalar-prefetched, so the branches below
    # skip whole pipelines at runtime): I-frames never run MC; P-frame
    # stripes without a single coded block (the common case for sparse
    # content) never run the dequant/iDCT/merge pipeline.
    @pl.when(intra)
    def _():
        out_ref[...] = compute_res().astype(jnp.uint8)

    @pl.when(jnp.logical_not(intra))
    def _():
        pred = compute_mc_gated() if gated else compute_mc()

        @pl.when(coded)
        def _():
            res = compute_res()
            # ---- residual apply / skip select (common.rs:98-105) ----
            inter = jnp.clip(pred + (res - 128) * 2, 0, 255)
            sel = jnp.where(hc_ref[0] != 0, inter, pred)
            out_ref[...] = sel.astype(jnp.uint8)

        @pl.when(jnp.logical_not(coded))
        def _():
            out_ref[...] = pred.astype(jnp.uint8)


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def make_step(chh: int, cw: int, gly: int, interpret: bool = False,
              gated: bool = False):
    """Build the jittable fused step: (canvas, per-frame xs) -> new canvas.

    chh, cw: fused-canvas height/width (multiples of 16); gly: number of
    luma stripes (region boundary for q-multiplier selection).
    Per-frame xs: (coeffs_z (64, gch*2*scp) i16, dyc (gch, cw) i8,
    dxc (gch, cw) i8, hcc (gch, cw) u8, ftype () i32, stab (gch, 5) i32
    per-stripe gating table [any coded block, dx-mask lo/hi, dy-mask
    lo/hi — bit d+16 set iff motion value d occurs in the stripe],
    qmul (2, 2, 64, 1) i32 [mode, region]).

    gated=True compiles the mask-gated MC ladders (wins on per-stripe-
    coherent motion, ~break-even on noise motion; the dataloader picks
    per clip from the stream's motion histogram).
    """
    gch = chh // 16
    gcw = cw // 16
    scp = round_up(2 * gcw, 128)

    kernel = functools.partial(_step_kernel, gly, scp, cw, gated)

    def region(s):
        return jnp.where(s < gly, 0, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # ftype + per-stripe table ride SMEM
        grid=(gch,),
        in_specs=[
            pl.BlockSpec((64, 2 * scp), lambda s, ft, st: (0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, cw),
                         lambda s, ft, st: (jnp.maximum(s - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, cw), lambda s, ft, st: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, cw),
                         lambda s, ft, st: (jnp.minimum(s + 1, gch - 1), 0),
                         memory_space=pltpu.VMEM),
            # (gch, 1, cw) maps: the singleton sublane axis satisfies
            # Mosaic's block-shape rule (last two dims must match the
            # array or be 8/128-aligned)
            pl.BlockSpec((1, 1, cw), lambda s, ft, st: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cw), lambda s, ft, st: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cw), lambda s, ft, st: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            # (mode, region) dequant multipliers: mode picked by the
            # prefetched frame type, region (luma/chroma) by the stripe
            pl.BlockSpec(
                (1, 1, 64, 1),
                lambda s, ft, st: (jnp.where(ft[0] == 1, 0, 1), region(s),
                                   0, 0),
                memory_space=pltpu.VMEM,
            ),
            # constant lane-expansion matrices (one per subblock row): same
            # block every step, so the pipeline copies them into VMEM once
            # and revolves
            pl.BlockSpec((2, 2 * scp, cw), lambda s, ft, st: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, cw), lambda s, ft, st: (s, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((12, cw), jnp.uint32),
                        pltpu.VMEM((4, cw), jnp.uint32)],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((chh, cw), jnp.uint8),
        interpret=interpret,
    )

    lanes = np.arange(2 * scp)
    cols = np.arange(cw)
    colmatch = (cols[None, :] // 8) == (2 * (lanes >> 2) + (lanes & 1))[:, None]
    k_mat = jnp.asarray(
        np.stack([colmatch & (((lanes >> 1) & 1) == r)[:, None]
                  for r in (0, 1)]).astype(np.float32),
        dtype=jnp.bfloat16)

    def step(canvas, coeffs_z, dyc, dxc, hcc, ftype, stab, qmul):
        ft = jnp.reshape(ftype, (1,)).astype(jnp.int32)
        return call(ft, stab, coeffs_z, canvas, canvas, canvas,
                    dyc[:, None, :], dxc[:, None, :], hcc[:, None, :],
                    qmul, k_mat)

    return step


# Coefficients arrive from the native demux already in this layout (one
# device scatter, no relayout program); the per-column mv/hc maps are
# built in dataloader.decode_yuv_impl_pstep as reshape/repeat/concat.
# The (64, 1) dequant multipliers are SCALE[z]*q[z] per zigzag slot
# (quirk Q1, dct.rs:75-86; max product 43*207 fits i32), permuted to
# row-major order to match the demux's unzigzagged rows.
