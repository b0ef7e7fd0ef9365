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


def _residual_px(coeff, mult, kmat, scp: int, cw: int) -> jnp.ndarray:
    """Dequant + 8x8 integer iDCT + subblock merge for one stripe.

    coeff: (64, 2*scp) integer coefficients, rows already unzigzagged
    (row-major r; the demux applies the permutation when bucketing
    units). mult: (64, 1) i32, the Q1 zigzag-slot-indexed multiplier
    column permuted to r-order at build time (dct.rs:75-86) — no row
    shuffle here. Returns the (16, cw) i32 reconstructed pixels."""
    c = coeff.astype(jnp.int32)
    m = (c * mult).reshape(8, 8, 2 * scp)      # wrapping i32, dct.rs:78-84
    # ---- 8x8 integer iDCT: columns then rows (common.rs:315) ----
    m = _idct8_ax(m, 0)
    m = _idct8_ax(m, 1)
    px = jnp.clip((m >> FP_BITS) + 128, 0, 255)   # (8i, 8j, 2*scp)
    return _merge_mxu(px, kmat, scp, cw)          # (16, cw) i32


def _mc_plain_px(p, dxc, dyc, cw: int) -> jnp.ndarray:
    """Motion compensation on the VMEM-resident 48-row band.

    Horizontal first over the whole band, masks indexed by DESTINATION
    column (dx is constant per 16-column destination block), then
    vertical — this ordering needs no neighbor-dy variants: by the time
    the vertical select runs, every column already holds the dest
    block's horizontal source.

    The band rides as row-packed u32 (p: (12, cw), u8 row 4s+t = byte t
    of u32 sublane s, LE — bitcast is a free vreg reinterpret, probed on
    hardware), so each 33-way ladder touches 1/4 the elements the u8
    form would (the VPU processes u8 one element per 32-bit lane).

    Returns the packed (4, cw) u32 prediction (rows 16+dy..31+dy);
    callers bitcast to u8 / widen as needed."""
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
    return v                                   # (4, cw) u32


def _mc_barrel_px(p, dxc, dyc, cw: int) -> jnp.ndarray:
    """Hybrid MC: plain horizontal select ladder + vertical barrel shifter.

    Vertical is a true per-column barrel: with u = dy + 16 in [0, 32],
    six stages (32, 16, 8, 4, 2, 1 rows) move every column by its own dy
    — 6 stage-selects instead of the 33-way ladder. Sound because row
    shifts never cross columns, so each stage's mask always belongs to
    the data it moves (the lanes are independent, exactly per-lane
    variable shifts). Bit-exact: the stage composition reproduces
    band[r + dy] (common.rs:254-285 semantics).

    Horizontal CANNOT be barreled the same way: a column-shift stage
    reads a neighboring destination block whose dx (and thus mask bits)
    differ, so the select chain composes the wrong bits whenever
    adjacent blocks move differently — it stays the 33-way ladder,
    masks indexed by destination column (dx constant per 16-column
    block, as in _mc_plain_px).

    Vertical stages ride the u32 row packing: row shifts of 32/16/8/4
    are sublane concats; the residual 2/1-row shifts are byte funnels
    ((v >> 8r) | (next << (32 - 8r)), LE row 4s+t = byte t), applied on
    the 5 sublanes that still matter."""
    zl = jnp.zeros((12, 16), jnp.uint32)
    pp = jnp.concatenate([zl, p, zl], axis=1)           # (12, cw+32)
    v = p
    for d in range(-16, 17):
        if d == 0:
            continue
        v = jnp.where(dxc == d, pp[:, 16 + d : 16 + d + cw], v)
    uy = dyc + 16
    for k, sl in ((32, 8), (16, 4), (8, 2), (4, 1)):
        shifted = jnp.concatenate(
            [v[sl:], jnp.zeros((sl, cw), jnp.uint32)], axis=0)
        v = jnp.where((uy & k) != 0, shifted, v)
    v = v[:5]
    for k, r in ((2, 2), (1, 1)):
        vn = jnp.concatenate(
            [v[1:], jnp.zeros((1, cw), jnp.uint32)], axis=0)
        shifted = (v >> (8 * r)) | (vn << (32 - 8 * r))
        v = jnp.where((uy & k) != 0, shifted, v)
    return v[:4]                               # (4, cw) u32


def _mc_gated_px(p, dxc, dyc, bits, h_scr, v_scr, cw: int) -> jnp.ndarray:
    """Mask-gated MC ladders: bits = (dxlo, dxhi, dylo, dyhi) carry
    per-stripe bitmasks of the motion values actually used (bit d+16),
    so each 33-way select runs only when its d occurs in this stripe.
    Executed selects pay a VMEM scratch round-trip (~1.5x a raw select),
    skipped ones cost a scalar test — a large win whenever per-stripe
    motion is coherent (global pans, static scenes), roughly break-even
    on per-block-noise motion (the host picks this variant per clip from
    the stream's motion histogram). Leaves the packed (4, cw) u32
    prediction in v_scr (no return value)."""
    dxlo, dxhi, dylo, dyhi = bits
    zl = jnp.zeros((12, 16), jnp.uint32)
    pp = jnp.concatenate([zl, p, zl], axis=1)

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


def _step_kernel(gly: int, scp: int, cw: int, ladder: str,
                 ft_ref, stab_ref, coeff_ref, up_ref, mid_ref, dn_ref,
                 dy_ref, dx_ref, hc_ref, q_ref, k_ref, out_ref,
                 h_scr, v_scr):
    s = pl.program_id(0)
    intra = ft_ref[0] == 1
    coded = stab_ref[s, 0] != 0   # any coded block in this stripe

    def compute_res():
        return _residual_px(coeff_ref[...], q_ref[0, 0], k_ref[...],
                            scp, cw)

    def _band():
        band = jnp.concatenate(
            [up_ref[...], mid_ref[...], dn_ref[...]], axis=0)
        return pltpu.bitcast(band, jnp.uint32)     # (12, cw), rows 4s..4s+3

    def compute_mc():
        # Static-stripe fast path: the per-stripe motion masks say only
        # d = 0 occurs (bit 16 alone in both axes) — the prediction is
        # the band's middle 16 rows verbatim; every ladder is skipped.
        # The dominant case for typical content (skip blocks and uncoded
        # blocks all carry mv 0, common.rs:206-236).
        bits = (stab_ref[s, 1], stab_ref[s, 2],
                stab_ref[s, 3], stab_ref[s, 4])
        only0 = jnp.logical_and(
            jnp.logical_and(bits[0] == (1 << 16), bits[1] == 0),
            jnp.logical_and(bits[2] == (1 << 16), bits[3] == 0))

        @pl.when(only0)
        def _():
            v_scr[...] = pltpu.bitcast(mid_ref[...], jnp.uint32)

        @pl.when(jnp.logical_not(only0))
        def _():
            dxc = dx_ref[0].astype(jnp.int32)
            dyc = dy_ref[0].astype(jnp.int32)
            if ladder == "gated":
                _mc_gated_px(_band(), dxc, dyc, bits, h_scr, v_scr, cw)
            elif ladder == "barrel":
                v_scr[...] = _mc_barrel_px(_band(), dxc, dyc, cw)
            else:
                v_scr[...] = _mc_plain_px(_band(), dxc, dyc, cw)

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
        pred = compute_mc()

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
              ladder: str = "plain"):
    """Build the jittable fused step: (canvas, per-frame xs) -> new canvas.

    chh, cw: fused-canvas height/width (multiples of 16); gly: number of
    luma stripes (region boundary for q-multiplier selection).
    Per-frame xs: (coeffs_z (64, gch*2*scp) i16, dyc (gch, cw) i8,
    dxc (gch, cw) i8, hcc (gch, cw) u8, ftype () i32, stab (gch, 5) i32
    per-stripe gating table [any coded block, dx-mask lo/hi, dy-mask
    lo/hi — bit d+16 set iff motion value d occurs in the stripe],
    qmul (2, 2, 64, 1) i32 [mode, region]).

    ladder picks the MC formulation: "plain" (33-way select ladders),
    "gated" (mask-gated ladders — wins on per-stripe-coherent motion,
    ~break-even on noise motion; the dataloader picks per clip from the
    stream's motion histogram), "barrel" (log-depth barrel shifter —
    12 stage-selects regardless of content).
    """
    gch = chh // 16
    gcw = cw // 16
    scp = round_up(2 * gcw, 128)

    kernel = functools.partial(_step_kernel, gly, scp, cw, ladder)

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


def _seq_kernel(F: int, gb: int, gch: int, gly: int, scp: int, cw: int,
                sb: int, ladder: str,
                ft_ref, stab_ref, coeff_ref, dy_ref, dx_ref, hc_ref,
                q_ref, k_ref, out_ref,
                band_scr, ostripe_scr, h_scr, v_scr, rsem, wsem):
    """Whole-clip decode: grid (F, gb) with sb stripes per grid step
    (gb = gch // sb), sequential; out_ref is the full (F, chh, cw) u8
    canvases tensor in HBM (ANY memory space).

    The frame-to-frame dependency rides the output buffer itself: step
    (f, S) manually DMAs the (sb*16 + 32)-row prediction band
    out[f-1, 16*sb*S - 16 : 16*sb*(S+1) + 16] into VMEM (issued one step
    EARLY, double-buffered, so the read latency hides behind the previous
    step's compute) and DMA-writes its sb result stripes back
    (double-buffered; the wait for slot reuse happens two steps later,
    BEFORE the band prefetch that could read it). One pallas_call per
    clip replaces the per-frame lax.scan: no per-frame launch or
    carry-copy cost; sb > 1 additionally amortizes the per-step DMA
    latency over sb stripes of compute.

    Ordering/safety: reads of frame f-1 rows happen >= gb-1 grid steps
    after their writes; the only tight case is the band prefetch for
    (f+1, 0) issued at (f, gb-1), which reads out[f] stripes 0..sb
    (blocks 0 and 1), written at (f, 0)/(f, 1) and waited (slot reuse)
    at (f, 2)/(f, 3) — both at or before (f, gb-1) in program order as
    long as gb >= 4, which the caller guarantees.

    First frame must be intra (ft[0] == 1, checked host-side): step
    (0, S) never reads a band, so nothing reads out[-1]."""
    f = pl.program_id(0)
    S = pl.program_id(1)
    gi = f * gb + S
    slot = jnp.bitwise_and(gi, 1)
    nslot = jnp.bitwise_and(gi + 1, 1)
    intra = ft_ref[f] == 1

    def band_read(k, fprev, blk, dst_slot):
        # band_scr is (2, sb+2, 16, cw): each 16-row band block is its
        # own leading index so every DMA destination starts tile-aligned
        # (u8 VMEM tiles are 32 sublanes)
        src_s = jnp.clip(blk * sb - 1 + k, 0, gch - 1)
        return pltpu.make_async_copy(
            out_ref.at[fprev, pl.ds(16 * src_s, 16), :],
            band_scr.at[dst_slot, k],
            rsem.at[dst_slot, k])

    def write_dma(wslot, j, ff, blk):
        return pltpu.make_async_copy(
            ostripe_scr.at[wslot, j],
            out_ref.at[ff, pl.ds(16 * (blk * sb + j), 16), :],
            wsem.at[wslot, j])

    # ---- 1. wait the writes issued two steps ago on this slot (frees
    # ostripe_scr[slot] AND guarantees the band prefetch below never
    # races an in-flight write of the same region) ----
    @pl.when(gi >= 2)
    def _():
        for j in range(sb):
            write_dma(slot, j, f, S).wait()

    # ---- 2. prefetch the NEXT step's band (hides read latency) ----
    is_last = jnp.logical_and(f == F - 1, S == gb - 1)
    wrap = S == gb - 1
    fn = jnp.where(wrap, f + 1, f)
    Sn = jnp.where(wrap, 0, S + 1)
    fn_c = jnp.minimum(fn, F - 1)

    @pl.when(jnp.logical_and(jnp.logical_not(is_last), ft_ref[fn_c] != 1))
    def _():
        for k in range(sb + 2):
            band_read(k, fn - 1, Sn, nslot).start()

    # ---- 3. compute the sb stripes of this step ----
    # intra is per-frame, so either every stripe of this step runs MC or
    # none does: wait the band reads once, before the per-stripe loop
    @pl.when(jnp.logical_not(intra))
    def _():
        for k in range(sb + 2):
            band_read(k, jnp.maximum(f - 1, 0), S, slot).wait()

    for j in range(sb):
        coded = stab_ref[0, j, 0, 0] != 0

        def compute_res(j=j):
            coeff = coeff_ref[0][:, j * 2 * scp : (j + 1) * 2 * scp]
            return _residual_px(coeff, q_ref[0, 0], k_ref[...], scp, cw)

        def _band(j=j):
            band = jnp.concatenate(
                [band_scr[slot, j], band_scr[slot, j + 1],
                 band_scr[slot, j + 2]], axis=0)           # (48, cw) u8
            return pltpu.bitcast(band, jnp.uint32)         # (12, cw)

        @pl.when(intra)
        def _(j=j, compute_res=compute_res):
            ostripe_scr[slot, j] = compute_res().astype(jnp.uint8)

        # the band wait must execute whenever the MC path below runs;
        # it is issued once per step, outside the per-stripe whens
        @pl.when(jnp.logical_not(intra))
        def _(j=j, coded=coded, compute_res=compute_res, _band=_band):
            bits = (stab_ref[0, j, 0, 1], stab_ref[0, j, 0, 2],
                    stab_ref[0, j, 0, 3], stab_ref[0, j, 0, 4])
            # static-stripe fast path: only d = 0 occurs in both axes ->
            # prediction is the band's middle block verbatim, no ladders
            # (skip/uncoded blocks all carry mv 0, common.rs:206-236)
            only0 = jnp.logical_and(
                jnp.logical_and(bits[0] == (1 << 16), bits[1] == 0),
                jnp.logical_and(bits[2] == (1 << 16), bits[3] == 0))

            @pl.when(only0)
            def _(j=j):
                v_scr[...] = pltpu.bitcast(band_scr[slot, j + 1],
                                           jnp.uint32)

            @pl.when(jnp.logical_not(only0))
            def _(j=j, _band=_band, bits=bits):
                dxc = dx_ref[0, j].astype(jnp.int32)   # (1, cw)
                dyc = dy_ref[0, j].astype(jnp.int32)
                if ladder == "gated":
                    _mc_gated_px(_band(), dxc, dyc, bits,
                                 h_scr, v_scr, cw)
                elif ladder == "barrel":
                    v_scr[...] = _mc_barrel_px(_band(), dxc, dyc, cw)
                else:
                    v_scr[...] = _mc_plain_px(_band(), dxc, dyc, cw)

            pred = pltpu.bitcast(v_scr[...], jnp.uint8).astype(jnp.int32)

            @pl.when(coded)
            def _(j=j, pred=pred, compute_res=compute_res):
                res = compute_res()
                # residual apply / skip select (common.rs:98-105)
                inter = jnp.clip(pred + (res - 128) * 2, 0, 255)
                sel = jnp.where(hc_ref[0, j] != 0, inter, pred)
                ostripe_scr[slot, j] = sel.astype(jnp.uint8)

            @pl.when(jnp.logical_not(coded))
            def _(j=j, pred=pred):
                ostripe_scr[slot, j] = pred.astype(jnp.uint8)

    # ---- 4. write the stripes; drain both slots at the very end ----
    for j in range(sb):
        write_dma(slot, j, f, S).start()

    @pl.when(is_last)
    def _():
        for j in range(sb):
            write_dma(slot, j, f, S).wait()

        @pl.when(gi >= 1)
        def _():
            for j in range(sb):
                write_dma(nslot, j, f, S).wait()  # same byte count


def _seq_kernel_units(F: int, gb: int, gch: int, gly: int, scp: int,
                      cw: int, sb: int, C: int, ladder: str,
                      ft_ref, coff_ref, stab_ref, units_ref,
                      dy_ref, dx_ref, hc_ref, q_ref, k_ref, out_ref,
                      band_scr, ostripe_scr, h_scr, v_scr, acc_scr,
                      ub_scr, rsem, wsem, usem):
    """Units-fed whole-clip decode: _seq_kernel with the dense coefficient
    pipeline input replaced by IN-KERNEL densify from the native tile
    demux's chunked unit stream (runtime.demux_file_sparse_tiles).

    Per stripe, the (64, 2*scp) coefficient tile is accumulated in VMEM
    from the tile's unit chunks: chunk k (C units, zero-padded) is DMA'd
    from HBM (double-buffered, prefetched one chunk early), and each
    u32-packed unit (idx << 16 | (u16)(i16)val, idx = r << 10 | lane,
    val i8) lands via two compare-built one-hot factors multiplied on
    the MXU:
        M1  (64, C)     = [r_u == r]                   (bf16 0/1)
        M2T (2*scp, C)  = [lane_u == lane] * val_u     (bf16, exact: |val|
                                                        <= 127)
        acc (64, 2*scp) += M1 @ M2T^T                  (f32 accumulate)
    Exactness: products are integers <= 127 in magnitude (exact in bf16),
    accumulated in f32; per-slot sums are bounded by the i16 coefficient
    range << 2^24, so the f32 accumulation is exact and the final i32
    cast reproduces the scatter-add dense tensor bit-for-bit. Zero-padded
    lanes contribute val 0. This removes the XLA scatter pass AND the
    dense tensor's HBM round-trip (~1.6 GB/clip at 1080p): coefficient
    HBM traffic becomes the ~3 bytes/unit stream itself.

    Everything else (band DMA, MC ladders, gating, write ordering) is
    identical to _seq_kernel."""
    f = pl.program_id(0)
    S = pl.program_id(1)
    gi = f * gb + S
    slot = jnp.bitwise_and(gi, 1)
    nslot = jnp.bitwise_and(gi + 1, 1)
    intra = ft_ref[f] == 1

    def band_read(k, fprev, blk, dst_slot):
        src_s = jnp.clip(blk * sb - 1 + k, 0, gch - 1)
        return pltpu.make_async_copy(
            out_ref.at[fprev, pl.ds(16 * src_s, 16), :],
            band_scr.at[dst_slot, k],
            rsem.at[dst_slot, k])

    def write_dma(wslot, j, ff, blk):
        return pltpu.make_async_copy(
            ostripe_scr.at[wslot, j],
            out_ref.at[ff, pl.ds(16 * (blk * sb + j), 16), :],
            wsem.at[wslot, j])

    @pl.when(gi >= 2)
    def _():
        for j in range(sb):
            write_dma(slot, j, f, S).wait()

    is_last = jnp.logical_and(f == F - 1, S == gb - 1)
    wrap = S == gb - 1
    fn = jnp.where(wrap, f + 1, f)
    Sn = jnp.where(wrap, 0, S + 1)
    fn_c = jnp.minimum(fn, F - 1)

    @pl.when(jnp.logical_and(jnp.logical_not(is_last), ft_ref[fn_c] != 1))
    def _():
        for k in range(sb + 2):
            band_read(k, fn - 1, Sn, nslot).start()

    @pl.when(jnp.logical_not(intra))
    def _():
        for k in range(sb + 2):
            band_read(k, jnp.maximum(f - 1, 0), S, slot).wait()

    def chunk_dma(k, uslot):
        # units ride as (NC, 1, C) u32: integer-indexing the untiled
        # leading chunk axis sidesteps Mosaic's tile-alignment rule for
        # dynamic slices of tiled dims (a (1, C) slice of a (NC, C)
        # array fails "slice along dim 0 must be aligned to tiling"),
        # and the single u32 word per unit makes it ONE DMA per chunk
        return pltpu.make_async_copy(units_ref.at[k], ub_scr.at[uslot],
                                     usem.at[uslot])

    for j in range(sb):
        coded = stab_ref[0, j, 0, 0] != 0
        t = (f * gch + S * sb + j).astype(jnp.int32)

        def compute_res(j=j, t=t):
            n0 = coff_ref[t]
            n1 = coff_ref[t + 1]
            nch = n1 - n0
            acc_scr[...] = jnp.zeros((64, 2 * scp), jnp.float32)

            @pl.when(nch > 0)
            def _():
                chunk_dma(n0, 0).start()

                def body(k, carry):
                    cur = jnp.bitwise_and(k, 1)
                    nxt = jnp.bitwise_and(k + 1, 1)

                    @pl.when(k + 1 < nch)
                    def _():
                        chunk_dma(n0 + k + 1, nxt).start()

                    chunk_dma(n0 + k, cur).wait()
                    w = ub_scr[cur]                            # (1, C) u32
                    idx = (w >> 16).astype(jnp.int32)
                    v16 = jnp.bitwise_and(w, 0xFFFF).astype(jnp.int32)
                    # low 16 bits hold the sign-extended i8 addend as u16
                    val = (v16 - (jnp.bitwise_and(v16, 0x8000) << 1)
                           ).astype(jnp.float32)
                    urow = idx >> 10
                    ulane = idx & 1023
                    riota = jax.lax.broadcasted_iota(
                        jnp.int32, (64, C), 0)
                    m1 = jnp.where(riota == urow, 1.0, 0.0).astype(
                        jnp.bfloat16)
                    liota = jax.lax.broadcasted_iota(
                        jnp.int32, (2 * scp, C), 0)
                    m2t = jnp.where(liota == ulane, val, 0.0).astype(
                        jnp.bfloat16)
                    acc_scr[...] += jax.lax.dot_general(
                        m1, m2t, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    return carry

                jax.lax.fori_loop(0, nch, body, 0)

            coeff = acc_scr[...].astype(jnp.int32)
            return _residual_px(coeff, q_ref[0, 0], k_ref[...], scp, cw)

        def _band(j=j):
            band = jnp.concatenate(
                [band_scr[slot, j], band_scr[slot, j + 1],
                 band_scr[slot, j + 2]], axis=0)
            return pltpu.bitcast(band, jnp.uint32)

        @pl.when(intra)
        def _(j=j, compute_res=compute_res):
            ostripe_scr[slot, j] = compute_res().astype(jnp.uint8)

        @pl.when(jnp.logical_not(intra))
        def _(j=j, coded=coded, compute_res=compute_res, _band=_band):
            bits = (stab_ref[0, j, 0, 1], stab_ref[0, j, 0, 2],
                    stab_ref[0, j, 0, 3], stab_ref[0, j, 0, 4])
            only0 = jnp.logical_and(
                jnp.logical_and(bits[0] == (1 << 16), bits[1] == 0),
                jnp.logical_and(bits[2] == (1 << 16), bits[3] == 0))

            @pl.when(only0)
            def _(j=j):
                v_scr[...] = pltpu.bitcast(band_scr[slot, j + 1],
                                           jnp.uint32)

            @pl.when(jnp.logical_not(only0))
            def _(j=j, _band=_band, bits=bits):
                dxc = dx_ref[0, j].astype(jnp.int32)
                dyc = dy_ref[0, j].astype(jnp.int32)
                if ladder == "gated":
                    _mc_gated_px(_band(), dxc, dyc, bits,
                                 h_scr, v_scr, cw)
                elif ladder == "barrel":
                    v_scr[...] = _mc_barrel_px(_band(), dxc, dyc, cw)
                else:
                    v_scr[...] = _mc_plain_px(_band(), dxc, dyc, cw)

            pred = pltpu.bitcast(v_scr[...], jnp.uint8).astype(jnp.int32)

            @pl.when(coded)
            def _(j=j, pred=pred, compute_res=compute_res):
                res = compute_res()
                inter = jnp.clip(pred + (res - 128) * 2, 0, 255)
                sel = jnp.where(hc_ref[0, j] != 0, inter, pred)
                ostripe_scr[slot, j] = sel.astype(jnp.uint8)

            @pl.when(jnp.logical_not(coded))
            def _(j=j, pred=pred):
                ostripe_scr[slot, j] = pred.astype(jnp.uint8)

    for j in range(sb):
        write_dma(slot, j, f, S).start()

    @pl.when(is_last)
    def _():
        for j in range(sb):
            write_dma(slot, j, f, S).wait()

        @pl.when(gi >= 1)
        def _():
            for j in range(sb):
                write_dma(nslot, j, f, S).wait()


def make_step_seq_units(chh: int, cw: int, gly: int, C: int = 128,
                        interpret: bool = False, ladder: str = "plain",
                        sb: int = 1):
    """Units-fed twin of make_step_seq (see _seq_kernel_units): returns
    seq(units (NC, C) u32, coff (F*gch + 1,) i32,
    dyc/dxc (F, gch, cw) i8, hcc (F, gch, cw) u8, ftype (F,) i32,
    stab (F, gch, 5) i32, qmul (2, 2, 64, 1) i32) -> (F, chh, cw) u8,
    with units/coff from runtime.demux_file_sparse_tiles.

    Same caller contract as make_step_seq, plus 2*scp <= 1024 (the u16
    unit index packs r << 10 | lane)."""
    gch = chh // 16
    gcw = cw // 16
    scp = round_up(2 * gcw, 128)
    if 2 * scp > 1024:
        raise ValueError("geometry too wide for u16 unit indices")
    if gch % sb or gly % sb:
        raise ValueError("make_step_seq_units: sb must divide gch and gly")
    gb = gch // sb
    if gb < 4:
        raise ValueError("make_step_seq_units requires gch // sb >= 4")

    def region(S):
        return jnp.where(S < gly // sb, 0, 1)

    lanes = np.arange(2 * scp)
    cols = np.arange(cw)
    colmatch = (cols[None, :] // 8) == (2 * (lanes >> 2) + (lanes & 1))[:, None]
    k_mat = jnp.asarray(
        np.stack([colmatch & (((lanes >> 1) & 1) == r)[:, None]
                  for r in (0, 1)]).astype(np.float32),
        dtype=jnp.bfloat16)

    def seq(units, coff, dyc, dxc, hcc, ftype, stab, qmul):
        F = ftype.shape[0]
        kernel = functools.partial(_seq_kernel_units, F, gb, gch, gly,
                                   scp, cw, sb, C, ladder)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,   # ftype + chunk offsets ride SMEM
            grid=(F, gb),
            in_specs=[
                pl.BlockSpec((1, sb, 1, 5),
                             lambda f, S, ft, co: (f, S, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec((1, sb, 1, cw),
                             lambda f, S, ft, co: (f, S, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sb, 1, cw),
                             lambda f, S, ft, co: (f, S, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sb, 1, cw),
                             lambda f, S, ft, co: (f, S, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, 1, 64, 1),
                    lambda f, S, ft, co: (jnp.where(ft[f] == 1, 0, 1),
                                          region(S), 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((2, 2 * scp, cw),
                             lambda f, S, ft, co: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, sb + 2, 16, cw), jnp.uint8),  # band dbuf
                pltpu.VMEM((2, sb, 16, cw), jnp.uint8),  # out stripes
                pltpu.VMEM((12, cw), jnp.uint32),      # gated H scratch
                pltpu.VMEM((4, cw), jnp.uint32),       # gated V scratch
                pltpu.VMEM((64, 2 * scp), jnp.float32),  # densify acc
                pltpu.VMEM((2, 1, C), jnp.uint32),     # unit chunk dbuf
                pltpu.SemaphoreType.DMA((2, sb + 2)),  # band reads
                pltpu.SemaphoreType.DMA((2, sb)),      # stripe writes
                pltpu.SemaphoreType.DMA((2,)),         # unit chunk reads
            ],
        )
        call = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((F, chh, cw), jnp.uint8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=interpret,
        )
        ft = ftype.astype(jnp.int32)
        return call(ft, coff.astype(jnp.int32), stab[:, :, None, :],
                    units.reshape(-1, 1, C),
                    dyc[:, :, None, :], dxc[:, :, None, :],
                    hcc[:, :, None, :], qmul, k_mat)

    return seq


def make_step_seq(chh: int, cw: int, gly: int, interpret: bool = False,
                  ladder: str = "plain", sb: int = 1):
    """Build the jittable whole-clip fused decode: one pallas_call over
    grid (F, gch // sb) — see _seq_kernel. Same layout contract as
    make_step; returns seq(coeffs_z (F, 64, gch*2*scp) i16, dyc/dxc
    (F, gch, cw) i8, hcc (F, gch, cw) u8, ftype (F,) i32,
    stab (F, gch, 5) i32, qmul (2, 2, 64, 1) i32) -> (F, chh, cw) u8.

    Caller contract: ftype[0] == 1 (first frame intra), gch % sb == 0,
    gly % sb == 0 (one dequant region per step), and gch // sb >= 4
    (write-vs-prefetch ordering, _seq_kernel docstring)."""
    gch = chh // 16
    gcw = cw // 16
    scp = round_up(2 * gcw, 128)
    if gch % sb or gly % sb:
        raise ValueError("make_step_seq: sb must divide gch and gly")
    gb = gch // sb
    if gb < 4:
        raise ValueError("make_step_seq requires gch // sb >= 4")

    def region(S):
        return jnp.where(S < gly // sb, 0, 1)

    lanes = np.arange(2 * scp)
    cols = np.arange(cw)
    colmatch = (cols[None, :] // 8) == (2 * (lanes >> 2) + (lanes & 1))[:, None]
    k_mat = jnp.asarray(
        np.stack([colmatch & (((lanes >> 1) & 1) == r)[:, None]
                  for r in (0, 1)]).astype(np.float32),
        dtype=jnp.bfloat16)

    def seq(coeffs_z, dyc, dxc, hcc, ftype, stab, qmul):
        F = coeffs_z.shape[0]
        kernel = functools.partial(_seq_kernel, F, gb, gch, gly, scp, cw,
                                   sb, ladder)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,   # ftype rides SMEM (qmul index map)
            grid=(F, gb),
            in_specs=[
                pl.BlockSpec((1, sb, 1, 5),
                             lambda f, S, ft: (f, S, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 64, sb * 2 * scp),
                             lambda f, S, ft: (f, 0, S),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sb, 1, cw), lambda f, S, ft: (f, S, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sb, 1, cw), lambda f, S, ft: (f, S, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sb, 1, cw), lambda f, S, ft: (f, S, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, 1, 64, 1),
                    lambda f, S, ft: (jnp.where(ft[f] == 1, 0, 1),
                                      region(S), 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((2, 2 * scp, cw), lambda f, S, ft: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, sb + 2, 16, cw), jnp.uint8),  # band dbuf
                pltpu.VMEM((2, sb, 16, cw), jnp.uint8),  # out stripes
                pltpu.VMEM((12, cw), jnp.uint32),      # gated H scratch
                pltpu.VMEM((4, cw), jnp.uint32),       # gated V scratch
                pltpu.SemaphoreType.DMA((2, sb + 2)),  # band reads
                pltpu.SemaphoreType.DMA((2, sb)),      # stripe writes
            ],
        )
        call = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((F, chh, cw), jnp.uint8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=interpret,
        )
        ft = ftype.astype(jnp.int32)
        return call(ft, stab[:, :, None, :], coeffs_z, dyc[:, :, None, :],
                    dxc[:, :, None, :], hcc[:, :, None, :], qmul, k_mat)

    return seq
