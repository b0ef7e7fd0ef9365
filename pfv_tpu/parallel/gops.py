"""GOP-parallel decode: shard one video's keyframe-delimited runs across
chips.

The PFV P-frame chain is sequential, but every I-frame resets the
prediction state, so keyframe-delimited GOPs are mutually independent
(SURVEY.md §2: "shard GOPs/streams across chips; within a GOP, frames stay
sequential via lax.scan"). This module splits a single stream into GOPs,
pads them to a common length, and decodes all GOPs as a vmapped scan —
optionally shard_mapped over a `gops` mesh axis so one long video saturates
multiple chips.

Padding frames are synthesized as all-skip P-frames (copy previous recon)
and dropped from the output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pfv_tpu import runtime
from pfv_tpu.dataloader import get_decoder


def _split_gops(info, idx, val, mvx, mvy, hc, ftype, qidx, pad_gops_to: int):
    """Regroup per-frame tensors into (G, L, ...) padded GOP tensors."""
    nb = info["total_blocks"]
    f = ftype.shape[0]
    starts = np.flatnonzero(ftype == 1)
    if starts.size == 0 or starts[0] != 0:
        raise ValueError("stream must start with an I-frame for GOP split")
    ends = np.append(starts[1:], f)
    lengths = ends - starts
    g = len(starts)
    gp = ((g + pad_gops_to - 1) // pad_gops_to) * pad_gops_to
    lmax = int(lengths.max())

    def pad_frames(arr, fill):
        out = np.full((gp, lmax) + arr.shape[1:], fill, dtype=arr.dtype)
        for i, (s, e) in enumerate(zip(starts, ends)):
            out[i, : e - s] = arr[s:e]
        return out

    mvx_g = pad_frames(mvx, 0)
    mvy_g = pad_frames(mvy, 0)
    hc_g = pad_frames(hc, 0)  # padding: all-skip P frames
    ftype_g = pad_frames(ftype.astype(np.int32), 2)
    qidx_g = pad_frames(qidx.astype(np.int32), 0)

    # remap sparse flat indices from frame space to (gop, slot) space
    per_frame = nb * 256
    frame_of = idx // per_frame
    gop_of = np.searchsorted(starts, frame_of, side="right") - 1
    slot_of = frame_of - starts[gop_of]
    new_idx = (gop_of.astype(np.int64) * lmax + slot_of) * per_frame + (
        idx % per_frame
    )
    order = np.argsort(new_idx, kind="stable")
    total = gp * lmax * per_frame
    if total >= 2**31:
        raise ValueError("GOP-padded video too large for int32 flat indexing")
    return (
        new_idx[order].astype(np.int32),
        val[order],
        mvx_g,
        mvy_g,
        hc_g,
        ftype_g,
        qidx_g,
        lengths,
        g,
    )


def decode_video_rgb_gops(
    data: bytes,
    mesh: Mesh | None = None,
    axis: str = "gops",
    num_threads: int = 0,
) -> jnp.ndarray:
    """Decode one .pfv stream with GOPs in parallel -> (F, H, W, 3) uint8.

    With a mesh, GOPs shard over `axis` (shard_map + vmap); without one,
    they still decode as a single vmapped launch on one chip.
    """
    out = runtime.demux_file_sparse(data, num_threads)
    info = out[0]
    n_dev = mesh.shape[axis] if mesh is not None else 1
    (idx, val, mvx, mvy, hc, ftype, qidx, lengths, g) = _split_gops(
        info, *out[1:], pad_gops_to=n_dev
    )
    gp, lmax = mvx.shape[0], mvx.shape[1]
    dec = get_decoder(info["width"], info["height"], info["qtables"],
                      "mxu" if info.get("mv_absmax", 127) <= 16 else "gather")
    nb = info["total_blocks"]
    per_gop = lmax * nb * 256

    def impl(idxs, vals, *rest):
        # scatter into the (local) gop range, then vmap the per-GOP scan
        g_local = rest[0].shape[0]
        total = g_local * per_gop
        base = jax.lax.axis_index(axis) * total if mesh is not None else 0
        buf = jnp.zeros((total + 1,), jnp.int16)
        local = jnp.clip(idxs - base, 0, total)  # out-of-shard -> sacrificial
        keep = (idxs >= base) & (idxs < base + total)
        buf = buf.at[jnp.where(keep, local, total)].set(vals)
        dense = buf[:total].reshape(g_local, lmax, nb, 256)
        return jax.vmap(dec.decode_yuv_impl)(dense, *rest)

    # stitch GOPs back into frame order (constant gather maps)
    gather_g = np.concatenate(
        [np.full(l, i, dtype=np.int32) for i, l in enumerate(lengths)]
    )
    gather_s = np.concatenate([np.arange(l, dtype=np.int32) for l in lengths])

    def stitch_impl(ys, us, vs):
        from pfv_tpu.ops.color import yuv_to_rgb

        y = ys[gather_g, gather_s]
        u = us[gather_g, gather_s]
        v = vs[gather_g, gather_s]
        uu = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2)
        vv = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2)
        return yuv_to_rgb(y, uu[:, : y.shape[1], : y.shape[2]],
                          vv[:, : y.shape[1], : y.shape[2]])

    args_np = (idx, val, mvx, mvy, hc, ftype, qidx)
    if mesh is None:
        # single device: decode + stitch fused into one program
        fn = jax.jit(lambda *a: stitch_impl(*impl(*a)))
        dev_args = tuple(jnp.asarray(a) for a in args_np)
        return fn(*dev_args)
    else:
        specs = (P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis))
        fn = jax.jit(
            jax.shard_map(
                impl, mesh=mesh, in_specs=specs, out_specs=P(axis),
                check_vma=False,
            )
        )
        shardings = tuple(
            NamedSharding(mesh, s) for s in specs
        )
        dev_args = tuple(
            jax.device_put(a, s) for a, s in zip(args_np, shardings)
        )

    ys, us, vs = fn(*dev_args)  # (GP, L, h, w) sharded over gops
    # GSPMD inserts the cross-shard gathers for the frame-order stitch
    return jax.jit(stitch_impl)(ys, us, vs)
