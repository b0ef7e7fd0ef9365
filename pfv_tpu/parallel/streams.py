"""Multi-stream decode sharded over a TPU device mesh.

Scaling story (SURVEY.md §2): PFV streams/GOPs are mutually independent, so
the natural multi-chip mapping is data parallelism over a `streams` mesh
axis — placement-only sharding over ICI; frames within a stream stay
sequential in the on-device `lax.scan`. A `psum` over the mesh aggregates
global statistics (the only collective the workload needs).

All streams in a batch must share geometry (width/height/frame count) —
stack heterogeneous videos into separate batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pfv_tpu import runtime
from pfv_tpu.dataloader import get_decoder


def make_stream_mesh(n_devices: int | None = None, axis: str = "streams") -> Mesh:
    """A 1-D mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def stack_streams(datas: list[bytes], num_threads: int = 0):
    """Demux S same-geometry .pfv byte streams into stacked (S, ...) tensors."""
    infos, parts = [], []
    for d in datas:
        info, coeffs, mvx, mvy, has_coeff, ftype, qidx = runtime.demux_file(
            d, num_threads
        )
        infos.append(info)
        parts.append((coeffs, mvx, mvy, has_coeff,
                      ftype.astype(np.int32), qidx.astype(np.int32)))
    w, h = infos[0]["width"], infos[0]["height"]
    for i in infos[1:]:
        if (i["width"], i["height"]) != (w, h):
            raise ValueError("all streams in a batch must share geometry")
        if not np.array_equal(i["qtables"], infos[0]["qtables"]):
            raise ValueError("all streams in a batch must share q-tables")
    stacked = tuple(np.stack([p[i] for p in parts]) for i in range(6))
    return infos[0], stacked


def make_sharded_decoder(
    mesh: Mesh, width: int, height: int, qtables: np.ndarray, axis: str = "streams"
):
    """Jitted sharded multi-stream decoder.

    Returns fn(stacked (S, ...) tensors) -> ((S, F, H, W, 3) u8 RGB sharded
    over `axis`, global mean-luma scalar aggregated with psum over ICI).
    S must be divisible by the mesh axis size.
    """
    dec = get_decoder(width, height, qtables)

    def local_decode(coeffs, mvx, mvy, has_coeff, ftype, qidx):
        rgb = jax.vmap(dec.decode_rgb_impl)(coeffs, mvx, mvy, has_coeff, ftype, qidx)
        # global statistic over the mesh: mean luma proxy (exercises ICI)
        local_sum = jnp.sum(rgb.astype(jnp.float32)) / rgb.size
        global_mean = jax.lax.psum(local_sum, axis) / jax.lax.psum(
            jnp.ones(()), axis
        )
        return rgb, global_mean

    # check_vma=False: the scan carry starts from mesh-invariant constants
    # (zero/neutral planes) that become per-shard varying on the first frame;
    # everything here is per-shard data parallel, so the VMA check is moot.
    sharded = jax.shard_map(
        local_decode,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def decode_stream_batch_rgb(
    datas: list[bytes],
    mesh: Mesh | None = None,
    num_threads: int = 0,
):
    """Demux + decode a batch of same-geometry streams across the mesh.

    Returns ((S, F, H, W, 3) uint8 RGB, global mean luma) — RGB stays
    sharded across devices (one shard per chip's HBM).
    """
    if mesh is None:
        mesh = make_stream_mesh()
    info, stacked = stack_streams(datas, num_threads)
    axis = mesh.axis_names[0]
    spec = NamedSharding(mesh, P(axis))
    dev_args = tuple(jax.device_put(a, spec) for a in stacked)
    fn = make_sharded_decoder(mesh, info["width"], info["height"], info["qtables"], axis)
    return fn(*dev_args)
