"""Pallas kernels == jnp oracle, bit for bit (CPU interpret mode)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def jnp():
    import jax.numpy as jnp

    return jnp


def test_idct_kernel_matches_oracle(jnp):
    import jax

    from pfv_tpu.ops.iframe import decode_blocks
    from pfv_tpu.ops.pallas.idct_kernel import decode_blocks_pallas

    rng = np.random.default_rng(20)
    for n in (1, 7, 128, 300):
        coeffs = rng.integers(-800, 800, size=(n, 4, 64))
        coeffs[rng.random(size=coeffs.shape) < 0.7] = 0
        coeffs = coeffs.astype(np.int16)
        q = rng.integers(1, 60, size=64).astype(np.int32)

        want = np.asarray(decode_blocks(jnp.asarray(coeffs), jnp.asarray(q)))
        got = np.asarray(
            jax.jit(decode_blocks_pallas)(jnp.asarray(coeffs), jnp.asarray(q))
        )
        np.testing.assert_array_equal(got, want, err_msg=f"n={n}")


def test_fdct_kernel_matches_oracle(jnp):
    import jax

    from pfv_tpu.ops.iframe import encode_blocks
    from pfv_tpu.ops.pallas.dct_kernel import encode_blocks_pallas

    rng = np.random.default_rng(21)
    for n in (1, 64, 200):
        blocks = rng.integers(0, 256, size=(n, 16, 16)).astype(np.uint8)
        q = rng.integers(1, 60, size=64).astype(np.int32)
        want = np.asarray(encode_blocks(jnp.asarray(blocks), jnp.asarray(q)))
        got = np.asarray(
            jax.jit(encode_blocks_pallas)(jnp.asarray(blocks), jnp.asarray(q))
        )
        np.testing.assert_array_equal(got, want, err_msg=f"n={n}")


def test_mc_kernel_matches_oracle(jnp):
    import jax

    from pfv_tpu.ops.blocks import block_origins
    from pfv_tpu.ops.motion import gather_predictions
    from pfv_tpu.ops.pallas.mc_kernel import mc_reconstruct_pallas
    from pfv_tpu.ops.pframe import apply_residuals

    rng = np.random.default_rng(22)
    h, w = 64, 80
    ref = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    by, bx = block_origins(h, w)
    n = len(by)
    res = rng.integers(0, 256, size=(n, 16, 16)).astype(np.uint8)
    mvx = np.clip(rng.integers(-15, 16, size=n), -bx, w - 16 - bx).astype(np.int32)
    mvy = np.clip(rng.integers(-15, 16, size=n), -by, h - 16 - by).astype(np.int32)
    hc = rng.random(n) < 0.5

    for is_intra in (False, True):
        pred = gather_predictions(
            jnp.asarray(ref), jnp.asarray(by), jnp.asarray(bx),
            jnp.asarray(mvy), jnp.asarray(mvx),
        )
        inter = jnp.where(
            jnp.asarray(hc)[:, None, None],
            apply_residuals(jnp.asarray(res), pred),
            pred,
        )
        want = np.asarray(jnp.where(is_intra, jnp.asarray(res), inter))

        got = np.asarray(
            jax.jit(mc_reconstruct_pallas)(
                jnp.asarray(res), jnp.asarray(ref),
                jnp.asarray(by), jnp.asarray(bx),
                jnp.asarray(mvy), jnp.asarray(mvx),
                jnp.asarray(hc), jnp.asarray(is_intra),
            )
        )
        np.testing.assert_array_equal(got, want, err_msg=f"intra={is_intra}")
