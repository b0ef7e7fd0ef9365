"""Pallas TPU kernels for the codec hot paths.

Each kernel has a jnp twin in pfv_tpu.ops.* that serves as the bit-exact
oracle; tests assert kernel == oracle on every element.
"""
