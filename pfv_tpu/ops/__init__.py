"""Batched TPU-native ops: DCT, quantization, blocks, motion, residuals, color."""
