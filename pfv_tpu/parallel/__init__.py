"""Multi-chip scaling: mesh construction and sharded multi-stream decode."""
