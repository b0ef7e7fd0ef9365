"""Runtime configuration knobs.

PFV_PALLAS: "1" force Pallas kernels, "0" force pure-XLA, "auto" (default)
Pallas on accelerator backends, XLA on CPU (where Pallas only interprets).
"""

from __future__ import annotations

import os


def use_pallas() -> bool:
    v = os.environ.get("PFV_PALLAS", "auto")
    if v == "auto":
        import jax

        return jax.default_backend() != "cpu"
    return v == "1"
