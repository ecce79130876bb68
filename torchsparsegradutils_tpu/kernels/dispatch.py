"""Backend dispatch helpers for the Pallas TPU kernels."""

from __future__ import annotations

import jax


def on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
