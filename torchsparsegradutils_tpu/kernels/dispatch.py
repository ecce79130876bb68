"""Backend dispatch for Pallas TPU kernels.

Each hook returns ``None`` to fall back to the XLA (gather + segment-sum)
path — e.g. off-TPU, for shapes the kernel doesn't cover, or while the
kernel is disabled.  Real kernels live in sibling modules and register here.
"""

from __future__ import annotations

import jax

_FORCE = None  # set by tests/benchmarks: None | "xla" | "pallas"


def on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def spmm_pallas(A, B):
    """Pallas SpMM hook for a 2-D static-pattern container; None -> XLA
    fallback."""
    return None
