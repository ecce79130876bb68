"""Benchmark suites.  ``python -m benchmarks.<suite> [--small] [--cpu]``.

``--cpu`` forces the CPU platform before any backend initialises (the
axon sitecustomize imports jax at interpreter start and pins the TPU
platform; plain ``JAX_PLATFORMS=cpu`` is too late) — use it for smoke
runs when no TPU is reachable.  Handled here because this package
``__init__`` runs before any suite module body.
"""

import sys

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")
