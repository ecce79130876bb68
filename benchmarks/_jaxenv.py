"""Process-environment guard for benchmark/probe entry points.

``JAX_USE_SIMPLIFIED_JAXPR_CONSTANTS=1`` hoists jit-captured arrays as
runtime arguments instead of inlining them as HLO literals.  Library
paths capture index arrays as jax device arrays (``types.as_device_array``)
precisely so this flag can hoist them; without it, a captured index
stream at nnz ~1e7 is a 40-80 MB literal and the tunnelled remote
compiler rejects the executable upload (HTTP 413 — the six error rows
of the round-4 ``sparse_mm_suite_results.csv``).

The flag's MLIR-lowering default is frozen when jax is first imported,
and the axon ``sitecustomize`` imports jax at interpreter start — so an
in-process ``os.environ`` update or ``jax.config.update`` is too late.
The only reliable fix is to re-exec the interpreter with the variable
in the inherited environment, which is what :func:`reexec` does.  Call
it first thing in every ``__main__`` block (NOT at import time: a test
run importing a benchmark module must never exec over pytest).
"""

import os
import sys

REQUIRED = {
    "JAX_USE_SIMPLIFIED_JAXPR_CONSTANTS": "1",
}


def reexec() -> None:
    """Re-exec ``python -m <module> <args>`` (or ``python <script>``)
    with :data:`REQUIRED` in the environment; no-op when already set."""
    missing = {k: v for k, v in REQUIRED.items()
               if os.environ.get(k) != v}
    if not missing:
        return
    os.environ.update(missing)
    main = sys.modules.get("__main__")
    spec = getattr(main, "__spec__", None)
    if spec is not None and spec.name:
        argv = [sys.executable, "-m", spec.name] + sys.argv[1:]
    else:
        argv = [sys.executable] + sys.argv
    sys.stderr.flush()
    sys.stdout.flush()
    os.execve(sys.executable, argv, os.environ)
