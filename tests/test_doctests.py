"""Docstring examples executed as tests (reference tests/test_doctests.py:
doctest.testmod over the library modules)."""

import doctest
import importlib

import pytest

MODULES = [
    "torchsparsegradutils_tpu.ops.spmm",
    "torchsparsegradutils_tpu.ops.solve",
    "torchsparsegradutils_tpu.ops.triangular_solve",
    "torchsparsegradutils_tpu.ops.logsumexp",
    "torchsparsegradutils_tpu.ops.lstsq",
    "torchsparsegradutils_tpu.utils.random_sparse",
    "torchsparsegradutils_tpu.models.distributions",
    "torchsparsegradutils_tpu.kernels.dia",
    "torchsparsegradutils_tpu.kernels.explain",
]


@pytest.mark.parametrize("module_name", MODULES)
def test_doctests(module_name):
    mod = importlib.import_module(module_name)
    result = doctest.testmod(mod, verbose=False,
                             optionflags=doctest.NORMALIZE_WHITESPACE)
    assert result.failed == 0, f"{result.failed} doctest failures in " \
                               f"{module_name}"
    assert result.attempted > 0, f"no doctests collected in {module_name}"
