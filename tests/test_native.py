"""Native (C++) pattern-op tests: equality with the numpy fallbacks and a
speed sanity check on the radix lexsort."""

import time

import numpy as np
import pytest

from torchsparsegradutils_tpu import native


def test_native_available():
    # the environment ships g++; the extension should build
    assert native.available()


def test_lexsort_matches_numpy():
    rng = np.random.default_rng(0)
    rows = rng.integers(0, 1000, 20000)
    cols = rng.integers(0, 800, 20000)
    p_nat = native.lexsort_rowcol(rows, cols, 800)
    p_np = np.lexsort((cols, rows))
    # permutations may differ on ties only if sort is unstable; keys equal
    k_nat = rows[p_nat] * 800 + cols[p_nat]
    k_np = rows[p_np] * 800 + cols[p_np]
    np.testing.assert_array_equal(k_nat, k_np)


def test_compress_rows_matches_numpy():
    rng = np.random.default_rng(1)
    rows = np.sort(rng.integers(0, 100, 5000))
    got = native.compress_rows(rows, 100)
    counts = np.bincount(rows, minlength=100)
    want = np.zeros(101, np.int64)
    np.cumsum(counts, out=want[1:])
    np.testing.assert_array_equal(got, want)
    assert got[-1] == 5000


def test_chunk_ranks_matches_numpy():
    rng = np.random.default_rng(2)
    rows = np.sort(rng.integers(0, 200, 4096))
    lr_n, seg_n, W_n = native.chunk_ranks(rows, 512, 200, W_cap=512)
    # numpy fallback path
    import os
    nchunks = len(rows) // 512
    rch = rows.reshape(nchunks, 512)
    new_row = np.concatenate([np.ones((nchunks, 1), bool),
                              rch[:, 1:] != rch[:, :-1]], axis=1)
    lr_ref = (np.cumsum(new_row, axis=1) - 1).astype(np.int32)
    np.testing.assert_array_equal(lr_n, lr_ref)
    W_ref = int(lr_ref.max() + 1)
    assert W_n == W_ref
    seg_ref = np.full((nchunks, 512), 200, np.int32)
    np.put_along_axis(seg_ref, lr_ref, rch.astype(np.int32), axis=1)
    np.testing.assert_array_equal(seg_n, seg_ref)


@pytest.mark.skipif(not native.available(), reason="no native lib")
def test_lexsort_speed():
    rng = np.random.default_rng(3)
    nnz = 2_000_000
    rows = rng.integers(0, 100_000, nnz)
    cols = rng.integers(0, 100_000, nnz)
    # best-of-3 on each side: a single sample flakes under CI host load
    t_nat = min(_time_once(lambda: native.lexsort_rowcol(
        rows, cols, 100_000)) for _ in range(3))
    t_np = min(_time_once(lambda: np.lexsort((cols, rows)))
               for _ in range(3))
    print(f"native {t_nat*1e3:.0f} ms vs numpy {t_np*1e3:.0f} ms")
    # radix should beat comparison sort at this size; allow slack for a
    # loaded machine (benchmarks may run concurrently in CI)
    assert t_nat < t_np * 2.0


def _time_once(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


class TestColorBipartite:
    """Euler-split edge coloring behind the 3-stage shuffle plans."""

    @staticmethod
    def _check_proper(src, dst, colors, R, d):
        assert colors.min() >= 0 and colors.max() < d
        n = len(src)
        assert len(np.unique(src * d + colors)) == n
        assert len(np.unique(dst * d + colors)) == n

    @pytest.mark.parametrize("R,d", [(3, 2), (5, 8), (64, 128), (311, 128)])
    def test_native_proper(self, R, d):
        rng = np.random.default_rng(R * d)
        perm = rng.permutation(R * d)
        src, dst = perm // d, np.arange(R * d) // d
        colors = native.color_bipartite(src, dst, R, d)
        assert colors is not None
        self._check_proper(src, dst, colors, R, d)

    def test_python_fallback_proper(self):
        rng = np.random.default_rng(7)
        R, d = 17, 16
        perm = rng.permutation(R * d)
        src, dst = perm // d, np.arange(R * d) // d
        colors = native._color_bipartite_py(
            src.astype(np.int64), dst.astype(np.int64), R, d)
        self._check_proper(src, dst, colors, R, d)

    def test_rejects_non_power_of_two(self):
        src = np.zeros(3, np.int64)
        dst = np.zeros(3, np.int64)
        assert native.color_bipartite(src, dst, 1, 3) is None \
            or not native.available()
