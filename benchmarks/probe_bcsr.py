"""Host-side analysis: can BCSR/tile clustering beat the gather floor
on the random-pattern SpMM benchmark?  (VERDICT r4 item 4 / SURVEY §7
hard part #2.)

The chunk kernel's forward cost on a random pattern is one 512-byte HBM
transaction per nonzero (the pre-gathered B-row stream).  A BCSR-style
design replaces per-entry row gathers with dense (8-row x 128-lane)
column-block loads — a win iff entries cluster into few distinct column
blocks per chunk, i.e. iff the pattern (after the best row reordering we
can find) has column locality:

    bytes_gather = C * 512                 per C-entry chunk
    bytes_bcsr   = distinct_col_blocks * 8 * 512

So BCSR wins iff distinct 8-col-blocks per chunk < C / 8.

This probe measures that statistic on the EXACT benchmark pattern
(uniform random, cfd2 scale) for
  (a) the natural row-sorted order,
  (b) a greedy column-similarity row clustering (nearest-neighbour by
      shared column blocks, the standard BCSR reordering heuristic), and
  (c) the analytic expectation for a uniform pattern,
and prints the modelled BCSR:gather byte ratio.  Pure host-side numpy —
run anywhere: ``python -m benchmarks.probe_bcsr [--small]``.

Expectation (and measured result — see STATUS.md): with ~25 nonzeros
per row spread uniformly over 123k columns, two rows share a column
block with probability ~25·25·8/123440 ≈ 0.04, so even perfect
clustering cannot concentrate entries: distinct blocks per 512-entry
chunk stays ≈ 512 and the BCSR design moves ~8x MORE bytes than the
per-entry gather.  The gather floor stands on uniform patterns; BCSR
only pays off on patterns with real block structure (which the DIA /
hybrid engines already capture via diagonal clustering).
"""

import argparse
import json

import numpy as np

N_ROWS = 123_440
NNZ_RAND = 3_087_898
CHUNK = 512
COL_BLOCK = 8


def _pattern(n, nnz, seed=0):
    rng = np.random.default_rng(seed)
    flat = rng.choice(n * n, size=nnz, replace=False)  # distinct entries
    rows, cols = flat // n, flat % n
    order = np.lexsort((cols, rows))
    return rows[order], cols[order]


def blocks_per_chunk(rows, cols, order_of_rows, n):
    """Mean distinct 8-col-blocks per 512-entry chunk under a given row
    ordering (entries of one row stay together, CSR-style)."""
    rank = np.empty(n, np.int64)
    rank[order_of_rows] = np.arange(n)
    order = np.lexsort((cols, rank[rows]))
    cb = cols[order] // COL_BLOCK
    nch = len(cb) // CHUNK
    cb = cb[:nch * CHUNK].reshape(nch, CHUNK)
    distinct = np.array([len(np.unique(c)) for c in cb])
    return float(distinct.mean())


def greedy_cluster(rows, cols, n, sample_rows=4096, seed=1):
    """Greedy nearest-neighbour row ordering by shared column blocks on
    a row sample (full greedy is O(n^2); the sample bounds the best
    achievable locality — if even the sample shows none, the full
    ordering has none)."""
    rng = np.random.default_rng(seed)
    sel = np.sort(rng.choice(n, size=min(sample_rows, n), replace=False))
    # row -> set of column blocks, restricted to the sample
    from collections import defaultdict
    rb = defaultdict(set)
    mask = np.isin(rows, sel)
    for r, c in zip(rows[mask], cols[mask] // COL_BLOCK):
        rb[int(r)].add(int(c))
    # inverted index: block -> rows
    inv = defaultdict(list)
    for r, bs in rb.items():
        for b in bs:
            inv[b].append(r)
    unvisited = set(rb.keys())
    order = []
    cur = next(iter(unvisited))
    pair_overlap = []
    while unvisited:
        unvisited.discard(cur)
        order.append(cur)
        # best unvisited neighbour by shared blocks
        counts = defaultdict(int)
        for b in rb[cur]:
            for r in inv[b]:
                if r in unvisited:
                    counts[r] += 1
        if counts:
            nxt, ov = max(counts.items(), key=lambda kv: kv[1])
            pair_overlap.append(ov)
        else:
            if not unvisited:
                break
            nxt = next(iter(unvisited))
            pair_overlap.append(0)
        cur = nxt
    return order, (float(np.mean(pair_overlap)) if pair_overlap else 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()
    n = 12_344 if args.small else N_ROWS
    nnz = 300_032 if args.small else NNZ_RAND
    rows, cols = _pattern(n, nnz)
    deg = nnz / n

    natural = blocks_per_chunk(rows, cols, np.arange(n), n)
    order, mean_overlap = greedy_cluster(rows, cols, n)
    # evaluate the clustered ordering on the sampled rows only (entries
    # of sampled rows, re-chunked)
    sel = np.array(order)
    mask = np.isin(rows, sel)
    rs, cs = rows[mask], cols[mask]
    clustered = blocks_per_chunk(rs, cs, np.concatenate(
        [sel, np.setdiff1d(np.arange(n), sel)]), n)
    # analytic: expected distinct blocks per chunk for uniform placement
    nb = n // COL_BLOCK
    analytic = nb * (1.0 - (1.0 - 1.0 / nb) ** CHUNK)
    out = {
        "deg_per_row": round(deg, 2),
        "blocks_per_chunk_natural": round(natural, 1),
        "blocks_per_chunk_clustered_sample": round(clustered, 1),
        "blocks_per_chunk_uniform_analytic": round(analytic, 1),
        "bcsr_win_threshold": CHUNK / COL_BLOCK,
        "mean_shared_blocks_between_greedy_neighbours": round(
            mean_overlap, 3),
        "bcsr_vs_gather_byte_ratio_natural": round(
            natural * COL_BLOCK / CHUNK, 2),
        "bcsr_vs_gather_byte_ratio_clustered": round(
            clustered * COL_BLOCK / CHUNK, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
