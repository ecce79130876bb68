// Native pattern-preprocessing kernels (host side).
//
// Sparse patterns in this library are static structure processed on the
// host: CSR conversion, transposes, encoder assembly and the Pallas chunk
// plans all begin with a lexicographic (row, col) sort of the nonzero
// coordinates.  numpy's lexsort is comparison-based (O(nnz log nnz) with a
// large constant); at the library's target scales (nnz 1e6-1e8, new
// pattern per encoder/config) this dominates plan-build latency.  This
// file provides an LSD radix sort over the packed 64-bit (row major, col
// minor) key - O(nnz) with 4 16-bit passes - plus fused helpers used by
// the planners.  Exposed with a plain C ABI for ctypes (no pybind11
// dependency); Python falls back to numpy when the shared library is
// unavailable.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Sort entry permutation by key[i] = rows[i] * m + cols[i] (row-major
// lexicographic).  rows/cols: int64[nnz]; perm_out: int64[nnz].
// Returns 0 on success.
int lexsort_rowcol(const int64_t* rows, const int64_t* cols, int64_t nnz,
                   int64_t m, int64_t* perm_out) {
    if (nnz <= 0) return 0;
    std::vector<uint64_t> key(nnz), key_tmp(nnz);
    std::vector<int64_t> perm(nnz), perm_tmp(nnz);
    for (int64_t i = 0; i < nnz; ++i) {
        key[i] = static_cast<uint64_t>(rows[i]) * static_cast<uint64_t>(m)
                 + static_cast<uint64_t>(cols[i]);
        perm[i] = i;
    }
    // LSD radix sort, 16-bit digits
    std::vector<int64_t> count(1 << 16);
    for (int shift = 0; shift < 64; shift += 16) {
        std::memset(count.data(), 0, count.size() * sizeof(int64_t));
        bool any = false;
        for (int64_t i = 0; i < nnz; ++i) {
            uint32_t d = (key[i] >> shift) & 0xFFFF;
            any |= (d != 0);
            ++count[d];
        }
        if (!any && shift > 0) break;  // higher digits all zero: done
        int64_t total = 0;
        for (size_t d = 0; d < count.size(); ++d) {
            int64_t c = count[d];
            count[d] = total;
            total += c;
        }
        for (int64_t i = 0; i < nnz; ++i) {
            uint32_t d = (key[i] >> shift) & 0xFFFF;
            int64_t pos = count[d]++;
            key_tmp[pos] = key[i];
            perm_tmp[pos] = perm[i];
        }
        key.swap(key_tmp);
        perm.swap(perm_tmp);
    }
    std::memcpy(perm_out, perm.data(), nnz * sizeof(int64_t));
    return 0;
}

// Compress sorted row indices into CSR indptr. rows: int64[nnz] sorted
// non-decreasing; indptr_out: int64[n+1].
int compress_rows(const int64_t* rows, int64_t nnz, int64_t n,
                  int64_t* indptr_out) {
    std::memset(indptr_out, 0, (n + 1) * sizeof(int64_t));
    for (int64_t i = 0; i < nnz; ++i) {
        int64_t r = rows[i];
        if (r < 0 || r >= n) return 1;
        ++indptr_out[r + 1];
    }
    for (int64_t r = 0; r < n; ++r) indptr_out[r + 1] += indptr_out[r];
    return 0;
}

// Per-chunk local row ranks for the Pallas chunk plan: rows (sorted,
// padded to nchunks*C with the last row), outputs lr int32[nchunks*C]
// (rank of each entry's row within its chunk's distinct rows) and
// seg_rows int32[nchunks*W_cap] (global row per rank slot; sentinel n).
// Returns the max distinct-row count over chunks (<= W_cap needed), or -1
// if some chunk exceeds W_cap.
int64_t chunk_ranks(const int64_t* rows, int64_t nnz_pad, int64_t C,
                    int64_t n, int64_t W_cap, int32_t* lr_out,
                    int32_t* seg_rows_out) {
    int64_t nchunks = nnz_pad / C;
    int64_t maxw = 0;
    for (int64_t c = 0; c < nchunks; ++c) {
        const int64_t* r = rows + c * C;
        int32_t* lr = lr_out + c * C;
        int32_t* seg = seg_rows_out + c * W_cap;
        for (int64_t w = 0; w < W_cap; ++w) seg[w] = static_cast<int32_t>(n);
        int64_t rank = -1;
        int64_t prev = -1;
        for (int64_t i = 0; i < C; ++i) {
            if (r[i] != prev) {
                ++rank;
                if (rank >= W_cap) return -1;
                seg[rank] = static_cast<int32_t>(r[i]);
                prev = r[i];
            }
            lr[i] = static_cast<int32_t>(rank);
        }
        if (rank + 1 > maxw) maxw = rank + 1;
    }
    return maxw;
}

// Dependency levels for a lower-triangular solve (level scheduling):
// level[i] = 1 + max(level[j]) over stored entries (i, j) with j < i, and
// 0 for rows with no such entry.  Entries must be sorted by row (CSR
// canonical order); entries with j >= i (diagonal/upper) are skipped.
// rows/cols: int64[nnz]; level_out: int64[n].  Returns the number of
// levels (max level + 1), or -1 on invalid input.
int64_t tri_levels(const int64_t* rows, const int64_t* cols, int64_t nnz,
                   int64_t n, int64_t* level_out) {
    for (int64_t i = 0; i < n; ++i) level_out[i] = 0;
    int64_t maxlev = 0;
    for (int64_t e = 0; e < nnz; ++e) {
        int64_t i = rows[e], j = cols[e];
        if (i < 0 || i >= n || j < 0 || j >= n) return -1;
        if (j >= i) continue;  // diagonal / upper part: no dependency
        int64_t cand = level_out[j] + 1;
        if (cand > level_out[i]) level_out[i] = cand;
        if (level_out[i] > maxlev) maxlev = level_out[i];
    }
    return maxlev + 1;
}

// 2^k-edge-coloring of a d-regular bipartite multigraph by recursive
// Euler splitting, for the 3-stage shuffle (static permutation) plans:
// elements of an (R, 128)-laid-out permutation are edges source-row ->
// dest-row; a proper 128-edge-coloring assigns each element an
// intermediate lane such that stage 1 (within-source-row) and stage 2
// (within-lane) moves are collision-free (Konig: the chromatic index of
// a bipartite multigraph equals its max degree).  src/dst: int64[nedges]
// in [0, R); d = max degree, must be a power of two; color_out:
// int32[nedges] in [0, d).  Returns 0 on success, -1 on invalid input.
static void euler_split(const int64_t* src, const int64_t* dst, int64_t R,
                        const std::vector<int64_t>& edges, int bit,
                        std::vector<int32_t>& color,
                        std::vector<int64_t>& scratch_ptr,
                        std::vector<int64_t>& scratch_inc,
                        std::vector<int64_t>& cursor,
                        std::vector<uint8_t>& used) {
    const int64_t ne = static_cast<int64_t>(edges.size());
    if (ne == 0 || bit < 0) return;
    // incidence lists over 2R vertices (left u, right R + v)
    const int64_t nv = 2 * R;
    scratch_ptr.assign(nv + 1, 0);
    for (int64_t t = 0; t < ne; ++t) {
        const int64_t e = edges[t];
        ++scratch_ptr[src[e] + 1];
        ++scratch_ptr[R + dst[e] + 1];
    }
    for (int64_t v = 0; v < nv; ++v) scratch_ptr[v + 1] += scratch_ptr[v];
    scratch_inc.resize(2 * ne);
    cursor.assign(nv, 0);
    for (int64_t v = 0; v < nv; ++v) cursor[v] = scratch_ptr[v];
    for (int64_t t = 0; t < ne; ++t) {
        const int64_t e = edges[t];
        scratch_inc[cursor[src[e]]++] = t;       // local edge index
        scratch_inc[cursor[R + dst[e]]++] = t;
    }
    for (int64_t v = 0; v < nv; ++v) cursor[v] = scratch_ptr[v];
    used.assign(ne, 0);
    std::vector<int64_t> half_a, half_b;
    half_a.reserve(ne / 2 + 1);
    half_b.reserve(ne / 2 + 1);
    // walk Euler circuits, alternating edges between the two halves
    for (int64_t t0 = 0; t0 < ne; ++t0) {
        if (used[t0]) continue;
        int64_t x = src[edges[t0]];
        int side = 0;
        int64_t t = t0;
        for (;;) {
            used[t] = 1;
            const int64_t e = edges[t];
            if (side == 0) half_a.push_back(e); else half_b.push_back(e);
            // move to the other endpoint of edge e
            x = (x < R) ? R + dst[e] : src[e];
            side ^= 1;
            // find next unused incident edge at x
            int64_t c = cursor[x];
            const int64_t end = scratch_ptr[x + 1];
            while (c < end && used[scratch_inc[c]]) ++c;
            cursor[x] = c;
            if (c >= end) break;                  // circuit closed
            t = scratch_inc[c];
        }
    }
    if (bit == 0) {
        for (int64_t e : half_b) color[e] |= 1;
        return;
    }
    for (int64_t e : half_b) color[e] |= (1 << bit);
    euler_split(src, dst, R, half_a, bit - 1, color, scratch_ptr,
                scratch_inc, cursor, used);
    euler_split(src, dst, R, half_b, bit - 1, color, scratch_ptr,
                scratch_inc, cursor, used);
}

int color_bipartite(const int64_t* src, const int64_t* dst, int64_t nedges,
                    int64_t R, int64_t d, int32_t* color_out) {
    if (nedges <= 0 || R <= 0 || d <= 0 || (d & (d - 1)) != 0) return -1;
    int bit = 0;  // log2(d): position of d's single set bit
    for (int64_t x = d; x > 1; x >>= 1) ++bit;
    std::vector<int32_t> color(nedges, 0);
    std::vector<int64_t> edges(nedges);
    for (int64_t e = 0; e < nedges; ++e) edges[e] = e;
    std::vector<int64_t> sp, si, cur;
    std::vector<uint8_t> used;
    euler_split(src, dst, R, edges, bit - 1, color, sp, si, cur, used);
    std::memcpy(color_out, color.data(), nedges * sizeof(int32_t));
    return 0;
}

// Beneš-network routing (looping algorithm): factor an arbitrary
// permutation of n = 2^k elements into 2k-1 conditional XOR-exchange
// stages (distances n/2, n/4, ..., 1, ..., n/4, n/2).  masks_out is
// (2k-1, n) row-major uint8; mask[s][i] == mask[s][i^d_s] and stage s
// applies y[i] = mask ? y[i^d_s] : y[i].  The device side streams these
// stages at HBM rate — the whole point: a static permutation becomes
// ~2k oblivious streaming passes instead of nnz scattered transactions
// (kernels/benes.py).  O(n log n) total; level-synchronous (no
// recursion), one cycle walk per block per level.
int benes_route(const int64_t* perm_in, int64_t n, uint8_t* masks_out) {
    if (n < 2 || (n & (n - 1)) != 0) return -1;
    int k = 0;
    for (int64_t x = n; x > 1; x >>= 1) ++k;
    std::vector<int64_t> pi(perm_in, perm_in + n), nxt(n), inv(n);
    std::vector<int8_t> h(n);
    int64_t s_in = 0, s_out = 2 * k - 2;
    for (int64_t s = n; s > 2; s >>= 1, ++s_in, --s_out) {
        const int64_t m = s >> 1;
        for (int64_t lo = 0; lo < n; lo += s) {
            int64_t* P = pi.data() + lo;
            int64_t* INV = inv.data() + lo;
            int8_t* H = h.data() + lo;
            for (int64_t o = 0; o < s; ++o) INV[P[o]] = o;
            std::memset(H, -1, s);
            for (int64_t o0 = 0; o0 < s; ++o0) {
                // walk the constraint cycle: alternate "shares an input
                // pair" / "shares an output pair" partners, alternating
                // halves as we go
                int64_t o = o0;
                int8_t hv = 0;
                while (H[o] < 0) {
                    H[o] = hv;
                    const int64_t o2 = INV[P[o] ^ m];
                    H[o2] = (int8_t)(1 - hv);
                    o = o2 ^ m;   // out-pair partner keeps hv
                }
            }
            uint8_t* MIN = masks_out + s_in * n + lo;
            uint8_t* MOUT = masks_out + s_out * n + lo;
            for (int64_t i = 0; i < m; ++i) {
                const uint8_t sw = (uint8_t)H[INV[i]];
                MIN[i] = sw;
                MIN[i + m] = sw;
            }
            for (int64_t o = 0; o < m; ++o) {
                const uint8_t sw = (uint8_t)H[o];
                MOUT[o] = sw;
                MOUT[o + m] = sw;
            }
            int64_t* N0 = nxt.data() + lo;
            for (int64_t o = 0; o < s; ++o)
                N0[(H[o] ? m : 0) + (o & (m - 1))] = P[o] & (m - 1);
        }
        std::swap(pi, nxt);
    }
    uint8_t* MB = masks_out + (int64_t)(k - 1) * n;
    for (int64_t lo = 0; lo < n; lo += 2) {
        const uint8_t sw = pi[lo] == 1 ? 1 : 0;
        MB[lo] = sw;
        MB[lo + 1] = sw;
    }
    return 0;
}

}  // extern "C"
