// Native setup kernels for schwarz_tpu.
//
// C++ replacements for the host-side setup hot loops, mirroring the role of the
// reference's C++ setup path (C5 partition_tools.hpp, C6
// restricted_schwarz.cpp:55-304): overlap BFS closure, ghost-ring discovery and
// the local/interface ELL split run over the global CSR arrays once per
// subdomain, which in pure numpy costs several passes over the nnz per
// subdomain.  Exposed through a plain C ABI consumed via ctypes
// (schwarz_tpu/native.py); semantics are bit-identical to the numpy reference
// implementation in core/decompose.py (first-occurrence discovery order).
//
// Build: make -C native  (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// BFS closure of one subdomain: interior rows [first, last) expanded by
// `rings` adjacency rings (first-occurrence order), then one more ring as the
// ghost set.  visited must be a caller-provided int8 buffer of length n
// (contents overwritten).  Returns 0 on success.
int schwz_closure(
    int64_t n,
    const int64_t* indptr,
    const int64_t* indices,
    int64_t first,
    int64_t last,
    int64_t rings,
    int8_t* visited,
    int64_t* out_closure,   // capacity n
    int64_t* out_nrows,
    int64_t* out_ghost,     // capacity n
    int64_t* out_nghost)
{
    std::memset(visited, 0, static_cast<size_t>(n));
    int64_t num = 0;
    for (int64_t i = first; i < last; ++i) {
        visited[i] = 1;
        out_closure[num++] = i;
    }
    int64_t ring_start = 0;
    int64_t ring_end = num;
    for (int64_t k = 0; k < rings; ++k) {
        for (int64_t idx = ring_start; idx < ring_end; ++idx) {
            const int64_t row = out_closure[idx];
            for (int64_t j = indptr[row]; j < indptr[row + 1]; ++j) {
                const int64_t c = indices[j];
                if (!visited[c]) {
                    visited[c] = 1;
                    out_closure[num++] = c;
                }
            }
        }
        if (num == ring_end) break;  // no growth: stop early
        ring_start = ring_end;
        ring_end = num;
    }
    *out_nrows = num;
    // ghost ring: unseen columns of the last ring's rows (first-occurrence)
    int64_t nghost = 0;
    for (int64_t idx = ring_start; idx < ring_end; ++idx) {
        const int64_t row = out_closure[idx];
        for (int64_t j = indptr[row]; j < indptr[row + 1]; ++j) {
            const int64_t c = indices[j];
            if (!visited[c]) {
                visited[c] = 1;
                out_ghost[nghost++] = c;
            }
        }
    }
    *out_nghost = nghost;
    return 0;
}

// Max per-row ELL widths (local, interface) for one subdomain's closure rows.
// g2l maps permuted-global -> extended-local slot, -1 where absent; slots
// < rows_count are closure (local) columns, >= rows_count are ghosts.
int schwz_row_widths(
    const int64_t* indptr,
    const int64_t* indices,
    const int64_t* g2l,
    const int64_t* closure,
    int64_t nrows,
    int64_t rows_count,
    int64_t* out_wl,
    int64_t* out_wi)
{
    int64_t wl = 0, wi = 0;
    for (int64_t r = 0; r < nrows; ++r) {
        const int64_t row = closure[r];
        int64_t cl = 0, ci = 0;
        for (int64_t j = indptr[row]; j < indptr[row + 1]; ++j) {
            const int64_t slot = g2l[indices[j]];
            if (slot < 0) continue;  // cannot happen for a proper closure
            if (slot < rows_count) ++cl; else ++ci;
        }
        if (cl > wl) wl = cl;
        if (ci > wi) wi = ci;
    }
    *out_wl = wl;
    *out_wi = wi;
    return 0;
}

// Fill one subdomain's padded ELL arrays (column-sorted order inherited from
// the CSR).  lcols must be pre-initialised to the self-column pattern and
// lvals/icols/ivals to zero (as the numpy path does); padded rows' identity
// diagonals are the caller's responsibility.
int schwz_ell_fill(
    const int64_t* indptr,
    const int64_t* indices,
    const double* values,
    const int64_t* g2l,
    const int64_t* closure,
    int64_t nrows,
    int64_t rows_count,
    int64_t Wl,
    int64_t Wi,
    int32_t* lcols,   // (R_rows, Wl) row-major
    double* lvals,
    int32_t* icols,   // (R_rows, Wi)
    double* ivals)
{
    for (int64_t r = 0; r < nrows; ++r) {
        const int64_t row = closure[r];
        int64_t cl = 0, ci = 0;
        for (int64_t j = indptr[row]; j < indptr[row + 1]; ++j) {
            const int64_t slot = g2l[indices[j]];
            if (slot < 0) continue;
            if (slot < rows_count) {
                lcols[r * Wl + cl] = static_cast<int32_t>(slot);
                lvals[r * Wl + cl] = values[j];
                ++cl;
            } else {
                icols[r * Wi + ci] = static_cast<int32_t>(slot);
                ivals[r * Wi + ci] = values[j];
                ++ci;
            }
        }
    }
    return 0;
}

// CSR symmetric permutation: B[r, c] = A[perm[r], perm[c]], columns re-sorted
// within each row (counting sort over the row's entries via insertion —
// rows are short).  Mirrors restricted_schwarz.cpp:135-151 + sort_by_column.
int schwz_permute_csr(
    int64_t n,
    const int64_t* indptr,
    const int64_t* indices,
    const double* values,
    const int64_t* perm,    // new -> old
    const int64_t* iperm,   // old -> new
    int64_t* out_indptr,
    int64_t* out_indices,
    double* out_values)
{
    int64_t nnz = 0;
    out_indptr[0] = 0;
    std::vector<std::pair<int64_t, double>> row;
    for (int64_t r = 0; r < n; ++r) {
        const int64_t old_row = perm[r];
        row.clear();
        for (int64_t j = indptr[old_row]; j < indptr[old_row + 1]; ++j) {
            row.emplace_back(iperm[indices[j]], values[j]);
        }
        // insertion sort by column (rows are short in FD/FEM matrices)
        for (size_t a = 1; a < row.size(); ++a) {
            auto key = row[a];
            size_t b = a;
            while (b > 0 && row[b - 1].first > key.first) {
                row[b] = row[b - 1];
                --b;
            }
            row[b] = key;
        }
        for (const auto& e : row) {
            out_indices[nnz] = e.first;
            out_values[nnz] = e.second;
            ++nnz;
        }
        out_indptr[r + 1] = nnz;
    }
    return 0;
}

// Greedy heavy-edge matching for one multilevel-partitioner coarsening level
// (cf. core/partition.py _heavy_edge_matching — python loop is the setup
// bottleneck at 10^6 vertices).  order must hold vertex ids sorted by weight
// ascending (METIS HEM visits light vertices first).  Returns the coarse
// vertex count; coarse_map[v] gets v's coarse id.
int64_t schwz_hem(
    int64_t n,
    const int64_t* indptr,
    const int64_t* indices,
    const int64_t* weights,
    const int64_t* order,
    int64_t* matched,      // workspace, length n (overwritten)
    int64_t* coarse_map)   // output, length n
{
    for (int64_t i = 0; i < n; ++i) matched[i] = -1;
    for (int64_t oi = 0; oi < n; ++oi) {
        const int64_t v = order[oi];
        if (matched[v] >= 0) continue;
        int64_t best = -1, best_w = -1;
        for (int64_t j = indptr[v]; j < indptr[v + 1]; ++j) {
            const int64_t u = indices[j];
            if (u != v && matched[u] < 0 && weights[u] > best_w) {
                best = u;
                best_w = weights[u];
            }
        }
        if (best >= 0) {
            matched[v] = best;
            matched[best] = v;
        } else {
            matched[v] = v;
        }
    }
    int64_t nc = 0;
    for (int64_t v = 0; v < n; ++v) coarse_map[v] = -1;
    for (int64_t v = 0; v < n; ++v) {
        if (coarse_map[v] < 0) {
            coarse_map[v] = nc;
            coarse_map[matched[v]] = nc;
            ++nc;
        }
    }
    return nc;
}

}  // extern "C"

#include <queue>
#include <utility>

extern "C" {

// Fiduccia-Mattheyses refinement rounds on a local-id bisection
// (core/partition.py::_refine_side, the per-uncoarsening-level refinement
// of the METIS-equivalent partitioner).  Sequential boundary moves with
// incremental gain updates, hill-climbing with best-prefix rollback; the
// move ordering (max gain, then min vertex id, lazy stale-entry skipping)
// matches the python heapq implementation bit-for-bit so the two paths are
// interchangeable.  side (0/1) is updated in place; returns the final
// side-0 weight.
int64_t schwz_fm_refine(
    int64_t n,
    const int64_t* ptr,
    const int64_t* cols,
    int8_t* side,
    const int64_t* weights,   // per-vertex weights (ones for unweighted)
    int64_t lo,
    int64_t hi,
    int64_t size0_in,
    int64_t rounds)
{
    std::vector<int64_t> gain(n);
    std::vector<int8_t> locked(n);
    std::vector<std::pair<int64_t, int64_t>> history;  // (v, delta)
    int64_t size0 = size0_in;
    // max-heap on (gain, -v): max gain first, then smallest vertex id
    using Entry = std::pair<int64_t, int64_t>;
    for (int64_t round = 0; round < rounds; ++round) {
        std::fill(gain.begin(), gain.end(), 0);
        std::fill(locked.begin(), locked.end(), 0);
        std::priority_queue<Entry> heap;
        int64_t n_boundary = 0;
        for (int64_t v = 0; v < n; ++v) {
            bool boundary = false;
            for (int64_t j = ptr[v]; j < ptr[v + 1]; ++j) {
                if (side[cols[j]] == side[v]) {
                    gain[v] -= 1;
                } else {
                    gain[v] += 1;
                    boundary = true;
                }
            }
            if (boundary) {
                heap.emplace(gain[v], -v);
                ++n_boundary;
            }
        }
        if (n_boundary == 0) break;
        const int64_t move_cap =
            std::min(n, std::max<int64_t>(256, 8 * n_boundary));
        history.clear();
        int64_t cum = 0, best_cum = 0, best_idx = -1, sz = size0;
        while (!heap.empty() &&
               static_cast<int64_t>(history.size()) < move_cap) {
            const Entry top = heap.top();
            heap.pop();
            const int64_t v = -top.second;
            if (locked[v] || top.first != gain[v]) continue;  // stale
            const int64_t wv = weights[v];
            int64_t delta;
            if (side[v]) {            // side 1 == part 0: moving OUT shrinks
                if (sz - wv < lo) continue;
                delta = -wv;
            } else {
                if (sz + wv > hi) continue;
                delta = wv;
            }
            locked[v] = 1;
            const int8_t old = side[v];
            side[v] = static_cast<int8_t>(!old);
            sz += delta;
            cum += gain[v];
            history.emplace_back(v, delta);
            if (cum > best_cum) {
                best_cum = cum;
                best_idx = static_cast<int64_t>(history.size()) - 1;
            }
            for (int64_t j = ptr[v]; j < ptr[v + 1]; ++j) {
                const int64_t u = cols[j];
                if (locked[u]) continue;
                // v left side `old`: u on `old` gains an external edge,
                // u on the other side loses one
                gain[u] += (side[u] == old) ? 2 : -2;
                heap.emplace(gain[u], -u);
            }
        }
        for (int64_t k = static_cast<int64_t>(history.size()) - 1;
             k > best_idx; --k) {
            const int64_t v = history[k].first;
            side[v] = static_cast<int8_t>(!side[v]);
            sz -= history[k].second;
        }
        size0 = sz;
        if (best_cum <= 0) break;
    }
    return size0;
}

}  // extern "C"
