// mmnative: native (C++/OpenMP) setup-time kernels for mmadmm_tpu.
//
// The reference vendors native C++ for its setup/runtime support code:
// nanoflann KD-tree 1-NN queries for the monitor grid scatter
// (reference MeshInterpolator.cpp:166-241) and the LASolver CSR machinery.
// The TPU rebuild keeps the hot path in XLA; this library provides the
// host-side equivalents where NumPy/SciPy would be the bottleneck at
// production mesh sizes (millions of vertices / grid nodes):
//
//   mm_grid_nn_map   — nearest mesh-vertex for every node of a uniform
//                      background grid, via bucket hashing + expanding-ring
//                      search (O(1) per query for mesh-like distributions,
//                      vs O(log n) KD-tree with far worse constants).
//   mm_glibc_rand_fill — glibc TYPE_3 additive-feedback rand() stream
//                      (the reference's srand(69)/rand() mesh perturbation,
//                      main.cpp:614-626) vectorized natively.
//
// Build: make (g++ -O3 -fopenmp -shared). Loaded via ctypes with a SciPy
// fallback (mmadmm_tpu/runtime/native.py).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

inline int64_t clamp64(int64_t v, int64_t lo, int64_t hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

struct Buckets {
    // CSR buckets of vertex indices over an n^D uniform cell grid
    std::vector<int64_t> offsets;  // size ncells + 1
    std::vector<int64_t> items;    // size npts
};

// assign vertices to cells; cell index per axis clamped to [0, n-1]
Buckets build_buckets(const double* X, int64_t npts, int D,
                      const double* lo, const double* inv_h, int64_t n) {
    int64_t ncells = 1;
    for (int d = 0; d < D; d++) ncells *= n;
    std::vector<int64_t> cell_of(npts);
    std::vector<int64_t> counts(ncells + 1, 0);
    for (int64_t i = 0; i < npts; i++) {
        int64_t c = 0;
        for (int d = 0; d < D; d++) {
            int64_t cd = clamp64(
                (int64_t)std::floor((X[i * D + d] - lo[d]) * inv_h[d]), 0,
                n - 1);
            c = c * n + cd;
        }
        cell_of[i] = c;
        counts[c + 1]++;
    }
    for (int64_t c = 0; c < ncells; c++) counts[c + 1] += counts[c];
    std::vector<int64_t> items(npts);
    std::vector<int64_t> cursor(counts.begin(), counts.end() - 1);
    for (int64_t i = 0; i < npts; i++) items[cursor[cell_of[i]]++] = i;
    Buckets b;
    b.offsets = std::move(counts);
    b.items = std::move(items);
    return b;
}

}  // namespace

extern "C" {

// Nearest mesh vertex for every node of the (n+1)^D background grid over
// [lo, hi]. Output layout matches ops/monitor_grid.py: 2D out[j*(n+1)+i]
// for node (x_i, y_j); 3D out[(k*(n+1)+j)*(n+1)+i] for node (x_i,y_j,z_k).
// Returns 0 on success.
int mm_grid_nn_map(const double* X, int64_t npts, int32_t D,
                   const double* lo, const double* hi, int64_t n,
                   int64_t* out) {
    if (npts <= 0 || n <= 0 || (D != 2 && D != 3)) return 1;
    double inv_h[3], step[3];
    for (int d = 0; d < D; d++) {
        double span = hi[d] - lo[d];
        if (span <= 0) span = 1.0;
        step[d] = span / (double)n;
        inv_h[d] = (double)n / span;
    }
    Buckets b = build_buckets(X, npts, D, lo, inv_h, n);
    const int64_t nn1 = n + 1;
    const int64_t total = D == 2 ? nn1 * nn1 : nn1 * nn1 * nn1;
    const double hmin = D == 2 ? std::fmin(step[0], step[1])
                               : std::fmin(step[0], std::fmin(step[1], step[2]));

#pragma omp parallel for schedule(static)
    for (int64_t g = 0; g < total; g++) {
        int64_t gi, gj, gk = 0;
        if (D == 2) {
            gi = g % nn1;
            gj = g / nn1;
        } else {
            gi = g % nn1;
            gj = (g / nn1) % nn1;
            gk = g / (nn1 * nn1);
        }
        double p[3];
        p[0] = lo[0] + (double)gi * step[0];
        p[1] = lo[1] + (double)gj * step[1];
        if (D == 3) p[2] = lo[2] + (double)gk * step[2];
        // anchor cell of the node
        int64_t c0[3];
        c0[0] = clamp64(gi, 0, n - 1);
        c0[1] = clamp64(gj, 0, n - 1);
        c0[2] = D == 3 ? clamp64(gk, 0, n - 1) : 0;

        double best = INFINITY;
        int64_t best_i = -1;
        for (int64_t r = 0; r < n; r++) {
            // scan the ring of cells at Chebyshev distance r
            int64_t a0 = clamp64(c0[0] - r, 0, n - 1),
                    a1 = clamp64(c0[0] + r, 0, n - 1);
            int64_t b0 = clamp64(c0[1] - r, 0, n - 1),
                    b1 = clamp64(c0[1] + r, 0, n - 1);
            int64_t d0 = D == 3 ? clamp64(c0[2] - r, 0, n - 1) : 0;
            int64_t d1 = D == 3 ? clamp64(c0[2] + r, 0, n - 1) : 0;
            for (int64_t cz = d0; cz <= d1; cz++)
                for (int64_t cy = b0; cy <= b1; cy++)
                    for (int64_t cx = a0; cx <= a1; cx++) {
                        int64_t cd = llabs(cx - c0[0]);
                        if (llabs(cy - c0[1]) > cd)
                            cd = llabs(cy - c0[1]);
                        if (D == 3 && llabs(cz - c0[2]) > cd)
                            cd = llabs(cz - c0[2]);
                        if (cd != r) continue;  // interior already scanned
                        int64_t cell = D == 2 ? cx * n + cy
                                              : (cx * n + cy) * n + cz;
                        // NOTE: build_buckets flattens x-major: c = ((cx)*n
                        // + cy)*n + cz for D=3, cx*n + cy for D=2.
                        for (int64_t t = b.offsets[cell];
                             t < b.offsets[cell + 1]; t++) {
                            int64_t v = b.items[t];
                            double dsq = 0;
                            for (int d = 0; d < D; d++) {
                                double dd = X[v * D + d] - p[d];
                                dsq += dd * dd;
                            }
                            if (dsq < best ||
                                (dsq == best && v < best_i)) {
                                best = dsq;
                                best_i = v;
                            }
                        }
                    }
            // a hit at ring r guarantees the true NN is within ring
            // ceil(sqrt(best)/hmin): stop once rings can't beat it
            if (best_i >= 0 &&
                (double)r * hmin >= std::sqrt(best)) {
                break;
            }
        }
        out[g] = best_i;
    }
    return 0;
}

// glibc TYPE_3 rand(): additive feedback generator with 344-step warmup
// (the sequence srand(seed); rand(), rand(), ... produces). Fills out[k]
// with successive rand() values in [0, 2^31).
int mm_glibc_rand_fill(int32_t seed, int64_t count, int32_t* out) {
    std::vector<int32_t> tbl(344);
    int32_t word = seed ? seed : 1;
    tbl[0] = word;
    for (int i = 1; i < 31; i++) {
        // word = 16807 * word % 2147483647 using Schrage to avoid overflow
        int64_t hi = word / 127773;
        int64_t lo2 = word % 127773;
        int64_t w = 16807 * lo2 - 2836 * hi;
        if (w < 0) w += 2147483647;
        word = (int32_t)w;
        tbl[i] = word;
    }
    for (int i = 31; i < 34; i++) tbl[i] = tbl[i - 31];
    for (int i = 34; i < 344; i++)
        tbl[i] = (int32_t)((uint32_t)tbl[i - 31] + (uint32_t)tbl[i - 3]);
    // subsequent values continue the recurrence; keep a ring of the last
    // 344 values
    std::vector<uint32_t> ring(tbl.begin(), tbl.end());
    int64_t idx = 344;
    for (int64_t k = 0; k < count; k++) {
        uint32_t v = ring[(idx - 31) % 344] + ring[(idx - 3) % 344];
        ring[idx % 344] = v;
        idx++;
        out[k] = (int32_t)(v >> 1);
    }
    return 0;
}

}  // extern "C"
