// Near-field cell-pair enumerator for the H2 assembly host path.
//
// For each unordered near cluster pair (I, J) this expands
// cells(I) x cells(J), canonicalizes to (lo, hi), deduplicates WITHIN the
// cluster pair, drops id pairs and vertex-touching pairs (handled by the
// singular path), and evaluates the distant-panel quadrature-order model
// (mirroring nl/panels.py:distantOrders in float32, including the
// round-up-to-even and >8 merging) — the per-pair host work that numpy
// does in ~1 microsecond/pair and this loop in ~20 ns/pair.
//
// Reference counterpart: the per-cluster-pair cell loops of
// assembleClusters (nonlocalAssembly_{SCALAR}.pxi:1663-1840) and
// getQuadOrder (fractionalLaplacian1D.pyx:644, 2D:622).
//
// Plain C ABI, driven through ctypes (no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// Enumerate one chunk of cluster pairs [p0, p1).
//
// Inputs:
//   IJr        [nPairsTotal] row index (into nc arrays) of node I per pair
//   IJc        [nPairsTotal] row index of node J per pair
//   ncOff      [nNear+1]     per-node cell-list offsets
//   ncArr      [...]         concatenated sorted cell lists
//   adjKeys    [nAdj]        sorted keys lo*C+hi of vertex-touching pairs
//   centers    [C*dim]       cell centers (f64, row-major)
//   logh       [C]           log cell diameters (f32)
//   order-model scalars: manifold_dim, sval (1D) or s2 (2D), cOrder,
//   logH0, maxOrder merging as in assembly._runNearDistantTree.
//
// Outputs (caller-allocated, capacity = sum of n1*n2 over the chunk):
//   outLo, outHi [cap] int32 cell pair
//   outPix       [cap] int32 cluster-pair index (global, i.e. p0-based)
//   outOrd       [cap] int32 merged quadrature order
// Returns the number of emitted pairs, or -1 on capacity overflow.
int64_t nearfield_enumerate(
    const int64_t* IJr, const int64_t* IJc, int64_t p0, int64_t p1,
    const int64_t* ncOff, const int64_t* ncArr,
    const int64_t* adjKeys, int64_t nAdj,
    const double* centers, int64_t C, int32_t dim,
    const float* logh,
    int32_t manifold_dim, float sval, float s2, float cOrder, float logH0,
    int32_t* outLo, int32_t* outHi, int32_t* outPix, int32_t* outOrd,
    int64_t cap)
{
    std::vector<int64_t> keys;
    int64_t n = 0;

    // first pass per cluster pair: collect max order for >16 merging later?
    // The merging (orders>8 -> min(16, omax); >16 -> omax) is GLOBAL per
    // chunk in the python path; we replicate it with a second sweep over
    // the emitted orders.
    int32_t omax = 0;

    for (int64_t p = p0; p < p1; ++p) {
        const int64_t rI = IJr[p];
        const int64_t rJ = IJc[p];
        const int64_t s1 = ncOff[rI], e1 = ncOff[rI + 1];
        const int64_t s2o = ncOff[rJ], e2 = ncOff[rJ + 1];
        keys.clear();
        keys.reserve((e1 - s1) * (e2 - s2o));
        for (int64_t a = s1; a < e1; ++a) {
            const int64_t ca = ncArr[a];
            for (int64_t b = s2o; b < e2; ++b) {
                const int64_t cb = ncArr[b];
                if (ca == cb)
                    continue;
                const int64_t lo = ca < cb ? ca : cb;
                const int64_t hi = ca < cb ? cb : ca;
                keys.push_back(lo * C + hi);
            }
        }
        std::sort(keys.begin(), keys.end());
        keys.erase(std::unique(keys.begin(), keys.end()), keys.end());
        for (const int64_t k : keys) {
            if (std::binary_search(adjKeys, adjKeys + nAdj, k))
                continue;                       // touching: singular path
            const int64_t lo = k / C, hi = k % C;
            // --- order model (float32, mirrors panels.distantOrders)
            float d2 = 0.0f;
            for (int32_t d = 0; d < dim; ++d) {
                const float dd = (float)(centers[lo * dim + d]
                                         - centers[hi * dim + d]);
                d2 += dd * dd;
            }
            const float logd = 0.5f * std::log(d2);
            const float lh1 = logh[lo], lh2 = logh[hi];
            const float logdh1 = logd - lh1, logdh2 = logd - lh2;
            const float lH1 = std::fabs(lh1 - logH0);
            const float lH2 = std::fabs(lh2 - logH0);
            float o1, o2;
            if (manifold_dim == 1) {
                const float num1 = cOrder + (2.0f * sval - 1.0f) * lH2
                                   - 2.0f * sval * logdh2;
                const float num2 = cOrder + (2.0f * sval - 1.0f) * lH1
                                   - 2.0f * sval * logdh1;
                o1 = std::ceil(num1 / (std::max(logdh1, 0.0f) + 0.8f));
                o2 = std::ceil(num2 / (std::max(logdh2, 0.0f) + 0.8f));
            } else {
                // 2D model (panels.distantOrders 2D branch / ref
                // fractionalLaplacian2D.pyx:622-641)
                const float lmin = std::max(lH1, lH2);
                const float num1 = cOrder + (s2 - 1.0f) * lH2 + lmin
                                   - s2 * logdh2;
                const float num2 = cOrder + (s2 - 1.0f) * lH1 + lmin
                                   - s2 * logdh1;
                o1 = std::ceil(num1 / (std::max(logdh1, 0.0f) + 0.4f));
                o2 = std::ceil(num2 / (std::max(logdh2, 0.0f) + 0.4f));
            }
            float of = std::max(std::max(o1, o2), 2.0f);
            int32_t o = (int32_t)of;
            o = ((o + 1) / 2) * 2;              // round up to even
            if (o > omax)
                omax = o;
            if (n >= cap)
                return -1;
            outLo[n] = (int32_t)lo;
            outHi[n] = (int32_t)hi;
            outPix[n] = (int32_t)p;
            outOrd[n] = o;
            ++n;
        }
    }

    // DETERMINISTIC order merge (mirrors the numpy fallback): (8,16] -> 16,
    // >16 -> next multiple of 8.  The former chunk-max snap made the
    // quadrature order of a pair depend on which OTHER pairs shared its
    // chunk, breaking bitwise parity between full and device-restricted
    // assemblies (DistributedH2Matrix.assemble).
    (void)omax;
    for (int64_t i = 0; i < n; ++i) {
        const int32_t o = outOrd[i];
        if (o > 16)
            outOrd[i] = ((o + 7) / 8) * 8;
        else if (o > 8)
            outOrd[i] = 16;
    }
    return n;
}

}  // extern "C"
