// Measured-baseline kernel: a faithful C++ reimplementation of the
// reference's per-element-pair dense assembly hot loop
// (/root/reference/nl/PyNucleus_nl/nonlocalAssembly_{SCALAR}.pxi:1387-1450:
// per-pair setCell/getPanelType/eval/addToMatrixElemElemSym, with the
// distant-panel tensor quadrature of nonlocalOperator pxi:549-600).
//
// The Cython reference cannot be built in this image (no Cython/mpi4py), so
// this compiled loop — same pair lists, same quadrature tables, same scatter
// — is the closest measurable stand-in for "the Cython+MPI reference on this
// container's CPU".  Cython compiles to C with the same per-pair loop
// structure and typically runs within a small factor of hand-written C.
//
// Built by pynucleus_tpu.bench_baseline via g++ -O3 -march=native; called
// through ctypes.

#include <cstdint>
#include <cmath>
#include <vector>

extern "C" {

// Assemble one distant-panel bucket into the dense matrix A [(N+1)^2].
// vertices [nVerts, dim]; cells [C, nv]; dofs [C, dpe]; vols [C];
// bary_x/bary_y [nv, Q]; w [Q]; PSI [2*dpe, Q]; pairs di/dj [P].
// Kernel: gamma(r) = Cnorm * r^(-d-2s)  (constant-order fractional).
double assemble_distant_bucket(
    int64_t P, const int64_t* di, const int64_t* dj,
    const double* vertices, const int64_t* cells, const int64_t* dofs,
    const double* vols, int64_t N, int dpe, int nv, int dim,
    const double* bary_x, const double* bary_y, const double* w, int Q,
    const double* PSI /* [2*dpe, Q] */,
    double exponent /* -(d/2+s), applied to r^2 */, double Cnorm,
    double* A)
{
    const int nPSI = 2 * dpe;
    const int64_t ld = N + 1;
    double chk = 0.0;
    std::vector<double> xb(Q * 3), yb(Q * 3), tb(Q);
    double* const xq = xb.data();
    double* const yq = yb.data();
    double* const t = tb.data();
    double contrib[20 * 20];
    int64_t rows[20];
    for (int64_t p = 0; p < P; ++p) {
        const int64_t c1 = di[p], c2 = dj[p];
        const int64_t* v1 = cells + c1 * nv;
        const int64_t* v2 = cells + c2 * nv;
        // quadrature points (x per column of bary_x, y per bary_y)
        for (int q = 0; q < Q; ++q) {
            for (int d = 0; d < dim; ++d) {
                double xx = 0.0, yy = 0.0;
                for (int v = 0; v < nv; ++v) {
                    xx += bary_x[v * Q + q] * vertices[v1[v] * dim + d];
                    yy += bary_y[v * Q + q] * vertices[v2[v] * dim + d];
                }
                xq[q * 3 + d] = xx;
                yq[q * 3 + d] = yy;
            }
        }
        const double volfac = 2.0 * vols[c1] * vols[c2];
        for (int q = 0; q < Q; ++q) {
            double r2 = 0.0;
            for (int d = 0; d < dim; ++d) {
                const double dd = xq[q * 3 + d] - yq[q * 3 + d];
                r2 += dd * dd;
            }
            t[q] = Cnorm * std::pow(r2, exponent) * w[q] * volfac;
        }
        // contrib[a][b] = sum_q t_q PSI[a,q] PSI[b,q]  (symmetric)
        for (int a = 0; a < nPSI; ++a) {
            for (int b = a; b < nPSI; ++b) {
                double acc = 0.0;
                for (int q = 0; q < Q; ++q)
                    acc += t[q] * PSI[a * Q + q] * PSI[b * Q + q];
                contrib[a * nPSI + b] = acc;
            }
        }
        // scatter (ref IndexManager addToMatrixElemElemSym)
        for (int l = 0; l < dpe; ++l) {
            const int64_t d1 = dofs[c1 * dpe + l];
            rows[l] = d1 >= 0 ? d1 : N;
            const int64_t d2 = dofs[c2 * dpe + l];
            rows[dpe + l] = d2 >= 0 ? d2 : N;
        }
        for (int a = 0; a < nPSI; ++a) {
            A[rows[a] * ld + rows[a]] += contrib[a * nPSI + a];
            for (int b = a + 1; b < nPSI; ++b) {
                const double vab = contrib[a * nPSI + b];
                A[rows[a] * ld + rows[b]] += vab;
                A[rows[b] * ld + rows[a]] += vab;
            }
        }
        chk += contrib[0];
    }
    return chk;
}

}  // extern "C"
