"""Nonlocal operator assembly: batched panel quadrature on device.

Counterpart of /root/reference/nl/PyNucleus_nl/nonlocalAssembly_{SCALAR}.pxi
(nonlocalBuilder.getDense :1262, IndexManager scatter :8-254) — redesigned for
TPU: instead of an O(C^2) Python/Cython loop dispatching per-pair quadrature,
pairs are classified host-side into panel buckets (panels.py), each bucket is
evaluated by ONE fused device kernel

    x    = bary_x^T @ simplex1          (batched gather + einsum)
    y    = bary_y^T @ simplex2
    t    = w * gamma(x, y) * vol        [P, Q]      (VPU)
    M    = t @ (PSI_I * PSI_J)          [P, nPSI^2] (MXU matmul)
    A   += scatter-add(M, dofRows)

and the results accumulate into the global operator with scatter-adds.
Symmetric pairs (i < j) carry weight 2, matching the reference's
addToMatrixElemElemSym(contrib, 2.) bookkeeping.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..config import REAL, INDEX
from ..base.linear_operators import Dense_LinearOperator
from .panels import (classifyPairsDense, classifyBoundaryPairs,
                     permuteLocalDofs)
from .quad_singular import (sameCellRule1D, vertexRule1D, distantRule,
                            boundaryVertexRule1D, boundaryDistantRule)

__all__ = ['assembleNonlocal', 'nonlocalBuilder']

MAX_PAIRS_PER_LAUNCH = 1 << 18


def _radial_eval(kernel, r2):
    """gamma evaluated from squared distance, NaN-safe at r2=0 (padding)."""
    r2safe = jnp.where(r2 > 0, r2, 1.0)
    val = kernel._radialJax(r2safe)
    return jnp.where(r2 > 0, val, 0.0)


@partial(jax.jit, static_argnames=('kernel', 'useNormals'))
def _bucket_contrib(vertices, vertIdx1, vertIdx2, volsym,
                    bary_x, bary_y, w, PSIP,
                    normals=None, kernel=None, useNormals=False):
    """One panel bucket -> local pair matrices M [P, nPSI^2].

    This kernel is independent of the global operator size, so it compiles
    once per (panel shape, kernel) and is reused across hierarchy levels."""
    v1 = vertices[vertIdx1]                       # [P, nv1, dim]
    v2 = vertices[vertIdx2]
    x = jnp.einsum('pvd,vq->pqd', v1, bary_x)     # [P, Q, dim]
    y = jnp.einsum('pvd,vq->pqd', v2, bary_y)
    r2 = jnp.sum((x - y) ** 2, axis=-1)
    g = _radial_eval(kernel, r2)
    if kernel.finiteHorizon or kernel.complement:
        ind = kernel.interaction.jaxIndicator(x, y, kernel.horizonValue ** 2)
        g = g * ind
    if useNormals:
        # boundary kernels carry n.(y-x)/|y-x| (outward normal at y on the
        # surface element; ref fractionalLaplacian1D.pyx:736-749 and the 2D
        # eval_distant_boundary)
        rsafe = jnp.sqrt(jnp.where(r2 > 0, r2, 1.0))
        fac = jnp.einsum('pd,pqd->pq', normals, y - x) / rsafe
        g = g * jnp.where(r2 > 0, fac, 0.0)
    t = (g * w[None, :]) * volsym[:, None]        # [P, Q]
    return t @ PSIP                               # [P, nPSI*nPSI]  (MXU)


def _psi_prod(PSI):
    """PSIP[q, I*n+J] = PSI[I,q]*PSI[J,q]."""
    n, Q = PSI.shape
    return (PSI[:, None, :] * PSI[None, :, :]).reshape(n * n, Q).T.copy()


def _pad(arr, P, fill=0):
    if arr.shape[0] == P:
        return arr
    pad_shape = (P - arr.shape[0],) + arr.shape[1:]
    return np.concatenate([arr, np.full(pad_shape, fill, arr.dtype)], axis=0)


def _chunk_size(chunk):
    """Pad to 256 * 4^k to bound the number of compiled shapes."""
    c = 256
    while c < chunk:
        c *= 4
    return c


class _BucketRunner:
    """Launches the device quadrature kernel in bounded padded chunks and
    accumulates into the global dense matrix.

    Accumulation is a host-side np.add.at by default (XLA's dense
    scatter-add is serial on CPU and would dominate); on TPU the device
    scatter path can be enabled.  The heavy quadrature math always runs on
    device."""

    def __init__(self, vertices, kernel, useNormals=False):
        self.vertices = jnp.asarray(vertices)
        self.kernel = kernel
        self.useNormals = useNormals

    def run(self, A, rule, PSI, vertIdx1, vertIdx2, dofRows, volsym,
            normals=None):
        """A: numpy [N+1, N+1] accumulator (dump slot last)."""
        P = vertIdx1.shape[0]
        if P == 0:
            return A
        N = A.shape[0] - 1
        PSIP = jnp.asarray(_psi_prod(PSI))
        bary_x = jnp.asarray(rule.bary_x)
        bary_y = jnp.asarray(rule.bary_y)
        w = jnp.asarray(rule.w)
        nPSI = PSI.shape[0]
        Q = rule.num_nodes
        # bound the [P, Q] intermediate: ~32M elements per launch
        maxP = max(min(MAX_PAIRS_PER_LAUNCH, (1 << 25) // max(Q, 1)), 256)
        start = 0
        while start < P:
            chunk = min(maxP, P - start)
            csize = _chunk_size(chunk)
            sl = slice(start, start + chunk)
            vi1 = _pad(vertIdx1[sl], csize)
            vi2 = _pad(vertIdx2[sl], csize)
            vs = _pad(volsym[sl], csize, fill=0.0)
            nm = None
            if self.useNormals:
                nm = jnp.asarray(_pad(normals[sl], csize, fill=0.0))
            M = _bucket_contrib(
                self.vertices, jnp.asarray(vi1, dtype=INDEX),
                jnp.asarray(vi2, dtype=INDEX), jnp.asarray(vs),
                bary_x, bary_y, w, PSIP,
                normals=nm, kernel=self.kernel, useNormals=self.useNormals)
            M = np.asarray(M[:chunk]).reshape(chunk, nPSI, nPSI)
            dr = dofRows[sl]
            rows = np.where(dr >= 0, dr, N)
            rb = np.broadcast_to(rows[:, :, None], M.shape)
            cb = np.broadcast_to(rows[:, None, :], M.shape)
            np.add.at(A, (rb.reshape(-1), cb.reshape(-1)), M.reshape(-1))
            start += chunk
        return A


class nonlocalBuilder:
    """Assembly driver (ref nonlocalAssembly_{SCALAR}.pxi:878 nonlocalBuilder)."""

    def __init__(self, dm, kernel, params=None, zeroExterior=True, comm=None,
                 dm2=None, **kwargs):
        self.dm = dm
        self.mesh = dm.mesh
        self.kernel = kernel
        self.params = params or {}
        self.zeroExterior = False if kernel.finiteHorizon else zeroExterior
        self.comm = comm

    # ------------------------------------------------------------- helpers
    def _interiorRules(self):
        dm, kernel, mesh = self.dm, self.kernel, self.mesh
        info = classifyPairsDense(dm, kernel,
                                  target_order=self.params.get('target_order'))
        mdim = mesh.manifold_dim
        p = max(dm.polynomialOrder, 1)
        continuous = dm.polynomialOrder >= 1
        sing = kernel.getSingularityValue()
        if mdim == 1:
            ruleId = sameCellRule1D(sing, 2 * p)
            ruleVertex = vertexRule1D(sing, info['quad_order_diagonal'], 2 * p,
                                      continuous=continuous)
        else:
            from .quad_singular_2d import (sameCellRule2DSS, edgeRule2DSS,
                                           vertexRule2DSS)
            # 2D quadrature orders (ref fractionalLaplacian2D.pyx:600-615)
            mesh2 = self.mesh
            smax = max(-0.5 * (kernel.max_singularity + 2), 0.0)
            target = self.params.get('target_order') or 0.5
            H0 = mesh2.diam / np.sqrt(8)
            lg = abs(np.log(mesh2.hmin / H0))
            qd = max(int(np.ceil((target + 1.0 + smax) / 0.43 * lg)), 4)
            qdV = max(int(np.ceil((target + 1.0 + smax) / 0.7 * lg)), 4)
            info['quad_order_diagonal'] = qd
            ruleId = sameCellRule2DSS(sing, 2 * p, qd)
            ruleEdge = edgeRule2DSS(sing, 2 * p, qd, continuous=continuous)
            ruleVertex = vertexRule2DSS(sing, 2 * p, qdV,
                                        continuous=continuous)
            info['ruleEdge'] = ruleEdge
        info['ruleId'] = ruleId
        info['ruleVertex'] = ruleVertex
        return info

    def getDense(self, trySparsification=False):
        dm, kernel, mesh = self.dm, self.kernel, self.mesh
        N = dm.num_dofs
        vols = mesh.simplexVolumes()
        cells = mesh.cells
        dofs = dm.dofs
        dpe = dm.dofs_per_element
        mdim = mesh.manifold_dim

        info = self._interiorRules()
        runner = _BucketRunner(mesh.vertices, kernel)
        A = np.zeros((N + 1, N + 1), dtype=REAL)

        # The singularity-cancelling rules are normalized to the collapsed
        # (x1 >= x2 >= ...) parametrization, whose Jacobian to physical space
        # is the simplex DETERMINANT = m! * volume (validated by Monte Carlo
        # against direct integration).  Distant rules use Sum(w)=1 simplex
        # rules, i.e. plain volumes.
        detfac = {1: 1.0, 2: 2.0, 3: 6.0}[mdim]
        dets = vols * detfac

        # --- identical-cell panels
        ids = info['id']
        ruleId = info['ruleId']
        PSI = ruleId.buildPSI(dm, nSharedVertices=mdim + 1)
        A = runner.run(A, ruleId, PSI,
                       cells[ids], cells[ids], dofs[ids],
                       dets[ids] ** 2)

        # --- touching panels (shared vertex / shared edge in 2D)
        pairs, sharedInfo = info['touching']
        byShared = {}
        for k in range(len(pairs)):
            nS = sharedInfo[k][0]
            byShared.setdefault(nS, []).append(k)
        for nS, idxs in byShared.items():
            if mdim == 1:
                rule = info['ruleVertex']
            else:
                rule = info['ruleVertex'] if nS == 1 else info['ruleEdge']
            PSI = rule.buildPSI(dm, nSharedVertices=nS)
            sharedMask = rule.sharedDofMask(dm, nS)
            P = len(idxs)
            nv = mdim + 1
            vi1 = np.zeros((P, nv), dtype=np.int64)
            vi2 = np.zeros((P, nv), dtype=np.int64)
            dr = np.zeros((P, 2 * dpe), dtype=np.int64)
            vs = np.zeros(P)
            for out_k, k in enumerate(idxs):
                i, j = pairs[k]
                _, perm1, perm2 = sharedInfo[k]
                vi1[out_k] = cells[i][perm1]
                vi2[out_k] = cells[j][perm2]
                ld1 = permuteLocalDofs(dm, perm1)
                ld2 = permuteLocalDofs(dm, perm2)
                dr[out_k, :dpe] = dofs[i][ld1]
                dr[out_k, dpe:] = dofs[j][ld2]
                # zero rows (duplicated shared dofs) -> dump slot
                dr[out_k, dpe:][sharedMask] = -1
                vs[out_k] = dets[i] * dets[j] * 2.0
            A = runner.run(A, rule, PSI, vi1, vi2, dr, vs)

        # --- distant panels, bucketed by quad order (high orders merged into
        # a few buckets: rounding up only improves accuracy)
        di, dj, orders = info['distant']
        if len(orders):
            omax = orders.max()
            orders = np.where(orders > 20, omax, orders)
            orders = np.where((orders > 12) & (orders <= 20),
                              min(20, omax), orders)
        for order in np.unique(orders):
            sel = orders == order
            ii, jj = di[sel], dj[sel]
            rule = distantRule(int(order), mdim)
            PSI = rule.buildPSI(dm, nSharedVertices=0)
            dr = np.concatenate([dofs[ii], dofs[jj]], axis=1)
            vs = vols[ii] * vols[jj] * 2.0
            A = runner.run(A, rule, PSI, cells[ii], cells[jj], dr, vs)

        # --- zeroExterior surface term (Omega x Omega^c via Gauss theorem)
        if self.zeroExterior:
            A = self._addZeroExterior(A)

        return Dense_LinearOperator(jnp.asarray(A[:N, :N]))

    def _addZeroExterior(self, A, sign=1.0):
        """A: numpy [N+1, N+1] accumulator."""
        dm, mesh = self.dm, self.mesh
        kernel = self.kernel
        surface = mesh.get_surface_mesh()
        bkernel = kernel.getModifiedKernel(horizon=np.inf).getBoundaryKernel()
        binfo = classifyBoundaryPairs(dm, surface, bkernel,
                                      target_order=self.params.get('target_order'))
        vols = mesh.simplexVolumes()
        svols = surface.simplexVolumes()
        cells = mesh.cells
        scells = surface.cells
        dofs = dm.dofs
        dpe = dm.dofs_per_element
        mdim = mesh.manifold_dim
        useNormals = mdim >= 2
        detfac = {1: 1.0, 2: 2.0, 3: 6.0}[mdim]
        sdetfac = {1: 1.0, 2: 1.0, 3: 2.0}[mdim]  # (m-1)! for surface simplex
        runner = _BucketRunner(mesh.vertices, bkernel, useNormals=useNormals)

        # touching (cell shares vertex/edge with surface simplex), grouped by
        # number of shared vertices (2D: vertex vs edge panels)
        tpairs, perms = binfo['touching']
        if len(tpairs):
            sigb = bkernel.getSingularityValue()
            qd = binfo['quad_order_diagonal']
            byShared = {}
            for k in range(len(tpairs)):
                byShared.setdefault(perms[k][0], []).append(k)
            for nS, idxs in byShared.items():
                if mdim == 1:
                    rule = boundaryVertexRule1D(sigb, qd)
                else:
                    from .quad_singular_2d import (boundaryEdgeRule2DSS,
                                                   boundaryVertexRule2DSS)
                    if nS == 2:
                        sig_eff = sigb if sigb > -1 + 1e-3 else 2.0 + sigb
                        rule = boundaryEdgeRule2DSS(sig_eff, qd, qd)
                    else:
                        rule = boundaryVertexRule2DSS(sigb, qd, qd)
                PHI = rule.buildPSI(dm, boundary=True)
                P = len(idxs)
                vi1 = np.zeros((P, mdim + 1), dtype=np.int64)
                vi2 = np.zeros((P, mdim), dtype=np.int64) if mdim >= 2 else \
                    np.zeros((P, 1), dtype=np.int64)
                dr = np.zeros((P, dpe), dtype=np.int64)
                vs = np.zeros(P)
                nm = np.zeros((P, mesh.dim)) if useNormals else None
                for out_k, k in enumerate(idxs):
                    i, j = tpairs[k]
                    _, perm1, perm2 = perms[k]
                    vi1[out_k] = cells[i][perm1]
                    vi2[out_k] = scells[j][perm2]
                    ld1 = permuteLocalDofs(dm, perm1)
                    dr[out_k] = dofs[i][ld1]
                    vs[out_k] = (detfac * vols[i]) * \
                        (sdetfac * svols[j] if mdim >= 2 else 1.0) * sign
                    if useNormals:
                        nm[out_k] = surface.normals[j]
                A = runner.run(A, rule, PHI, vi1, vi2, dr, vs, normals=nm)

        # distant surface pairs
        di, dj, orders = binfo['distant']
        for order in np.unique(orders):
            sel = orders == order
            ii, jj = di[sel], dj[sel]
            rule = boundaryDistantRule(int(order), mdim, mdim - 1)
            PHI = rule.buildPSI(dm, boundary=True)
            dr = dofs[ii]
            vs = vols[ii] * (svols[jj] if mdim >= 2 else 1.0) * sign
            vi2 = scells[jj] if mdim >= 2 else scells[jj].reshape(-1, 1)
            nm = surface.normals[jj] if useNormals else None
            A = runner.run(A, rule, PHI, cells[ii], vi2, dr, vs, normals=nm)
        return A


def assembleNonlocal(dm, kernel, matrixFormat='dense', zeroExterior=True,
                     comm=None, params=None, **kwargs):
    """Entry point (ref fem/PyNucleus_fem/DoFMaps.pyx:808 assembleNonlocal)."""
    builder = nonlocalBuilder(dm, kernel, params=params,
                              zeroExterior=zeroExterior, comm=comm, **kwargs)
    fmt = matrixFormat.lower()
    if fmt == 'dense':
        return builder.getDense()
    if fmt == 'sparse':
        return builder.getSparse()
    if fmt == 'h2':
        return builder.getH2()
    raise NotImplementedError(matrixFormat)
