"""Multi-chip distribution over a jax.sharding.Mesh.

TPU-native counterpart of the reference's MPI strategies (SURVEY.md section
2.9):
  S1 row-sliced dense assembly  -> shard_map over the cell-pair grid + psum
     (ref nonlocalAssembly_{SCALAR}.pxi:1280-1285,1449: per-rank outer-cell
     slice + Allreduce)
  S3 distributed operator, global vectors -> row-sharded operator matvec;
     XLA inserts the all-gather/psum that replace Bcast/Allreduce
     (ref clusterMethodCy.pyx:3127-3155 DistributedH2Matrix_globalData)
  distributed Krylov inner products -> jnp.vdot on sharded arrays == the
     ip_distributed_nonoverlapping Allreduce (ref base/ip_norm.pxd:48)
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

from ..config import REAL, INDEX

__all__ = ['makeDeviceMesh', 'shardedDenseAssembly', 'rowShardedOperator',
           'distributedSolveStep']


def makeDeviceMesh(n_devices=None, axis='d'):
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    return Mesh(np.array(devs[:n_devices]), (axis,))


def shardedDenseAssembly(dm, kernel, mesh, axis='d'):
    """S1: shard the distant-pair grid over devices, each assembles a partial
    dense matrix, psum combines (the TPU analogue of the reference's
    row-sliced assembly + MPI Allreduce).

    The singular (touching) panels are cheap and assembled host-side once;
    only the O(C^2) distant work is sharded."""
    from ..nl.assembly import (nonlocalBuilder, DenseAccumulator,
                               _psi_prod, _radial_eval)
    from ..nl.panels import classifyPairsDense
    from ..nl.quad_singular import distantRule

    nd = mesh.devices.size
    builder = nonlocalBuilder(dm, kernel)
    meshM = dm.mesh
    N = dm.num_dofs
    info = builder._makeRules(classifyPairsDense(dm, kernel))

    # near/singular part on host (small)
    acc = DenseAccumulator(N)
    infoNear = dict(info)
    infoNear['distant'] = (np.zeros(0, dtype=np.int64),
                           np.zeros(0, dtype=np.int64),
                           np.zeros(0, dtype=np.int64))
    builder._runPairBuckets(acc, infoNear)
    if builder.zeroExterior:
        builder._addZeroExterior(acc)
    Anear = acc.A[:N, :N]

    # sharded distant part: one representative order bucket machinery per
    # order, pairs split over the device mesh
    di, dj, orders = info['distant']
    vertices = jnp.asarray(meshM.vertices)
    cellsArr = jnp.asarray(meshM.cells, dtype=INDEX)
    dofsArr = jnp.asarray(dm.dofs, dtype=INDEX)
    volsArr = jnp.asarray(meshM.simplexVolumes())

    A = jnp.zeros((N + 1, N + 1), dtype=REAL)

    for order in np.unique(orders):
        sel = orders == order
        ii, jj = di[sel], dj[sel]
        rule = distantRule(int(order), meshM.manifold_dim)
        PSI = rule.buildPSI(dm, nSharedVertices=0)
        PSIP = jnp.asarray(_psi_prod(PSI))
        bary_x = jnp.asarray(rule.bary_x)
        bary_y = jnp.asarray(rule.bary_y)
        w = jnp.asarray(rule.w)
        nPSI = PSI.shape[0]
        # pad pairs to a multiple of the device count
        Ptot = len(ii)
        per = -(-Ptot // nd)
        pad = per * nd - Ptot
        iiP = np.concatenate([ii, np.zeros(pad, dtype=np.int64)])
        jjP = np.concatenate([jj, np.zeros(pad, dtype=np.int64)])
        fac = np.concatenate([np.full(Ptot, 2.0), np.zeros(pad)])

        def assembleShard(iiL, jjL, facL):
            v1 = vertices[cellsArr[iiL]]
            v2 = vertices[cellsArr[jjL]]
            x = jnp.einsum('pvd,vq->pqd', v1, bary_x)
            y = jnp.einsum('pvd,vq->pqd', v2, bary_y)
            r2 = jnp.sum((x - y) ** 2, axis=-1)
            g = _radial_eval(kernel, r2)
            if kernel.finiteHorizon:
                g = g * kernel.interaction.jaxIndicator(
                    x, y, kernel.horizonValue ** 2)
            vols = volsArr[iiL] * volsArr[jjL] * facL
            t = (g * w[None, :]) * vols[:, None]
            M = t @ PSIP
            dr = jnp.concatenate([dofsArr[iiL], dofsArr[jjL]], axis=1)
            rows = jnp.where(dr >= 0, dr, N)
            Pl = rows.shape[0]
            rb = jnp.broadcast_to(rows[:, :, None], (Pl, nPSI, nPSI)).reshape(-1)
            cb = jnp.broadcast_to(rows[:, None, :], (Pl, nPSI, nPSI)).reshape(-1)
            Apart = jnp.zeros((N + 1, N + 1), dtype=REAL)
            Apart = Apart.at[rb, cb].add(M.reshape(-1))
            return jax.lax.psum(Apart, axis)

        shardFn = jax.shard_map(
            assembleShard, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=P())
        A = A + jax.jit(shardFn)(jnp.asarray(iiP, dtype=INDEX),
                                 jnp.asarray(jjP, dtype=INDEX),
                                 jnp.asarray(fac))

    from ..base.linear_operators import Dense_LinearOperator
    total = A[:N, :N] + jnp.asarray(Anear)
    return Dense_LinearOperator(total)


def rowShardedOperator(A, mesh, axis='d'):
    """Place a dense operator row-sharded on the device mesh (S3 layout:
    each device owns a row block; matvec leaves y sharded, inner products
    trigger psum)."""
    from ..base.linear_operators import Dense_LinearOperator
    data = A.data if hasattr(A, 'data') else jnp.asarray(A)
    N = data.shape[0]
    nd = mesh.devices.size
    pad = (-N) % nd
    if pad:
        # pad to a square multiple of the device count; identity on the pad
        # block keeps the operator invertible
        data = jnp.pad(data, ((0, pad), (0, pad)))
        data = data.at[jnp.arange(N, N + pad), jnp.arange(N, N + pad)].set(1.0)
    sharding = NamedSharding(mesh, P(axis, None))
    dataSharded = jax.device_put(data, sharding)
    return Dense_LinearOperator(dataSharded), pad


def distributedSolveStep(mesh, A_sharded, b, pad, axis='d', tol=1e-8,
                         maxiter=50):
    """One MG-free distributed solve step: Jacobi-preconditioned CG on the
    row-sharded operator.  jnp inner products on sharded arrays ARE the
    distributed inner products (XLA inserts the collectives; ref ip_norm
    ip_distributed_nonoverlapping)."""
    from ..base.solvers import _cg_core
    from ..base.linear_operators import Diagonal_LinearOperator

    N = b.shape[0]
    bP = jnp.pad(b, (0, pad)) if pad else b

    diag = jnp.diagonal(A_sharded.data)
    diag = jnp.where(diag != 0, diag, 1.0)
    M = Diagonal_LinearOperator(1.0 / diag)
    x, iters, res = _cg_core(A_sharded, M, bP, jnp.zeros_like(bP),
                             tol, maxiter, use_prec=True)
    return x[:N], iters
