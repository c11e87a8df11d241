"""ILU / incomplete-Cholesky solvers (ref base/PyNucleus_base/solvers.pyx:188
ilu_solver, solver_ichol.pxi, linalg.pyx:44 ichol_csr) and the ILU multigrid
smoother (ref smoothers.pyx:482)."""
import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from pynucleus_tpu.base.linear_operators import CSR_LinearOperator
from pynucleus_tpu.base.solvers import solverFactory


def _poisson1d(n):
    h = 1.0 / (n + 1)
    A = (sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n)) / h ** 2)
    return CSR_LinearOperator.from_scipy(A.tocsr())


def test_ichol_exact_on_tridiag():
    # IC(0) on a matrix whose Cholesky factor has the same pattern is EXACT
    A = _poisson1d(50)
    s = solverFactory.build('ichol', A=A, setup=True)
    b = jnp.asarray(np.random.RandomState(0).rand(50))
    x = s.solve(b)
    r = float(jnp.linalg.norm(b - A @ x))
    assert r < 1e-10 * float(jnp.linalg.norm(b)), r


def test_ilu_preconditioned_cg():
    # spilu(fill_factor=1) is an incomplete factorization (same backend and
    # settings as ref solvers.pyx:188) — validate it as a preconditioner
    n = 200
    A = _poisson1d(n)
    b = jnp.ones(n)
    cg0 = solverFactory.build('cg', A=A, setup=True)
    cg0.tolerance = 1e-10
    cg0.maxIter = 500
    cg0.solve(b)
    cg1 = solverFactory.build('cg', A=A, setup=True)
    cg1.tolerance = 1e-10
    cg1.maxIter = 500
    s = solverFactory.build('ilu', A=A)
    s.fill_factor = 10.0
    s.setup()
    cg1.setPreconditioner(s.asPreconditioner())
    x = cg1.solve(b)
    assert cg1.iterations < cg0.iterations, (cg1.iterations, cg0.iterations)
    r = float(jnp.linalg.norm(b - A @ x))
    assert r < 1e-7 * float(jnp.linalg.norm(b)), r


def test_ichol_preconditioned_cg():
    n = 200
    A = _poisson1d(n)
    b = jnp.ones(n)
    cg0 = solverFactory.build('cg', A=A, setup=True)
    cg0.tolerance = 1e-10
    cg0.maxIter = 500
    cg0.solve(b)
    it0 = cg0.iterations
    cg1 = solverFactory.build('cg', A=A, setup=True)
    cg1.tolerance = 1e-10
    cg1.maxIter = 500
    ich = solverFactory.build('ichol', A=A, setup=True)
    cg1.setPreconditioner(ich.asPreconditioner())
    x = cg1.solve(b)
    # IC(0) is exact here -> CG converges almost immediately
    assert cg1.iterations < it0 / 5, (cg1.iterations, it0)
    r = float(jnp.linalg.norm(b - A @ x))
    assert r < 1e-8 * float(jnp.linalg.norm(b))


def test_ilu_smoother_gmg():
    from pynucleus_tpu.fem import simpleInterval, P1_DoFMap, assembleStiffness
    from pynucleus_tpu.multilevel.gmg import multigrid, buildProlongation
    meshes = [simpleInterval(0.0, 1.0)]
    for _ in range(7):
        meshes.append(meshes[-1].refine())
    meshes = meshes[3:]
    dms = [P1_DoFMap(m) for m in meshes]
    hierarchy = []
    for lvl, dm in enumerate(dms):
        e = {'A': assembleStiffness(dm)}
        if lvl > 0:
            e['P'] = buildProlongation(dms[lvl - 1], dm)
        hierarchy.append(e)
    ml = multigrid(hierarchy=hierarchy, smoother=('ilu', {}))
    ml.tolerance = 1e-10
    ml.maxIter = 50
    ml.setup()
    b = jnp.ones(dms[-1].num_dofs)
    x = ml.solve(b)
    A = hierarchy[-1]['A']
    r = float(jnp.linalg.norm(b - A @ x))
    assert r < 1e-9 * float(jnp.linalg.norm(b)), r
    # ILU smoothing should converge at least as fast as damped Jacobi
    ml2 = multigrid(hierarchy=hierarchy)
    ml2.tolerance = 1e-10
    ml2.maxIter = 50
    ml2.setup()
    ml2.solve(b)
    assert ml.iterations <= ml2.iterations, (ml.iterations, ml2.iterations)
