from .. import config  # noqa: F401  (enables x64 before jax arrays exist)
from ..config import REAL, INDEX, COMPLEX  # noqa: F401
from .factory import factory  # noqa: F401
from .linear_operators import (  # noqa: F401
    LinearOperator, Dense_LinearOperator, Diagonal_LinearOperator,
    CSR_LinearOperator, SSS_LinearOperator, identityOperator, nullOperator,
    TimeStepperLinearOperator, asOperator, invDiagonal)
from .solvers import (  # noqa: F401
    solver, lu_solver, chol_solver, jacobi_solver, iterative_solver,
    krylov_solver, cg_solver, gmres_solver, bicgstab_solver, preconditioner,
    solverFactory)
from .utilsFem import (  # noqa: F401
    TimerManager, outputGroup, driver, generates,
    classWithComputedDependencies, problem, diffDict, parametrizedArg,
    runDriver)


def uninitialized(shape, dtype=REAL):
    import numpy as np
    return np.empty(shape, dtype=dtype)
