from .gmg import (  # noqa: F401
    buildProlongation, buildMeshHierarchy, pCoarsenHierarchy, multigrid,
    mgPreconditioner)
from . import smoothers  # noqa: F401  (registers gs/sor/ssor solvers)
from .hierarchies import (  # noqa: F401
    paramsForMG, hierarchyManager, algebraicLevel)
