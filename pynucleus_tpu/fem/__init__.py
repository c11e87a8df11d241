from .meshes import (  # noqa: F401
    simplexMesh, meshFactory, simpleInterval, intervalWithInteraction,
    simpleSquare, uniformSquare, squareWithInteractions, circle,
    discWithInteraction, PHYSICAL, INTERIOR, NO_BOUNDARY)
from .functions import (  # noqa: F401
    function, constant, Lambda, monomial, squareIndicator, radialIndicator,
    solFractional, vectorFunction, functionFactory)
from .dofmaps import (  # noqa: F401
    DoFMap, P0_DoFMap, P1_DoFMap, P2_DoFMap, P3_DoFMap, dofmapFactory,
    fe_vector, str2DoFMap)
from .assembly import (  # noqa: F401
    assembleMass, assembleStiffness, assembleRHS, assembleDrift,
    assembleRHSgrad, assembleNonlinearity, matrixFreeOperator,
    buildSparsityPattern, scatterToCSR)
from .lookup import cellFinder, lookupFunction  # noqa: F401
from . import mesh_zoo  # noqa: F401  (registers the extended mesh catalogue)
from . import mesh_construction  # noqa: F401  (PSLG geometry + mesher)
meshConstruction = mesh_construction  # reference-parity module alias
from .quadrature import gauss01, gaussJacobi01, simplexDuffy  # noqa: F401
