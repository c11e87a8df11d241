from .kernels import (  # noqa: F401
    Kernel, FractionalKernel, getFractionalKernel, getIntegrableKernel,
    getKernel, kernelFactory, constFractionalOrder,
    variableConstFractionalOrder, fractionalOrderFactory, interactionFactory,
    fullSpace, ball2, ballInf, constantFractionalLaplacianScaling,
    constantIntegrableScaling)
from .assembly import assembleNonlocal, nonlocalBuilder  # noqa: F401
