from .dist import (  # noqa: F401
    makeDeviceMesh, shardedDenseAssembly, rowShardedOperator,
    distributedSolveStep)
from .dist_h2 import (  # noqa: F401
    DistributedH2Matrix, DistributedCSROperator)
