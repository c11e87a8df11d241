from .dist import (  # noqa: F401
    makeDeviceMesh, shardedDenseAssembly, rowShardedOperator,
    distributedSolveStep)
