from .checkpoint import CheckpointedAnySketchJob, CheckpointedSketchJob
from .sink import write_partitioned

__all__ = [
    "CheckpointedAnySketchJob",
    "CheckpointedSketchJob",
    "write_partitioned",
]
