from .checkpoint import CheckpointedSketchJob

__all__ = ["CheckpointedSketchJob"]
