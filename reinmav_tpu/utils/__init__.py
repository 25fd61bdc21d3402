from . import checkpoint, ckpt_manager, metrics, profiling
from .ckpt_manager import CheckpointManager
from .metrics import MetricsLogger

__all__ = [
    "checkpoint", "ckpt_manager", "metrics", "profiling",
    "CheckpointManager", "MetricsLogger",
]
