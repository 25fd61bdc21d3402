from . import checkpoint, profiling

__all__ = ["checkpoint", "profiling"]
