from . import geometric, pd2d, rpy_pid

__all__ = ["geometric", "pd2d", "rpy_pid"]
