from .plot import plot_trajectory, render_frame

__all__ = ["plot_trajectory", "render_frame"]
