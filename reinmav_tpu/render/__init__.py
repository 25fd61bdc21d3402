from .html_view import save_html
from .live_view import LiveViewer
from .plot import plot_trajectory, render_frame, save_gif

__all__ = ["plot_trajectory", "render_frame", "save_gif", "save_html",
           "LiveViewer"]
