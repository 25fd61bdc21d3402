from . import networks, ppo

__all__ = ["networks", "ppo"]
