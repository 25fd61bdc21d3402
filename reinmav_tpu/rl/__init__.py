from . import evaluate, networks, ppo

__all__ = ["evaluate", "networks", "ppo"]
