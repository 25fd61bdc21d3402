from . import gym_env

__all__ = ["gym_env"]
