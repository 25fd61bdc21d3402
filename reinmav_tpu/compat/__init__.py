from . import gym_env, vector_env

__all__ = ["gym_env", "vector_env"]
