from .native_envs import (
    ORACLES,
    Quadrotor2DOracle,
    Quadrotor2DSlungloadOracle,
    Quadrotor3DOracle,
    Quadrotor3DSlungloadOracle,
    Reinmav13Oracle,
)
from .pyquat import Quat

__all__ = [
    "ORACLES", "Quat",
    "Quadrotor2DOracle", "Quadrotor2DSlungloadOracle",
    "Quadrotor3DOracle", "Quadrotor3DSlungloadOracle", "Reinmav13Oracle",
]
