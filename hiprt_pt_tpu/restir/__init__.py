from .reservoir import Reservoir
from . import di

__all__ = ["Reservoir", "di"]
