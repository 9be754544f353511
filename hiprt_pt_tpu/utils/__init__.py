from .perf import PerformanceMetrics
from .logger import get_logger

__all__ = ["PerformanceMetrics", "get_logger"]
