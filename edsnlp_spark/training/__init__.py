from .optimizer import LinearSchedule, ScheduledOptimizer, BaseOptimizer

__all__ = ["LinearSchedule", "ScheduledOptimizer", "BaseOptimizer"]
