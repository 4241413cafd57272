from .optimizer import LinearSchedule, ScheduledOptimizer, BaseOptimizer
from .loggers import CSVTracker, JSONTracker, flatten_dict, sanitize_hparams
from .scorer import GenericScorer

__all__ = ["LinearSchedule", "ScheduledOptimizer", "BaseOptimizer",
           "CSVTracker", "JSONTracker", "flatten_dict", "sanitize_hparams",
           "GenericScorer"]
