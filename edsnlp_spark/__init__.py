"""edsnlp_spark: PySpark-native analytics engine with the query and
data-processing capabilities of aphp/edsnlp (reference read-only at
/root/reference — semantics re-expressed Spark-first, not ported).

Two relational planes (schemas.py): ``notes`` (documents) and
``entities`` (one row per extracted span).  Pipes are Transformers
(core/base.py) composed MLlib-style; a registry maps ``eds.*`` names to
factories (registry.py), mirroring edsnlp/core/registries.py:318-457.
"""

from .core.base import Pipeline, Transformer
from .core.facade import SparkNLP, blank, load
from .registry import available, create, register
from .session import get_spark

# Import operator modules for their registration side effects.
from .operators import tokenizer as _t  # noqa: F401
from .operators import sentences as _s  # noqa: F401
from .operators import matcher as _m  # noqa: F401
from .operators import qualifiers as _q  # noqa: F401
from .operators import sections as _sec  # noqa: F401
from .operators import dates as _d  # noqa: F401
from .operators import quantities as _qt  # noqa: F401
from .operators import split_explode as _se  # noqa: F401
from .operators import contextual as _cm  # noqa: F401
from .operators import history as _h  # noqa: F401
from .operators import scores as _sc  # noqa: F401
from .operators import terminology as _tm  # noqa: F401
from .operators import pollution as _pl  # noqa: F401
from .operators import simstring as _ss  # noqa: F401
from .operators import tables as _tb  # noqa: F401
from .operators import misc_pipes as _mp  # noqa: F401
from .operators import endlines as _el  # noqa: F401
from .operators import disorders as _dis  # noqa: F401

__all__ = [
    "Pipeline", "Transformer", "SparkNLP", "blank", "available", "create",
    "register", "get_spark",
]
__version__ = "0.1.0"
