"""Pipeline composition: MLlib-shaped Transformers.

The reference composes named "pipes" into a Pipeline applied doc-wise
(edsnlp/core/pipeline.py:90-175, add_pipe :251-325).  Here each pipe is a
Transformer whose ``transform(df) -> df`` appends/extends columns on the
notes or entities plane; a Pipeline chains them in order.  Because every
transform only *adds* lazily-evaluated columns to the logical plan,
Catalyst sees the whole pipeline as one plan and prunes anything unused —
the decomposition the reference's own Spark backend cannot do (it ships
the whole pipeline as a single mapPartitions blob,
edsnlp/processing/spark.py:109-149).

Pipes declare column dependencies (``requires`` / ``provides``) so the
Pipeline can validate ordering (SURVEY.md §7 "doc mutation order").
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class Transformer:
    """Base pipe: a pure function DataFrame -> DataFrame."""

    #: columns that must exist on the input DataFrame
    requires: tuple[str, ...] = ()
    #: columns this pipe adds (informational; used for ordering checks)
    provides: tuple[str, ...] = ()
    name: str = "transformer"

    def transform(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError

    def __call__(self, df: DataFrame) -> DataFrame:
        missing = [c for c in self.requires if c not in df.columns]
        if missing:
            raise ValueError(
                f"pipe '{self.name}' requires columns {missing}; "
                f"got {df.columns}. Add the providing pipe earlier in the "
                f"pipeline (cf. reference add_pipe ordering, "
                f"edsnlp/core/pipeline.py:251-325)."
            )
        return self.transform(df)


class Pipeline:
    """Ordered pipes; mirrors ``nlp.add_pipe`` composition."""

    def __init__(self, stages: list[Transformer] | None = None):
        self.stages: list[Transformer] = list(stages or [])

    def add_pipe(self, stage: Transformer, name: str | None = None) -> "Pipeline":
        if name:
            stage.name = name
        self.stages.append(stage)
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        for stage in self.stages:
            df = stage(df)
        return df

    __call__ = transform

    @property
    def pipe_names(self) -> list[str]:
        return [s.name for s in self.stages]
