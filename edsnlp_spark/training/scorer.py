"""GenericScorer: one call -> speed + every configured metric.

Parity target: edsnlp/training/trainer.py:89-186 — the reference times
``nlp.pipe`` over the eval docs (words/docs per second), then runs each
keyword metric on (pred, gold).  Here docs are a notes DataFrame and
metrics are callables over (pred_entities, gold_entities) DataFrames
(e.g. operators.metrics.ner_exact_metrics); DataFrame results are
collected to plain row dicts so the output nests into the trackers'
flatten_dict.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict

from pyspark.sql import DataFrame, functions as F


class GenericScorer:
    def __init__(self, speed: bool = True,
                 **metrics: Callable[[DataFrame, DataFrame], Any]):
        self.speed = speed
        self.metrics = metrics

    def __call__(self, nlp, notes: DataFrame,
                 gold: DataFrame) -> Dict[str, Any]:
        scores: Dict[str, Any] = {}
        if self.speed:
            # time a full materialization of the pipeline over the eval
            # notes (trainer.py:136-152); wps uses the engine tokenizer's
            # token counts
            t0 = time.time()
            nlp.pipe(notes).count()     # materialize the full pipeline
            duration = time.time() - t0
            n_docs = notes.count()
            if "tokens" in notes.columns:
                total = notes.select(
                    F.sum(F.size("tokens")).alias("n")).collect()[0]["n"]
            else:
                total = notes.select(
                    F.sum(F.size(F.split(F.col("note_text"), r"\s+")))
                    .alias("n")).collect()[0]["n"]
            scores["speed"] = {
                "wps": (total or 0) / duration,
                "dps": n_docs / duration,
            }
        pred = nlp.pipe(notes)
        for name, metric in self.metrics.items():
            res = metric(pred, gold)
            if isinstance(res, DataFrame):
                res = [r.asDict() for r in res.collect()]
            scores[name] = res
        return scores
