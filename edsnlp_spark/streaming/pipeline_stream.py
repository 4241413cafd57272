"""Structured Streaming surface (SURVEY.md §2.12).

The reference is a pull-based streaming engine over bounded data with
stateless per-document operators — which maps exactly onto
``readStream`` -> the same Transformers -> ``writeStream`` with
``foreachBatch``.  No watermarks needed (every pipe is a per-row map);
windowed/stateful extensions would use the same notes plane with
event-time columns.

``annotate_stream`` runs an arbitrary Pipeline + entity extractor over a
streaming notes source; ``stream_notes_json`` builds the canonical
file-source stream.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..core import caching
from ..schemas import NOTES_SCHEMA


def stream_notes_json(spark: SparkSession, path: str,
                      max_files_per_trigger: int = 10) -> DataFrame:
    """File-source stream of OMOP note records (jsonl)."""
    return (
        spark.readStream.schema(NOTES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def annotate_stream(stream_df: DataFrame,
                    batch_fn: Callable[[DataFrame], DataFrame],
                    out_path: str, checkpoint: str,
                    available_now: bool = True) -> StreamingQuery:
    """Run ``batch_fn`` (notes df -> entities df) on each micro-batch and
    append the result to parquet.  ``foreachBatch`` lets the batch plan
    reuse every operator unchanged — including joins against static
    dims (terms tables), which streaming-native plans would restrict.
    """

    def handle(batch: DataFrame, batch_id: int) -> None:
        # Bounded cache lifetime for long-running streams (ADVICE r6):
        # a batch_fn that builds fresh engines per micro-batch (e.g. the
        # negation chain's QualifierEngine) registers fresh persisted
        # planes under a fresh owner every batch, and nothing would ever
        # release them.  Snapshot before / release the delta after the
        # batch output is written — micro-batches run sequentially, so
        # no still-lazy plan references the batch's planes by then.
        snap = caching.snapshot()
        try:
            out = batch_fn(batch)
            out.write.mode("append").parquet(out_path)
        finally:
            caching.release_since(snap)

    writer = (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
