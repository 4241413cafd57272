"""Stream dataflow verbs as DataFrame operators.

Parity target: edsnlp/core/stream.py:278-880 — the reference Stream's
reader-level verbs (loop, shuffle, batchify) re-expressed declaratively.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F


def loop(df: DataFrame, n_epochs: int, epoch_col: str = "epoch") -> DataFrame:
    """Stream.loop (stream.py:852-878) cycles the READER; the
    declarative equivalent is replicating source rows per epoch, and
    the reference's own invariant — ``stream.loop().map(f) ==
    stream.map(f).loop()`` — holds here because row-wise ops are
    deterministic per row.  Bounded epochs (training loops are
    epoch-bounded in practice); the unbounded analog is a Structured
    Streaming source (edsnlp_spark/streaming/).

    Scale note: this is a row-explode, not a self-union chain — one
    extra column, no plan blow-up with n_epochs.
    """
    if n_epochs < 1:
        raise ValueError("n_epochs must be >= 1")
    return df.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(n_epochs - 1))).alias(epoch_col),
    )


def shuffle(df: DataFrame, seed: Optional[int] = None) -> DataFrame:
    """Stream.shuffle (stream.py:765): whole-dataset reshuffle.
    ``orderBy(rand(seed))`` is a full sort-shuffle — exactly the
    reference's 'materialize and shuffle the whole dataset' semantics
    ('dataset' shuffle mode), distributed instead of in-driver-memory.
    """
    return df.orderBy(F.rand(seed) if seed is not None else F.rand())


def batchify(df: DataFrame, batch_size: int,
             batch_col: str = "batch_id") -> DataFrame:
    """Stream.batchify (stream.py:581): assign stable batch ids of at
    most ``batch_size`` rows.  Batches form WITHIN partitions by
    bit-splitting monotonically_increasing_id (partition ordinal in the
    high bits, per-partition row counter in the low 33) — a pure
    projection: no window, no shuffle, exact batch bounds at any scale.
    The same locality contract as Arrow record batches feeding a
    mapInPandas model stage.
    """
    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    mid = F.monotonically_increasing_id()
    part = F.shiftrightunsigned(mid, 33)
    ctr = mid.bitwiseAND(F.lit((1 << 33) - 1))
    return df.withColumn(
        batch_col,
        F.concat_ws("_", part.cast("string"),
                    F.floor(ctr / batch_size).cast("string")),
    )
