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


def greedy_padded_groups(lengths, batch_size: int) -> list[int]:
    """Group index per item under the PADDED budget: a batch costs
    (items in batch) x (longest item), i.e. the memory of the padded
    tensor a GPU forward allocates (utils/batching.py:181-240
    batchify_by_padded).  Greedy in input order: close the batch when
    admitting the next item would push (count+1) * max(maxlen, len)
    over ``batch_size``; an oversized single item gets its own batch.
    """
    out: list[int] = []
    bid = count = maxlen = 0
    for ln in lengths:
        ln = int(ln)
        nl = max(maxlen, ln)
        if (count + 1) * nl > batch_size and count > 0:
            bid += 1
            count = 0
            nl = ln
        out.append(bid)
        count += 1
        maxlen = nl
    return out


def batchify_by_padded_words(df: DataFrame, batch_size: int,
                             text_col: str = "note_text",
                             batch_col: str = "batch_id",
                             length_col: str | None = None) -> DataFrame:
    """Stream.batchify(batch_by="padded_words"): batches bounded by
    rows x longest-row — the true padded-activation footprint
    (utils/batching.py:181-240).

    The running max makes this inherently sequential, so unlike the
    prefix-sum ``batchify_by_words`` it runs as a per-partition greedy
    pass in an Arrow stage (state carried across Arrow chunks within
    the partition).  Batch ids are '<partition>_<seq>' — the same
    partition-local contract as ``batchify()``, no shuffle.
    """
    import pandas as pd  # noqa: F401  (Arrow stage)

    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    out_cols = list(df.columns) + [batch_col]
    schema = ", ".join(f"{n} {t}" for n, t in df.dtypes) + f", {batch_col} string"
    with_len = df.withColumn(
        "__part", F.spark_partition_id().cast("int"),
    ).withColumn(
        "__len",
        (F.col(length_col) if length_col
         else F.size(F.split(F.coalesce(F.col(text_col), F.lit("")),
                             r"\s+"))).cast("int"),
    )

    def run(batches):
        bid = count = maxlen = 0
        part = None
        for pdf in batches:
            ids = []
            for p, ln in zip(pdf["__part"], pdf["__len"]):
                part = int(p)
                ln = int(ln)
                nl = max(maxlen, ln)
                if (count + 1) * nl > batch_size and count > 0:
                    bid += 1
                    count = 0
                    nl = ln
                ids.append(f"{part}_{bid}")
                count += 1
                maxlen = nl
            pdf = pdf.assign(**{batch_col: ids})
            yield pdf[out_cols]

    return with_len.mapInPandas(run, schema)


def batchify_by_words(df: DataFrame, max_words: int,
                      text_col: str = "note_text",
                      batch_col: str = "batch_id",
                      length_col: str | None = None) -> DataFrame:
    """Stream.batchify(batch_by="words") (utils/batching.py:121
    words_batchify): batches bounded by the SUM of per-row token counts
    instead of the row count — the budget a GPU forward actually cares
    about (padded activation memory tracks tokens, not documents).

    Within each partition, batch id = floor(running word count /
    max_words): a partition-local prefix sum over a window keyed by the
    stable monotonically_increasing_id order.  One window per
    partition, no cross-partition shuffle (partitionBy the partition
    ordinal), matching batchify()'s locality contract.  A row longer
    than ``max_words`` gets its own batch (same as the reference's
    batcher yielding oversized singletons).
    """
    from pyspark.sql import Window
    n_words = (F.col(length_col) if length_col
               else F.size(F.split(F.coalesce(F.col(text_col), F.lit("")),
                                   r"\s+")))
    mid = F.monotonically_increasing_id()
    part = F.shiftrightunsigned(mid, 33)
    d = df.withColumn("__n", F.least(n_words.cast("long"),
                                     F.lit(int(max_words)))) \
          .withColumn("__part", part).withColumn("__mid", mid)
    w = (Window.partitionBy("__part").orderBy("__mid")
         .rowsBetween(Window.unboundedPreceding, -1))
    prior = F.coalesce(F.sum("__n").over(w), F.lit(0))
    return d.withColumn(
        batch_col,
        F.concat_ws("_", F.col("__part").cast("string"),
                    F.floor(prior / max_words).cast("string")),
    ).drop("__n", "__part", "__mid")
