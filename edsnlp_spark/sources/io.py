"""Thin reader/writer surface mirroring edsnlp.data.* (SURVEY.md §2.1).

Everything maps onto Spark's own datasources; options reproduce the
reference's semantics (one record per file vs per line, overwrite/append
modes, fragment-level parallelism is Spark's file splitting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def from_iterable(spark: SparkSession, records, schema=None) -> DataFrame:
    """edsnlp/data/base.py:86-197 IterableReader."""
    return spark.createDataFrame(records, schema=schema)


def read_json(spark: SparkSession, path: str, lines: bool = True) -> DataFrame:
    """edsnlp/data/json.py:26-290 — .jsonl (per line) or .json (per file:
    multiLine)."""
    return spark.read.json(path, multiLine=not lines)


def write_json(df: DataFrame, path: str, mode: str = "error",
               lines: bool = True) -> None:
    if not lines:
        raise NotImplementedError(
            "one-file-per-record JSON export: use write_standoff-style "
            "driver loop or jsonl"
        )
    df.write.mode(mode).json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """edsnlp/data/parquet.py:24-114 — fragment parallelism = file splits."""
    return spark.read.parquet(path)


def write_parquet(df: DataFrame, path: str, mode: str = "error",
                  partition_by: list[str] | None = None) -> None:
    """edsnlp/data/parquet.py:117-405 — write_in_worker == executors
    writing natively; accumulate=False == partitioned direct write."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def from_pandas(spark: SparkSession, pdf) -> DataFrame:
    """edsnlp/data/pandas.py:18-186 (Arrow-accelerated)."""
    return spark.createDataFrame(pdf)


def to_pandas(df: DataFrame):
    return df.toPandas()


def from_polars(spark: SparkSession, pldf) -> DataFrame:
    """edsnlp/data/polars.py:19-193 — via Arrow; gated on polars import."""
    try:
        import polars as pl  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise ImportError("polars not installed in this environment") from e
    return spark.createDataFrame(pldf.to_pandas())


def to_polars(df: DataFrame):
    try:
        import polars as pl
    except ImportError as e:  # pragma: no cover
        raise ImportError("polars not installed in this environment") from e
    return pl.from_pandas(df.toPandas())
