"""HuggingFace dataset source/sink with native IOB<->span conversion.

Parity target: edsnlp/data/huggingface_dataset.py:13-348 (reader/writer,
hf_ner / hf_text converters) and edsnlp/data/converters.py:1168-1412
(HfNerDict2DocConverter._extract_entities forgiving BIO/IOBES decode,
HfNerDoc2DictConverter BIO encode, single-space token join at
converters.py:1340).

Spark design: the dataset travels as Arrow (HF datasets are
Arrow-backed; Spark ingests Arrow tables zero-copy-ish), and both IOB
directions are NATIVE DataFrame algebra:

* IOB -> spans: posexplode tokens||tags, per-token prefix/type parse,
  open-state via lag window, entity ids via running sum of start flags,
  groupBy entity — the reference's per-token loop re-expressed as
  sessionization, no UDF.
* spans -> IOB: whitespace re-tokenization + prefix-sum offsets, a
  range join token-start-in-span, tag construction, collect_list back
  to arrays.

The `datasets` library is import-gated (absent in this container): hub
loading raises a clear ImportError, while in-memory objects (list of
dicts, pyarrow Table, pandas, or an Arrow-backed HF Dataset) work
without it.  The 100 TB sink path is `path=` (distributed parquet
shards, which `datasets.load_dataset("parquet", ...)` reads back);
returning a driver-side Arrow table is for golden-test-sized data.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

_PREFIX_TAGS = ["B", "I", "E", "S", "U", "L"]
_CLOSERS = ["E", "S", "U", "L"]   # entity closes after this token
_STARTERS = ["B", "S", "U"]       # always starts a new entity


def _import_datasets():
    try:
        import datasets

        return datasets
    except Exception as e:
        raise ImportError(
            "The 'datasets' library is required to load datasets from the "
            "HuggingFace hub. Install it with `pip install datasets`; "
            "in-memory datasets (list of dicts, pyarrow Table, pandas) "
            "work without it."
        ) from e


def _tag_str(tag_col, tag_map: Optional[dict]):
    """Resolve a raw tag (int index or string) to its string form via
    tag_map/tag_order, falling back to str(raw) (converters.py:1281)."""
    if tag_map:
        m = F.create_map(*[x for k, v in tag_map.items()
                           for x in (F.lit(k), F.lit(v))])
        return F.coalesce(m[tag_col], tag_col.cast("string"))
    return tag_col.cast("string")


def iob_to_spans(
    df: DataFrame,
    tokens_col: str = "tokens",
    tags_col: str = "ner_tags",
    id_col: str = "note_id",
    tag_map: Optional[dict] = None,
) -> DataFrame:
    """Token-level IOB/IOBES tags -> entity spans, with the reference's
    forgiving decode (converters.py:1252-1324): B/S/U always start;
    a type change or an I after a close also starts; E/L/S/U close at
    token+1; a trailing open entity closes at the end.  Char offsets
    assume single-space token separation (converters.py:1340).

    Returns (id_col, tok_start, tok_end, start_char, end_char, label,
    lexical_variant).
    """
    z = F.arrays_zip(
        F.col(tokens_col).alias("w"),
        F.slice(F.col(tags_col), 1, F.size(tokens_col)).alias("t"),
    )
    tok = df.select(
        F.col(id_col), F.posexplode(z).alias("pos", "wt")
    ).filter(  # min-length contract (converters.py:1270): unpaired
        # trailing tokens or tags are dropped, not decoded.
        F.col("wt.w").isNotNull() & F.col("wt.t").isNotNull()
    ).select(
        id_col, "pos",
        F.col("wt.w").alias("word"),
        _tag_str(F.col("wt.t"), tag_map).alias("tag"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    sep = "[-_]"
    prefix = (
        F.when(F.col("tag").isin("O", "0"), F.lit("O"))
        .when(F.col("tag").rlike(f"^({'|'.join(_PREFIX_TAGS)}){sep}"),
              F.substring("tag", 1, 1))
        .otherwise(F.lit("S"))
    )
    etype = (
        F.when(F.col("tag").isin("O", "0"), F.lit(None).cast("string"))
        .when(F.col("tag").rlike(f"^({'|'.join(_PREFIX_TAGS)}){sep}"),
              F.expr("substring(tag, 3)"))
        .otherwise(F.col("tag"))
    )
    start_char = F.coalesce(
        F.sum(F.length("word") + 1).over(
            w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    ).cast("int")
    tok = tok.select(
        id_col, "pos", "word", prefix.alias("prefix"),
        etype.alias("etype"), start_char.alias("start_char"),
    )
    # State open after token i: the entity type iff prefix is B or I
    # (everything else — O and the E/L/S/U closers — leaves no open
    # entity).  lag(open_after) is "current_type" before token i.
    open_after = F.when(F.col("prefix").isin("B", "I"), F.col("etype"))
    tok = tok.withColumn("cur_before", F.lag(open_after).over(w))
    start_new = (
        F.col("prefix").isin(*_STARTERS)
        | F.col("cur_before").isNull()
        | (F.col("cur_before") != F.col("etype"))
    )
    tok = tok.withColumn(
        "start_flag",
        F.when(F.col("prefix") != "O", start_new.cast("int")).otherwise(0),
    ).withColumn("eid", F.sum("start_flag").over(w))
    ents = (
        tok.filter(F.col("prefix") != "O")
        .groupBy(id_col, "eid")
        .agg(
            F.min("pos").alias("tok_start"),
            (F.max("pos") + 1).alias("tok_end"),
            F.min("start_char").alias("start_char"),
            F.max(F.col("start_char") + F.length("word")).alias("end_char"),
            F.min_by("etype", F.col("pos")).alias("label"),
            F.concat_ws(" ", F.sort_array(F.collect_list(
                F.struct("pos", "word")))["word"]).alias("lexical_variant"),
        )
        .drop("eid")
    )
    return ents


def spans_to_iob(
    notes: DataFrame,
    entities: DataFrame,
    text_col: str = "note_text",
    id_col: str = "note_id",
) -> DataFrame:
    """Entity spans -> token-level BIO tags (HfNerDoc2DictConverter,
    converters.py:1388-1412): whitespace tokens, B- at the span-opening
    token, I- inside; on overlap the later span (larger start_char)
    wins, mirroring the reference's overwrite-in-doc-order loop.

    Returns (id_col, tokens array<string>, ner_tags array<string>).
    """
    w = Window.partitionBy(id_col).orderBy("pos")
    tok = notes.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "word"),
    ).withColumn(
        "tok_start",
        F.coalesce(
            F.sum(F.length("word") + 1).over(
                w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0)).cast("int"),
    )
    e = entities.select(
        F.col(id_col).alias("e_id"),
        F.col("start_char").alias("e_start"),
        F.col("end_char").alias("e_end"),
        F.col("label").alias("e_label"),
    )
    joined = tok.join(
        e,
        (F.col(id_col) == F.col("e_id"))
        & (F.col("tok_start") >= F.col("e_start"))
        & (F.col("tok_start") < F.col("e_end")),
        "left",
    )
    # later span wins on overlap -> keep max e_start per token
    best = (
        joined.groupBy(id_col, "pos", "word", "tok_start")
        .agg(F.max_by(
            F.struct("e_start", "e_label"), F.col("e_start")).alias("e"))
    )
    tag = (
        F.when(F.col("e").isNull() | F.col("e.e_start").isNull(), F.lit("O"))
        .when(F.col("tok_start") == F.col("e.e_start"),
              F.concat(F.lit("B-"), F.col("e.e_label")))
        .otherwise(F.concat(F.lit("I-"), F.col("e.e_label")))
    )
    per_tok = best.select(id_col, "pos", "word", tag.alias("tag"))
    arr = F.sort_array(F.collect_list(F.struct("pos", "word", "tag")))
    return per_tok.groupBy(id_col).agg(
        arr["word"].alias("tokens"), arr["tag"].alias("ner_tags"),
    )


def _to_spark(spark: SparkSession, dataset: Any) -> DataFrame:
    """In-memory dataset -> DataFrame via Arrow interchange."""
    if isinstance(dataset, DataFrame):
        return dataset
    try:
        import pyarrow as pa
    except Exception:  # pragma: no cover
        pa = None
    if pa is not None and isinstance(dataset, pa.Table):
        try:
            return spark.createDataFrame(dataset)  # pyspark>=4 Arrow path
        except Exception:
            return spark.createDataFrame(dataset.to_pandas())
    if hasattr(dataset, "to_pandas"):  # HF Dataset / pandas-likes
        return spark.createDataFrame(dataset.to_pandas())
    import pandas as pd

    if isinstance(dataset, pd.DataFrame):
        return spark.createDataFrame(dataset)
    return spark.createDataFrame(pd.DataFrame(list(dataset)))


def from_huggingface_dataset(
    spark: SparkSession,
    dataset: Any,
    split: Optional[str] = None,
    name: Optional[str] = None,
    converter: Optional[str] = None,
    text_column: str = "text",
    words_column: str = "tokens",
    ner_tags_column: str = "ner_tags",
    id_column: Optional[str] = "id",
    tag_order: Optional[list] = None,
    tag_map: Optional[dict] = None,
    load_kwargs: Optional[dict] = None,
):
    """HF dataset -> DataFrame(s).

    converter='hf_text' -> notes plane (note_id, note_text).
    converter='hf_ner'  -> {'notes': (note_id, note_text, tokens,
    ner_tags), 'entities': span plane from iob_to_spans}.
    None -> the raw DataFrame.

    ``dataset`` may be a hub identifier string (requires the `datasets`
    library), an HF Dataset, a pyarrow Table, a pandas DataFrame, or an
    iterable of dicts (huggingface_dataset.py:140-250 accepts the same
    spectrum).
    """
    if tag_map is not None and tag_order is not None:
        raise ValueError("Provide only one of tag_map or tag_order.")
    if tag_order is not None:
        tag_map = dict(enumerate(tag_order))
    if isinstance(dataset, str):
        datasets = _import_datasets()
        dataset = datasets.load_dataset(
            dataset, name=name, split=split, **(load_kwargs or {}))
    elif split is not None and hasattr(dataset, "keys"):
        dataset = dataset[split]
    df = _to_spark(spark, dataset)

    if converter is None:
        return df
    idc = (F.col(id_column) if id_column and id_column in df.columns
           else F.monotonically_increasing_id())
    if converter == "hf_text":
        return df.select(idc.alias("note_id"),
                         F.col(text_column).alias("note_text"))
    if converter == "hf_ner":
        notes = df.select(
            idc.alias("note_id"),
            F.col(words_column).alias("tokens"),
            F.col(ner_tags_column).alias("ner_tags"),
        ).withColumn("note_text", F.concat_ws(" ", "tokens"))
        ents = iob_to_spans(notes, "tokens", "ner_tags", "note_id", tag_map)
        return {"notes": notes, "entities": ents}
    raise ValueError(f"Unknown converter {converter!r} "
                     "(expected 'hf_ner' or 'hf_text').")


def to_huggingface_dataset(
    data: Any,
    entities: Optional[DataFrame] = None,
    converter: Optional[str] = None,
    text_col: str = "note_text",
    id_col: str = "note_id",
    path: Optional[str] = None,
):
    """DataFrame(s) -> HF-shaped data.

    converter='hf_ner': (notes, entities) -> (id, tokens, ner_tags) via
    spans_to_iob.  converter='hf_text': notes -> (id, text).

    With ``path``: write distributed parquet shards (the scale path —
    workers write, `datasets.load_dataset('parquet', data_files=...)`
    reads back) and return the path.  Without: return a
    `datasets.Dataset` when the library is importable, else the
    driver-side Arrow table (golden-test-sized by contract).
    """
    if converter == "hf_ner":
        out = spans_to_iob(data, entities, text_col, id_col).select(
            F.col(id_col).alias("id"), "tokens", "ner_tags")
    elif converter == "hf_text":
        out = data.select(F.col(id_col).alias("id"),
                          F.col(text_col).alias("text"))
    else:
        out = data
    if path is not None:
        out.write.mode("overwrite").parquet(path)
        return path
    table = out.toArrow()
    try:
        import datasets

        return datasets.Dataset(table)
    except Exception:
        return table
