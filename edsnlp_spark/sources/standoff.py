"""BRAT standoff reader/writer (.txt + .ann corpora).

Parity target: edsnlp/data/standoff.py:45-277 — `.ann` lines:
  T<id>\tLABEL start end\tsurface        entity (possibly discontinuous)
  A<id>\tAttr T<ref> [value]             attribute
  R<id>\tRel Arg1:T<a> Arg2:T<b>         relation
  #<id>\tAnnotatorNotes T<ref> note      note

Spark design: ``spark.read.text`` per-line with ``input_file_name`` as
the doc key — file listing/splitting parallelism is Spark's own; the
line grammar is native regexp_extract projections (no UDF).  The writer
mirrors it with ``foreachPartition``-free composition: build the .ann
lines relationally and write with the text datasource partitioned by
file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

ANN_ENTITY_RX = r"^(T\d+)\t(\S+) (\d+) (\d+)(?:;\d+ \d+)*\t(.*)$"
ANN_ATTR_RX = r"^(A\d+)\t(\S+) (T\d+)(?: (.*))?$"
ANN_REL_RX = r"^(R\d+)\t(\S+) Arg1:(T\d+) Arg2:(T\d+)"
ANN_NOTE_RX = r"^(#\d*)\tAnnotatorNotes (T\d+)\t?(.*)$"


def _doc_id(path_col):
    return F.regexp_replace(
        F.element_at(F.split(path_col, "/"), -1), r"\.(ann|txt)$", ""
    )


def read_standoff(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """Read a BRAT directory -> {'notes', 'entities', 'attributes',
    'relations', 'notes_annot'} DataFrames."""
    txt = (
        spark.read.text(os.path.join(path, "*.txt"), wholetext=True)
        .select(
            _doc_id(F.input_file_name()).alias("doc_id"),
            F.col("value").alias("note_text"),
        )
    )
    ann = (
        spark.read.text(os.path.join(path, "*.ann"))
        .select(
            _doc_id(F.input_file_name()).alias("doc_id"),
            F.col("value").alias("line"),
        )
        .filter(F.length("line") > 0)
    )
    line = F.col("line")
    entities = ann.filter(line.rlike(ANN_ENTITY_RX)).select(
        "doc_id",
        F.regexp_extract(line, ANN_ENTITY_RX, 1).alias("ann_id"),
        F.regexp_extract(line, ANN_ENTITY_RX, 2).alias("label"),
        F.regexp_extract(line, ANN_ENTITY_RX, 3).cast("int").alias("start_char"),
        F.regexp_extract(line, ANN_ENTITY_RX, 4).cast("int").alias("end_char"),
        F.regexp_extract(line, ANN_ENTITY_RX, 5).alias("lexical_variant"),
    )
    attributes = ann.filter(line.rlike(ANN_ATTR_RX)).select(
        "doc_id",
        F.regexp_extract(line, ANN_ATTR_RX, 1).alias("attr_id"),
        F.regexp_extract(line, ANN_ATTR_RX, 2).alias("attr"),
        F.regexp_extract(line, ANN_ATTR_RX, 3).alias("ann_id"),
        F.nullif(F.regexp_extract(line, ANN_ATTR_RX, 4), F.lit("")).alias("value"),
    )
    relations = ann.filter(line.rlike(ANN_REL_RX)).select(
        "doc_id",
        F.regexp_extract(line, ANN_REL_RX, 1).alias("rel_id"),
        F.regexp_extract(line, ANN_REL_RX, 2).alias("relation"),
        F.regexp_extract(line, ANN_REL_RX, 3).alias("arg1"),
        F.regexp_extract(line, ANN_REL_RX, 4).alias("arg2"),
    )
    notes_annot = ann.filter(line.rlike(ANN_NOTE_RX)).select(
        "doc_id",
        F.regexp_extract(line, ANN_NOTE_RX, 2).alias("ann_id"),
        F.regexp_extract(line, ANN_NOTE_RX, 3).alias("note"),
    )
    return {
        "notes": txt,
        "entities": entities,
        "attributes": attributes,
        "relations": relations,
        "notes_annot": notes_annot,
    }


def write_standoff(notes: DataFrame, entities: DataFrame, path: str) -> None:
    """Write .txt/.ann pairs from the WORKERS (foreachPartition), like
    the reference writes in its worker processes (edsnlp/data/
    standoff.py:278) — no `.collect()`, so a 100x corpus never lands on
    the driver.  ``path`` must be a filesystem every executor can reach
    (local FS in local mode, a shared mount on a cluster — the same
    contract as the reference's file-per-doc writer)."""
    os.makedirs(path, exist_ok=True)
    # Rename the grouping key: notes and entities often share lineage
    # (entities derived from the same notes df), and identical names
    # would trip Spark's ambiguous-self-join analysis.
    ents_by_doc = (
        entities.groupBy(F.col("note_id").alias("e_note_id"))
        .agg(F.sort_array(F.collect_list(F.struct(
            "start_char", "end_char", "label", "lexical_variant"))).alias("es"))
    )
    rows = notes.join(
        ents_by_doc, F.col("note_id") == F.col("e_note_id"), "left"
    ).select("note_id", "note_text", "es")

    def _write_partition(it):
        import os as _os
        _os.makedirs(path, exist_ok=True)
        for r in it:
            with open(_os.path.join(path, f"{r['note_id']}.txt"), "w") as f:
                f.write(r["note_text"] or "")
            with open(_os.path.join(path, f"{r['note_id']}.ann"), "w") as f:
                for i, e in enumerate(r["es"] or [], 1):
                    f.write(
                        f"T{i}\t{e['label']} {e['start_char']} "
                        f"{e['end_char']}\t{e['lexical_variant']}\n"
                    )

    rows.foreachPartition(_write_partition)
