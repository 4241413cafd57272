"""eds.tables: ASCII table detection -> relational rows.

Parity target: edsnlp/pipes/misc/tables/tables.py:15-243 — detects
pipe/tab-delimited blocks in clinical text and exposes each as a table
(`to_pd_table()`); here each detected table lands as rows
(note_id, table_id, row_id, col_id, cell) — already relational, no
pandas hop.

Spark design: split into lines (posexplode), tag table lines (>=2
delimiters), group consecutive table lines via the run-id sessionization
pattern (line_no - row_number over table lines), then split cells and
posexplode columns.  Fully native.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..core.base import Transformer
from .. import registry


class TablesExtractor(Transformer):
    requires = ("note_id", "note_text")
    name = "eds.tables"

    def __init__(self, delimiter: str = "|¦", min_cells: int = 2,
                 min_rows: int = 1, text_col: str = "note_text"):
        """``delimiter`` is a STRING OF DELIMITER CHARS (the reference's
        tables.py patterns accept both the ASCII pipe and the broken bar
        '¦' that PDF extraction produces in biology results);
        ``min_rows`` drops runs shorter than the reference's min_rows
        table threshold."""
        self.delim = delimiter
        self.min_cells = min_cells
        self.min_rows = min_rows
        self.text_col = text_col
        self.requires = ("note_id", text_col)

    def tables(self, notes: DataFrame) -> DataFrame:
        cls = "[" + "".join("\\" + c for c in self.delim) + "]"
        lines = notes.select(
            "note_id",
            F.posexplode(F.split(F.coalesce(F.col(self.text_col), F.lit("")),
                                 "\n")).alias("line_no", "line"),
        )
        is_table = F.size(F.split(F.col("line"), cls, -1)) > self.min_cells
        tl = lines.filter(is_table)
        # consecutive table lines share (line_no - rank) — run-id trick
        w = Window.partitionBy("note_id").orderBy("line_no")
        runs = tl.withColumn(
            "run", F.col("line_no") - F.row_number().over(w))
        wt = Window.partitionBy("note_id").orderBy("run")
        tables = runs.withColumn(
            "table_id", F.dense_rank().over(wt)
        ).withColumn(
            "row_id",
            F.row_number().over(
                Window.partitionBy("note_id", "table_id").orderBy("line_no")),
        )
        if self.min_rows > 1:
            tables = tables.withColumn(
                "_n_rows",
                F.count(F.lit(1)).over(
                    Window.partitionBy("note_id", "table_id")),
            ).filter(F.col("_n_rows") >= self.min_rows).drop("_n_rows")
        cells = tables.select(
            "note_id", "table_id", "row_id",
            F.posexplode(
                F.split(F.regexp_replace("line", f"^{cls}|{cls}$", ""), cls)
            ).alias("col_id", "cell"),
        )
        return cells.withColumn("cell", F.trim("cell"))

    def transform(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError("use .tables(notes)")


@registry.register("eds.tables")
def _make_tables(**kw):
    return TablesExtractor(**kw)
