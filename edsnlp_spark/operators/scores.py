"""Score pipes (eds.charlson / eds.sofa / emergency scores), eds.tnm,
eds.adicap — §2.6 "config, not code".

Score parity: SimpleScoreMatcher (edsnlp/pipes/ner/scores/base_score.py:
13-170): match the score name, extract the numeric value after it within
a window, apply a normalization.  Spark: one native regex with a value
capture group + cast — whole-stage codegen.

TNM parity: edsnlp/pipes/ner/tnm/tnm.py:18 — regex parse of TNM staging
strings ("pT2 N1 M0") into a typed struct + normalized string.

ADICAP parity: edsnlp/pipes/ner/adicap/adicap.py:18 — code regex +
field decode via a broadcast dictionary join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..core.base import Transformer
from .. import registry


class ScoreMatcher(Transformer):
    """Named score + value extraction: one entity row per mention."""

    requires = ("note_id",)
    name = "eds.score"

    def __init__(self, score_name: str, name_patterns: list[str],
                 value_rx: str = r"(\d+(?:[.,]\d+)?)",
                 max_value: float | None = None,
                 text_col: str = "note_text"):
        self.score_name = score_name
        alt = "|".join(name_patterns)
        # name, optional separator (:, =, à, de), then the value
        self.rx = rf"(?i)\b(?:{alt})\s*(?:[:=]|a|à|de)?\s*{value_rx}"
        self.max_value = max_value
        self.text_col = text_col
        self.requires = ("note_id", text_col)

    def entities(self, df: DataFrame) -> DataFrame:
        matches = F.regexp_extract_all(
            F.coalesce(F.col(self.text_col), F.lit("")), F.lit(self.rx), F.lit(1)
        )
        out = df.select(
            "note_id", F.explode(matches).alias("raw")
        ).select(
            "note_id",
            F.lit(self.score_name).alias("label"),
            F.replace(F.col("raw"), F.lit(","), F.lit("."))
            .cast("double").alias("value"),
        )
        if self.max_value is not None:
            out = out.filter(F.col("value") <= self.max_value)
        return out

    def transform(self, df: DataFrame) -> DataFrame:
        agg = self.entities(df).groupBy("note_id").agg(
            F.collect_list("value").alias(f"{self.score_name}_values")
        )
        return df.join(agg, "note_id", "left")


SCORE_CONFIGS = {
    # factories: scores/charlson/factory.py:23, sofa, emergency.*
    "eds.charlson": {"score_name": "charlson",
                     "name_patterns": ["charlson"], "max_value": 40},
    "eds.sofa": {"score_name": "sofa", "name_patterns": ["sofa"],
                 "max_value": 24},
    "eds.emergency_ccmu": {"score_name": "ccmu",
                           "name_patterns": ["ccmu"], "max_value": 5},
    "eds.emergency_gemsa": {"score_name": "gemsa",
                            "name_patterns": ["gemsa"], "max_value": 6},
    "eds.elston_ellis": {"score_name": "elston_ellis",
                         "name_patterns": ["elston[- ]ellis", "ee"],
                         "max_value": 9},
}

for _name, _cfg in SCORE_CONFIGS.items():
    registry.register(_name)(lambda cfg=_cfg, **kw: ScoreMatcher(**{**cfg, **kw}))


# ---- TNM ---------------------------------------------------------------

TNM_RX = (
    r"(?i)\b(?:(?<prefix>[cpyraum]) ?)?"
    r"T ?(?<t>[0-4x]|is)"
    r"(?: ?N ?(?<n>[0-3x]))?"
    r"(?: ?M ?(?<m>[01x]))?"
)


def parse_tnm(text: Column) -> Column:
    """First TNM mention -> struct<prefix,t,n,m,norm> (null if none)."""
    rx = (r"(?i)\b(?:([cpyraum]) ?)?T ?([0-4x]|is)(?: ?N ?([0-3x]))?"
          r"(?: ?M ?([01x]))?")
    pre = F.lower(F.regexp_extract(text, rx, 1))
    t = F.lower(F.regexp_extract(text, rx, 2))
    n = F.lower(F.regexp_extract(text, rx, 3))
    m = F.lower(F.regexp_extract(text, rx, 4))
    norm = F.concat(
        pre,
        F.lit("T"), t,
        F.when(n != "", F.concat(F.lit("N"), n)).otherwise(F.lit("")),
        F.when(m != "", F.concat(F.lit("M"), m)).otherwise(F.lit("")),
    )
    return F.when(
        t != "",
        F.struct(
            F.nullif(pre, F.lit("")).alias("prefix"),
            t.alias("t"), F.nullif(n, F.lit("")).alias("n"),
            F.nullif(m, F.lit("")).alias("m"), norm.alias("norm"),
        ),
    )


class TNMExtractor(Transformer):
    requires = ("note_id", "note_text")
    provides = ("tnm",)
    name = "eds.tnm"

    def __init__(self, text_col: str = "note_text"):
        self.text_col = text_col
        self.requires = ("note_id", text_col)

    def transform(self, df: DataFrame) -> DataFrame:
        return df.withColumn("tnm", parse_tnm(F.col(self.text_col)))


# ---- ADICAP ------------------------------------------------------------

# Minimal decode dictionaries (structure parity with resources/adicap.json.gz;
# full tables are config data loaded the same way).
ADICAP_SAMPLING = {
    "B": "biopsie chirurgicale", "C": "cytoponction", "E": "exerese",
    "H": "biopsie endoscopique", "P": "ponction",
}
ADICAP_TECHNIC = {
    "H": "histologie", "C": "cytologie", "I": "immunohistochimie",
}


class AdicapDecoder(Transformer):
    """ADICAP code scan + structure decode via broadcast dict join."""

    requires = ("note_id", "note_text")
    name = "eds.adicap"

    CODE_RX = r"\b([BCEHP])([HCI])([A-Z]{2})([A-Z0-9]{4})\b"

    def __init__(self, text_col: str = "note_text"):
        self.text_col = text_col
        self.requires = ("note_id", text_col)

    def entities(self, df: DataFrame) -> DataFrame:
        codes = F.regexp_extract_all(
            F.coalesce(F.col(self.text_col), F.lit("")),
            F.lit(self.CODE_RX), F.lit(0),
        )
        ex = df.select("note_id", F.explode(codes).alias("code"))
        spark = df.sparkSession
        samp = spark.createDataFrame(
            list(ADICAP_SAMPLING.items()), "k string, sampling_mode string")
        tech = spark.createDataFrame(
            list(ADICAP_TECHNIC.items()), "k string, technic string")
        return (
            ex.withColumn("s_k", F.substring("code", 1, 1))
            .withColumn("t_k", F.substring("code", 2, 1))
            .join(F.broadcast(samp), F.col("s_k") == samp["k"], "left").drop("k")
            .join(F.broadcast(tech), F.col("t_k") == tech["k"], "left").drop("k")
            .select(
                "note_id", "code", "sampling_mode", "technic",
                F.substring("code", 3, 2).alias("organ_code"),
                F.substring("code", 5, 4).alias("pathology_code"),
            )
        )

    def transform(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError("use .entities(notes)")


registry.register("eds.tnm")(lambda **kw: TNMExtractor(**kw))
registry.register("eds.adicap")(lambda **kw: AdicapDecoder(**kw))
