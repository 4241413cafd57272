"""eds.quantities: value + unit extraction with dimensional conversion.

Parity target: edsnlp/pipes/misc/quantities/quantities.py:379 — a unit
registry mapping unit tokens to (dimension, scale factor)
(UnitRegistry.parse_unit, quantities.py:142-167), value and range
parsing (SimpleQuantity :169, RangeQuantity :276), and cross-unit
conversion/comparison (convert_to, :209-274).

Spark design (SURVEY.md §2.8): regex scan + broadcast unit table +
arithmetic — classic dimensional analysis in native SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..core.base import Transformer
from .. import registry

# unit -> (dimension, factor to SI base of that dimension)
UNIT_REGISTRY: dict[str, tuple[str, float]] = {
    "kg": ("mass", 1e3), "g": ("mass", 1.0), "mg": ("mass", 1e-3),
    "µg": ("mass", 1e-6), "ug": ("mass", 1e-6),
    "km": ("length", 1e3), "m": ("length", 1.0), "cm": ("length", 1e-2),
    "mm": ("length", 1e-3),
    "l": ("volume", 1.0), "dl": ("volume", 1e-1), "cl": ("volume", 1e-2),
    "ml": ("volume", 1e-3),
    "mol": ("substance", 1.0), "mmol": ("substance", 1e-3),
    "µmol": ("substance", 1e-6), "umol": ("substance", 1e-6),
    "jour": ("time", 86400.0), "j": ("time", 86400.0),
    "heure": ("time", 3600.0), "h": ("time", 3600.0),
    "min": ("time", 60.0), "s": ("time", 1.0),
    "%": ("ratio", 1e-2),
    "µl": ("volume", 1e-6), "ul": ("volume", 1e-6),
    "dm": ("length", 1e-1),
    "ui": ("arbitrary", 1.0),
}

_UNITS_ALT = "|".join(sorted(UNIT_REGISTRY, key=len, reverse=True))
# Unit terminator: \b after a non-word char like '%' only holds when a
# word char FOLLOWS, so '98 %' would never match — use a negative
# lookahead (no letter/digit continues the unit token) instead.
_UNIT_END = r"(?![A-Za-z0-9µ])"
# value + unit: "65 kg", "65,5kg", "1.75 m", "98 %"
QUANTITY_RX = rf"(\d+(?:[.,]\d+)?)\s*({_UNITS_ALT}){_UNIT_END}"
# range: "de 10 à 20 mg" / "10 - 20 mg"
RANGE_RX = (rf"(\d+(?:[.,]\d+)?)\s*(?:-|a|à)\s*(\d+(?:[.,]\d+)?)"
            rf"\s*({_UNITS_ALT}){_UNIT_END}")
# range with 'et' separator — ONLY after 'entre' (patterns.py
# range_patterns ('entre','et')): a bare "8, 13 et 15dm" is a value
# sequence, not a range.
RANGE_ET_RX = (rf"entre\s+(\d+(?:[.,]\d+)?)\s+et\s+(\d+(?:[.,]\d+)?)"
               rf"\s*({_UNITS_ALT}){_UNIT_END}")
# comparison operators before a quantity (patterns.py operator_terms)
_LT_ALT = r"<=|<|inf(?:erieure?)?\s*a?"
_GT_ALT = r">=|>|sup(?:erieure?)?\s*a?"
OPERATOR_RX = (rf"({_LT_ALT}|{_GT_ALT})\s*(\d+(?:[.,]\d+)?)"
               rf"\s*({_UNITS_ALT}){_UNIT_END}")
# letter-number values: "deux m" (reference letter number atoms)
from .dates import LETTER_NUMBERS as _DATE_LETTER_NUMBERS  # noqa: E402
_Q_LETTERS = [(p, v) for p, v in _DATE_LETTER_NUMBERS
              if p not in ("l'", "le", "la", "cette", "cet", "ce")]
_LETTER_ALT = "|".join(p for p, _ in _Q_LETTERS)
LETTER_QUANTITY_RX = rf"\b({_LETTER_ALT})\s+({_UNITS_ALT}){_UNIT_END}"


def _num(col: Column) -> Column:
    return F.replace(col, F.lit(","), F.lit(".")).cast("double")


def unit_factor(unit: Column) -> Column:
    out = F.lit(None).cast("double")
    for u, (_, f) in UNIT_REGISTRY.items():
        out = F.when(unit == u, F.lit(f)).otherwise(out)
    return out


def unit_dimension(unit: Column) -> Column:
    out = F.lit(None).cast("string")
    for u, (d, _) in UNIT_REGISTRY.items():
        out = F.when(unit == u, F.lit(d)).otherwise(out)
    return out


def extract_quantity(text: Column) -> Column:
    """First quantity mention -> struct<value double, unit string,
    value_si double, dimension string> (null if none)."""
    raw_v = F.regexp_extract(text, QUANTITY_RX, 1)
    raw_u = F.regexp_extract(text, QUANTITY_RX, 2)
    value = _num(raw_v)
    return F.when(
        raw_v != "",
        F.struct(
            value.alias("value"),
            raw_u.alias("unit"),
            (value * unit_factor(raw_u)).alias("value_si"),
            unit_dimension(raw_u).alias("dimension"),
        ),
    )


def extract_range(text: Column) -> Column:
    """First range mention ('de 10 à 20 mg', '10 - 20 mg', 'entre 1 et
    2m') -> struct<low, high, unit, low_si, high_si> (RangeQuantity,
    quantities.py:276; range_patterns patterns.py:118-128)."""
    def branch(rx):
        lo = _num(F.regexp_extract(text, rx, 1))
        hi = _num(F.regexp_extract(text, rx, 2))
        u = F.regexp_extract(text, rx, 3)
        return F.when(
            F.regexp_extract(text, rx, 1) != "",
            F.struct(
                lo.alias("low"), hi.alias("high"), u.alias("unit"),
                (lo * unit_factor(u)).alias("low_si"),
                (hi * unit_factor(u)).alias("high_si"),
            ),
        )
    return F.coalesce(branch(RANGE_ET_RX), branch(RANGE_RX))


def _letter_value(word: Column) -> Column:
    """Letter-number token -> numeric value (patterns are matched
    against their own regex so hyphen/space variants collapse)."""
    out = F.lit(None).cast("double")
    for pat, val in _Q_LETTERS:
        out = F.when(word.rlike(f"^(?:{pat})$"), F.lit(float(val))) \
            .otherwise(out)
    return out


def extract_operator_quantity(text: Column) -> Column:
    """First comparison-operator quantity ('< 5 µl', 'superieur a 8 ui')
    -> struct<value, unit, operator, value_si, dimension>
    (quantities.py:175-229 SimpleQuantity.operator; operator_terms
    patterns.py:110-114). Falls back to '=' for plain quantities."""
    op_raw = F.regexp_extract(text, OPERATOR_RX, 1)
    raw_v = F.regexp_extract(text, OPERATOR_RX, 2)
    raw_u = F.regexp_extract(text, OPERATOR_RX, 3)
    value = _num(raw_v)
    op = F.when(op_raw.rlike(rf"^(?:{_LT_ALT})$"), F.lit("<")) \
        .when(op_raw.rlike(rf"^(?:{_GT_ALT})$"), F.lit(">"))
    with_op = F.when(
        raw_v != "",
        F.struct(
            value.alias("value"), raw_u.alias("unit"), op.alias("operator"),
            (value * unit_factor(raw_u)).alias("value_si"),
            unit_dimension(raw_u).alias("dimension"),
        ),
    )
    plain = extract_quantity(text)
    return F.coalesce(with_op, F.when(
        plain.isNotNull(),
        F.struct(
            plain["value"].alias("value"), plain["unit"].alias("unit"),
            F.lit("=").alias("operator"),
            plain["value_si"].alias("value_si"),
            plain["dimension"].alias("dimension"),
        ),
    ))


def extract_letter_quantity(text: Column) -> Column:
    """Letter-number quantity ('deux m' -> 2 m; numbers.py atoms)."""
    word = F.regexp_extract(text, LETTER_QUANTITY_RX, 1)
    raw_u = F.regexp_extract(text, LETTER_QUANTITY_RX, 2)
    value = _letter_value(word)
    return F.when(
        (word != "") & value.isNotNull(),
        F.struct(
            value.alias("value"), raw_u.alias("unit"),
            (value * unit_factor(raw_u)).alias("value_si"),
            unit_dimension(raw_u).alias("dimension"),
        ),
    )


def convert_to(value: Column, from_unit: Column, to_unit: Column) -> Column:
    """Cross-unit conversion; null when dimensions differ (the reference
    raises — we stay relational and yield null)."""
    return F.when(
        unit_dimension(from_unit) == unit_dimension(to_unit),
        value * unit_factor(from_unit) / unit_factor(to_unit),
    )


# ---- composed units (quantities.py:142-167 UnitRegistry.parse_unit) ---
# The reference composes unit parts into a dimension-degree vector
# (summed degrees per dim, product of scales, canonical string
# str(dict(sorted(degrees)))) with auto-generated per_<unit> inverses.
# Here: <unit><power?>(/|par <unit><power?>)? parsed natively; scale
# and dimension from literal MAP lookups.

_POWER_MAP = {"2": 2, "²": 2, "3": 3, "³": 3}
COMPOSED_RX = (rf"(\d+(?:[.,]\d+)?)\s*({_UNITS_ALT})?([23²³])?"
               rf"(?:\s*(?:/|par\s+)\s*({_UNITS_ALT})([23²³])?)?{_UNIT_END}")


def _lit_map(d: dict) -> Column:
    return F.create_map(*[x for k, v in d.items()
                          for x in (F.lit(k), F.lit(v))])


def _dim_entry(dim: Column, degree: Column) -> Column:
    return F.concat(F.lit("'"), dim, F.lit("': "), degree.cast("string"))


def composed_dimension(num_dim: Column, num_pow: Column,
                       den_dim: Column, den_pow: Column) -> Column:
    """Canonical dimension string — ``{'mass': 1, 'volume': -1}`` —
    matching the reference's str(dict(sorted(degrees))) (parse_unit,
    quantities.py:161-166): same-dim parts cancel, dims sort by name."""
    e_num = _dim_entry(num_dim, num_pow)
    e_den = _dim_entry(den_dim, -den_pow)
    both = num_dim.isNotNull() & den_dim.isNotNull()
    same = both & (num_dim == den_dim)
    net = num_pow - den_pow
    return (
        F.when(same & (net == 0), F.lit("{}"))
        .when(same, F.concat(F.lit("{"), _dim_entry(num_dim, net),
                             F.lit("}")))
        .when(both & (num_dim < den_dim),
              F.concat(F.lit("{"), e_num, F.lit(", "), e_den, F.lit("}")))
        .when(both,
              F.concat(F.lit("{"), e_den, F.lit(", "), e_num, F.lit("}")))
        .when(num_dim.isNotNull(), F.concat(F.lit("{"), e_num, F.lit("}")))
        .when(den_dim.isNotNull(), F.concat(F.lit("{"), e_den, F.lit("}")))
    )


def extract_composed_quantity(text: Column) -> Column:
    """First (possibly composed) quantity -> struct<value double, unit
    string, dimension string, value_si double>.  Handles 'mg/l',
    'mmol/l', 'ml/min', powers 'cm2'/'cm³', per-only '3/j' or
    '3 par jour', and plain simple units."""
    raw_v = F.regexp_extract(text, COMPOSED_RX, 1)
    nu = F.regexp_extract(text, COMPOSED_RX, 2)
    np_ = F.regexp_extract(text, COMPOSED_RX, 3)
    du = F.regexp_extract(text, COMPOSED_RX, 4)
    dp = F.regexp_extract(text, COMPOSED_RX, 5)
    scale_map = _lit_map({u: f for u, (_, f) in UNIT_REGISTRY.items()})
    dim_map = _lit_map({u: d for u, (d, _) in UNIT_REGISTRY.items()})
    npow = F.when(nu != "",
                  F.coalesce(_lit_map(_POWER_MAP)[np_], F.lit(1))
                  ).otherwise(F.lit(0))
    dpow = F.when(du != "",
                  F.coalesce(_lit_map(_POWER_MAP)[dp], F.lit(1))
                  ).otherwise(F.lit(0))
    scale = (
        F.when(nu != "", F.pow(scale_map[nu], npow)).otherwise(F.lit(1.0))
        * F.when(du != "", F.pow(scale_map[du], -dpow)).otherwise(F.lit(1.0))
    )
    num_dim = F.when(nu != "", dim_map[nu])
    den_dim = F.when(du != "", dim_map[du])
    unit_str = F.concat(
        F.coalesce(nu, F.lit("")),
        F.when(npow > 1, npow.cast("string")).otherwise(F.lit("")),
        F.when(du != "",
               F.concat(F.lit("/"), du,
                        F.when(dpow > 1, dpow.cast("string"))
                        .otherwise(F.lit("")))).otherwise(F.lit("")),
    )
    value = _num(raw_v)
    return F.when(
        (raw_v != "") & ((nu != "") | (du != "")),
        F.struct(
            value.alias("value"),
            unit_str.alias("unit"),
            composed_dimension(num_dim, npow, den_dim, dpow)
            .alias("dimension"),
            (value * scale).alias("value_si"),
        ),
    )


# Unitless patterns gated by context (quantities.py:379 "poids: 65" ->
# kg): context word -> implied unit.
CONTEXT_UNITS = {"poids": "kg", "taille": "m", "temperature": "°C"}


def extract_contextual_quantity(text: Column) -> Column:
    """Bare number after a known context word -> struct<value, unit,
    context> with the implied unit (only when no explicit unit follows).
    """
    out = F.lit(None).cast(
        "struct<value:double,unit:string,context:string>")
    for ctx, unit in CONTEXT_UNITS.items():
        # (?!\d)(?![.,]\d) blocks backtracking into a shorter number when
        # the full number is followed by an explicit unit, while still
        # allowing a sentence-final "poids : 65." to match.
        rx = (rf"\b{ctx}\s*(?::|a|de)?\s*(\d+(?:[.,]\d+)?)"
              rf"(?!\d)(?![.,]\d)(?!\s*(?:{_UNITS_ALT}){_UNIT_END})")
        raw = F.regexp_extract(text, rx, 1)
        out = F.when(
            raw != "",
            F.struct(_num(raw).alias("value"), F.lit(unit).alias("unit"),
                     F.lit(ctx).alias("context")),
        ).otherwise(out)
    return out


# Sequence labels for zipped unitless extraction ("poids / IMC : 57/22"
# — test_quantities.py:214-276): label list zipped positionally with the
# value list that follows the colon.
SEQ_UNITS = {"poids": "kg", "taille": "cm", "imc": "kg_per_m2"}
_SEQ_LABEL_ALT = "|".join(SEQ_UNITS)


def extract_unitless_sequence(text: Column) -> Column:
    """Zipped unitless sequences (quantities use_tables unitless
    handling): labels before the colon pair positionally with the bare
    numbers after it -> array<struct<label, unit, value>>.  Covers the
    separator shapes (/, -, 'et', whitespace); the glued '57imc22' form
    is out of scope (documented subset)."""
    low = F.lower(F.coalesce(text, F.lit("")))
    head = F.substring_index(low, ":", 1)
    tail = F.when(
        F.instr(low, ":") > 0,
        F.substring(low, F.instr(low, ":") + 1, F.length(low)),
    ).otherwise(F.lit(""))
    labels = F.regexp_extract_all(
        head, F.lit(rf"\b({_SEQ_LABEL_ALT})\b"), F.lit(1))
    values = F.regexp_extract_all(
        tail, F.lit(r"(\d+(?:[.,]\d+)?)"), F.lit(1))
    n = F.least(F.size(labels), F.size(values))
    idx = F.sequence(F.lit(1), F.greatest(n, F.lit(1)))
    unit_map = F.create_map(*[x for k, v in SEQ_UNITS.items()
                              for x in (F.lit(k), F.lit(v))])
    pairs = F.transform(
        idx,
        _seq_pair_factory(labels, values, unit_map),
    )
    return F.when(n >= 1, pairs).otherwise(
        F.expr("cast(array() as "
               "array<struct<label:string,unit:string,value:double>>)"))


def _seq_pair_factory(labels, values, unit_map):
    """Closure factory (HOF-lambda gotcha)."""
    def mk(i):
        lab = F.element_at(labels, i)
        val = F.replace(F.element_at(values, i), F.lit(","), F.lit("."))
        return F.struct(
            lab.alias("label"), unit_map[lab].alias("unit"),
            val.cast("double").alias("value"))
    return mk


class QuantitiesExtractor(Transformer):
    requires = ("note_text",)
    provides = ("quantity",)
    name = "eds.quantities"

    def __init__(self, text_col: str = "note_text", out_col: str = "quantity"):
        self.text_col, self.out_col = text_col, out_col
        self.requires = (text_col,)
        self.provides = (out_col,)

    def transform(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            self.out_col, extract_quantity(F.lower(F.col(self.text_col)))
        )


@registry.register("eds.quantities")
def _make_quantities(**kw):
    return QuantitiesExtractor(**kw)


def link_table_units(cells: DataFrame) -> DataFrame:
    """Table unit linking (quantities use_tables,
    tests/pipelines/misc/test_quantities.py:383-401): a bare numeric
    cell takes the unit of the nearest unit-bearing cell in the SAME
    ROW, preferring the closest cell to its left ("mg | 5" -> 5 mg).

    One equi-join on (note, table, row) + grouped min_by over
    (side-preference, distance) — relational, no per-table loops.
    Input is the TablesExtractor cells plane.
    """
    low = F.lower(F.trim(F.col("cell")))
    units = cells.filter(
        low.isin(*UNIT_REGISTRY.keys())
    ).select(
        F.col("note_id").alias("u_note"), F.col("table_id").alias("u_tab"),
        F.col("row_id").alias("u_row"), F.col("col_id").alias("u_col"),
        low.alias("unit"),
    )
    nums = cells.filter(
        F.trim(F.col("cell")).rlike(r"^\d+(?:[.,]\d+)?$")
    ).select(
        "note_id", "table_id", "row_id", "col_id",
        F.replace(F.trim(F.col("cell")), F.lit(","), F.lit("."))
        .cast("double").alias("value"),
    )
    j = nums.join(
        units,
        (nums["note_id"] == units["u_note"])
        & (nums["table_id"] == units["u_tab"])
        & (nums["row_id"] == units["u_row"]),
        "inner",
    )
    dist = F.abs(F.col("col_id") - F.col("u_col"))
    pref = F.struct(
        # closest-left wins; right-side units only when nothing on the left
        F.when(F.col("u_col") < F.col("col_id"), 0).otherwise(1)
        .alias("side"),
        dist.alias("dist"),
        F.col("u_col").alias("tiebreak"),
    )
    g = j.groupBy("note_id", "table_id", "row_id", "col_id", "value").agg(
        F.min_by("unit", pref).alias("unit"))
    return g.select(
        "note_id", "table_id", "row_id", "col_id", "value", "unit",
        F.round(F.col("value") * unit_factor(F.col("unit")), 9)
        .alias("value_si"),
        unit_dimension(F.col("unit")).alias("dimension"),
    )


# ---- quantity_mentions: ALL mentions, reference pipe semantics ---------
# Parity: the eds.quantities pipe's span list (quantities.py:379-1030 +
# patterns.py common_quantities) — every quantity in the document with
# label (size/weight/bmi by dimension), parsed value(s), unit and the
# reference's str(value) norm, including:
#  * unit propagation over connector chains ("2 par 1mm" -> 2 mm;
#    "8, 13 et 15dm" -> all dm) via a per-note window, never a loop;
#  * followed_by composites ("1m50" -> 1.5 m, "1kg300" -> 1.3 kg,
#    "1h30" -> 1.5 h);
#  * vulgar fractions ("⅛ m" -> 0.125 m) and letter numbers ("deux m");
#  * ranges ("entre 1 et 2m" -> 1-2 m) when extract_ranges;
#  * unitless context rules (patterns.py:62-104: pese/mesure/imc with
#    value-scaled units: weight <200 -> kg else g, size <3 -> m else
#    cm, bmi -> kg_per_m2);
#  * non-match guards: rates ("10 g / h", "10 cm par jour"), glued
#    letters ("10cma"), dotted number chains ("01.42.43.56.78 m").

_DEFAULT_DIMS = ("length", "mass")
_DIM_LABEL = {"length": "size", "mass": "weight"}
_NUMG = r"\d+(?:[.,]\d+)?"
_FRACTIONS = {"½": 0.5, "⅓": 1 / 3, "¼": 0.25, "⅕": 0.2, "⅙": 1 / 6,
              "⅐": 1 / 7, "⅛": 0.125, "⅑": 1 / 9, "⅔": 2 / 3, "¾": 0.75,
              "⅖": 0.4, "⅗": 0.6, "⅜": 0.375}
# (main unit, sub unit implied by followed_by, sub-per-main divisor) —
# patterns.py followed_by entries.  Divisors (not scales): value =
# main + sub / divisor keeps the float bit-identical to an engine
# computing sub/100.0 (an ulp differs via sub * 0.01).
_FOLLOWED_BY = [("m", "cm", 100.0), ("kg", "g", 1000.0), ("h", "min", 60.0)]
# reference stopwords (patterns.py:108) + the '/' unit divisor act as
# value-sequence connectors for unit propagation
_CONNECTOR_GAP_RX = r"^(?:\s|,|et\b|par\b|de\b|a\b|sur\b|-|/)*$"
_CTX_TERMS = {
    "size": ["mesure", "taille", "mesurant", "mesurent", "mesurait",
             "mesuree", "hauteur", "largeur", "longueur"],
    "weight": ["poids", "poid", "pese", "pesant", "pesait", "pesent"],
    "bmi": ["imc", "bmi"],
}


def _qm_units(all_units: bool) -> list[str]:
    if all_units:
        return list(UNIT_REGISTRY)
    return [u for u, (d, _) in UNIT_REGISTRY.items() if d in _DEFAULT_DIMS]


def quantity_mentions(notes: DataFrame, text_col: str = "note_text",
                      extract_ranges: bool = True,
                      all_units: bool = False) -> DataFrame:
    """All quantity mentions as a flat table:

    (note_id, start_char, end_char, lexical_variant, label, value,
     value_high, unit, operator, norm, value_si)

    ``notes`` should be persisted by the caller (referenced twice:
    matcher scan + gap/text join)."""
    from .matcher import RegexMatcher
    from .filter_spans import filter_spans
    from ..functions.text import norm_text

    units = sorted(_qm_units(all_units), key=len, reverse=True)
    ualt = "|".join(units)
    uend = _UNIT_END
    frac_cls = "".join(_FRACTIONS)
    num_guard = r"(?<![0-9.,])"

    patterns: dict[str, list[str]] = {
        # FP families: matched longest so filter_spans suppresses the
        # inner simple/bare matches, then dropped.
        "aa_fp": [
            rf"\d+(?:[.,]\d+){{2,}}",                       # dotted chains
            rf"{_NUMG}\s*(?:{ualt}){uend}\s*(?:/|par\b)\s*\w+",  # rates
        ],
        "comp": [
            rf"{num_guard}(\d+)\s*{m}\s*(\d+)(?![.,]?\d)"
            rf"(?!\s*(?:{ualt}){uend})"
            for m, _, _ in _FOLLOWED_BY
        ],
        "simple": [rf"{num_guard}{_NUMG}\s*(?:{ualt}){uend}"],
        "letter": [rf"\b(?:{_LETTER_ALT})\s+(?:{ualt}){uend}"],
        "frac": [rf"[{frac_cls}]\s*(?:{ualt}){uend}"],
        "bare": [rf"{num_guard}{_NUMG}(?![.,]?\d)"
                 rf"(?!\s*(?:{ualt}){uend})"],
    }
    if extract_ranges:
        patterns["range"] = [
            rf"entre\s+{_NUMG}\s+et\s+{_NUMG}\s*(?:{ualt}){uend}",
            rf"(?:de\s+)?{num_guard}{_NUMG}\s*(?:-|a)\s*{_NUMG}"
            rf"\s*(?:{ualt}){uend}",
        ]
    for kind, terms in _CTX_TERMS.items():
        talt = "|".join(terms)
        # trailing guards: not mid-number, not a value sequence (57/22),
        # not unit-bearing, not glued to letters (composites like
        # "taille 1m70" belong to the comp family)
        patterns[f"ctx_{kind}"] = [
            rf"\b(?:{talt})\s*:?\s*(?:de\s+)?{_NUMG}(?![.,]?\d)"
            rf"(?!\s*[/,]?\s*\d)(?!\s*(?:{ualt}){uend})(?!\s*[a-zµ])"
        ]
    if all_units:
        patterns["op"] = [
            rf"(?:{_LT_ALT}|{_GT_ALT})\s*{_NUMG}\s*(?:{ualt}){uend}"]

    m = RegexMatcher(patterns, attr="NORM", span_type="quantity") \
        .entities(notes)
    m = filter_spans(m).filter(F.col("label") != "aa_fp")

    # Family-parsing projection: a large name-based expression set
    # (every branch interpolates the unit alternation) — built once
    # per unit config and memoized (functions/memo.py).
    def _parsed_args():
        v = norm_text(F.col("lexical_variant"))
        fam = F.col("label")

        def num_at(rx, i=1):
            return F.regexp_extract(v, rx, i)

        # per-family parsed (value, value_high, unit_raw, operator, decimal?)
        simple_v = num_at(rf"({_NUMG})")
        simple_u = num_at(rf"{_NUMG}\s*({ualt}){uend}")
        comp_main = num_at(r"(\d+)")
        comp_sub = num_at(r"\d+\s*[a-z]+\s*(\d+)")
        comp_unit = num_at(rf"\d+\s*({'|'.join(mu for mu, _, _ in _FOLLOWED_BY)})")
        comp_scale = F.create_map(*[x for mu, _, s in _FOLLOWED_BY
                                    for x in (F.lit(mu), F.lit(s))])
        rng_lo = num_at(rf"({_NUMG})")
        rng_hi = num_at(rf"{_NUMG}\s*(?:-|a|et)\s*({_NUMG})")
        letter_word = num_at(rf"\b({_LETTER_ALT})\s")
        frac_char = num_at(rf"([{frac_cls}])")
        frac_map = F.create_map(*[x for k, val in _FRACTIONS.items()
                                  for x in (F.lit(k), F.lit(float(val)))])
        op_raw = num_at(rf"^({_LT_ALT}|{_GT_ALT})")
        ctx_v = num_at(rf"({_NUMG})\s*$")

        value = (
            F.when(fam == "comp",
                   comp_main.cast("double")
                   + comp_sub.cast("double") / comp_scale[comp_unit])
            .when(fam == "range", _num(rng_lo))
            .when(fam == "letter", _letter_value(letter_word))
            .when(fam == "frac", frac_map[frac_char])
            .when(fam.startswith("ctx_"), _num(ctx_v))
            .otherwise(_num(simple_v))
        )
        value_high = F.when(fam == "range", _num(rng_hi))
        unit0 = (
            F.when(fam == "comp", comp_unit)
            .when(fam == "letter",
                  num_at(rf"\b(?:{_LETTER_ALT})\s+({ualt}){uend}"))
            .when(fam == "frac", num_at(rf"[{frac_cls}]\s*({ualt}){uend}"))
            .when(fam == "ctx_size",
                  F.when(_num(ctx_v) < 3, F.lit("m")).otherwise(F.lit("cm")))
            .when(fam == "ctx_weight",
                  F.when(_num(ctx_v) < 200, F.lit("kg")).otherwise(F.lit("g")))
            .when(fam == "ctx_bmi", F.lit("kg_per_m2"))
            .when(fam == "bare", F.lit(None).cast("string"))
            .otherwise(F.when(simple_u != "", simple_u))
        )
        operator = F.when(
            fam == "op",
            F.when(op_raw.rlike(rf"^(?:{_LT_ALT})$"), F.lit("<"))
            .otherwise(F.lit(">")))
        return [
            "note_id", "start_char", "end_char", "lexical_variant",
        fam.alias("family"), value.alias("value"),
        value_high.alias("value_high"), unit0.alias("unit"),
        operator.alias("operator"),
        ]

    from ..functions.memo import memo_column
    parsed = m.select(*memo_column(("qm_parsed_args", all_units),
                                   _parsed_args))

    # unit propagation across connector chains (window, no loop).
    # Scale note: only a 64-char prefix window rides the shuffle, not
    # the document text — a gap longer than that cannot be a pure
    # connector chain anyway.
    from pyspark.sql import Window
    slim = notes.select("note_id",
                        norm_text(F.col(text_col)).alias("__norm"))
    p = parsed.join(slim, "note_id").select(
        parsed["*"],
        F.substring(
            F.col("__norm"),
            F.greatest(F.col("start_char") - 64, F.lit(0)) + 1,
            F.least(F.col("start_char"), F.lit(64)),
        ).alias("__prefix"),
    )
    w = Window.partitionBy("note_id").orderBy("start_char", "end_char")
    prev_end = F.lag("end_char").over(w)
    dist = F.col("start_char") - prev_end
    gap = F.when(
        dist <= 64,
        F.substring(F.col("__prefix"),
                    F.length(F.col("__prefix")) - dist + 1, dist))
    conn = F.coalesce(gap.rlike(_CONNECTOR_GAP_RX), F.lit(False))
    p = p.withColumn("__grp",
                     F.sum(F.when(conn, 0).otherwise(1)).over(w))
    wg = (Window.partitionBy("note_id", "__grp")
          .orderBy("start_char", "end_char")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    p = p.withColumn("unit_eff", F.first("unit", ignorenulls=True).over(wg))
    p = p.filter(F.col("unit_eff").isNotNull())

    dim = unit_dimension(F.col("unit_eff"))
    label = (
        F.when(F.col("family") == "ctx_bmi", F.lit("bmi"))
        .otherwise(F.coalesce(
            _lit_map(_DIM_LABEL)[dim],
            F.col("unit_eff")))
    )

    def fmt(val, dec):
        return F.when(dec, val.cast("string")) \
            .otherwise(val.cast("long").cast("string"))

    # str(value) decimal-ness follows the SOURCE number on each side
    nv = norm_text(F.col("lexical_variant"))
    lo_dec = (F.col("family").isin("comp", "frac")
              | nv.rlike(r"^.*?\d+[.,]\d"))
    lo_dec = F.when(F.col("family") == "range",
                    nv.rlike(r"^(?:entre\s+|de\s+)?\d+[.,]\d")) \
        .otherwise(lo_dec)
    lo_s = fmt(F.col("value"), lo_dec)
    hi_dec = nv.rlike(r"(?:-|a\s|et\s)\s*\d+[.,]\d")
    hi_s = F.when(F.col("value_high").isNotNull(),
                  fmt(F.col("value_high"), hi_dec))
    val_str = F.when(F.col("value_high").isNotNull(),
                     F.concat(lo_s, F.lit("-"), hi_s)).otherwise(lo_s)
    norm = F.when(
        F.col("operator").isNotNull(),
        F.concat(F.col("operator"), val_str, F.lit(" "), F.col("unit_eff"))
    ).otherwise(F.concat(val_str, F.lit(" "), F.col("unit_eff")))

    si = F.col("value") * F.coalesce(unit_factor(F.col("unit_eff")),
                                     F.lit(1.0))
    return p.select(
        "note_id", "start_char", "end_char", "lexical_variant",
        label.alias("label"), F.col("value"),
        F.col("value_high"), F.col("unit_eff").alias("unit"),
        F.col("operator"), norm.alias("norm"),
        F.round(si, 9).alias("value_si"),
    )
