"""LLM pipes: async remote inference inside partitions (SURVEY.md §2.10).

Parity target: eds.llm_markup_extractor
(pipes/llm/llm_markup_extractor/llm_markup_extractor.py:33-560): prompt
an OpenAI-compatible endpoint to annotate text with inline markup, keep
``max_concurrent_requests`` in flight, parse the returned markup back to
spans; and eds.llm_span_qualifier (llm_span_qualifier.py:29): per-span
attribute classification via JSON answers.

Spark design: ``mapInPandas`` partition-level asyncio fan-out — each
partition runs its own event loop with a bounded semaphore, so total
in-flight requests = partitions x max_concurrent.  The HTTP client is
injected; there is no network in this container, so the default client
raises NotImplementedError and tests inject a fake.  Markup -> span
parsing reuses sources/converters.parse_markup.
"""

from __future__ import annotations

import asyncio
from typing import Awaitable, Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..sources.converters import parse_markup

CompleteFn = Callable[[str], Awaitable[str]]


def _default_client(prompt: str) -> Awaitable[str]:
    raise NotImplementedError(
        "no LLM endpoint in this container; inject complete_fn "
        "(an async prompt -> completion callable)"
    )


def _select_few_shot(text: str, examples: list[tuple[str, str]],
                     k: int) -> list[tuple[str, str]]:
    """Closest-example retrieval (llm_markup_extractor.py:312
    use_retriever): rank few-shot examples by token-overlap similarity
    with the request text, keep the top k.  Runs inside the executor —
    the example list is tiny (it ships with the closure)."""
    toks = set((text or "").lower().split())
    scored = sorted(
        examples,
        key=lambda ex: -len(toks & set(ex[0].lower().split())),
    )
    return scored[:k]


def llm_markup_extract(notes: DataFrame,
                       complete_fn: CompleteFn | None = None,
                       prompt_template: str = "Annotate entities: {text}",
                       few_shot_examples: list[tuple[str, str]] | None = None,
                       max_few_shot_examples: int = -1,
                       max_concurrent: int = 8,
                       alignment_threshold: float = 0.0,
                       text_col: str = "note_text") -> DataFrame:
    """-> entities plane rows parsed from the LLM's markup output.

    ``few_shot_examples`` are (text, annotated_markup) pairs; when
    ``max_few_shot_examples`` > 0 the closest examples to each request
    (token-overlap retriever, llm_markup_extractor.py:226-312) are
    prepended to the prompt as demonstration turns.

    Offsets are emitted in SOURCE-text coordinates: when the model's
    echo differs from the input (paraphrase, dropped whitespace,
    truncation), spans are re-aligned with the fuzzy aligner
    (operators/fuzzy_align.py, mirroring llm_markup_extractor.py:328-351
    + utils/fuzzy_alignment.py); spans whose best alignment scores at or
    under ``alignment_threshold`` are dropped, like the reference."""
    fn = complete_fn or _default_client
    exs = few_shot_examples or []
    k = (len(exs) if max_few_shot_examples < 0
         else min(max_few_shot_examples, len(exs)))

    def build_prompt(text: str) -> str:
        parts = []
        for ex_text, ex_markup in (
                _select_few_shot(text, exs, k) if exs and k else []):
            parts.append(f"Input: {ex_text}\nOutput: {ex_markup}")
        parts.append(prompt_template.format(text=text or ""))
        return "\n".join(parts)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .fuzzy_align import align_spans

        async def process(pdf: pd.DataFrame):
            sem = asyncio.Semaphore(max_concurrent)

            async def one(note_id, text):
                async with sem:
                    out = await fn(build_prompt(text))
                return note_id, text, out

            return await asyncio.gather(*[
                one(nid, txt)
                for nid, txt in zip(pdf["note_id"], pdf[text_col])
            ])

        for pdf in batches:
            results = asyncio.run(process(pdf))
            rows = []
            for note_id, source, markup in results:
                echo, ents = parse_markup(markup or "")
                echo = echo.rstrip()
                src = (source or "").rstrip()
                if echo == src:
                    for e in ents:
                        rows.append((
                            note_id, e["start_char"], e["end_char"],
                            e["label"], e["lexical_variant"], "llm",
                        ))
                    continue
                # echo altered by the model -> re-align into source space
                # (llm_markup_extractor.py:335-351).
                mapped = align_spans(
                    echo, [(e["start_char"], e["end_char"]) for e in ents],
                    src, threshold=alignment_threshold)
                for e, span in zip(ents, mapped):
                    if span is None:
                        continue
                    s, t = span
                    rows.append((
                        note_id, s, t, e["label"], (source or "")[s:t], "llm",
                    ))
            yield pd.DataFrame(rows, columns=[
                "note_id", "start_char", "end_char", "label",
                "lexical_variant", "span_type"])

    return notes.select("note_id", text_col).mapInPandas(
        run,
        "note_id long, start_char int, end_char int, label string, "
        "lexical_variant string, span_type string",
    )


_SCHEMA_CASTS = {
    "boolean": lambda v: bool(v) if isinstance(v, bool)
    else str(v).strip().lower() in ("true", "1", "yes", "oui"),
    "string": lambda v: None if v is None else str(v),
    "date": lambda v: None if v in (None, "") else str(v)[:10],
}


def _span_context(text: str, start: int, end: int, label: str,
                  context_words: int | None) -> str:
    """XML-marked context around the span (the reference's doc2xml
    context_formatter + 'words[-n:n]' context_getter,
    llm_span_qualifier.py): n whitespace words each side, the span
    wrapped as <LABEL>span</LABEL>."""
    left, span, right = text[:start], text[start:end], text[end:]
    if context_words is not None:
        lw = left.split(" ")
        rw = right.split(" ")
        left = " ".join(lw[-context_words - 1:]) if lw else ""
        right = " ".join(rw[:context_words + 1]) if rw else ""
    return f"{left}<{label}>{span}</{label}>{right}"


def llm_span_qualify(entities: DataFrame,
                     complete_fn: CompleteFn | None = None,
                     attribute: str | None = None,
                     schema: dict[str, str] | None = None,
                     notes: DataFrame | None = None,
                     context_words: int | None = 2,
                     prompt_template: str | None = None,
                     on_error: str = "skip",
                     max_concurrent: int = 8,
                     text_col: str = "note_text") -> DataFrame:
    """Per-span attributes from an LLM JSON answer.

    Parity: eds.llm_span_qualifier (llm_span_qualifier.py:29 +
    tests/pipelines/llm/test_llm_span_qualifier.py):

    * ``schema`` maps attribute name -> type ('boolean' | 'string' |
      'date'); ONE output column per attribute, values parsed from the
      model's JSON with tolerant casting (the legacy single
      ``attribute`` arg is a {attribute: boolean} schema);
    * when ``notes`` is given, each request carries the span's
      XML-marked context (``<LABEL>span</LABEL>`` with
      ``context_words`` words each side) instead of the bare variant;
    * ``on_error='skip'`` leaves attributes null on a failed request /
      unparseable answer; 'raise' propagates (reference on_error).
    """
    import json as _json

    fn = complete_fn or _default_client
    sch = dict(schema) if schema else {attribute or "negation": "boolean"}
    for k, t in sch.items():
        if t not in _SCHEMA_CASTS:
            raise ValueError(f"unsupported schema type {t!r} for {k!r}")
    tmpl = prompt_template or (
        "You are a span classifier. Answer with JSON using the keys: "
        + ", ".join(sch) + ".\nContext: {context}")

    ents = entities
    if notes is not None:
        slim = notes.select(F.col("note_id").alias("__nid"),
                            F.col(text_col).alias("__text"))
        ents = entities.join(
            slim, entities["note_id"] == slim["__nid"], "left"
        ).drop("__nid")
    in_cols = entities.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        async def process(pdf):
            sem = asyncio.Semaphore(max_concurrent)

            async def one(idx, row):
                if "__text" in row and isinstance(row["__text"], str):
                    ctx = _span_context(
                        row["__text"], int(row["start_char"]),
                        int(row["end_char"]), str(row["label"]),
                        context_words)
                else:
                    ctx = str(row["lexical_variant"])
                async with sem:
                    try:
                        out = await fn(tmpl.format(context=ctx))
                    except Exception:
                        if on_error == "raise":
                            raise
                        return idx, None
                return idx, out

            return await asyncio.gather(*[
                one(i, row) for i, (_, row) in enumerate(pdf.iterrows())
            ])

        for pdf in batches:
            answers = dict(asyncio.run(process(pdf)))
            pdf = pdf.copy()
            parsed = []
            for i in range(len(pdf)):
                raw = answers.get(i)
                try:
                    obj = _json.loads(raw) if raw else {}
                    if not isinstance(obj, dict):
                        obj = {}
                except Exception:
                    if on_error == "raise":
                        raise
                    obj = {}
                parsed.append(obj)
            for k, t in sch.items():
                cast = _SCHEMA_CASTS[t]
                pdf[k] = [
                    (cast(p[k]) if k in p and p[k] is not None else None)
                    for p in parsed]
            yield pdf[in_cols + list(sch)]

    types = {"boolean": "boolean", "string": "string", "date": "string"}
    fields = ", ".join(f"{n} {t}" for n, t in entities.dtypes)
    out_fields = ", ".join(f"{k} {types[t]}" for k, t in sch.items())
    out = ents.mapInPandas(run, f"{fields}, {out_fields}")
    for k, t in sch.items():
        if t == "date":
            out = out.withColumn(k, F.to_date(F.col(k)))
    return out
