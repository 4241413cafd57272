"""Trainable-pipe surface: the mapInPandas/GPU plumbing (SURVEY.md §2.9).

Parity targets:
- eds.transformer (pipes/trainable/embeddings/transformer/transformer.py:
  60-547): long docs are chunked into overlapping windows (512/256
  default); overlapping token embeddings resolve to the occurrence most
  central in its window (:69-87).
- eds.ner_crf (pipes/trainable/ner_crf/ner_crf.py:57-640): token tagger
  whose decoded spans land in the SAME entities schema as rule matchers —
  the key design invariant.

Torch is not in this container, so the model forward is pluggable: the
default ``forward`` is a deterministic md5-based pseudo-embedding /
pseudo-tagger (clearly a stub).  Everything around it — window fan-out,
Arrow batching, most-central overlap resolution, span decode to the
entities plane — is real Spark and tested:

- window fan-out is a native ``explode`` over ``sequence`` (so Catalyst
  sees and can repartition the windowed rows, e.g. to GPU executors with
  a stage-level resource profile);
- the forward runs in ``mapInPandas`` (Arrow columnar transfer, one
  batch = one model minibatch; sort-by-length happens inside via
  pandas sort to cut padding — changelog.md:553's 2x trick);
- overlap resolution is a grouped ``min_by`` on distance-to-window-center.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _pseudo_vector(token: str, dim: int) -> list[float]:
    h = hashlib.md5(token.encode()).digest()
    return [h[i % 16] / 255.0 for i in range(dim)]


def window_tokens(notes: DataFrame, window: int = 128, stride: int = 64,
                  tokens_col: str = "tokens") -> DataFrame:
    """Fan a doc out into overlapping token windows (native explode).

    Output: (note_id, win_id, win_start, toks array<string>) — one row
    per window, ready for Arrow transfer to the model stage.
    """
    toks = F.col(tokens_col)
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    return (
        notes.select("note_id", toks.alias("__toks"),
                     F.explode(starts).alias("win_start"))
        .filter((F.col("win_start") < F.size("__toks")) & (F.size("__toks") > 0))
        .select(
            "note_id",
            (F.col("win_start") / stride).cast("int").alias("win_id"),
            "win_start",
            F.transform(
                F.slice(F.col("__toks"), F.col("win_start") + 1, window),
                lambda t: t["text"],
            ).alias("toks"),
        )
    )


def embed_windows(windows: DataFrame, dim: int = 16,
                  forward: Callable[[list[str]], list[list[float]]] | None = None,
                  ) -> DataFrame:
    """Model stage: one Arrow batch = one minibatch; rows sorted by
    length inside the batch to minimize padding waste."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fwd = forward or (lambda toks: [_pseudo_vector(t, dim) for t in toks])
        for pdf in batches:
            pdf = pdf.assign(__len=pdf["toks"].map(len)).sort_values("__len")
            out_rows = []
            for note_id, win_id, win_start, toks in zip(
                    pdf["note_id"], pdf["win_id"], pdf["win_start"], pdf["toks"]):
                vecs = fwd(list(toks))
                for i, v in enumerate(vecs):
                    out_rows.append((note_id, win_id, int(win_start) + i, v))
            yield pd.DataFrame(
                out_rows, columns=["note_id", "win_id", "tok_i", "emb"])

    return windows.mapInPandas(
        run, "note_id long, win_id int, tok_i int, emb array<float>")


def resolve_overlaps(embedded: DataFrame, window: int = 128) -> DataFrame:
    """Per token, keep the embedding from the window where the token is
    most central (transformer.py:69-87) — a grouped min_by, no UDF."""
    center = F.col("win_id") * F.lit(window // 2) + F.lit(window / 2.0)
    dist = F.abs(F.col("tok_i") - center)
    return embedded.groupBy("note_id", "tok_i").agg(
        F.min_by(F.col("emb"), F.struct(dist.alias("d"),
                                        F.col("win_id").alias("w"))).alias("emb")
    )


def transformer_embeddings(notes: DataFrame, window: int = 128,
                           stride: int = 64, dim: int = 16,
                           forward=None) -> DataFrame:
    """Full eds.transformer pipeline: fan-out -> model -> overlap resolve."""
    w = window_tokens(notes, window, stride)
    e = embed_windows(w, dim, forward)
    return resolve_overlaps(e, window)


def ner_crf_decode(notes: DataFrame,
                   tagger: Callable[[list[str]], list[str]] | None = None,
                   label_whitelist: tuple[str, ...] = ("ENT",),
                   tokens_col: str = "tokens") -> DataFrame:
    """BIO tag + decode to the entities plane (ner_crf.py:57-640 contract:
    ML spans share the rule-matcher schema).

    The default tagger is a deterministic stub (tags tokens whose md5
    starts with a hex digit < '4' — clearly fake); the decode from BIO
    runs in the same mapInPandas pass and emits char offsets from the
    token structs.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def default_tagger(toks: list[str]) -> list[str]:
            return [
                "B-ENT" if hashlib.md5(t.encode()).hexdigest()[0] < "4" else "O"
                for t in toks
            ]

        tag = tagger or default_tagger
        for pdf in batches:
            rows = []
            for note_id, toks in zip(pdf["note_id"], pdf[tokens_col]):
                texts = [t["text"] for t in toks]
                tags = tag(texts)
                i = 0
                while i < len(tags):
                    if tags[i].startswith("B-"):
                        label = tags[i][2:]
                        j = i + 1
                        while j < len(tags) and tags[j] == f"I-{label}":
                            j += 1
                        if label in label_whitelist:
                            rows.append((
                                note_id,
                                int(toks[i]["start"]), int(toks[j - 1]["end"]),
                                label,
                                " ".join(texts[i:j]),
                                "ml", i, j,
                            ))
                        i = j
                    else:
                        i += 1
            yield pd.DataFrame(rows, columns=[
                "note_id", "start_char", "end_char", "label",
                "lexical_variant", "span_type", "tok_start", "tok_end"])

    return notes.select("note_id", tokens_col).mapInPandas(
        run,
        "note_id long, start_char int, end_char int, label string, "
        "lexical_variant string, span_type string, tok_start int, tok_end int",
    )
