"""Fuzzy span re-alignment: land spans annotated on an altered copy of a
text (an LLM's echo of its input, an older revision of a document) back
onto the SOURCE text.

Parity target: ``edsnlp/utils/fuzzy_alignment.py:193-460`` (``align``),
as used by eds.llm_markup_extractor
(``edsnlp/pipes/llm/llm_markup_extractor/llm_markup_extractor.py:328-354``)
to transfer entity offsets from the model's (possibly paraphrased,
re-wrapped or truncated) markup echo into source-text coordinates.

Algorithm (reference semantics, re-expressed):

1. collapse every whitespace run to a single space in BOTH texts, keeping
   a per-character position map for the source so results can be emitted
   in RAW source coordinates (the reference tracks the same information
   as a ``DeltaCollection`` of edits; a direct char map is equivalent
   here because the only edit is whitespace collapsing, and span edges
   map identically on non-space characters);
2. for each span, search the source for EXACT occurrences of the span
   text (spans of <= 2 chars are widened to the following word, else to
   a 10-char window, before the search — and dropped as unalignable when
   still tiny and matching > 20 places);
3. when the span text itself is nowhere in the source, retry with the 10
   characters FOLLOWING the span ("begin_is_end" mode: the chosen
   candidate's start becomes the span's END);
4. score every candidate by context similarity: difflib ratios of the
   left and right contexts at several widths, combined with the
   reference's weight scheme [(20, .70), (50, .20), (100, .15),
   (400, .10), (1000, .05)] and normalized by the total weight;
5. keep the best candidate if its score clears ``threshold`` (the LLM
   pipe passes 0.0: any exact occurrence wins), else mark the span
   unsure/missing.
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher

# (context width, weight) — the reference's sim_scheme default.
SIM_SCHEME: list[tuple[int, float]] = [
    (20, 0.70), (50, 0.20), (100, 0.15), (400, 0.10), (1000, 0.05),
]
_TOTAL_W = sum(w for _, w in SIM_SCHEME)
_WS_RUN = re.compile(r"\s+")


def _collapse(text: str) -> tuple[str, list[int], list[int]]:
    """Collapse whitespace runs to single spaces.

    Returns (collapsed, raw_start, raw_end) where, for collapsed char
    ``c``, ``raw_start[c]`` is the raw index of its first source char
    and ``raw_end[c]`` the raw index one past its last (a collapsed
    space stands for the whole run).  Sentinel entries at the end map
    the one-past-the-end position.
    """
    out: list[str] = []
    raw_start: list[int] = []
    raw_end: list[int] = []
    i, n = 0, len(text)
    while i < n:
        if text[i].isspace():
            j = i
            while j < n and text[j].isspace():
                j += 1
            out.append(" ")
            raw_start.append(i)
            raw_end.append(j)
            i = j
        else:
            out.append(text[i])
            raw_start.append(i)
            raw_end.append(i + 1)
            i += 1
    raw_start.append(n)
    raw_end.append(n)
    return "".join(out), raw_start, raw_end


def _to_collapsed(text: str) -> tuple[str, list[int]]:
    """Collapsed text + map raw index -> collapsed index (chars inside a
    whitespace run all map to the run's single space)."""
    coll: list[str] = []
    c_of: list[int] = []
    i, n = 0, len(text)
    while i < n:
        if text[i].isspace():
            j = i
            while j < n and text[j].isspace():
                j += 1
            idx = len(coll)
            coll.append(" ")
            c_of.extend([idx] * (j - i))
            i = j
        else:
            c_of.append(len(coll))
            coll.append(text[i])
            i += 1
    c_of.append(len(coll))
    return "".join(coll), c_of


def _similarity(a: str, b: str) -> float:
    return SequenceMatcher(None, a, b).ratio()


def _contexts(text: str, begin: int, end: int,
              scheme: list[tuple[int, float]]) -> list[tuple[str, str]]:
    return [(text[:begin][-n:], text[end:][:n]) for n, _ in scheme]


def _score(old_ctx: list[tuple[str, str]],
           new_ctx: list[tuple[str, str]],
           scheme: list[tuple[int, float]]) -> float:
    s = 0.0
    for (ol, orr), (nl, nr), (_, w) in zip(old_ctx, new_ctx, scheme):
        s += (_similarity(ol, nl) + _similarity(orr, nr)) * w
    return s / sum(w for _, w in scheme)


def align_spans(old_text: str, spans: list[tuple[int, int]],
                new_text: str,
                threshold: float = 1.0,
                sim_scheme: list[tuple[int, float]] | None = None,
                ) -> list[tuple[int, int] | None]:
    """Map each (begin, end) span from ``old_text`` coordinates to RAW
    ``new_text`` coordinates; ``None`` where the span is missing or the
    best candidate scores at-or-under ``threshold``.
    """
    scheme = sim_scheme or SIM_SCHEME
    old_coll, old_c_of = _to_collapsed(old_text)
    new_coll, new_raw_start, new_raw_end = _collapse(new_text)

    results: list[tuple[int, int] | None] = []
    for begin, end in spans:
        if (begin, end) == (0, 0):
            results.append((0, 0))
            continue
        b = old_c_of[min(begin, len(old_text))]
        e = old_c_of[max(min(end, len(old_text)) - 1, 0)] + 1 if end > begin else b
        frag = old_coll[b:e]
        orig_len_tiny = len(frag) <= 2
        if orig_len_tiny:
            # widen: the word starting at the span, else a 10-char window
            rest = old_coll[b:].split()
            frag = rest[0] if rest else ""
            if len(frag) <= 2:
                frag = old_coll[b:b + 10]
        search_end = b + len(frag)
        old_ctx = _contexts(old_coll, b, search_end, scheme)

        cands = [m.span() for m in re.finditer(re.escape(frag), new_coll)] \
            if frag else []
        if orig_len_tiny and len(cands) > 20:
            results.append(None)
            continue

        begin_is_end = False
        if not cands:
            # anchor on the 10 chars AFTER the span instead
            begin_is_end = True
            frag = old_coll[e:e + 10]
            old_ctx = _contexts(old_coll, e, e + 10, scheme)
            cands = [m.span() for m in re.finditer(re.escape(frag), new_coll)] \
                if frag else []
            if orig_len_tiny and len(cands) > 20:
                results.append(None)
                continue
            if not cands:
                results.append(None)
                continue

        scored = [(_score(old_ctx, _contexts(new_coll, cb, ce, scheme), scheme),
                   cb) for cb, ce in cands]
        best, cb = max(scored)
        if best <= threshold:
            results.append(None)
            continue
        if begin_is_end:
            nb, ne = cb - (e - b), cb
        else:
            nb, ne = cb, cb + (e - b)
        # back to RAW source coordinates
        nb = max(nb, 0)
        raw_b = new_raw_start[min(nb, len(new_coll))]
        raw_e = new_raw_end[ne - 1] if ne > nb else raw_b
        results.append((raw_b, raw_e))
    return results
