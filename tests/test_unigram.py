"""Unigram-LM tokenizer (operators/unigram.py): dp unit checks,
training behavior, determinism, guards."""

import pytest


def test_viterbi_hand_computed():
    from edsnlp_spark.operators.unigram import _viterbi

    vocab = {"a": -10, "b": -20, "c": -30, "ab": -25, "abc": -28,
             "ca": -15}
    # 'abc'+'a' = -38 beats 'ab'+'ca' = -40 and singles = -60
    pieces, comb = _viterbi("abca", vocab, unk=-99, max_len=3)
    assert pieces == ["abc", "a"]
    assert comb == (-38) * 64 - 2
    # unknown single char falls back to unk
    pieces, comb = _viterbi("x", vocab, unk=-99, max_len=3)
    assert pieces == ["x"] and comb == -99 * 64 - 1
    # empty word
    assert _viterbi("", vocab, unk=-99, max_len=3) == ([], 0)


def test_viterbi_rejects_overlong_word():
    from edsnlp_spark.operators.unigram import _viterbi

    with pytest.raises(ValueError, match="longer than"):
        _viterbi("x" * 64, {"x": -1}, unk=-9, max_len=6)


def test_unigram_train_learns_compound_pieces(spark):
    """'sun' and 'flower' dominate the corpus, so the trained
    vocabulary segments the rarer compound 'sunflower' into exactly
    those two pieces."""
    from edsnlp_spark.operators.unigram import (
        unigram_encode_words, unigram_train)

    docs = spark.createDataFrame(
        [(i, "sun flower " * 20 + "sunflower") for i in range(4)],
        "doc_id long, text string")
    # trailing space in the repeat makes words like '' appear; the
    # split model tolerates them (empty word -> 0 pieces)
    vocab, unk = unigram_train(docs, vocab_size=50, seed_size=100,
                               max_piece_len=6, iterations=2)
    assert "sun" in vocab and "flower" in vocab
    words = spark.createDataFrame([("sunflower",)], "word string")
    row = unigram_encode_words(words, vocab, unk).collect()[0]
    assert row.n_pieces == 2
    assert row.pieces_str == "sun|flower"


def test_unigram_train_deterministic(spark):
    from edsnlp_spark.operators.unigram import unigram_train

    docs = spark.createDataFrame(
        [(i, "alpha beta alphabeta gamma") for i in range(6)],
        "doc_id long, text string")
    a = unigram_train(docs, vocab_size=40, seed_size=80, iterations=2)
    b = unigram_train(docs, vocab_size=40, seed_size=80, iterations=2)
    assert a == b


def test_unigram_empty_and_encode_memo(spark):
    from edsnlp_spark.operators.unigram import unigram_encode_words

    vocab = {"a": -10, "b": -20}
    words = spark.createDataFrame(
        [("",), ("a",), ("ab",), ("a",)], "word string")
    rows = {(r.word, r.n_pieces, r.score_q)
            for r in unigram_encode_words(words, vocab, -99).collect()}
    assert ("", 0, 0) in rows
    assert ("a", 1, -10) in rows
    assert ("ab", 2, -30) in rows


def test_viterbi_matches_bruteforce_enumeration():
    """Property: the dp's combined int equals the max over ALL 2^(L-1)
    segmentations (pieces limited to max_len, unknown multi-char
    pieces disallowed, unknown single chars scored unk)."""
    import itertools
    import random

    from edsnlp_spark.operators.unigram import _COMB, _viterbi

    rnd = random.Random(11)
    alphabet = "abc"
    for trial in range(40):
        L = rnd.randint(1, 8)
        word = "".join(rnd.choice(alphabet) for _ in range(L))
        # random vocab over substrings (plus maybe-missing singles)
        vocab = {}
        for i in range(L):
            for j in range(i + 1, min(i + 4, L) + 1):
                if rnd.random() < 0.6:
                    vocab[word[i:j]] = -rnd.randint(1, 500)
        unk = -900

        def seg_score(cuts):
            total, prev = 0, 0
            for c in list(cuts) + [L]:
                piece = word[prev:c]
                prev = c
                if not piece:
                    continue
                if len(piece) > 3:
                    return None
                s = vocab.get(piece)
                if s is None:
                    if len(piece) != 1:
                        return None
                    s = unk
                total += s * _COMB - 1
            return total

        best = None
        for k in range(L):
            for cuts in itertools.combinations(range(1, L), k):
                s = seg_score(cuts)
                if s is not None and (best is None or s > best):
                    best = s
        _, comb = _viterbi(word, vocab, unk, max_len=3)
        assert comb == best, (word, vocab, comb, best)
