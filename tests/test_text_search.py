"""Positional inverted-index phrase search: brute-force model check,
overlap/repeat semantics, tokenization normalization, plan shape."""

from __future__ import annotations

import re

import pytest

from d365fo_db_sync_spark.operators.text_search import (
    phrase_search,
    redact_spans,
    tokenize_positions,
)


def _brute(docs: list[tuple[int, str]], phrases: list[str]) -> dict:
    """Reference: per (phrase, doc) count of all (overlapping) start
    positions plus the earliest one, on the same tokenization."""
    out = {}
    for doc_id, text in docs:
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        for p in phrases:
            pt = p.lower().split()
            starts = [
                i
                for i in range(len(toks) - len(pt) + 1)
                if toks[i : i + len(pt)] == pt
            ]
            if starts:
                out[(p, doc_id)] = (len(starts), starts[0])
    return out


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "a a a a"),  # overlapping 'a a' matches
    (3, "Table, TABLE; table!"),  # case + punctuation normalization
    (4, "merge batch merge batch merge"),  # repeated bigram, shared token
    (5, ""),  # empty document
    (6, "quick brown quick brown fox"),  # phrase prefix repeats
]
PHRASES = ["quick brown fox", "a a", "table table", "merge batch", "absent phrase"]


def test_matches_brute_force(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r["phrase"], r["doc_id"]): (r["n_matches"], r["first_start"])
        for r in phrase_search(df, PHRASES).collect()
    }
    assert got == _brute(DOCS, PHRASES)
    # spot-pin the tricky rows so the model itself is audited
    assert got[("a a", 2)] == (3, 0)  # overlapping starts 0,1,2
    assert got[("table table", 3)] == (2, 0)  # punctuation-separated
    assert got[("quick brown fox", 6)] == (1, 2)  # prefix repeat skipped
    assert ("absent phrase", 1) not in got


def test_empty_phrase_raises(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="tokenizes to nothing"):
        phrase_search(df, ["  ,; "])


def test_tokenize_positions_are_dense(spark):
    df = spark.createDataFrame([(9, " x--y  z ")], "doc_id long, text string")
    rows = sorted(
        (r["pos"], r["tok"])
        for r in tokenize_positions(df).collect()
    )
    assert rows == [(0, "x"), (1, "y"), (2, "z")]


def test_phrase_table_is_broadcast(spark):
    """The phrase side must broadcast — a shuffled join on `tok` would
    shuffle the full posting list against an 8-row table."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = phrase_search(df, PHRASES)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


@pytest.mark.parametrize("seed", [3, 17, 91])
def test_random_low_entropy_corpus_matches_brute_force(spark, seed):
    """Randomized corpora from a tiny vocabulary (heavy repetition →
    overlapping and repeated-token matches everywhere) against the
    reference implementation, including phrases absent from the
    corpus and phrases of repeated tokens."""
    import random

    rng = random.Random(seed)
    vocab = ["a", "b", "c", "dd"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 25))))
        for i in range(30)
    ]
    phrases = [
        "a a",
        "b c b",
        "dd dd dd",
        "c",
        "zz yy",  # vocabulary miss
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["phrase"], r["doc_id"]): (r["n_matches"], r["first_start"])
        for r in phrase_search(df, phrases).collect()
    }
    assert got == _brute(docs, phrases), seed


def _brute_redact(docs, phrases, placeholder="<BLOCKED>"):
    out = {}
    ph = [[t for t in re.split(r"[^a-z0-9]+", p.lower()) if t] for p in phrases]
    for doc_id, text in docs:
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        covered, n_matches = set(), 0
        for pt in ph:
            for s in range(len(toks) - len(pt) + 1):
                if toks[s : s + len(pt)] == pt:
                    n_matches += 1
                    covered.update(range(s, s + len(pt)))
        kept, n_spans = [], 0
        for i, t in enumerate(toks):
            if i not in covered:
                kept.append(t)
            elif i - 1 not in covered:
                kept.append(placeholder)
                n_spans += 1
        out[doc_id] = (n_matches, n_spans, " ".join(kept))
    return out


def test_redact_spans_merges_overlaps_and_passes_clean_docs(spark):
    docs = [
        (1, "The quick, brown fox! Jumps over the lazy dog."),
        (2, "quick brown quick brown fox fox"),  # overlapping phrases
        (3, "nothing to see here"),              # clean passthrough
        (4, ""),                                 # empty document
        (5, "brown fox brown fox brown fox"),    # adjacent spans merge
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_matches"], r["n_spans"], r["redacted_text"])
        for r in redact_spans(df, ["brown fox", "quick brown"]).collect()
    }
    assert got == _brute_redact(docs, ["brown fox", "quick brown"])
    # the merge guarantee in one line: doc 2 has 3 occurrence sites
    # collapsed into 1 placeholder, and no 'brown' survives before it
    assert got[2] == (3, 1, "<BLOCKED> fox")


@pytest.mark.parametrize("seed", [7, 23])
def test_redact_spans_random_corpus_matches_brute_force(spark, seed):
    import random

    rng = random.Random(seed)
    vocab = ["a", "b", "c", "dd"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 25))))
        for i in range(30)
    ]
    phrases = ["a a", "b c", "dd", "zz miss"]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_matches"], r["n_spans"], r["redacted_text"])
        for r in redact_spans(df, phrases).collect()
    }
    assert got == _brute_redact(docs, phrases), seed


def test_redact_spans_null_text_passes_as_empty(spark):
    """NULL-text documents come through as zero-token documents with
    empty redacted_text and zero counts — not NULL strings that poison
    downstream length/quality features."""
    from d365fo_db_sync_spark.operators.text_search import redact_spans

    df = spark.createDataFrame(
        [(1, "brown fox runs"), (2, None)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["n_spans"], r["redacted_text"])
        for r in redact_spans(df, ["brown fox"]).collect()
    }
    assert got[1] == (1, 1, "<BLOCKED> runs")
    assert got[2] == (0, 0, "")
