"""Exact-substring (k-token-window) dedup: window enumeration,
cross-doc repeat stats, excision vs a brute-force model, hashed-key
equivalence, and the run-coverage property."""

from __future__ import annotations

import random
import re

import pytest

from d365fo_db_sync_spark.operators.exact_substr import (
    duplicate_token_stats,
    excise_repeated_windows,
    repeated_windows,
    token_windows,
)


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _brute_excise(docs, k, min_docs=2):
    """Reference model: enumerate windows, find cross-doc repeats,
    excise covered tokens."""
    wins = {}
    for doc_id, text in docs:
        toks = _toks(text)
        for s in range(len(toks) - k + 1):
            w = " ".join(toks[s : s + k])
            wins.setdefault(w, []).append((doc_id, s))
    dup = {w for w, occ in wins.items() if len({d for d, _ in occ}) >= min_docs}
    out = {}
    for doc_id, text in docs:
        toks = _toks(text)
        covered = set()
        for s in range(len(toks) - k + 1):
            if " ".join(toks[s : s + k]) in dup:
                covered.update(range(s, s + k))
        kept = [t for i, t in enumerate(toks) if i not in covered]
        n_spans = sum(1 for p in covered if p - 1 not in covered)
        out[doc_id] = (len(toks), len(covered), n_spans, " ".join(kept))
    return out


def test_known_shapes(spark):
    docs = [
        (1, "alpha beta gamma delta epsilon UNIQUE-ONE zeta"),
        (2, "intro words alpha beta gamma delta epsilon tail piece"),
        (3, "totally different content here nothing shared at all okay"),
        (4, "alpha beta gamma delta epsilon alpha beta gamma delta epsilon"),
        (5, "short"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rw = {r["w"]: (r["n_docs"], r["n_occ"]) for r in repeated_windows(df, 5).collect()}
    # the one shared 5-run: 3 docs, 4 occurrences (doc 4 holds it twice)
    assert rw == {"alpha beta gamma delta epsilon": (3, 4)}
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_tokens"], r["n_spans"], r["clean_text"])
        for r in excise_repeated_windows(df, 5).collect()
    }
    assert got == _brute_excise(docs, 5)
    # the within-doc second occurrence of a cross-doc window excises too
    assert got[4] == (10, 10, 1, "")
    # sub-k documents pass through untouched
    assert got[5] == (1, 0, 0, "short")


def test_repeated_run_excises_end_to_end(spark):
    """A shared run of length L > k is covered by its L-k+1 windows:
    the whole run must go, with no half-excised fragments at the
    edges."""
    shared = " ".join(f"tok{i}" for i in range(12))  # L=12 > k=5
    docs = [
        (1, f"one two {shared} three four"),
        (2, f"{shared} five six seven"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_dup_tokens"], r["n_spans"], r["clean_text"])
        for r in excise_repeated_windows(df, 5).collect()
    }
    assert got[1] == (12, 1, "one two three four")
    assert got[2] == (12, 1, "five six seven")


@pytest.mark.parametrize("seed,k", [(11, 4), (29, 6)])
def test_random_corpus_matches_brute_force(spark, seed, k):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(8)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 30))))
        for i in range(25)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_tokens"], r["n_spans"], r["clean_text"])
        for r in excise_repeated_windows(df, k).collect()
    }
    assert got == _brute_excise(docs, k), (seed, k)


def test_hashed_mode_equivalent_to_text_mode(spark):
    """xxhash64 window keys (the 100 TB shuffle shape) must reproduce
    the text-keyed decision exactly on a collision-free corpus."""
    rng = random.Random(101)
    vocab = [f"w{i}" for i in range(10)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(5, 40))))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = {
        r["doc_id"]: (r["n_dup_tokens"], r["clean_text"])
        for r in excise_repeated_windows(df, 5, hashed=False).collect()
    }
    b = {
        r["doc_id"]: (r["n_dup_tokens"], r["clean_text"])
        for r in excise_repeated_windows(df, 5, hashed=True).collect()
    }
    assert a == b
    ra = {(r["n_docs"], r["n_occ"]) for r in repeated_windows(df, 5).collect()}
    rb = {
        (r["n_docs"], r["n_occ"])
        for r in repeated_windows(df, 5, hashed=True).collect()
    }
    assert ra == rb


def test_stats_rollup(spark):
    docs = [
        (1, "a b c d e f", "s1"),
        (2, "x a b c d e tail", "s1"),
        (3, "p q r s t u v", "s2"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    got = {r["source"]: r for r in duplicate_token_stats(df, 5).collect()}
    assert got["s1"]["n_docs_total"] == 2
    assert got["s1"]["n_docs_affected"] == 2
    assert got["s1"]["n_dup_tokens"] == 10  # 'a b c d e' in both docs
    assert got["s2"]["n_dup_tokens"] == 0
    assert got["s2"]["dup_frac"] == 0.0
    assert got["s1"]["dup_frac"] == round(10 / 13, 6)


def test_validation_and_short_docs(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="k must be"):
        token_windows(df, 1)
    with pytest.raises(ValueError, match="min_docs"):
        repeated_windows(df, 3, min_docs=1)
    # doc shorter than k: zero windows, not a negative sequence blowup
    assert token_windows(df, 5).count() == 0


def test_null_text_rows_flow_as_zero_token_docs(spark):
    """A NULL-text document must come through excision as a 0-token
    document (n_tokens 0, clean_text ''), NOT as NULLs that skew the
    per-source sum(n_tokens)/dup_frac rollup."""
    docs = [
        (1, "a b c d e f", "s1"),
        (2, "x a b c d e tail", "s1"),
        (3, None, "s1"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    got = {r["doc_id"]: r for r in excise_repeated_windows(df, 5).collect()}
    assert (
        got[3]["n_tokens"],
        got[3]["n_dup_tokens"],
        got[3]["n_spans"],
        got[3]["clean_text"],
    ) == (0, 0, 0, "")
    stats = {r["source"]: r for r in duplicate_token_stats(df, 5).collect()}
    # the NULL doc counts as a 0-token doc: totals unchanged vs the
    # 2-doc corpus, n_docs_total includes it, dup_frac not NULLed
    assert stats["s1"]["n_docs_total"] == 3
    assert stats["s1"]["n_docs_affected"] == 2
    assert stats["s1"]["n_tokens"] == 13
    assert stats["s1"]["n_dup_tokens"] == 10
    assert stats["s1"]["dup_frac"] == round(10 / 13, 6)


def test_long_document_mostly_covered_rebuild_is_linear(spark):
    """The round-10 rebuild (sorted-cov run bounds + one slice per
    uncovered gap) on the tier's motivating workload: a long document
    that is MOSTLY boilerplate. 20k tokens per doc, ~50-63% covered —
    the r9 per-token array_contains scan was O(n_tokens x |cov|) here
    (~2x10^8 comparisons per doc); the run-slicing rebuild is
    O(n_tokens + n_runs). Correctness pinned against the brute model;
    the wall is measured in SCALE.md (round 10), not asserted."""
    blk = " ".join(f"b{i}" for i in range(100))  # 100-token boilerplate block
    rng = random.Random(5)
    mk = lambda j: " ".join(  # noqa: E731
        blk if rng.random() < 0.55 else f"u{j}x{i} " * 100
        for i in range(200)
    )  # ~20k tokens, ~55% covered by the shared block
    docs = [(j, mk(j)) for j in range(3)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_tokens"], r["n_spans"], r["clean_text"])
        for r in excise_repeated_windows(df, 8).collect()
    }
    assert got == _brute_excise(docs, 8)
    assert all(v[0] >= 19000 and v[1] >= 0.45 * v[0] for v in got.values())
