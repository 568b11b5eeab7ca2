"""Property-based invariants for the dedup family.

Two layers: the prefix-filtering inequality that makes
ngram_jaccard_pairs sub-quadratic is checked pure-Python over arbitrary
set pairs (hypothesis), and the distributed pipelines are checked
against a brute-force Python oracle on seeded random corpora designed
to force shingle collisions.
"""

from __future__ import annotations

import math
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from d365fo_db_sync_spark.operators import dedup

#: driver-window tier: value-equality / contract tests (pytest -m fast)
pytestmark = pytest.mark.fast


@given(
    a=st.sets(st.integers(min_value=0, max_value=30), min_size=1, max_size=20),
    b=st.sets(st.integers(min_value=0, max_value=30), min_size=1, max_size=20),
    t=st.floats(min_value=0.05, max_value=1.0, allow_nan=False),
)
@settings(max_examples=500, deadline=None)
def test_prefix_filter_completeness(a, b, t):
    """The AllPairs bound _prefix_filter_candidates relies on: under ANY
    global element ordering, two sets with Jaccard >= t must share an
    element within their first `sz - floor(t*sz) + 1` elements. If this
    inequality were wrong, the distributed join would silently DROP
    qualifying pairs — the worst failure mode for a dedup engine."""
    inter = len(a & b)
    jac = inter / (len(a) + len(b) - inter)
    if jac < t:
        return  # bound only constrains qualifying pairs
    prefix_a = set(sorted(a)[: len(a) - math.floor(t * len(a)) + 1])
    prefix_b = set(sorted(b)[: len(b) - math.floor(t * len(b)) + 1])
    assert prefix_a & prefix_b, (
        f"qualifying pair (J={jac:.3f} >= {t:.3f}) with disjoint prefixes"
    )


def _random_corpus(seed: int, n_docs: int = 40) -> list[tuple[int, str]]:
    """Low-entropy corpus: a tiny vocabulary plus near-duplicate pairs
    made by light token edits, so shingles collide heavily."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]
    docs = []
    for i in range(n_docs):
        toks = [rng.choice(vocab) for _ in range(rng.randrange(4, 25))]
        docs.append((i, " ".join(toks)))
        if rng.random() < 0.4:  # a near-dup twin with one token changed
            twin = list(toks)
            twin[rng.randrange(len(twin))] = rng.choice(vocab)
            docs.append((n_docs + i, " ".join(twin)))
    return docs


def _brute_force_pairs(
    docs: list[tuple[int, str]], n: int, threshold: float
) -> dict[tuple[int, int], float]:
    def sh(text):
        toks = text.split()
        wins = max(len(toks) - n + 1, 1)
        return {" ".join(toks[i : i + n]) for i in range(wins)}

    sets = {i: sh(t) for i, t in docs}
    out = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = sets[ids[x]], sets[ids[y]]
            inter = len(a & b)
            jac = round(inter / (len(a) + len(b) - inter), 6)
            if jac >= threshold:
                out[(ids[x], ids[y])] = jac
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_jaccard_pairs_match_bruteforce(spark, seed):
    docs = _random_corpus(seed)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=0.6
        ).collect()
    }
    assert got == _brute_force_pairs(docs, 3, 0.6)


def test_jaccard_pairs_singleton_prune_edges(spark):
    """The r16 singleton prune (df_g = 1 shingles dropped before the
    prefix rank window) must not change results on the shapes it
    touches hardest: exact duplicates embedded in a corpus of fully
    UNIQUE documents (every non-shared shingle has df 1 — such docs
    now contribute zero prefix rows), and a doc sharing only its
    rarest shingle."""
    docs = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon zeta"),  # exact dup of 0
        (2, " ".join(f"u2w{i}" for i in range(9))),  # all shingles unique
        (3, " ".join(f"u3w{i}" for i in range(12))),  # all shingles unique
        (4, "alpha beta gamma nine ten eleven twelve"),  # partial overlap
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for t in (0.3, 0.8, 1.0):
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup.ngram_jaccard_pairs(
                df, "doc_id", "text", n=3, threshold=t
            ).collect()
        }
        assert got == _brute_force_pairs(docs, 3, t)


@pytest.mark.parametrize("seed", [0, 1])
def test_minhash_verified_equals_exact(spark, seed):
    """LSH candidates -> exact verify must equal the exact pair set:
    64 hashes / 32 bands makes the miss probability (1-t^2)^32
    negligible at t=0.8, and the verify stage removes any false
    positives, so the pipelines are interchangeable."""
    docs = _random_corpus(seed)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sets = dedup.shingle_sets(df, "doc_id", "text", 3)
    cands = dedup.minhash_lsh_candidates(
        df, "doc_id", "text", num_hashes=64, bands=32, shingle_n=3, sets=sets
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=0.8, candidates=cands, sets=sets
        ).collect()
    }
    assert got == _brute_force_pairs(docs, 3, 0.8)


class TestParagraphDedup:
    """Corpus-wide keep-first paragraph dedup: window construction,
    first-occurrence ordering, reassembly, and edge cases."""

    def _dd(self, spark, rows, para_tokens=4):
        from d365fo_db_sync_spark.operators import dedup

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {
            r["doc_id"]: (r["kept_text"], r["n_kept"], r["n_dropped"])
            for r in dedup.paragraph_dedup(
                df, "doc_id", "text", para_tokens=para_tokens
            ).collect()
        }

    def test_repeated_paragraph_keeps_first_occurrence(self, spark):
        boiler = "subscribe to our newsletter now"  # 5 tokens
        rows = [
            (1, f"{boiler} unique one content here"),
            (2, f"{boiler} totally different body text"),
            (3, f"{boiler} third document payload words"),
        ]
        out = self._dd(spark, rows, para_tokens=5)
        # para 0 of each doc is the shared boilerplate; only doc 1 keeps it
        assert out[1][0].startswith(boiler)
        assert not out[2][0].startswith(boiler)
        assert not out[3][0].startswith(boiler)
        assert out[2][2] == 1 and out[3][2] == 1  # one dropped each
        # the unique tails all survive
        assert "unique one content here" in out[1][0]
        assert "totally different body text" in out[2][0]
        assert "third document payload words" in out[3][0]

    def test_duplicate_inside_one_document(self, spark):
        rows = [(7, "a b c d a b c d e f g h")]
        out = self._dd(spark, rows, para_tokens=4)
        kept, n_kept, n_dropped = out[7]
        assert kept == "a b c d e f g h"
        assert (n_kept, n_dropped) == (2, 1)

    def test_unique_corpus_is_identity_modulo_whitespace(self, spark):
        rows = [(1, "alpha beta gamma delta"), (2, "eps zeta eta theta iota")]
        out = self._dd(spark, rows, para_tokens=4)
        assert out[1] == ("alpha beta gamma delta", 1, 0)
        assert out[2] == ("eps zeta eta theta iota", 2, 0)

    def test_empty_and_whitespace_docs_survive_with_empty_text(self, spark):
        rows = [(1, ""), (2, "   "), (3, "real words here")]
        out = self._dd(spark, rows, para_tokens=4)
        assert out[1] == ("", 0, 0)
        assert out[2] == ("", 0, 0)
        assert out[3] == ("real words here", 1, 0)

    def test_partitioning_invariant(self, spark):
        from d365fo_db_sync_spark.operators import dedup

        rows = [(i, f"tok{i % 5} w x y z common suffix block") for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = sorted(
            map(tuple, dedup.paragraph_dedup(df, para_tokens=4).collect())
        )
        b = sorted(
            map(
                tuple,
                dedup.paragraph_dedup(
                    df.repartition(11, "doc_id"), para_tokens=4
                ).collect(),
            )
        )
        assert a == b


class TestContainmentPairs:
    def test_quoted_document_detected_despite_tiny_jaccard(self, spark):
        from d365fo_db_sync_spark.operators import dedup

        short = " ".join(f"q{i}" for i in range(8))
        long = short + " " + " ".join(f"body{i}" for i in range(80))
        df = spark.createDataFrame(
            [(1, short), (2, long), (3, "totally unrelated words here")],
            "doc_id long, text string",
        )
        got = {
            (r["id_a"], r["id_b"]): r["containment"]
            for r in dedup.containment_pairs(
                df, "doc_id", "text", n=3, threshold=0.9
            ).collect()
        }
        assert got.get((1, 2)) == 1.0  # short fully contained in long
        assert (2, 1) not in got  # the reverse direction is far below t
        assert not any(3 in k for k in got)
        # and symmetric jaccard would have missed it
        jac = dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=0.9
        ).collect()
        assert not any({r["id_a"], r["id_b"]} == {1, 2} for r in jac)

    def test_matches_bruteforce(self, spark):
        import itertools
        import random

        from d365fo_db_sync_spark.operators import dedup

        rng = random.Random(11)
        vocab = [f"w{i}" for i in range(30)]
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(6, 30))))
            for i in range(25)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        t = 0.6
        got = {
            (r["id_a"], r["id_b"]): r["containment"]
            for r in dedup.containment_pairs(
                df, "doc_id", "text", n=3, threshold=t
            ).collect()
        }

        def sh(text):
            toks = text.split()
            k = max(len(toks) - 2, 1)
            return {" ".join(toks[i : i + 3]) for i in range(k)}

        want = {}
        for (ia, ta), (ib, tb) in itertools.permutations(rows, 2):
            sa, sb = sh(ta), sh(tb)
            c = round(len(sa & sb) / len(sa), 6)
            if c >= t:
                want[(ia, ib)] = c
        assert got == want
