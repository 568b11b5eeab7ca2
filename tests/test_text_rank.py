"""BM25 / TF-IDF ranking contracts (operators/text_rank.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators import text_rank


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark spark spark merge"),
        (2, "spark merge"),
        (3, "merge merge merge merge merge merge"),
        (4, "stream table scan"),
        (5, "vector"),
        (6, "table scan filter join"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bm25_reference(corpus: dict[int, list[str]], terms, k1=1.2, b=0.75):
    """Plain-Python BM25 for cross-checking the distributed plan."""
    n = len(corpus)
    avgdl = sum(len(t) for t in corpus.values()) / n
    df = {t: sum(1 for toks in corpus.values() if t in toks) for t in terms}
    out = {}
    for doc, toks in corpus.items():
        s = 0.0
        hit = False
        for t in terms:
            tf = toks.count(t)
            hit = hit or tf > 0
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * len(toks) / avgdl))
        if hit:
            out[doc] = s
    return out


def test_bm25_matches_reference(docs):
    terms = ("spark", "merge", "vector")
    got = {
        r["doc_id"]: r["bm25"] for r in text_rank.bm25_score(docs, terms).collect()
    }
    corpus = {
        r["doc_id"]: r["text"].split() for r in docs.collect()
    }
    want = _bm25_reference(corpus, terms)
    assert set(got) == set(want)
    for doc in want:
        assert got[doc] == pytest.approx(want[doc], rel=1e-12)


def test_bm25_topk_order(docs):
    top = text_rank.bm25_topk(docs, ("spark",), k=2).collect()
    # doc 1 has tf=3, doc 2 tf=1: saturation keeps 1 above 2
    assert [r["doc_id"] for r in top] == [1, 2]
    assert top[0]["bm25"] > top[1]["bm25"]


def test_bm25_requires_terms(docs):
    with pytest.raises(ValueError):
        text_rank.bm25_score(docs, ())


def test_tfidf_vectors_shape_and_zeroes(docs):
    vocab = ("spark", "absentterm")
    rows = {r["doc_id"]: r["tfidf"] for r in text_rank.tfidf_vectors(docs, vocab).collect()}
    assert all(len(v) == 2 for v in rows.values())
    # absent term contributes 0 weight everywhere (tf=0)
    assert all(v[1] == 0.0 for v in rows.values())
    # tf scaling: doc 1 (tf=3) weight is 3x doc 2 (tf=1)
    assert rows[1][0] == pytest.approx(3 * rows[2][0], rel=1e-12)
    assert rows[4][0] == 0.0


def test_bm25_stats_row_is_broadcast(docs):
    plan = text_rank.bm25_score(docs, ("spark",))._jdf.queryExecution().executedPlan().toString()
    # the 1-row stats frame must be the broadcast side; a shuffled join
    # here would re-shuffle the whole corpus at scale
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_tfidf_keywords_reference_and_ranking(spark, docs):
    """Top-k keywords match a plain-Python TF-IDF reference, the
    distinguishing term outranks the corpus-saturating one, ties break
    by token text, and k bounds per-doc output."""
    corpus = {
        r["doc_id"]: r["text"].split() for r in docs.collect()
    }
    n = len(corpus)

    def ref(doc_id):
        toks = corpus[doc_id]
        out = []
        for t in set(toks):
            tf = toks.count(t)
            df = sum(1 for v in corpus.values() if t in v)
            out.append((round(tf * math.log((n + 1) / (df + 1)), 6), t, tf, df))
        out.sort(key=lambda r: (-r[0], r[1]))
        return out

    got = text_rank.tfidf_keywords(docs, k=2).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r["doc_id"], r["rnk"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        assert len(rows) <= 2
        want = ref(doc_id)[: len(rows)]
        for r, (score, tok, tf, df) in zip(rows, want):
            assert (r["token"], r["tf"], r["df"]) == (tok, tf, df), (doc_id, r)
            assert r["tfidf"] == pytest.approx(score, abs=1e-9)
    # doc 1: "spark" (tf=3, df=2) must outrank "merge" (tf=1, df=3)
    assert by_doc[1][0]["token"] == "spark"
    # doc 6: all terms tf=1; "filter"/"join" (df=1) tie ahead of
    # "scan"/"table" (df=2) and break alphabetically
    assert [r["token"] for r in by_doc[6]] == ["filter", "join"]
    with pytest.raises(ValueError):
        text_rank.tfidf_keywords(docs, k=0)


def test_tfidf_keywords_plan_shape(docs):
    """The 1-row N frame must broadcast (a shuffled join here would
    re-shuffle the corpus at scale), and no more than three exchanges
    may appear in the plan (tf agg, token window, doc window)."""
    plan = (
        text_rank.tfidf_keywords(docs, k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 3, plan


class TestNpmiCollocations:
    def test_matches_bruteforce_and_bounds(self, spark):
        import math
        from collections import Counter

        from d365fo_db_sync_spark.operators.text_rank import npmi_collocations

        docs = [
            "the quick brown fox", "the quick dog", "brown fox jumps",
            "the lazy dog sleeps", "quick brown fox runs", None, "",
        ]
        df = spark.createDataFrame([(d,) for d in docs], "text string")
        got = {
            (r["a"], r["b"]): r
            for r in npmi_collocations(df, min_count=2).collect()
        }
        toks = [d.lower().split() for d in docs if d]
        uni = Counter(t for ts in toks for t in ts)
        big = Counter(
            (ts[i], ts[i + 1]) for ts in toks for i in range(len(ts) - 1)
        )
        n = sum(uni.values())
        exp = {k: c for k, c in big.items() if c >= 2}
        assert set(got) == set(exp)
        for (a, b), c in exp.items():
            p_ab, p_a, p_b = c / n, uni[a] / n, uni[b] / n
            pmi = math.log(p_ab / (p_a * p_b))
            r = got[(a, b)]
            assert r["count"] == c
            assert abs(r["pmi"] - pmi) < 1e-12
            assert abs(r["npmi"] - pmi / -math.log(p_ab)) < 1e-12
            assert -1 - 1e-12 <= r["npmi"] <= 1 + 1e-12

    def test_perfect_association_is_one(self, spark):
        from d365fo_db_sync_spark.operators.text_rank import npmi_collocations

        df = spark.createDataFrame(
            [("san francisco",), ("san francisco",), ("oakland",)],
            "text string",
        )
        rows = npmi_collocations(df, min_count=2).collect()
        assert len(rows) == 1
        assert rows[0]["a"] == "san"
        # mathematically exactly 1; floating point may land one ulp shy
        assert abs(rows[0]["npmi"] - 1.0) < 1e-12

    def test_min_count_validation(self, spark):
        from d365fo_db_sync_spark.operators.text_rank import npmi_collocations

        df = spark.createDataFrame([("x",)], "text string")
        import pytest

        with pytest.raises(ValueError, match="min_count"):
            npmi_collocations(df, min_count=0)


class TestApplyCollocations:
    def _greedy(self, toks, ps, sep="_"):
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and (toks[i], toks[i + 1]) in ps:
                out.append(toks[i] + sep + toks[i + 1])
                i += 2
            else:
                out.append(toks[i])
                i += 1
        return out

    def test_matches_greedy_bruteforce(self, spark):
        import random

        from d365fo_db_sync_spark.operators.text_rank import apply_collocations

        rng = random.Random(11)
        vocab = ["a", "b", "c", "d", "e"]
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 30))))
            for i in range(60)
        ]
        ps = {("a", "b"), ("b", "b"), ("c", "d"), ("e", "a")}
        df = spark.createDataFrame(docs, "doc_id long, text string")
        ph = spark.createDataFrame(sorted(ps), "a string, b string")
        got = {
            r["doc_id"]: (r["text_phrased"], r["n_merges"], r["n_tokens_out"])
            for r in apply_collocations(df, ph).collect()
        }
        for i, text in docs:
            toks = text.split()
            exp = self._greedy(toks, ps)
            n_merges = sum(1 for t in exp if "_" in t)
            assert got[i] == (" ".join(exp), n_merges, len(exp)), (i, text)

    def test_overlap_chains_merge_greedily(self, spark):
        from d365fo_db_sync_spark.operators.text_rank import apply_collocations

        df = spark.createDataFrame(
            [(1, "new york york times"), (2, "x x x x x"), (3, None)],
            "doc_id long, text string",
        )
        ph = spark.createDataFrame(
            [("new", "york"), ("york", "times"), ("x", "x")], "a string, b string"
        )
        got = {r["doc_id"]: r["text_phrased"] for r in apply_collocations(df, ph).collect()}
        assert got[1] == "new_york york_times"
        assert got[2] == "x_x x_x x"  # five x's: two merges, one loner
        assert got[3] == ""

    def test_phrases_schema_validation(self, spark):
        from d365fo_db_sync_spark.operators.text_rank import apply_collocations

        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        bad = spark.createDataFrame([("a",)], "a string")
        import pytest

        with pytest.raises(ValueError, match="missing 'b'"):
            apply_collocations(df, bad)


def test_learn_apply_phrases_surfaces_trigrams(spark):
    """The multi-pass pin: one pass can only produce bigram merges
    (greedy parity consumes the merged token); the second pass,
    re-learning on the rewritten corpus, fuses (bigram_token, word)
    into the trigram — and a corpus already at its fixed point
    rewrites to itself."""
    from d365fo_db_sync_spark.operators.text_rank import learn_apply_phrases

    docs = spark.createDataFrame(
        [(i, "new york times reported quietly") for i in range(10)]
        + [(100 + i, f"filler{i} alone here") for i in range(3)],
        "doc_id long, text string",
    )
    one = {
        r["doc_id"]: r["text_phrased"]
        for r in learn_apply_phrases(
            docs, rounds=1, min_count=5, npmi_threshold=0.3
        ).collect()
    }
    # pass 1: every adjacent pair qualifies; greedy parity over the
    # 4-position run keeps positions 0 and 2
    assert one[0] == "new_york times_reported quietly"

    two = learn_apply_phrases(docs, rounds=2, min_count=5, npmi_threshold=0.3)
    got = {r["doc_id"]: r for r in two.collect()}
    # pass 2 fuses (new_york, times_reported) — the 4-gram emerging
    # from re-learning on bigram tokens, impossible in one pass
    assert got[0]["text_phrased"] == "new_york_times_reported quietly"
    assert got[0]["n_merges"] == 1  # last round's merges only
    assert got[0]["n_tokens_out"] == 2
    # untouched docs ride through every round byte-identical
    assert got[101]["text_phrased"] == "filler1 alone here"
    assert got[101]["n_merges"] == 0

    # pass 3 finishes the fusion; pass 4 is the fixed point (single
    # tokens carry no bigrams, fillers never clear min_count)
    three = {
        r["doc_id"]: r["text_phrased"]
        for r in learn_apply_phrases(
            docs, rounds=3, min_count=5, npmi_threshold=0.3
        ).collect()
    }
    assert three[0] == "new_york_times_reported_quietly"
    four = {
        r["doc_id"]: r["text_phrased"]
        for r in learn_apply_phrases(
            docs, rounds=4, min_count=5, npmi_threshold=0.3
        ).collect()
    }
    assert four == three

    import pytest

    with pytest.raises(ValueError, match="rounds"):
        learn_apply_phrases(docs, rounds=0)
