"""Semantic contract of the compression-ratio quality signal (the
rows-only `text_compression_quality` query's pytest half) + the
BPE-ish token-count extraction/staged equivalence pin."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators.text import (
    bpe_ish_token_count,
    bpe_ish_token_count_staged,
    compression_ratio,
)


def _ratios(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r["zlib_ratio"] for r in compression_ratio(df).collect()}


def test_repetitive_text_compresses_below_prose(spark):
    prose = (
        "The quick brown fox jumps over the lazy dog while seventeen "
        "quirky zebras vault backwards through mismatched garden hoops."
    ) * 4
    loop = "spam ham " * 60
    got = _ratios(spark, [(1, prose), (2, loop), (3, ""), (4, None)])
    assert got[2] < got[1] < 1.2
    assert got[2] < 0.1  # a pure loop collapses
    assert got[3] == 0.0 and got[4] == 0.0  # empty/null -> 0, not error


def test_ratio_is_deterministic_and_partitioning_invariant(spark):
    rows = [(i, f"doc {i} " + "xyz " * (i % 17)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, compression_ratio(df).collect()))
    b = sorted(map(tuple, compression_ratio(df.repartition(7)).collect()))
    assert a == b


def test_bpe_extraction_equals_staged_construction(spark):
    """The oracle-friendly single-pattern extraction must count exactly
    what the original staged replace-then-split construction counted —
    on adversarial literals AND the real sf0.01 corpus."""
    rows = [
        (1, "abc123def 45-6,7.8"),
        (2, "plain words only"),
        (3, "UPPER lower 2024: mix3d_tokens [bracketed] `tick`"),
        (4, ""),
        (5, "   \t\n  "),
        (6, "1234567890"),
        (7, "a1b2c3"),
        (8, "punct!!! only??? ---"),
        (9, "unicode naïve café 北京 42度"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    mism = df.select(
        bpe_ish_token_count("text").alias("a"),
        bpe_ish_token_count_staged("text").alias("b"),
    ).filter("a <> b")
    assert mism.count() == 0

    corpus = os.path.join(
        os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01"),
        "documents.parquet",
    )
    if os.path.exists(corpus):
        docs = spark.read.parquet(corpus)
        got = docs.agg(
            F.sum(bpe_ish_token_count("text")).alias("a"),
            F.sum(bpe_ish_token_count_staged("text")).alias("b"),
            F.sum(
                (bpe_ish_token_count("text") != bpe_ish_token_count_staged("text")).cast("int")
            ).alias("n_diff"),
        ).first()
        assert got["n_diff"] == 0 and got["a"] == got["b"]


def test_input_schema_not_mutated(spark):
    """compression_ratio must not mutate the input frame's cached
    schema (StructType.add is in-place) — regression guard."""
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    compression_ratio(df)
    assert [f.name for f in df.schema.fields] == ["doc_id", "text"]
    assert df.select("doc_id", "text").count() == 1


# --------------------------------------------------------- pii redaction


class TestPiiRedact:
    def _df(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )

    def test_redacts_each_type_with_placeholders(self, spark):
        from d365fo_db_sync_spark.operators.text import pii_redact

        rows = pii_redact(
            self._df(
                spark,
                [
                    "mail a@b.io now",
                    "dial (555) 867-5309 or 555-123-4567",
                    "host 10.0.0.1 up",
                    "clean document",
                ],
            )
        ).collect()
        got = {r["doc_id"]: (r["n_redacted"], r["redacted_text"]) for r in rows}
        assert got[0] == (1, "mail <EMAIL> now")
        assert got[1] == (2, "dial <PHONE> or <PHONE>")
        assert got[2] == (1, "host <IP> up")
        assert got[3] == (0, "clean document")

    def test_phone_inside_email_counts_once(self, spark):
        from d365fo_db_sync_spark.operators.text import pii_redact

        # the email's local part is phone-shaped: sequential counting
        # must see ONE redaction (the email), not two
        [r] = pii_redact(self._df(spark, ["call 555-123-4567@spam.example ok"])).collect()
        assert r["redacted_text"] == "call <EMAIL> ok"
        assert r["n_redacted"] == 1

    def test_placeholder_not_rescanned(self, spark):
        from d365fo_db_sync_spark.operators.text import pii_redact

        # a document that is ONLY pii: placeholders must not chain-match
        [r] = pii_redact(self._df(spark, ["a@b.io 10.0.0.1"])).collect()
        assert r["redacted_text"] == "<EMAIL> <IP>"
        assert r["n_redacted"] == 2


def test_frequent_shingles_counts_distinct_docs(spark):
    from d365fo_db_sync_spark.operators.dedup import frequent_shingles

    boiler = "all rights reserved"
    texts = [f"doc {i} body {boiler}" for i in range(4)] + [
        f"{boiler} {boiler} twice in one doc",  # within-doc repeat: still 1
        "unrelated content entirely",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {
        r["shingle"]: r["doc_freq"]
        for r in frequent_shingles(df, "doc_id", "text", n=3, min_docs=5).collect()
    }
    assert out == {boiler: 5}  # doc frequency, not occurrence count

    with pytest.raises(ValueError):
        frequent_shingles(df, "doc_id", "text", min_docs=0)


# ------------------------------------------------- quality classifier


def test_quality_classifier_decision_matches_rounded_logit(spark):
    from d365fo_db_sync_spark.operators.text import quality_classifier

    df = spark.createDataFrame(
        [
            (0, "the cat is on the mat and the dog is here too"),
            (1, "x!!! ??? ### $$$ %%%"),
            (2, "word " * 400),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in quality_classifier(df).collect()}
    for r in rows.values():
        assert r["keep"] == (r["quality_logit"] > 0)
    # stopword-rich prose scores above punctuation soup
    assert rows[0]["quality_logit"] > rows[1]["quality_logit"]


def test_quality_classifier_is_map_only(spark):
    from d365fo_db_sync_spark.operators.text import quality_classifier

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = quality_classifier(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero-shuffle scoring pass


# ------------------------------------------------ exact contamination


class TestExactContamination:
    def _frames(self, spark):
        corpus = spark.createDataFrame(
            [
                (0, "The QUICK brown fox jumps over the lazy dog"),
                (1, "nothing to see here"),
                (2, "a quick brown fox appears again"),
            ],
            "doc_id long, text string",
        )
        needles = spark.createDataFrame(
            [(100, "quick brown fox")], "bench_id long, needle string"
        )
        return corpus, needles

    def test_case_insensitive_containment(self, spark):
        from d365fo_db_sync_spark.operators.decontam import exact_contamination

        corpus, needles = self._frames(spark)
        got = sorted(
            (r["doc_id"], r["bench_id"])
            for r in exact_contamination(corpus, needles).collect()
        )
        assert got == [(0, 100), (2, 100)]

    def test_rejects_colliding_id_columns(self, spark):
        from d365fo_db_sync_spark.operators.decontam import exact_contamination

        corpus, needles = self._frames(spark)
        with pytest.raises(ValueError):
            exact_contamination(
                corpus, needles.withColumnRenamed("bench_id", "doc_id"),
                needle_id="doc_id",
            )

    def test_needles_are_broadcast(self, spark):
        from d365fo_db_sync_spark.operators.decontam import exact_contamination

        corpus, needles = self._frames(spark)
        plan = (
            exact_contamination(corpus, needles)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastNestedLoopJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # corpus never shuffled


def test_heavy_hitters_exact_matches_naive(spark):
    """heavy_hitters_exact == naive groupBy-and-threshold on a corpus
    engineered so candidates differ per partition, and the result is
    invariant to partitioning (the pigeonhole superset guarantee)."""
    import pytest

    from d365fo_db_sync_spark.operators.text import heavy_hitters_exact, tokens

    rows = []
    # "alpha" globally heavy; "beta" heavy only in a few rows; long
    # tail of singletons that no partition should emit
    for i in range(40):
        rows.append((i, "alpha alpha beta tail%d" % i))
    for i in range(40, 50):
        rows.append((i, "beta beta beta alpha x%d y%d" % (i, i)))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def naive(frame, k):
        from pyspark.sql import functions as F

        toks = frame.select(F.explode(tokens("text")).alias("token"))
        n = toks.count()
        return {
            (r["token"], r["cnt"], r["n_total"])
            for r in toks.groupBy("token")
            .agg(F.count("*").alias("cnt"))
            .withColumn("n_total", F.lit(n))
            .filter(F.col("cnt") * k > F.col("n_total"))
            .collect()
        }

    for k in (5, 20, 60):
        expected = naive(df, k)
        got = {
            (r["token"], r["cnt"], r["n_total"])
            for r in heavy_hitters_exact(df, "text", k=k).collect()
        }
        assert got == expected, (k, got, expected)
        # partitioning-invariant: skewed single-partition layout and a
        # wide shuffle produce the identical exact answer
        for parts in (1, 7):
            rep = {
                (r["token"], r["cnt"], r["n_total"])
                for r in heavy_hitters_exact(
                    df.repartition(parts), "text", k=k
                ).collect()
            }
            assert rep == expected, (k, parts)

    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters_exact(df, "text", k=1)


def test_bigram_logprob_heldout_and_fallback_tiers(spark):
    """bigram_logprob on held-out text: hand-computed add-one values,
    the per-w1 fallback for unseen pairs, and the final ln(1/(V+1))
    tier when training never produced the w1 symbol at all."""
    import math

    import pytest

    from d365fo_db_sync_spark.operators import text

    train = spark.createDataFrame(
        [(0, "a b a"), (1, "b b")], "doc_id long, text string"
    )
    vocab = ["a", "b"]
    v1 = 3  # |vocab| + 1
    uc = {
        r["tok"]: r["c"]
        for r in train.select(
            F.explode(text.vocab_mapped_tokens("text", vocab)).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert uc == {"a": 2, "b": 3}
    bc = {
        r["b"]: r["cnt"] for r in text.bigram_vocab(train, "text", vocab).collect()
    }
    assert bc == {"a b": 1, "b a": 1, "b b": 1}
    blp = {b: math.log((c + 1) / (uc[b.split(" ")[0]] + v1)) for b, c in bc.items()}
    flp = {w: -math.log(c + v1) for w, c in uc.items()}

    held = spark.createDataFrame(
        [
            (0, "a b b a"),  # all bigrams seen
            (1, "a z b"),    # "a <unk>" -> fm[a]; "<unk> b" -> ln(1/(V+1))
            (2, "a"),        # no bigrams -> 0.0
            (3, ""),         # empty -> 0.0
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["s"]
        for r in held.select(
            "doc_id",
            text.bigram_logprob("text", blp, flp, vocab).alias("s"),
        ).collect()
    }
    exp0 = (math.log(2 / 5) + math.log(2 / 6) + math.log(2 / 6)) / 3
    exp1 = (-math.log(5) + -math.log(3)) / 2
    assert out[0] == pytest.approx(exp0, abs=1e-12)
    assert out[1] == pytest.approx(exp1, abs=1e-12)
    assert out[2] == 0.0 and out[3] == 0.0

    with pytest.raises(ValueError, match="fallback_lp"):
        text.bigram_logprob("text", blp, {}, vocab)


def test_winsorized_group_stats_matches_reference(spark):
    """winsorized_group_stats vs an independent Python reference on a
    skewed two-group corpus: discrete rank bounds, clip counts, and
    the winsorized mean; partitioning-invariant; bad quantiles raise."""
    import math

    import pytest

    from d365fo_db_sync_spark.operators.text import winsorized_group_stats

    ga = [float(i) for i in range(1, 41)]  # 1..40, clean
    gb = [-500.0, 900.0] + [float(i) for i in range(2, 40)]  # wild tails
    rows = [("a", i, v) for i, v in enumerate(ga)] + [
        ("b", i, v) for i, v in enumerate(gb)
    ]
    df = spark.createDataFrame(rows, "src string, doc_id long, q double")

    def reference(vals, lo_q=0.05, hi_q=0.95):
        s = sorted(vals)
        n = len(s)
        r_lo = max(math.ceil(lo_q * n), 1)
        r_hi = math.ceil(hi_q * n)
        p_lo, p_hi = s[r_lo - 1], s[r_hi - 1]
        clipped = [min(max(v, p_lo), p_hi) for v in vals]
        return (
            n,
            p_lo,
            p_hi,
            sum(v < p_lo for v in vals),
            sum(v > p_hi for v in vals),
            round(sum(round(c, 6) for c in clipped) / n, 6),
        )

    for parts in (1, 7):
        got = {
            r["src"]: (
                r["n_docs"], r["p_lo"], r["p_hi"],
                r["clipped_lo"], r["clipped_hi"], r["avg_winsorized"],
            )
            for r in winsorized_group_stats(
                df.repartition(parts), "src", "q", tiebreak_cols=("doc_id",)
            ).collect()
        }
        for src, vals in (("a", ga), ("b", gb)):
            n, p_lo, p_hi, clo, chi, avg = reference(vals)
            gn, gp_lo, gp_hi, gclo, gchi, gavg = got[src]
            assert (gn, gp_lo, gp_hi, gclo, gchi) == (n, p_lo, p_hi, clo, chi)
            assert gavg == pytest.approx(avg, abs=1e-9)
        # the wild tails actually clip (the scenario the operator is for)
        assert got["b"][3] >= 1 and got["b"][4] >= 1

    with pytest.raises(ValueError, match="lo_q"):
        winsorized_group_stats(df, "src", "q", lo_q=0.9, hi_q=0.5)
