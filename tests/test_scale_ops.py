"""Unit tests for the scale-extension operator families:
dedup (exact / MinHash-LSH / SimHash / Jaccard), similarity search,
text analysis, multimodal plumbing.

Synthetic micro-frames with planted duplicates keep these fast and make
recall assertions exact; the value-level oracle checks live in
tools/check.py over the corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators import dedup, multimodal, similarity, text

BASE = (
    "the quick brown fox jumps over the lazy dog near the river bank "
    "while a cold wind blows across the open field and the tall grass sways"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, BASE.replace("cold wind", "warm breeze")),  # near dup of 0
        (3, "completely different content about spark dataframes and shuffles "
            "partitions executors tasks stages jobs catalyst tungsten codegen"),
        (4, "short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_lowest_key(spark, docs):
    out = dedup.exact_dedup(
        docs.select("doc_id", text.fingerprint("text").alias("fp")), ["fp"], "doc_id"
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert kept == {0, 2, 3, 4}  # doc 1 collapsed into doc 0


def test_minhash_lsh_finds_planted_near_dups(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_candidates(docs, "doc_id", "text").collect()
    }
    assert (0, 1) in pairs  # exact dup always collides
    assert (0, 2) in pairs and (1, 2) in pairs  # near dup
    assert (0, 3) not in pairs  # disjoint content


def test_ngram_jaccard_exact_values(spark, docs):
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert out[(0, 1)] == 1.0
    assert 0.5 < out[(0, 2)] < 1.0
    assert (0, 3) not in out


def test_simhash_candidates_recall(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.simhash_candidates(docs, "doc_id", "text").collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) in pairs


def test_simhash_md5_twin_recall_and_sig_width(spark, docs):
    """The oracle-replayable md5 twin recovers the same planted pairs
    as the xxhash64 production path, and its signatures fit 60 bits
    (non-negative in a signed long — the cross-engine contract)."""
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.simhash_candidates(
            docs, "doc_id", "text", hash_fn="md5"
        ).collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) in pairs
    assert (0, 3) not in pairs
    sigs = dedup.simhash(docs, "doc_id", "text", hash_fn="md5").collect()
    assert all(0 <= r["simhash"] < (1 << 60) for r in sigs)


@pytest.fixture(scope="module")
def vectors(spark):
    # 4-dim embeddings: 0/1 identical, 2 close to them, 3 orthogonal
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_bruteforce(spark, vectors):
    q = vectors.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = similarity.cosine_topk_bruteforce(vectors, q, k=2).collect()
    assert [r["neighbor_id"] for r in res] == [1, 2]
    assert res[0]["cosine"] == pytest.approx(1.0)


def test_cosine_topk_np_matches_hof(spark):
    """The numpy-GEMM scale path must produce the SAME ranked neighbor
    slots as the HOF oracle anchor on the real corpus (float
    accumulation-order noise lives ~1e-16, below every ranking gap),
    and cosines must agree to high precision."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hof = {
        (r["query_id"], r["rnk"]): (r["neighbor_id"], r["cosine"])
        for r in similarity.cosine_topk_bruteforce(emb, q, k=5).collect()
    }
    npv = {
        (r["query_id"], r["rnk"]): (r["neighbor_id"], r["cosine"])
        for r in similarity.cosine_topk_bruteforce_np(emb, q, k=5).collect()
    }
    assert set(hof) == set(npv)
    for slot, (nid, cos) in hof.items():
        nid2, cos2 = npv[slot]
        assert nid == nid2, (slot, nid, nid2)
        assert cos == pytest.approx(cos2, abs=1e-12)


def test_embedding_near_duplicates_exact_pair(spark, vectors):
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity.embedding_near_duplicates(
            vectors, threshold=0.95, bits=4, dim=4
        ).collect()
    }
    assert pairs[(0, 1)] == pytest.approx(1.0)
    assert (0, 3) not in pairs


def test_lsh_near_dup_is_subset_of_exact(spark):
    from d365fo_db_sync_spark.suite.similarity_q import similarity_near_dup_exact
    from d365fo_db_sync_spark.suite.tail_q import similarity_near_dup_lsh

    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity_near_dup_exact(spark, "/root/testdata/sf0.001").collect()
    }
    approx = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity_near_dup_lsh(spark, "/root/testdata/sf0.001").collect()
    }
    assert set(approx) <= set(exact)
    for k, v in approx.items():
        assert exact[k] == v


def test_language_id_and_quality(spark):
    rows = [
        (0, "the cat and the dog is a friend of the bird"),
        (1, "el gato y la casa de los perros es que grande"),
        (2, "zzz qqq xxx"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    langs = {r["doc_id"]: r["lang"] for r in df.select(
        "doc_id", text.language_id("text").alias("lang")).collect()}
    assert langs == {0: "en", 1: "es", 2: "unknown"}
    q = text.quality_features(df, "text").filter(F.col("doc_id") == 0).first()
    assert q["n_tokens"] == 11
    assert q["stopword_ratio"] > 0.3


def test_pii_counts(spark):
    rows = [
        (0, "mail a@b.io and c.d+e@f-g.org today"),
        (1, "call (555) 867-5309 or 555-123-4567"),
        (2, "hosts 10.0.0.1 192.168.1.255 and not 1.2.3"),
        (3, "clean text with no contact info"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.pii_counts(df, "text").collect()}
    assert (out[0]["n_emails"], out[0]["n_phones"], out[0]["n_ipv4"]) == (2, 0, 0)
    assert (out[1]["n_emails"], out[1]["n_phones"], out[1]["n_ipv4"]) == (0, 2, 0)
    assert (out[2]["n_emails"], out[2]["n_phones"], out[2]["n_ipv4"]) == (0, 0, 2)
    assert (out[3]["n_emails"], out[3]["n_phones"], out[3]["n_ipv4"]) == (0, 0, 0)


def test_repetition_features(spark):
    rows = [
        (0, "spam spam spam spam"),  # 4 tokens 1 distinct; 3 bigrams 1 distinct
        (1, "all tokens here differ"),
        (2, "one"),  # no bigrams -> 0/1
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.repetition_features(df, "text").collect()}
    assert out[0]["dup_token_frac"] == pytest.approx(3 / 4)
    assert out[0]["dup_bigram_frac"] == pytest.approx(2 / 3)
    assert out[1]["dup_token_frac"] == 0.0 and out[1]["dup_bigram_frac"] == 0.0
    assert out[2]["dup_token_frac"] == 0.0 and out[2]["dup_bigram_frac"] == 0.0
    assert out[3]["dup_token_frac"] == 0.0 and out[3]["dup_bigram_frac"] == 0.0


def test_decontaminate_drops_contaminated_docs(spark):
    from d365fo_db_sync_spark.operators.decontam import benchmark_overlap, decontaminate

    corpus = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),
            (1, "completely unrelated text about spark query planning"),
            (2, "prefix words then the quick brown fox jumps over more"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "bench_id long, text string"
    )
    overlaps = {
        (r["doc_id"], r["bench_id"]): r["overlap_frac"]
        for r in benchmark_overlap(corpus, bench).collect()
    }
    # bench has trigrams {the quick brown, quick brown fox, brown fox jumps}
    assert overlaps[(0, 100)] == pytest.approx(1.0)
    assert overlaps[(2, 100)] == pytest.approx(1.0)
    assert (1, 100) not in overlaps
    clean = decontaminate(corpus, bench, min_overlap_frac=0.5)
    assert {r["doc_id"] for r in clean.collect()} == {1}


def test_semantic_contamination_argmax_and_ties(spark):
    """semantic_contamination: hand-computable cosines, deterministic
    id-ascending tie-break, one output row per corpus vector, and the
    empty-needle guard."""
    from d365fo_db_sync_spark.operators.decontam import semantic_contamination

    corpus = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),  # exactly along needle 10 AND needle 30
            (1, [0.0, 1.0]),  # exactly along needle 20
            (2, [1.0, 1.0]),  # cos 1/sqrt(2) to both axes -> tie
            (3, [-1.0, 0.0]),  # anti-aligned with the x needles
            (4, [0.0, 0.0]),  # zero vector: defined-as-0 cosine, not NaN
        ],
        "vec_id long, embedding array<double>",
    )
    needles = spark.createDataFrame(
        # 10 and 30 are the SAME direction: every x-aligned corpus row
        # ties between them and must report the smaller id (10)
        [(20, [0.0, 1.0]), (10, [1.0, 0.0]), (30, [2.0, 0.0])],
        "bench_id long, embedding array<double>",
    )
    out = {
        r["vec_id"]: (r["best_needle"], r["max_cos"])
        for r in semantic_contamination(corpus, needles).collect()
    }
    assert len(out) == 5  # one row per corpus vector, flagged or not
    assert out[0] == (10, pytest.approx(1.0))
    assert out[1] == (20, pytest.approx(1.0))
    assert out[2][0] == 10 and out[2][1] == pytest.approx(2**-0.5)
    assert out[3][0] == 20 and out[3][1] == pytest.approx(0.0)
    # zero vector scores 0.0 everywhere and ties to the lowest needle id
    assert out[4] == (10, 0.0)

    # determinism under repartitioning: same rows, same argmaxes
    re = {
        r["vec_id"]: (r["best_needle"], r["max_cos"])
        for r in semantic_contamination(corpus.repartition(3), needles).collect()
    }
    assert re == out

    empty = spark.createDataFrame([], "bench_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        semantic_contamination(corpus, empty)


def test_snapshot_progress_reporting(spark, tmp_path):
    from d365fo_db_sync_spark.sinks import ParquetTarget, snapshot

    tgt = ParquetTarget(str(tmp_path / "t"))
    tgt.overwrite(spark.range(100).toDF("id"))
    calls = []
    snapshot(tgt, str(tmp_path / "snaps"), "a", progress=lambda p, e: calls.append(p))
    assert calls and calls[-1] == 100.0
    assert all(a <= b for a, b in zip(calls, calls[1:]))

    def boom(p, e):
        raise RuntimeError("monitoring failure")

    dest = snapshot(tgt, str(tmp_path / "snaps"), "b", progress=boom)
    assert spark.read.parquet(dest).count() == 100


@pytest.mark.parametrize("sink_kind", ["bucketed", "manifest"])
def test_ingest_batch_incremental_dedup(spark, tmp_path, sink_kind):
    from d365fo_db_sync_spark.operators.dedup import ingest_batch
    from d365fo_db_sync_spark.plans.audit import explain_formatted
    from d365fo_db_sync_spark.sinks import BucketedParquetTarget, ManifestParquetTarget

    def mk(rows):
        return spark.createDataFrame(rows, "doc_id long, fp string, text string")

    sink_cls = BucketedParquetTarget if sink_kind == "bucketed" else ManifestParquetTarget
    idx = sink_cls(str(tmp_path / "idx"), key="fp", n_buckets=8)
    b1 = mk([(1, "a", "x"), (2, "b", "y"), (3, "a", "x")])  # in-batch dup
    novel1 = {r["doc_id"] for r in ingest_batch(spark, b1, idx).collect()}
    assert novel1 == {1, 2}  # fp 'a' keeps lowest id

    b2 = mk([(10, "b", "y"), (11, "c", "z"), (12, "c", "z")])
    novel2 = {r["doc_id"] for r in ingest_batch(spark, b2, idx).collect()}
    assert novel2 == {11}  # 'b' known from batch 1, 'c' new once

    # replay of batch 2 is a no-op: zero novel, index version unchanged
    before = idx.current_path()
    assert ingest_batch(spark, b2, idx).count() == 0
    assert idx.current_path() == before
    assert {(r["fp"], r["doc_id"]) for r in idx.read(spark).collect()} == {
        ("a", 1), ("b", 2), ("c", 11),
    }

    # the membership probe never reads the whole index: hive partition
    # pruning on the bucketed sink, an exact manifest file-list cut on
    # the manifest sink (no partition discovery to prune — the plan
    # scans only the probed buckets' files by construction)
    probe = idx.probe(spark, mk([(0, "c", "")]).select("fp"))
    if sink_kind == "bucketed":
        plan = explain_formatted(probe)
        assert "PartitionFilters" in plan and "__kb" in plan
    else:
        m = idx._load_manifest()
        total_files = sum(len(fs) for fs in m["buckets"].values())
        assert 0 < len(probe.inputFiles()) < total_files


def test_ingest_batch_near_dup_cross_history(spark, tmp_path):
    from d365fo_db_sync_spark.operators.dedup import ingest_batch_near_dup
    from d365fo_db_sync_spark.sinks import BucketedParquetTarget

    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the afternoon sun light"
    )
    idx = BucketedParquetTarget(str(tmp_path / "lsh"), key="bkey", n_buckets=8)
    b1 = spark.createDataFrame(
        [(1, base), (2, "entirely different words about query planning engines")],
        "doc_id long, text string",
    )
    assert ingest_batch_near_dup(spark, b1, idx).count() == 0  # first batch seeds

    # batch 2: one near-dup of doc 1 (one word changed), one novel doc
    b2 = spark.createDataFrame(
        [(10, base.replace("afternoon", "morning")), (11, "fresh unseen content here")],
        "doc_id long, text string",
    )
    cands = {(r["doc_id"], r["dup_id"]) for r in ingest_batch_near_dup(spark, b2, idx).collect()}
    assert (10, 1) in cands
    assert all(d != 11 for d, _ in cands)

    # replay of batch 2: same candidates, but the index gains NOTHING
    before = idx.num_rows()
    cands2 = {(r["doc_id"], r["dup_id"]) for r in ingest_batch_near_dup(spark, b2, idx).collect()}
    assert (10, 1) in cands2
    assert idx.num_rows() == before

    # the inverted index keeps multi-row buckets: doc 10's shared
    # buckets coexist with doc 1's (append, not upsert)
    rows = idx.read(spark)
    shared = (
        rows.filter(F.col("doc_id").isin(1, 10))
        .groupBy("bkey")
        .count()
        .filter(F.col("count") == 2)
    )
    assert shared.count() > 0


def test_multimodal_decode_roundtrip(spark):
    for mt in ("image", "audio", "video"):
        multimodal.register_codec(mt, multimodal.fake_codec)
    rows = [(0, "image", b"abcd" * 32), (1, "audio", b"xy"), (2, "video", None)]
    assets = spark.createDataFrame(rows, "asset_id long, media_type string, content binary")
    out = {r["asset_id"]: r for r in multimodal.decode_features(assets).collect()}
    assert out[0]["width"] is not None and out[0]["n_bytes"] == 128
    assert out[1]["duration_ms"] == 20
    assert out[2]["n_bytes"] == 0
    assert len(out[0]["feature"]) == 8


def test_multimodal_missing_codec_raises(spark):
    multimodal._CODECS.clear()
    assets = spark.createDataFrame(
        [(0, "image", b"x")], "asset_id long, media_type string, content binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|no codec"):
        multimodal.decode_features(assets).collect()


def test_approx_distinct_within_rsd(spark):
    from d365fo_db_sync_spark.suite.tail_q import approx_distinct_sketch

    got = {
        r["l_returnflag"]: r["approx_orderkeys"]
        for r in approx_distinct_sketch(spark, "/root/testdata/sf0.001").collect()
    }
    from d365fo_db_sync_spark.sources import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag").agg(
            F.countDistinct("l_orderkey").alias("n")
        ).collect()
    }
    for flag, est in got.items():
        assert abs(est - exact[flag]) <= max(0.05 * exact[flag], 5)


def test_ivf_topk_recall_on_clustered_data(spark):
    """IVF's contract holds on clusterable data: vectors near one of a
    few prototype directions. On such data probing the nearest cells
    recovers the true neighbors (uniform random vectors do NOT cluster,
    and IVF recall there is ~n_probes/n_lists by design)."""
    import math

    protos = [
        [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0],
    ]
    rows = []
    for i in range(200):
        p = protos[i % 4]
        jitter = [0.15 * math.sin(i * 1.7 + d) for d in range(4)]
        rows.append((i, [p[d] + jitter[d] for d in range(4)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.cosine_topk_bruteforce(emb, queries, k=5)
    assigned, model = similarity.ivf_index(emb, n_lists=4)
    approx = similarity.ivf_topk(assigned, model, queries, k=5, n_probes=2)

    def pairs(df):
        return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}

    e, a = pairs(exact), pairs(approx)
    assert len(a & e) / len(e) >= 0.9  # probe recall on clustered data


def test_pandas_udf_cosine_matches_jvm_fold(spark, vectors):
    """U4 — the Arrow slow path must agree with the JVM fold to 1e-12."""
    from d365fo_db_sync_spark.functions.pandas_udfs import cosine_pandas_udf
    from d365fo_db_sync_spark.operators.similarity import _dot, _norm

    q = [1.0, 0.0, 0.0, 0.0]
    udf = cosine_pandas_udf(q)
    jvm = (
        _dot(F.col("embedding"), F.lit(q)) / (_norm(F.col("embedding")) * F.lit(1.0))
    )
    rows = vectors.select(
        "vec_id", udf(F.col("embedding")).alias("py"), jvm.alias("jvm")
    ).collect()
    for r in rows:
        assert abs(r["py"] - r["jvm"]) < 1e-12, r


def test_grouped_robust_stats(spark):
    from d365fo_db_sync_spark.functions.pandas_udfs import grouped_robust_stats

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 100.0), ("b", 5.0)], "g string, v double"
    )
    out = {r["group_key"]: r for r in grouped_robust_stats(df, "g", "v").collect()}
    assert out["a"]["median"] == 2.0
    assert out["a"]["mad"] == 1.0  # |1-2|,|2-2|,|100-2| -> median 1
    assert out["b"]["n"] == 1 and out["b"]["mad"] == 0.0


def test_salted_agg_matches_plain_groupby(spark):
    from d365fo_db_sync_spark.operators.skew import salted_agg, top_frequent_keys

    rows = [("hot", float(i)) for i in range(500)] + [("cold", 1.0), ("cold", 2.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {
        r["k"]: (r["total"], r["n"], r["lo"], r["hi"])
        for r in salted_agg(
            df, ["k"],
            {"total": ("v", "sum"), "n": ("*", "count"),
             "lo": ("v", "min"), "hi": ("v", "max")},
            salt=8,
        ).collect()
    }
    assert got["hot"] == (sum(range(500)), 500, 0.0, 499.0)
    assert got["cold"] == (3.0, 2, 1.0, 2.0)

    hot = top_frequent_keys(df, "k", min_count=100).collect()
    assert [r["k"] for r in hot] == ["hot"]


def test_asof_join_semantics(spark):
    from d365fo_db_sync_spark.operators.asof import asof_join
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, 10, t(10)), (2, 10, t(5)), (3, 20, t(30)), (4, 30, t(1))],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 10, t(5)), (101, 10, t(9)), (102, 20, t(30)), (103, 20, t(31))],
        "rid long, k long, ts timestamp",
    )
    out = {
        r["id"]: r["match"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts", right_cols={"rid": "match"}
        ).collect()
    }
    assert out[1] == 101  # latest earlier
    assert out[2] == 100  # equal ts matches (inclusive)
    assert out[3] == 102  # equal ts, not the later one
    assert out[4] is None  # no earlier right row -> NULL


def test_interval_join_matches_naive(spark):
    import datetime as dt

    from d365fo_db_sync_spark.operators.rangejoin import interval_join

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    pts = spark.createDataFrame(
        [(i, t(i * 7)) for i in range(9)], "pid long, pts timestamp"
    )
    ivs = spark.createDataFrame(
        [(0, t(0), t(15)), (1, t(10), t(40)), (2, t(58), t(59))],
        "iid long, s timestamp, e timestamp",
    )
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(pts, ivs, "pts", "s", "e", band_seconds=600).collect()
    }
    naive = {
        (p["pid"], i["iid"])
        for p in pts.collect()
        for i in ivs.collect()
        if i["s"] <= p["pts"] < i["e"]
    }
    assert got == naive and len(naive) > 0


def test_resize_and_frame_sample_plumbing(spark):
    from d365fo_db_sync_spark.operators import multimodal as M

    assets = spark.createDataFrame(
        [
            (1, "image", b"x" * 1000, None),
            (2, "video", b"y" * 250, None),
            (3, "video", None, None),     # null payload
            (4, "audio", b"z" * 50, None),  # wrong media type -> filtered
        ],
        M.ASSET_SCHEMA,
    )
    resized = {r["asset_id"]: r for r in M.resize_images(assets, 8, 8).collect()}
    assert list(resized) == [1]
    assert resized[1]["n_bytes"] == 8  # 8*8/8 cap
    assert bytes(resized[1]["content"]) == b"x" * 8

    spec = M.FrameSampleSpec(every_n=1, max_frames=4, bytes_per_frame=100)
    frames = M.sample_frames(assets, spec).collect()
    by_asset = {}
    for r in frames:
        by_asset.setdefault(r["asset_id"], []).append(r)
    assert sorted(by_asset) == [2, 3]
    # 250 bytes -> frames of 100, 100, 50
    sizes = [len(bytes(r["frame"])) for r in sorted(by_asset[2], key=lambda r: r["frame_idx"])]
    assert sizes == [100, 100, 50]
    assert [len(bytes(r["frame"])) for r in by_asset[3]] == [0]  # null -> 1 empty frame


def test_grid_sort_typed_and_numeric_source(spark):
    # O5: numeric-looking strings sort numerically (as a group, first),
    # text lexically; numeric_source sorts a display column by its raw
    # backing value; descending toggles.
    from d365fo_db_sync_spark.operators.gridsort import grid_sort

    df = spark.createDataFrame(
        [
            (1, "10", 10.0, "10 MB"),
            (2, "9", 9.0, "9 MB"),
            (3, "alpha", 2.0, "2 MB"),
            (4, "2.5", 2.5, "2.5 MB"),
            (5, "Beta", 100.0, "100 MB"),
        ],
        "id long, cell string, size double, size_display string",
    )
    asc = [r["id"] for r in grid_sort(df, "cell", tiebreak="id").collect()]
    assert asc == [4, 2, 1, 5, 3]  # 2.5 < 9 < 10, then "Beta" < "alpha"
    desc = [r["id"] for r in grid_sort(df, "cell", ascending=False, tiebreak="id").collect()]
    assert desc == [3, 5, 1, 2, 4]
    # display column sorted by its raw numeric backing, not "10">"100"
    by_size = [
        r["id"]
        for r in grid_sort(df, "size_display", numeric_source="size", tiebreak="id").collect()
    ]
    assert by_size == [3, 4, 2, 1, 5]


def test_chunk_documents_windows_and_overlap(spark):
    words = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(1, words), (2, "a b c")], "doc_id long, text string")
    out = text.chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=1)
    rows = {(r["doc_id"], r["chunk_idx"]): r for r in out.collect()}
    # doc 1: stride 3, last_start = 6 -> starts 0,3,6 -> 3 chunks
    assert {k for k in rows if k[0] == 1} == {(1, 0), (1, 1), (1, 2)}
    assert rows[(1, 0)]["chunk_text"] == "w0 w1 w2 w3"
    assert rows[(1, 1)]["chunk_text"] == "w3 w4 w5 w6"  # 1-token overlap
    assert rows[(1, 2)]["chunk_text"] == "w6 w7 w8 w9"
    assert all(r["n_chunk_tokens"] == 4 for k, r in rows.items() if k[0] == 1)
    # doc 2 shorter than a chunk: itself as chunk 0
    assert rows[(2, 0)]["chunk_text"] == "a b c"
    assert rows[(2, 0)]["n_chunk_tokens"] == 3
    assert {k for k in rows if k[0] == 2} == {(2, 0)}


def test_chunk_documents_clamped_final_window(spark):
    # 11 tokens, chunk 4, no overlap: starts 0,4, then clamped 7 (not 8)
    words = " ".join(f"w{i}" for i in range(11))
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    out = {r["chunk_idx"]: r["chunk_text"] for r in
           text.chunk_documents(df, "doc_id", "text", chunk_tokens=4).collect()}
    assert out == {0: "w0 w1 w2 w3", 1: "w4 w5 w6 w7", 2: "w7 w8 w9 w10"}
    with pytest.raises(ValueError):
        text.chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=4)


def test_quantized_cosine_accuracy_and_recall(spark, vectors):
    # int8 quantization: values in [-127, 127], quantized cosine within
    # ~2% of exact, and top-k recall preserved on separated clusters
    q = similarity.quantize_embeddings(vectors)
    rows = {r["vec_id"]: r for r in q.collect()}
    assert all(abs(v) <= 127 for r in rows.values() for v in r["qvec"])
    assert max(rows[0]["qvec"]) == 127  # max component hits full scale

    queries = q.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "qvec"
    )
    approx = similarity.quantized_cosine_topk(q, queries, k=2).collect()
    exact = similarity.cosine_topk_bruteforce(
        vectors,
        vectors.filter(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        ),
        k=2,
    ).collect()
    assert [r["neighbor_id"] for r in approx] == [r["neighbor_id"] for r in exact]
    for a, e in zip(approx, exact):
        assert abs(a["qcosine"] - e["cosine"]) < 0.02


def test_ivf_persisted_index_partition_prunes(spark, tmp_path):
    """The on-disk IVF path must (a) return the same neighbors as the
    in-memory probe and (b) actually prune: the vector scan carries a
    PartitionFilter on the probed cells, so unprobed cells' files are
    never read."""
    import math

    from d365fo_db_sync_spark.plans.audit import explain_formatted

    protos = [
        [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0],
    ]
    rows = []
    for i in range(200):
        p = protos[i % 4]
        jitter = [0.15 * math.sin(i * 1.7 + d) for d in range(4)]
        rows.append((i, [p[d] + jitter[d] for d in range(4)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    assigned, model = similarity.ivf_index(emb, n_lists=4)
    root = similarity.ivf_write(assigned, model, str(tmp_path / "ivf"))

    in_mem = similarity.ivf_topk(assigned, model, queries, k=5, n_probes=2)
    on_disk = similarity.ivf_topk_on_disk(spark, root, queries, k=5, n_probes=2)

    def pairs(df):
        return {(r["query_id"], r["rnk"], r["neighbor_id"]) for r in df.collect()}

    assert pairs(on_disk) == pairs(in_mem)

    # pruning evidence: a cell predicate over the partitioned read shows
    # up as a PartitionFilter, not a post-scan Filter
    vec_df, centers = similarity.ivf_read(spark, root)
    plan = explain_formatted(vec_df.filter(F.col("cell").isin([0, 1])))
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters", 1)[1].splitlines()[0]
    assert "cell" in seg, seg


def test_salted_topn_matches_plain_on_skew(spark):
    """top_n_per_group_salted must equal the single-window top-N even
    when one group holds most rows (the hot-group case it exists for)."""
    from d365fo_db_sync_spark.operators.windows import (
        top_n_per_group,
        top_n_per_group_salted,
    )

    hot = [(1, i, f"r{i}") for i in range(5000)]
    cold = [(g, i, f"r{g}_{i}") for g in range(2, 30) for i in range(7)]
    df = spark.createDataFrame(hot + cold, "grp int, seq long, payload string")

    plain = top_n_per_group(df, ["grp"], "seq", 5, tiebreakers=["payload"])
    salted = top_n_per_group_salted(
        df, ["grp"], "seq", 5, tiebreakers=["payload"], salt_buckets=8
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # every group must surface, each capped at N
    counts = {r["grp"]: r["c"] for r in salted.groupBy("grp").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("c")
    ).collect()}
    assert counts[1] == 5 and all(v <= 5 for v in counts.values())


# ------------------------------------------------------- skew profile


def test_skew_profile_numbers_and_plan(spark):
    from d365fo_db_sync_spark.operators.skew import skew_profile

    # 100 rows on key 0, 10 rows each on keys 1..5 -> total 150, 6 keys
    rows = [(0,)] * 100 + [(k,) for k in range(1, 6) for _ in range(10)]
    df = spark.createDataFrame(rows, "k long")
    out = skew_profile(df, ["k"], top_k=3)
    got = {r["rank"]: (r["k"], r["cnt"], r["share_bp"], r["salt_factor"]) for r in out.collect()}
    assert got[1] == (0, 100, 100 * 10000 // 150, (100 + 24) // 25)  # salt 4 (avg=25)
    assert got[1][3] == 4
    # rank 2/3: tied cnt=10 -> key ascending
    assert got[2][0] == 1 and got[3][0] == 2
    assert got[2][3] == 1  # average keys need no salt

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # hot set is top-k, not a global sort
    assert "BroadcastExchange" in plan  # 1-row totals broadcast back


def test_skew_profile_rejects_bad_topk(spark):
    from d365fo_db_sync_spark.operators.skew import skew_profile

    df = spark.createDataFrame([(1,)], "k long")
    import pytest as _p

    with _p.raises(ValueError):
        skew_profile(df, ["k"], top_k=0)


def test_asof_join_forward_direction(spark):
    import datetime as dt

    from d365fo_db_sync_spark.operators.asof import asof_join

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, 10, t(10)), (2, 10, t(5)), (3, 20, t(32)), (4, 10, t(40))],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 10, t(5)), (101, 10, t(9)), (102, 10, t(20)), (103, 20, t(30))],
        "rid long, k long, ts timestamp",
    )
    out = {
        r["id"]: r["match"]
        for r in asof_join(
            left, right, "k", "ts", "ts", {"rid": "match"}, direction="forward"
        ).collect()
    }
    assert out[1] == 102  # earliest later
    assert out[2] == 100  # equal ts matches (inclusive)
    assert out[3] is None  # no later right row for k=20
    assert out[4] is None  # nothing after t(40)


def test_asof_join_tolerance_nulls_stale_matches(spark):
    import datetime as dt

    from d365fo_db_sync_spark.operators.asof import asof_join

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, 10, t(10)), (2, 10, t(30)), (3, 10, t(9))],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 10, t(9))], "rid long, k long, ts timestamp"
    )
    out = {
        r["id"]: r["match"]
        for r in asof_join(
            left,
            right,
            "k",
            "ts",
            "ts",
            {"rid": "match"},
            tolerance_seconds=300,
        ).collect()
    }
    assert out[1] == 100  # 60 s stale, within 5 min
    assert out[2] is None  # 21 min stale -> nulled
    assert out[3] == 100  # exact match, gap 0


def test_asof_join_null_value_field_stays_with_matched_row(spark):
    """A NULL value in the MATCHED right row must come through as NULL.

    Per-column ignorenulls fills would skip to an older right row for
    that column only — mixing (ts, value) across rows and, with
    tolerance, admitting a stale value the gate should reject. The
    single-struct carry pins every output to the one matched row.
    """
    import datetime as dt

    from d365fo_db_sync_spark.operators.asof import asof_join

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, 10, t(10))], "id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(100, 7.5, 10, t(1)), (101, None, 10, t(9))],
        "rid long, px double, k long, ts timestamp",
    )
    # Nearest match is rid=101 whose px is NULL: px must be NULL, and
    # rid must be 101 — never (rid=101, px=7.5) mixed across rows.
    row = asof_join(
        left, right, "k", "ts", "ts", {"rid": "m_rid", "px": "m_px"}
    ).collect()[0]
    assert row["m_rid"] == 101 and row["m_px"] is None

    # With a 5-min tolerance the nearest row (1 min stale) matches but
    # its NULL px must NOT fall back to the 9-min-stale rid=100 value.
    row = asof_join(
        left, right, "k", "ts", "ts", {"rid": "m_rid", "px": "m_px"},
        tolerance_seconds=300,
    ).collect()[0]
    assert row["m_rid"] == 101 and row["m_px"] is None
