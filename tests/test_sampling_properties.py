"""Property-based invariants (hypothesis) for the curation operators —
the guarantees training pipelines rely on, checked over arbitrary
inputs rather than fixtures: split exhaustiveness/disjointness for any
weight vector, chunking content preservation for any document and
window geometry."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from d365fo_db_sync_spark.operators.sampling import _hex_threshold


def _label_of(h: str, bounds: list[tuple[str, str, str]]) -> str | None:
    for label, lo, hi in bounds:
        if lo <= h < hi:
            return label
    return None


@given(
    weights=st.lists(
        st.floats(min_value=0.01, max_value=1.0, allow_nan=False), min_size=1, max_size=6
    )
)
@settings(max_examples=200, deadline=None)
def test_split_ranges_partition_the_hash_space(weights):
    # normalized weights must tile [0, 2^32) with no gap and no overlap
    total = sum(weights)
    norm = [w / total for w in weights]
    cum, bounds = 0.0, []
    for i, w in enumerate(norm):
        lo = _hex_threshold(cum)
        cum += w
        bounds.append((f"s{i}", lo, _hex_threshold(cum)))
    if abs(cum - 1.0) < 1e-9:  # split_column's exhaustiveness clamp
        label, lo, _ = bounds[-1]
        bounds[-1] = (label, lo, "g")
    # ranges are contiguous: each hi == next lo, first lo is 0, last hi
    # admits the max bucket
    assert bounds[0][1] == "00000000"
    for (_, _, hi), (_, lo, _) in zip(bounds, bounds[1:]):
        assert hi == lo
    assert "ffffffff" < bounds[-1][2]  # exhaustive at the top
    # spot probes across the space land in exactly one range
    for probe in ("00000000", "3fffffff", "80000000", "bfffffff", "ffffffff"):
        hits = [b for b in bounds if b[1] <= probe < b[2]]
        assert len(hits) == 1


@given(
    n_tokens=st.integers(min_value=1, max_value=200),
    chunk=st.integers(min_value=1, max_value=64),
    overlap_frac=st.floats(min_value=0.0, max_value=0.99),
)
@settings(max_examples=300, deadline=None)
def test_chunk_geometry_covers_every_token_exactly(n_tokens, chunk, overlap_frac):
    # pure-python replica of chunk_documents' window arithmetic: the
    # union of windows covers [0, n) with no gap, the stride is
    # honored, and the final window ends exactly at n
    overlap = min(chunk - 1, int(chunk * overlap_frac))
    stride = chunk - overlap
    last_start = max(n_tokens - chunk, 0)
    n_chunks = last_start // stride + (2 if last_start % stride else 1)
    starts = [min(i * stride, last_start) for i in range(n_chunks)]
    covered = set()
    for s in starts:
        covered.update(range(s, min(s + chunk, n_tokens)))
    assert covered == set(range(n_tokens))
    assert starts == sorted(starts)
    assert len(set(starts)) == len(starts)  # no duplicate windows
    if n_tokens > chunk:
        assert starts[-1] + chunk == n_tokens  # clamped final window


@given(fraction=st.floats(min_value=0.0, max_value=1.5, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_hex_threshold_total_order(fraction):
    th = _hex_threshold(fraction)
    # threshold string compares correctly against any 8-hex bucket
    assert th == "g" or (len(th) == 8 and int(th, 16) == int(fraction * (1 << 32)))
    if fraction >= 1.0:
        assert "ffffffff" < th


@given(
    counts=st.dictionaries(
        st.text(min_size=1, max_size=4), st.integers(min_value=0, max_value=10**12),
        min_size=0, max_size=8,
    ),
    total=st.integers(min_value=0, max_value=10**9),
)
@settings(max_examples=300, deadline=None)
def test_temperature_quotas_invariants(counts, total):
    import math

    from d365fo_db_sync_spark.operators.sampling import temperature_quotas

    q = temperature_quotas(counts, total)
    # quotas never exceed the requested total and never go negative
    assert sum(q.values()) <= total
    assert all(v >= 0 for v in q.values())
    # empty sources get no quota key at all
    assert set(q) == {s for s, n in counts.items() if n > 0}
    # exact integer definition: floor(total * isqrt(n) / sum(isqrt))
    mass = {s: math.isqrt(n) for s, n in counts.items() if n > 0}
    sm = sum(mass.values())
    for s, m in mass.items():
        assert q[s] == (total * m) // sm if sm else q[s] == 0


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=0, max_size=60,
        unique_by=lambda t: t[0],
    ),
    shard_tokens=st.integers(min_value=1, max_value=200),
)
@settings(max_examples=40, deadline=None)
def test_shuffled_shards_property_matches_global_cumsum(spark, rows, shard_tokens):
    import hashlib

    from pyspark.sql import functions as F

    from d365fo_db_sync_spark.operators.packing import shuffled_shards

    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (r["g_start"], r["shard"])
        for r in shuffled_shards(df, F.col("n_tokens"), shard_tokens).collect()
    }
    order = sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), i, t) for i, t in rows if t > 0
    )
    acc = 0
    for _, i, t in order:
        assert got[i] == (acc, acc // shard_tokens)
        acc += t
    assert len(got) == len(order)


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e", "zz", "q1"]),
            min_size=0, max_size=30,
        ),
        min_size=0, max_size=25,
    ),
    k=st.integers(min_value=2, max_value=12),
    parts=st.integers(min_value=1, max_value=5),
)
@settings(max_examples=30, deadline=None)
def test_heavy_hitters_model_check(spark, docs, k, parts):
    """Model check: heavy_hitters_exact == the naive threshold count on
    random tiny-vocab corpora across random k and partitionings — the
    pigeonhole candidate pass must never lose a true heavy hitter."""
    from collections import Counter

    from d365fo_db_sync_spark.operators.text import heavy_hitters_exact

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    all_toks = [t for toks in docs for t in toks]
    n = len(all_toks)
    cnt = Counter(all_toks)
    expected = {
        (tok, c, n) for tok, c in cnt.items() if c * k > n
    }
    got = {
        (r["token"], r["cnt"], r["n_total"])
        for r in heavy_hitters_exact(df.repartition(parts), "text", k=k).collect()
    }
    assert got == expected


@given(
    list_a=st.lists(
        st.integers(min_value=0, max_value=30), min_size=0, max_size=10,
        unique=True,
    ),
    list_b=st.lists(
        st.integers(min_value=0, max_value=30), min_size=0, max_size=10,
        unique=True,
    ),
    k=st.integers(min_value=1, max_value=12),
    k_rrf=st.integers(min_value=1, max_value=80),
)
@settings(max_examples=30, deadline=None)
def test_rrf_fuse_model_check(spark, list_a, list_b, k, k_rrf):
    """Model check: rrf_fuse == the naive dict-merge reference on random
    ranked lists (rank = position), including one-sided items, fused
    ordering with id tie-breaks, and the top-k cut."""
    from d365fo_db_sync_spark.operators.retrieval import rrf_fuse

    def frame(items):
        return spark.createDataFrame(
            [(1, it, r + 1) for r, it in enumerate(items)],
            "query_id long, item_id long, rnk int",
        )

    scores: dict[int, float] = {}
    lists_n: dict[int, int] = {}
    for items in (list_a, list_b):
        for r, it in enumerate(items):
            scores[it] = scores.get(it, 0.0) + 1.0 / (k_rrf + r + 1)
            lists_n[it] = lists_n.get(it, 0) + 1
    order = sorted(scores, key=lambda it: (-scores[it], it))[:k]
    expected = {
        it: (rank + 1, lists_n[it], scores[it])
        for rank, it in enumerate(order)
    }

    got = {
        r["item_id"]: (r["rnk"], r["n_lists"], r["rrf_score"])
        for r in rrf_fuse([frame(list_a), frame(list_b)], k=k, k_rrf=k_rrf).collect()
    }
    assert got.keys() == expected.keys()
    for it, (rk, nl, sc) in expected.items():
        grk, gnl, gsc = got[it]
        assert (grk, gnl) == (rk, nl), (it, got[it], expected[it])
        assert abs(gsc - sc) < 1e-12


@given(
    train_docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "dd", "e"]), min_size=0, max_size=12),
        min_size=1, max_size=12,
    ),
    held_docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd", "e", "zz", "q7"]),
            min_size=0, max_size=12,
        ),
        min_size=1, max_size=8,
    ),
    top_v=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=25, deadline=None)
def test_bigram_lm_model_check(spark, train_docs, held_docs, top_v):
    """Model check: train the add-one bigram LM exactly as the suite
    query does, then score random HELD-OUT docs (exercising all three
    lookup tiers) against an independent pure-Python scorer."""
    import math

    from pyspark.sql import functions as F

    from d365fo_db_sync_spark.operators import text

    train = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(train_docs)],
        "doc_id long, text string",
    )
    held = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(held_docs)],
        "doc_id long, text string",
    )
    top = text.unigram_vocab(train, "text", top_v=top_v).collect()
    vocab = sorted(r["tok"] for r in top)
    v1 = len(vocab) + 1

    def mapped(toks):
        return [t if t in vocab else "<unk>" for t in toks]

    uc: dict[str, int] = {}
    bc: dict[str, int] = {}
    for t in train_docs:
        m = mapped(t)
        for w in m:
            uc[w] = uc.get(w, 0) + 1
        for w1, w2 in zip(m, m[1:]):
            bc[f"{w1} {w2}"] = bc.get(f"{w1} {w2}", 0) + 1

    from hypothesis import assume

    # an all-empty training stream has no LM to train (the operator
    # correctly refuses an empty fallback map — covered by the unit test)
    assume(uc)
    flp = {w: -math.log(c + v1) for w, c in uc.items()}
    blp = {b: math.log((c + 1) / (uc[b.split(" ")[0]] + v1)) for b, c in bc.items()}

    def ref_score(toks):
        m = mapped(toks)
        pairs = [f"{w1} {w2}" for w1, w2 in zip(m, m[1:])]
        lp = 0.0
        for b in pairs:
            w1 = b.split(" ")[0]
            lp += blp.get(b, flp.get(w1, -math.log(v1)))
        return lp / max(len(pairs), 1)

    got = {
        r["doc_id"]: r["s"]
        for r in held.select(
            "doc_id", text.bigram_logprob("text", blp, flp, vocab).alias("s")
        ).collect()
    }
    for i, toks in enumerate(held_docs):
        assert abs(got[i] - ref_score(toks)) < 1e-10, (i, toks)


@given(
    groups=st.dictionaries(
        st.sampled_from(["s1", "s2", "s3"]),
        st.lists(
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
            min_size=1, max_size=40,
        ),
        min_size=1, max_size=3,
    ),
    lo_q=st.floats(min_value=0.01, max_value=0.45),
    hi_q=st.floats(min_value=0.55, max_value=1.0),
)
@settings(max_examples=25, deadline=None)
def test_winsorized_group_stats_model_check(spark, groups, lo_q, hi_q):
    """Model check: winsorized_group_stats vs a pure-Python reference
    on random group/value sets and random quantile pairs — discrete
    rank bounds, clip counts, and the winsorized mean.

    The per-row round emulates Spark's HALF_UP-on-shortest-repr
    semantics (Python's round() is half-to-even, which differs at
    exact .5e-6 boundaries); the final mean is compared against the
    UNROUNDED reference mean with a half-ulp-of-rounding tolerance,
    because Spark's partition-order float sum can legitimately flip
    the last rounding step at a knife-edge boundary."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from d365fo_db_sync_spark.operators.text import winsorized_group_stats

    def spark_round6(x):
        q = Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP)
        return float(q)

    rows = [
        (src, i, v)
        for src, vals in groups.items()
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "src string, doc_id long, q double")
    got = {
        r["src"]: (
            r["n_docs"], r["p_lo"], r["p_hi"],
            r["clipped_lo"], r["clipped_hi"], r["avg_winsorized"],
        )
        for r in winsorized_group_stats(
            df.repartition(3), "src", "q", lo_q=lo_q, hi_q=hi_q,
            tiebreak_cols=("doc_id",),
        ).collect()
    }
    for src, vals in groups.items():
        s = sorted(vals)
        n = len(s)
        p_lo = s[max(math.ceil(lo_q * n), 1) - 1]
        p_hi = s[math.ceil(hi_q * n) - 1]
        clipped = [min(max(v, p_lo), p_hi) for v in vals]
        avg = sum(spark_round6(c) for c in clipped) / n
        gn, gp_lo, gp_hi, gclo, gchi, gavg = got[src]
        assert (gn, gp_lo, gp_hi) == (n, p_lo, p_hi), (src, got[src])
        assert gclo == sum(v < p_lo for v in vals)
        assert gchi == sum(v > p_hi for v in vals)
        assert abs(gavg - avg) <= 5.1e-7 + abs(avg) * 1e-12, (src, gavg, avg)
