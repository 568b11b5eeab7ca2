"""connected_components vs a union-find ground truth."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators import graph


def _union_find(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _check(spark, edges: list[tuple[int, int]]):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["node"], r["component"])
        for r in graph.connected_components(df, "src", "dst").collect()
    }
    want = set(_union_find(0, edges).items())
    assert got == want


def test_chain_contracts_to_one_component(spark):
    # a 60-node path is the label-propagation worst case; star rounds
    # must still converge well inside max_iter
    _check(spark, [(i, i + 1) for i in range(60)])


def test_disjoint_cliques_and_singleton_edge(spark):
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (20, 21), (30, 31)]
    _check(spark, edges)


def test_duplicate_reversed_and_self_edges(spark):
    _check(spark, [(2, 1), (1, 2), (3, 3), (3, 2), (7, 9), (9, 7)])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed)
    n = 80
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(20, 90))
    ]
    edges = [e for e in edges if e[0] != e[1]]
    _check(spark, edges)


def test_long_path_converges_far_below_max_iter(spark):
    """Adversarial convergence guard: a pure path graph is the worst
    case for star contraction (label propagation would need O(n)
    rounds). Kiveris et al. bound large-star/small-star at O(log^2 n);
    pin the observed round count ≪ the max_iter=50 RuntimeError guard
    at 10^4 nodes so a contraction regression fails here, not as a
    surprise RuntimeError on a production corpus.

    On a real cluster swap localCheckpoint for checkpoint() + a
    checkpoint dir (executor loss tolerance) — see graph.py header.
    """
    n = 10_000
    edges = spark.range(n - 1).selectExpr("id AS src", "id + 1 AS dst")
    stats: dict = {}
    labels = graph.connected_components(edges, "src", "dst", stats=stats)
    distinct = labels.select("component").distinct().collect()
    assert [r["component"] for r in distinct] == [0]
    assert labels.count() == n
    assert stats["rounds"] <= 15, stats


def test_near_dup_clusters_survivors(spark):
    docs = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(1, 2), (2, 5), (7, 8)], "id_a long, id_b long"
    )
    rows = {
        r["doc_id"]: (r["cluster_id"], r["is_survivor"])
        for r in graph.near_dup_clusters(docs, pairs).collect()
    }
    assert rows[1] == (1, True) and rows[2] == (1, False) and rows[5] == (1, False)
    assert rows[7] == (7, True) and rows[8] == (7, False)
    # untouched docs are singleton survivors
    assert rows[0] == (0, True) and rows[9] == (9, True)
    assert len(rows) == 10


def test_update_components_matches_full_recompute(spark):
    rng = random.Random(42)
    n = 60
    old = [(rng.randrange(n), rng.randrange(n)) for _ in range(50)]
    new = [(rng.randrange(n), rng.randrange(n)) for _ in range(25)]
    old = [e for e in old if e[0] != e[1]]
    new = [e for e in new if e[0] != e[1]]

    old_df = spark.createDataFrame(old, "src long, dst long")
    new_df = spark.createDataFrame(new, "src long, dst long")
    labels = graph.connected_components(old_df, "src", "dst")
    got = {
        (r["node"], r["component"])
        for r in graph.update_components(labels, new_df).collect()
    }
    # ground truth: full recompute over the union; nodes only in old
    # singletons must survive the update too
    want = set(_union_find(0, old + new).items())
    old_nodes = {x for e in old for x in e}
    want |= {(x, x) for x in old_nodes if (x not in {a for a, _ in want})}
    want = {(n_, c) for n_, c in want}
    assert got == want


def test_update_components_merges_two_old_clusters(spark):
    old_df = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "src long, dst long")
    labels = graph.connected_components(old_df, "src", "dst")
    bridge = spark.createDataFrame([(3, 10)], "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in graph.update_components(labels, bridge).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 1, 11: 1}


def test_incremental_cluster_lifecycle(spark, tmp_path):
    """The full continuous-dedup composition: persisted band-bucket
    index + in-batch LSH for pairs, exact-Jaccard verify, then
    update_components — the incremental labels must equal a from-scratch
    run over the union corpus."""
    from d365fo_db_sync_spark.operators import dedup
    from d365fo_db_sync_spark.sinks import BucketedParquetTarget

    def corpus(lo, hi, dup_of=None):
        rows = []
        for i in range(lo, hi):
            base = " ".join(f"tok{i}_{j}" for j in range(12))
            rows.append((i, base))
            if dup_of is not None and i % 3 == 0:
                rows.append((i + 1000, base + " extra"))  # near-dup twin
        return rows

    v1 = spark.createDataFrame(corpus(0, 12, dup_of=True), "doc_id long, text string")
    v2 = spark.createDataFrame(
        corpus(12, 20, dup_of=True)
        + [(2000, " ".join(f"tok3_{j}" for j in range(12)))],  # dups doc 3
        "doc_id long, text string",
    )

    def verified_pairs(df, cands):
        return dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=0.7, candidates=cands
        ).select("id_a", "id_b")

    idx = BucketedParquetTarget(str(tmp_path / "idx"), key="bkey", n_buckets=8)

    # cycle 1: index v1, resolve v1's clusters
    dedup.ingest_batch_near_dup(spark, v1, idx, num_hashes=64, bands=32, shingle_n=3)
    p1 = verified_pairs(
        v1, dedup.minhash_lsh_candidates(v1, "doc_id", "text", 64, 32, 3)
    )
    labels = graph.connected_components(p1, "id_a", "id_b")

    # cycle 2: probe the index for cross-batch dups + in-batch dups
    union = v1.union(v2)
    cross = dedup.ingest_batch_near_dup(
        spark, v2, idx, num_hashes=64, bands=32, shingle_n=3
    ).select(F.col("doc_id").alias("id_a"), F.col("dup_id").alias("id_b"))
    inb = dedup.minhash_lsh_candidates(v2, "doc_id", "text", 64, 32, 3)
    p2 = verified_pairs(union, cross.union(inb.select("id_a", "id_b")))
    updated = {
        (r["node"], r["component"])
        for r in graph.update_components(labels, p2, "id_a", "id_b").collect()
    }

    # ground truth: one-shot pairs + CC over the whole union corpus
    full = verified_pairs(
        union, dedup.minhash_lsh_candidates(union, "doc_id", "text", 64, 32, 3)
    )
    want = {
        (r["node"], r["component"])
        for r in graph.connected_components(full, "id_a", "id_b").collect()
    }
    assert updated == want
    assert want  # the twins guarantee non-trivial clusters


def test_near_dup_clusters_with_no_pairs(spark):
    docs = spark.range(0, 6).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    rows = graph.near_dup_clusters(docs, pairs).collect()
    assert len(rows) == 6
    assert all(r["cluster_id"] == r["doc_id"] and r["is_survivor"] for r in rows)


def test_update_components_with_empty_batch(spark):
    old_df = spark.createDataFrame([(1, 2), (4, 5)], "src long, dst long")
    labels = graph.connected_components(old_df, "src", "dst")
    empty = spark.createDataFrame([], "src long, dst long")
    got = {
        (r["node"], r["component"])
        for r in graph.update_components(labels, empty).collect()
    }
    assert got == {(1, 1), (2, 1), (4, 4), (5, 4)}


def test_connected_components_never_writes_session_conf(spark, monkeypatch):
    """The adaptive shuffle-width clamp is applied via explicit
    repartition(width, keys), NOT by mutating session-global
    spark.sql.shuffle.partitions (which would race concurrent queries
    under the orchestrator's FAIR-scheduler pool). Pin both halves:
    (a) a non-numeric conf read (e.g. 'auto' on some platforms) falls
    back to a default instead of raising; (b) conf.set is never called
    on the shuffle-partitions key at all."""
    from pyspark.sql.conf import RuntimeConfig

    from d365fo_db_sync_spark.operators.graph import connected_components

    key = "spark.sql.shuffle.partitions"
    real_get, real_set = RuntimeConfig.get, RuntimeConfig.set
    writes = []

    def fake_get(self, k, *args, **kwargs):
        if k == key:
            return "auto"
        return real_get(self, k, *args, **kwargs)

    def fake_set(self, k, v):
        if k == key:
            writes.append(v)
            return
        real_set(self, k, v)

    monkeypatch.setattr(RuntimeConfig, "get", fake_get)
    monkeypatch.setattr(RuntimeConfig, "set", fake_set)
    edges = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    comp = {
        r["node"]: r["component"]
        for r in connected_components(edges, src="id_a", dst="id_b").collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    assert writes == []  # session conf untouched


def test_containment_dedup_keeps_longest(spark):
    """Keep-longest survivor: the container (max size) survives each
    transitive cluster, min id breaks size ties, singletons survive."""
    from d365fo_db_sync_spark.operators.graph import containment_dedup

    docs = spark.createDataFrame(
        # cluster {1,2,3}: 3 is longest; cluster {10,11}: tie -> min id 10;
        # 99 is a singleton
        [(1, 10), (2, 20), (3, 30), (10, 7), (11, 7), (99, 5)],
        "doc_id long, __size long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (11, 10)], "id_a long, id_b long"
    )
    out = {
        r["doc_id"]: (r["cluster_id"], r["is_survivor"])
        for r in containment_dedup(docs, pairs).collect()
    }
    assert out == {
        1: (1, False),
        2: (1, False),
        3: (1, True),   # longest in cluster
        10: (10, True),  # size tie -> min id
        11: (10, False),
        99: (99, True),  # singleton
    }


def test_containment_dedup_matches_union_find_model(spark):
    """Randomized model check: survivor choice must equal a plain
    union-find + keep-longest/min-id reference on arbitrary graphs
    (chains, stars, size ties, isolated nodes)."""
    import random

    from d365fo_db_sync_spark.operators.graph import containment_dedup

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        n = 30
        sizes = {i: rng.randint(1, 6) for i in range(n)}
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randint(5, 25))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        clusters: dict[int, list[int]] = {}
        for i in range(n):
            clusters.setdefault(find(i), []).append(i)
        expect = {}
        for root, members in clusters.items():
            best = min(members, key=lambda m: (-sizes[m], m))
            for m in members:
                expect[m] = (root, m == best)

        docs = spark.createDataFrame(
            [(i, sizes[i]) for i in range(n)], "doc_id long, __size long"
        )
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r["doc_id"]: (r["cluster_id"], r["is_survivor"])
            for r in containment_dedup(docs, pairs).collect()
        }
        assert got == expect, f"seed={seed}"


def test_containment_dedup_all_null_sizes_still_elects_winner(spark):
    from d365fo_db_sync_spark.operators.graph import containment_dedup

    docs = spark.createDataFrame(
        [(1, None), (2, None), (9, 4)], "doc_id long, __size long"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    out = {
        r["doc_id"]: r["is_survivor"]
        for r in containment_dedup(docs, pairs).collect()
    }
    # NULL sizes: min-id wins, is_survivor is never NULL
    assert out == {1: True, 2: False, 9: True}


def test_pagerank_model_check(spark):
    """3-iteration PageRank on a small directed graph equals the
    plain-Python power iteration; scores sum to ~1 on a graph with no
    dangling nodes; input validation raises."""
    import pytest

    from d365fo_db_sync_spark.operators.graph import pagerank

    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (3, 4), (4, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["pagerank"] for r in pagerank(df, iters=3).collect()}

    nodes = sorted({s for s, _ in edges})
    deg = {n: sum(1 for s, _ in edges if s == n) for n in nodes}
    score = {n: 1.0 / len(nodes) for n in nodes}
    for _ in range(3):
        inflow = {n: 0.0 for n in nodes}
        for s, t in edges:
            inflow[t] += score[s] / deg[s] * 0.85
        score = {n: (1.0 - 0.85) / len(nodes) + inflow[n] for n in nodes}
    for n in nodes:
        assert abs(got[n] - score[n]) < 1e-9, (n, got[n], score[n])
    assert abs(sum(got.values()) - 1.0) < 1e-9
    with pytest.raises(ValueError):
        pagerank(df, damping=1.0)
    with pytest.raises(ValueError):
        pagerank(df, iters=0)


def _brute_triangles(edges: list[tuple[int, int]]) -> dict[int, int]:
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({n for e in es for n in e})
    counts: dict[int, int] = {}
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if (a, b) not in es:
                continue
            for c in nodes[nodes.index(b) + 1 :]:
                if (b, c) in es and (a, c) in es:
                    for n in (a, b, c):
                        counts[n] = counts.get(n, 0) + 1
    return counts


def _check_triangles(spark, edges: list[tuple[int, int]]):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["triangles"]
        for r in graph.triangle_counts(df, "src", "dst").collect()
    }
    assert got == _brute_triangles(edges)


def test_triangle_counts_known_shapes(spark):
    # K4: every node sits in C(3,2)=3 triangles
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    _check_triangles(spark, k4)
    # a triangle plus a pendant edge: pendant node in none
    _check_triangles(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    # square (no diagonal): zero triangles -> empty frame
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    assert graph.triangle_counts(df).count() == 0


def test_triangle_counts_ignore_duplicates_loops_direction(spark):
    # reversed duplicates, parallel edges, and self-loops collapse
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)]
    _check_triangles(spark, edges)


@pytest.mark.parametrize("seed", [7, 23])
def test_triangle_counts_random_graphs(spark, seed):
    rnd = random.Random(seed)
    edges = [
        (rnd.randrange(12), rnd.randrange(12)) for _ in range(40)
    ]
    _check_triangles(spark, edges)


@pytest.mark.parametrize("seed", [11, 37])
def test_triangle_degree_orientation_equivalence(spark, seed):
    """orient='degree' (the power-law hub path) must produce identical
    per-node counts to the canonical id ordering."""
    rnd = random.Random(seed)
    edges = [(rnd.randrange(14), rnd.randrange(14)) for _ in range(50)]
    # add a deliberate hub so the orientations genuinely differ
    edges += [(0, n) for n in range(1, 14)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {
        r["node"]: r["triangles"]
        for r in graph.triangle_counts(df, orient="id").collect()
    }
    b = {
        r["node"]: r["triangles"]
        for r in graph.triangle_counts(df, orient="degree").collect()
    }
    assert a == b == _brute_triangles(edges)


def test_triangle_orient_validation(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="orient"):
        graph.triangle_counts(df, orient="random")


def _brute_k_core(edges: list[tuple[int, int]], k: int) -> dict[int, int]:
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    while True:
        deg: dict[int, int] = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        low = {n for n, d in deg.items() if d < k}
        if not low:
            return deg
        es = {(a, b) for a, b in es if a not in low and b not in low}


def _check_k_core(spark, edges: list[tuple[int, int]], k: int):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["degree"] for r in graph.k_core(df, k, "src", "dst").collect()
    }
    assert got == _brute_k_core(edges, k), (edges, k)


def test_k_core_known_shapes(spark):
    # K4 with a pendant tail: 3-core = the K4, tail peels (cascade)
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    tail = [(3, 10), (10, 11), (11, 12)]
    _check_k_core(spark, k4 + tail, 3)
    # 2-core of a pure path is empty (full cascade)
    _check_k_core(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], 2)
    # a cycle IS its own 2-core
    _check_k_core(spark, [(1, 2), (2, 3), (3, 1)], 2)


@pytest.mark.parametrize("seed,k", [(5, 2), (19, 3)])
def test_k_core_random_graphs(spark, seed, k):
    rnd = random.Random(seed)
    edges = [(rnd.randrange(15), rnd.randrange(15)) for _ in range(45)]
    _check_k_core(spark, edges, k)


def test_k_core_validation(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="k must be"):
        graph.k_core(df, 0)


def test_k_core_chain_trips_max_iter_instead_of_hanging(spark):
    """Worst-case topology: k=2 on a bare 20-node path peels only the
    two endpoints per round (~n/2 rounds total). With max_iter below
    that, the documented RuntimeError must fire — not a hang, not a
    silently-partial core."""
    path = [(i, i + 1) for i in range(19)]
    df = spark.createDataFrame(path, "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.k_core(df, 2, max_iter=5)
    # and with enough budget the same chain peels clean to empty
    assert graph.k_core(df, 2, max_iter=15).count() == 0


class TestLabelPropagation:
    def test_matches_bruteforce_rounds(self, spark):
        """Synchronous mode-LPA with smallest-label ties vs a Python
        replay, on a graph with two dense triangles joined by one
        bridge — the density case CC cannot express (CC would merge
        everything)."""
        from d365fo_db_sync_spark.operators.graph import label_propagation

        edges = [
            (1, 2), (2, 3), (1, 3),      # triangle A
            (4, 5), (5, 6), (4, 6),      # triangle B
            (3, 4),                      # thin bridge
            (9, 9),                      # self loop: ignored
        ]
        df = spark.createDataFrame(edges, "src long, dst long")

        def brute(rounds):
            adj: dict[int, list[int]] = {}
            for a, b in edges:
                if a == b:
                    continue
                adj.setdefault(a, []).append(b)
                adj.setdefault(b, []).append(a)
            lbl = {v: v for v in adj}
            for _ in range(rounds):
                new = {}
                for v, ns in adj.items():
                    freq: dict[int, int] = {}
                    for n in ns:
                        freq[lbl[n]] = freq.get(lbl[n], 0) + 1
                    best = sorted(freq.items(), key=lambda p: (-p[1], p[0]))[0][0]
                    new[v] = best
                lbl = new
            return lbl

        for rounds in (1, 3):
            got = {
                r["node"]: r["community"]
                for r in label_propagation(df, rounds=rounds).collect()
            }
            assert got == brute(rounds)
        # density read after 3 rounds: the two triangles hold distinct
        # labels despite the bridge (CC would report one component)
        got3 = {
            r["node"]: r["community"]
            for r in label_propagation(df, rounds=3).collect()
        }
        assert len({got3[1], got3[4]}) == 2

    def test_isolated_and_validation(self, spark):
        import pytest

        from d365fo_db_sync_spark.operators.graph import label_propagation

        df = spark.createDataFrame([(1, 1)], "src long, dst long")
        assert label_propagation(df, rounds=2).count() == 0  # self loops only
        with pytest.raises(ValueError, match="rounds"):
            label_propagation(df, rounds=0)
