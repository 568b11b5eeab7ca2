"""Product quantization (PQ) for embedding similarity at storage scale.

PQ (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
Search" — public paper) splits each d-dim vector into ``m`` subvectors
and replaces each with the id of its nearest per-subspace centroid:
d floats become m small codes (one byte each here) — a 32× storage
cut at d=64/m=8 over float32, far past int8's 4× — and distance
evaluation becomes ``m`` table lookups (ADC: asymmetric distance
computation), no floating multiply per corpus vector.

Spark mapping:

* **train** — per-subspace k-means on a driver-collected SAMPLE
  (codebooks are tiny: m × k × d/m floats; training data for 256
  centroids needs ~100k vectors, a sample at any corpus scale —
  the same sampled-fit discipline as similarity.ivf_index);
* **encode** — one `mapInPandas` pass: per Arrow batch, m argmin
  distance computations against the broadcast codebooks (numpy GEMM
  per subspace), emitting ``codes array<int>``;
* **search (ADC)** — per query, precompute the m × k lookup table of
  partial squared distances driver-side (m·k floats — metadata), ship
  it with the task, and score each corpus batch with numpy fancy
  indexing + row sum: ``dist ≈ Σ_j LUT[j, code_j]``; per-batch
  partial top-k before the single shuffle, exactly the map-side
  combine shape of similarity.cosine_topk_bruteforce_np.

Vectors are L2-NORMALIZED before train/encode, so squared-L2 order
equals cosine order (‖a−b‖² = 2−2·cos on the unit sphere) and PQ
results rank against the same ground truth as the exact cosine path.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PQCodebooks:
    m: int
    k: int
    dim: int
    # centroids[j] is a (k, dim/m) list-of-lists for subspace j
    centroids: tuple


def _normalize(mat):
    import numpy as np

    norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    return mat / norms


def pq_train(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    sample_limit: int = 100_000,
    seed: int = 42,
    iters: int = 10,
) -> PQCodebooks:
    """Fit per-subspace codebooks with plain Lloyd's iterations in numpy
    over a driver sample (deterministic: seeded init by evenly-spaced
    sorted sample rows, fixed iteration count). k ≤ 256 keeps codes
    byte-sized."""
    import numpy as np

    rows = (
        df.select(vec_col).limit(sample_limit).collect()
    )
    x = _normalize(np.array([list(r[0]) for r in rows], dtype=np.float64))
    n, dim = x.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    if k > n:
        raise ValueError("sample smaller than k")
    d_sub = dim // m
    rng = np.random.default_rng(seed)
    codebooks = []
    for j in range(m):
        sub = x[:, j * d_sub : (j + 1) * d_sub]
        # deterministic spread init: k distinct sample rows
        init_idx = rng.permutation(n)[:k]
        c = sub[init_idx].copy()
        for _ in range(iters):
            # ||s-c||^2 = ||s||^2 - 2 s.c + ||c||^2; the ||s||^2 term
            # is constant per row, so the argmin is unchanged when it
            # is dropped. The naive broadcast form materializes an
            # (n, k, d_sub) intermediate — ~1.6 GB at sample_limit=100k,
            # k=256, d_sub=8 — where this GEMM form is O(n*k).
            d2 = -2.0 * sub @ c.T + (c**2).sum(axis=1)[None, :]
            assign = d2.argmin(axis=1)
            for ci in range(k):
                mask = assign == ci
                if mask.any():
                    c[ci] = sub[mask].mean(axis=0)
        codebooks.append(c.tolist())
    return PQCodebooks(m=m, k=k, dim=dim, centroids=tuple(codebooks))


def pq_encode(
    df: DataFrame,
    books: PQCodebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — one Arrow-batched pass; per batch the
    per-subspace assignment is a numpy distance matrix + argmin."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, IntegerType, LongType, StructField, StructType

    cents = [np.array(c, dtype=np.float64) for c in books.centroids]
    d_sub = books.dim // books.m
    schema = StructType(
        [StructField(id_col, LongType()), StructField("codes", ArrayType(IntegerType()))]
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            x = _normalize(np.array([list(v) for v in pdf[vec_col]], dtype=np.float64))
            codes = np.empty((len(ids), books.m), dtype=np.int32)
            for j in range(books.m):
                sub = x[:, j * d_sub : (j + 1) * d_sub]
                # ||s - c||^2 = ||s||^2 - 2 s.c + ||c||^2; argmin over c
                d2 = (
                    -2.0 * sub @ cents[j].T
                    + (cents[j] ** 2).sum(axis=1)[None, :]
                )
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame({id_col: ids, "codes": list(codes.tolist())})

    return df.select(id_col, vec_col).mapInPandas(run, schema)


def pq_topk(
    encoded: DataFrame,
    queries: DataFrame,
    books: PQCodebooks,
    kk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ADC top-k: approximate nearest neighbors of each query over the
    PQ-encoded corpus. Queries stay exact (asymmetric); the per-query
    m × k lookup tables ship with the task closure; each corpus batch
    scores with fancy indexing and pre-reduces to its local top-k
    before the single rank shuffle."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    cents = [np.array(c, dtype=np.float64) for c in books.centroids]
    d_sub = books.dim // books.m
    q_rows = queries.select(query_id_col, vec_col).collect()
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    qmat = _normalize(np.array([list(r[1]) for r in q_rows], dtype=np.float64))
    # LUT[q, j, c] = || q_sub_j - cent_jc ||^2
    luts = np.stack(
        [
            ((qmat[:, j * d_sub : (j + 1) * d_sub][:, None, :] - cents[j][None, :, :]) ** 2).sum(
                axis=2
            )
            for j in range(books.m)
        ],
        axis=1,
    )  # (n_q, m, k)

    schema = StructType(
        [
            StructField(query_id_col, LongType()),
            StructField("neighbor_id", LongType()),
            StructField("adc_dist", DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            codes = np.array(list(pdf["codes"]), dtype=np.int64)  # (n, m)
            out_q, out_n, out_d = [], [], []
            for qi in range(len(qids)):
                # Σ_j LUT[qi, j, codes[:, j]] — m fancy-indexed adds
                d = luts[qi, np.arange(books.m)[None, :], codes].sum(axis=1)
                mask = ids != qids[qi]
                cand_ids, cand_d = ids[mask], d[mask]
                n_loc = min(kk, len(cand_ids))
                if n_loc == 0:
                    continue
                order = np.lexsort((cand_ids, cand_d))[:n_loc]
                out_q.append(np.full(n_loc, qids[qi]))
                out_n.append(cand_ids[order])
                out_d.append(cand_d[order])
            if out_q:
                yield pd.DataFrame(
                    {
                        query_id_col: np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_n),
                        "adc_dist": np.concatenate(out_d),
                    }
                )

    scored = encoded.mapInPandas(score, schema)
    w = Window.partitionBy(query_id_col).orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= kk)
        .select(query_id_col, "rnk", "neighbor_id", "adc_dist")
    )


def ivf_pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    books: PQCodebooks | None = None,
    n_lists: int = 16,
    n_probes: int = 4,
    kk: int = 10,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """The full billion-scale ANN composition: IVF cells cut the
    candidate set (only ``n_probes``/``n_lists`` of the corpus is
    touched per query), PQ codes cut the memory/IO inside each cell
    (ADC over byte codes), and an EXACT cosine rerank of the ADC top
    ``rerank_factor × kk`` candidates restores full-precision ranking —
    the standard IVF-PQ + refine pipeline (Jégou et al. 2011 §V).

    Output: (query_id, rnk, neighbor_id, cosine) — same contract as
    similarity.cosine_topk_bruteforce, so recall is directly
    measurable against the exact path. The probed-cell set is the
    union over queries, collected driver-side (|queries| × n_probes
    ints — metadata, same discipline as the IVF probe sidecar).
    """
    import numpy as np

    from d365fo_db_sync_spark.operators import similarity

    assigned, model = similarity.ivf_index(
        emb, n_lists=n_lists, id_col=id_col, vec_col=vec_col, seed=seed
    )
    if books is None:
        books = pq_train(emb, vec_col=vec_col, seed=seed)

    centers = np.array([list(map(float, c)) for c in model.clusterCenters()])
    q_rows = queries.select(query_id_col, vec_col).collect()
    qmat = _normalize(np.array([list(r[1]) for r in q_rows], dtype=np.float64))
    # per-query n_probes nearest cells; probed set = union across queries
    d2 = ((qmat[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
    probe_cells = sorted({int(c) for row in d2.argsort(axis=1)[:, :n_probes] for c in row})

    window = assigned.filter(F.col("cell").isin(probe_cells))
    enc = pq_encode(window, books, id_col=id_col, vec_col=vec_col)
    coarse = pq_topk(
        enc,
        queries,
        books,
        kk=kk * rerank_factor,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
    )
    # exact rerank: candidates join back to their float vectors (a
    # kk·rerank_factor·|queries|-row frame — the small side), then the
    # numpy-GEMM scorer restores exact cosine order
    cand_vecs = coarse.select(query_id_col, "neighbor_id").join(
        emb.select(F.col(id_col).alias("neighbor_id"), vec_col), on="neighbor_id"
    )
    reranked = similarity.cosine_topk_bruteforce(
        cand_vecs.select(F.col("neighbor_id").alias(id_col), vec_col).distinct(),
        queries,
        k=kk,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
    )
    # restrict each query's rerank to ITS OWN candidate set (the
    # brute-force above scored the union; an id outside a query's
    # coarse list must not leak into its top-k)
    own = coarse.select(query_id_col, "neighbor_id")
    from pyspark.sql import Window

    filtered = reranked.join(own, on=[query_id_col, "neighbor_id"], how="left_semi")
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        filtered.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= kk)
        .select(query_id_col, "rnk", "neighbor_id", "cosine")
    )


# --- deterministic (oracle-replayable) PQ path ---------------------------
#
# The numpy train/encode/ADC above is the production Arrow path; the
# functions below re-express the SAME contract on the decimal-replay
# discipline (operators/clustering.py): normalization, per-subspace
# Lloyd rounds, code assignment and ADC scoring all reduce to exact
# decimal sums + IEEE-identical scalar ops, so a SQL oracle unrolls
# the entire fit+encode+search. Codebook init is the md5-order seed
# pick (the clustering discipline) instead of a seeded permutation.

_DIST_DEC = "decimal(38,18)"


def normalized_qvec(vec_col) -> "F.Column":
    """L2-normalized, deterministic vector column: components quantize
    ONCE to DECIMAL(28,12) at ingestion, the squared norm is an exact
    DECIMAL(38,18) term sum, and each normalized component is the RAW
    IEEE quotient ``x / sqrt(double(n2))`` — sqrt and division are
    correctly rounded over identical operands, so both engines hold
    the identical double with NO quantization boundary. (r14/r15: the
    quotient previously re-quantized through DECIMAL(28,12); a
    double→decimal cast of a DERIVED double rounds the shortest repr
    on the JVM but the exact binary expansion in DuckDB, and a
    half-boundary splits them — the class of the sf1 k-means centroid
    incident, see clustering.py's module doc.) Zero vectors normalize
    to themselves (the numpy path's max(norm, eps) guard, exactly
    expressible because the zero test runs on exact decimals)."""
    from d365fo_db_sync_spark.operators.clustering import quantized_vec

    qv = quantized_vec(vec_col)
    n2 = F.aggregate(
        F.transform(qv, lambda x: (x * x).cast(_DIST_DEC)),
        F.lit(0).cast(_DIST_DEC),
        lambda acc, v: (acc + v).cast(_DIST_DEC),
    )
    nrm = F.sqrt(n2.cast("double"))
    return F.when(n2 == F.lit(0).cast(_DIST_DEC), qv).otherwise(
        F.transform(qv, lambda x: x / nrm)
    )


def _codebook_frame(spark, centroids, d_sub: int) -> DataFrame:
    """(sub, cw, spos, c) rows from nested centroid lists — m*k*d_sub
    rows of model metadata, broadcast onto the exploded corpus."""
    return spark.createDataFrame(
        [
            (j, ci, p, centroids[j][ci][p])
            for j in range(len(centroids))
            for ci in range(len(centroids[j]))
            for p in range(d_sub)
        ],
        "sub int, cw int, spos int, c double",
    )


def _nv_exploded(
    df: DataFrame, id_col: str, vec_col: str, d_sub: int
) -> DataFrame:
    """(id, sub, spos, comp): the normalized quantized components keyed
    by subspace — the whole deterministic-PQ hot path runs on this
    frame through codegen joins/aggregates (an earlier shape evaluated
    m*k interpreted HOF folds per ROW and was ~100x slower)."""
    return (
        df.select(F.col(id_col), normalized_qvec(vec_col).alias("_nv"))
        .select(id_col, F.posexplode("_nv").alias("pos", "comp"))
        .select(
            id_col,
            (F.col("pos") / d_sub).cast("int").alias("sub"),
            F.pmod("pos", F.lit(d_sub)).cast("int").alias("spos"),
            "comp",
        )
    )


def _codes_exploded(exp: DataFrame, cb: DataFrame, id_col: str) -> DataFrame:
    """(id, sub, cw) nearest codeword per (vector, subspace): broadcast
    codebook join, one combinable (id, sub, cw)-keyed exact decimal
    distance aggregate, argmin as a rank window (ties toward the
    smaller code — the clustering discipline)."""
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    d = (
        exp.join(broadcast(cb), on=["sub", "spos"])
        .groupBy(id_col, "sub", "cw")
        .agg(
            F.sum(
                ((F.col("comp") - F.col("c")) * (F.col("comp") - F.col("c")))
                .cast(_DIST_DEC)
            ).alias("d")
        )
    )
    w = Window.partitionBy(id_col, "sub").orderBy("d", "cw")
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "sub", "cw")
    )


def pq_train_deterministic(
    df: DataFrame,
    m: int = 16,
    k: int = 16,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> PQCodebooks:
    """Per-subspace codebooks via GROUPED fixed-round Lloyd's over the
    FULL corpus — all m subspaces fit in the same jobs, with the
    clustering.kmeans_fit exactness toolkit: md5-order seed rows,
    exact DECIMAL(38,18) term-quantized distances and mean sums with
    raw-IEEE-quotient centroids (no derived-double→decimal re-casts),
    argmin ties toward the smaller code, empty codewords
    keeping their previous centroid. Per round: one combinable
    distance aggregate + one rank window (assignment), one combinable
    (sub, code, dim)-keyed mean aggregate + an m*k*d_sub-row bounded
    collect (update). The exploded normalized corpus is materialized
    ONCE (localCheckpoint, released on exit) and reused by every
    round. Unlike pq_train's driver-sample numpy fit, every number
    replays as unrolled SQL CTEs."""
    from d365fo_db_sync_spark.session import release_local_checkpoint

    spark = df.sparkSession
    first = df.select(F.col(vec_col)).first()
    dim = len(first[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d_sub = dim // m
    seeds = (
        df.select(F.col(id_col).alias("_id"), normalized_qvec(vec_col).alias("_nv"))
        .orderBy(F.md5(F.col("_id").cast("string")), "_id")
        .limit(k)
        .collect()
    )
    centroids = [
        [list(r._nv[j * d_sub : (j + 1) * d_sub]) for r in seeds]
        for j in range(m)
    ]
    exp = _nv_exploded(df, id_col, vec_col, d_sub).localCheckpoint(eager=True)
    try:
        for _ in range(rounds):
            cb = _codebook_frame(spark, centroids, d_sub)
            codes = _codes_exploded(exp, cb, id_col)
            # codeword mean: normalized components are DERIVED doubles
            # (raw norm quotients), so the order-free sum quantizes each
            # TERM to DECIMAL(38,18) (the gradient/entropy-term
            # discipline), and the mean itself stays the RAW IEEE
            # quotient of that exact sum — no DECIMAL(28,12) re-cast
            # (the sf1 half-boundary class, clustering.py module doc).
            upd = (
                codes.join(exp, on=[id_col, "sub"])
                .groupBy("sub", "cw", "spos")
                .agg(
                    F.sum(F.col("comp").cast(_DIST_DEC)).alias("s"),
                    F.count("*").alias("n"),
                )
                .select(
                    "sub",
                    "cw",
                    "spos",
                    (F.col("s").cast("double") / F.col("n").cast("double"))
                    .alias("c"),
                )
                .collect()
            )
            new = {(r.sub, r.cw, r.spos): r.c for r in upd}
            centroids = [
                [
                    [
                        new.get((j, ci, p), centroids[j][ci][p])
                        for p in range(d_sub)
                    ]
                    for ci in range(k)
                ]
                for j in range(m)
            ]
    finally:
        release_local_checkpoint(exp)
    return PQCodebooks(m=m, k=k, dim=dim, centroids=tuple(centroids))


def pq_encode_exact(
    df: DataFrame,
    books: PQCodebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) via exact decimal argmin — pq_encode's
    oracle-replayable twin. One broadcast codebook join + one
    combinable distance aggregate + the argmin rank window + a
    per-vector collect_list (sub-sorted, so the array is positional)."""
    spark = df.sparkSession
    d_sub = books.dim // books.m
    cb = _codebook_frame(spark, list(books.centroids), d_sub)
    exp = _nv_exploded(df, id_col, vec_col, d_sub)
    codes = _codes_exploded(exp, cb, id_col)
    return codes.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "cw"))),
            lambda t: t["cw"],
        ).alias("codes")
    )


def pq_topk_exact(
    encoded: DataFrame,
    queries: DataFrame,
    books: PQCodebooks,
    kk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ADC top-k with exact decimal lookup tables — pq_topk's
    oracle-replayable twin. The per-(query, subspace, codeword) LUT is
    built distributed (the query side is small by construction) and
    broadcast onto the exploded corpus codes; the per-pair ADC
    distance is an exact decimal sum of m LUT entries, so ranking ties
    cannot drift cross-engine. One broadcast join + one (query,
    neighbor)-keyed combinable aggregate + the rank window."""
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    spark = encoded.sparkSession
    d_sub = books.dim // books.m
    cb = spark.createDataFrame(
        [
            (j, ci, p, books.centroids[j][ci][p])
            for j in range(books.m)
            for ci in range(books.k)
            for p in range(d_sub)
        ],
        "sub int, cw int, spos int, c double",
    )
    qn = queries.select(
        F.col(query_id_col), normalized_qvec(vec_col).alias("_nv")
    )
    qexp = qn.select(
        query_id_col, F.posexplode("_nv").alias("pos", "comp")
    ).select(
        query_id_col,
        (F.col("pos") / d_sub).cast("int").alias("sub"),
        F.pmod("pos", F.lit(d_sub)).cast("int").alias("spos"),
        "comp",
    )
    lut = (
        qexp.join(broadcast(cb), on=["sub", "spos"])
        .groupBy(query_id_col, "sub", "cw")
        .agg(
            F.sum(
                ((F.col("comp") - F.col("c")) * (F.col("comp") - F.col("c")))
                .cast(_DIST_DEC)
            ).alias("d")
        )
    )
    codes = encoded.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode("codes").alias("sub", "cw"),
    )
    scored = (
        codes.join(broadcast(lut), on=["sub", "cw"])
        .groupBy(query_id_col, "neighbor_id")
        .agg(F.sum("d").alias("_adc_dec"))
        .filter(F.col(query_id_col) != F.col("neighbor_id"))
    )
    # Rank on the UNCAST decimal sum so ties resolve identically to the
    # oracle's decimal ORDER BY (two decimal distances that collapse to
    # the same double must still order by decimal magnitude, not by the
    # neighbor_id tie-break); cast to double only in the final select.
    w = Window.partitionBy(query_id_col).orderBy(
        F.asc("_adc_dec"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= kk)
        .select(
            query_id_col,
            "rnk",
            "neighbor_id",
            F.col("_adc_dec").cast("double").alias("adc_dist"),
        )
    )
