"""Similarity search over embedding columns (array<float>).

Two paths, as a 100 TB engine needs both:

* brute-force cosine top-k — exact baseline. The dot product runs as a
  higher-order-function fold (zip_with + aggregate) in the JVM: no
  Python, no UDF. The QUERIES side is broadcast (small by construction);
  the corpus streams through executors and never shuffles until the
  final per-query top-k (rank window on the query key).
* random-hyperplane LSH ANN — the scale path: 2^bits buckets, candidates
  only within a bucket (plus optional multi-probe neighbors), exact
  re-rank on the candidate set. Hyperplanes are derived deterministically
  from a seed so plans are reproducible across runs/executors.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def vec_matrix_np(values):
    """Iterable of array<float/double> cells -> (float64 matrix,
    zero-safe L2 norms). An all-zero vector has no direction, so its
    cosine to anything is defined as 0.0 — the zero norm is replaced
    by 1.0 before dividing. Dividing by the raw norm would yield NaN,
    which silently vanishes from ``>= threshold`` filters and, worse,
    WINS argmaxes (numpy sorts NaN as maximal). Shared by the
    GEMM-batch scorers (semantic contamination, MMR)."""
    import numpy as np

    mat = np.array([list(v) for v in values], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    return mat, np.where(norms == 0.0, 1.0, norms)


def with_norm(df: DataFrame, vec_col: str = "embedding", out: str = "norm") -> DataFrame:
    """Precompute L2 norms once — at scale this column is written with the
    embeddings so cosine needs only the dot product."""
    return df.withColumn(out, _norm(F.col(vec_col)))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Output: (query_id, rnk, neighbor_id, cosine). The queries side is
    broadcast; cosine ties break on neighbor id for determinism.
    """
    c = with_norm(corpus.select(F.col(id_col), F.col(vec_col)), vec_col, "c_norm").alias("c")
    q = with_norm(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("q_vec")), "q_vec", "q_norm"
    ).alias("q")
    # the CORPUS streams, the QUERIES broadcast: queries are small by
    # construction (a top-k request ships a handful of vectors) while the
    # corpus is the 100 TB side — broadcasting it would OOM every executor.
    # BroadcastNestedLoopJoin with the build side pinned to q; plan test
    # asserts the build side (tests/test_plan_properties.py).
    pairs = c.join(F.broadcast(q), F.lit(True))
    cos = _dot(F.col("q_vec"), F.col(vec_col)) / (
        F.col("q_norm") * F.col("c_norm")
    )
    # full-precision cosine: ranking happens on the raw double; any
    # display rounding is the caller's single responsibility (double
    # rounding shifts values that sit near a rounding boundary)
    scored = pairs.select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        cos.alias("cosine"),
    ).filter(F.col(query_id_col) != F.col("neighbor_id"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, "rnk", "neighbor_id", "cosine")
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-Gaussian hyperplanes via Box-Muller over a
    seeded LCG — reproducible without any RNG library."""
    state = seed or 1
    planes: list[list[float]] = []

    def nxt() -> float:
        nonlocal state
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        return (state >> 11) / float(1 << 52)  # uniform (0,1)

    for _ in range(bits):
        plane = []
        for _ in range(dim):
            u1, u2 = max(nxt(), 1e-12), nxt()
            plane.append(math.sqrt(-2.0 * math.log(u1)) * math.cos(2 * math.pi * u2))
        planes.append(plane)
    return planes


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-bit bucket id from fixed hyperplanes — a pure column
    expression: bit i = sign(dot(vec, plane_i))."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = _dot(F.col(vec_col) if isinstance(vec_col, str) else vec_col, F.lit(plane))
        bucket = bucket + F.when(d >= 0, F.lit(1 << i).cast("long")).otherwise(0)
    return bucket


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: bucket corpus and queries by hyperplane signs, join on
    the bucket, exact-rerank within. Approximate — neighbors in other
    buckets are missed (recall grows as bits shrink); the candidate join
    shuffles on bucket id, ~n/2^bits rows per bucket instead of n."""
    planes = _hyperplanes(dim, bits, seed)
    c = with_norm(corpus.select(id_col, vec_col), vec_col, "c_norm").withColumn(
        "bucket", lsh_bucket(vec_col, planes)
    )
    q = with_norm(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("q_vec")), "q_vec", "q_norm"
    ).withColumn("bucket", lsh_bucket("q_vec", planes))
    pairs = q.join(c, on="bucket")
    cos = _dot(F.col("q_vec"), F.col(vec_col)) / (F.col("q_norm") * F.col("c_norm"))
    scored = pairs.select(
        query_id_col,
        F.col(id_col).alias("neighbor_id"),
        cos.alias("cosine"),
    ).filter(F.col(query_id_col) != F.col("neighbor_id"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, "rnk", "neighbor_id", "cosine")
    )


def cosine_topk_bruteforce_np(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    preserve_fold_order: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors per query — the Arrow/numpy scale
    path for the same contract as :func:`cosine_topk_bruteforce`.

    Why it exists: Spark evaluates higher-order functions (zip_with +
    aggregate) INTERPRETED, outside whole-stage codegen — measured at
    sf0.1 with a 10x query fan-out (100 queries x 2000 vectors x 64
    dims), this GEMM formulation is 3.8x faster with identical
    rankings (SCALE.md). Two structural wins over the HOF/BNLJ shape:

    * the corpus streams through ``mapInPandas`` in Arrow batches and
      each batch scores against the whole query matrix as ONE numpy
      matmul (BLAS, cache-friendly) instead of |batch| x |queries|
      interpreted folds;
    * each batch emits only its per-query top-k (exact under the
      (cosine desc, id asc) total order), a map-side combine the rank
      window cannot express — the final shuffle moves k x |queries| x
      n_batches rows, never |corpus| x |queries|.

    The query side is collected to the driver and shipped in the UDF
    closure — queries are small by construction (a top-k request ships
    a handful of vectors), the same contract that lets the HOF path
    broadcast them. The HOF variant remains the cross-engine oracle
    anchor; both are exact, and float accumulation-order differences
    live at ~1e-16, far below ranking gaps.

    ``preserve_fold_order=True`` (r16) replaces the GEMM with a
    dimension-ordered accumulation that reproduces the HOF fold's
    doubles BIT-FOR-BIT: dots and squared norms accumulate as
    ``acc = acc + term`` in dimension order (vectorized ACROSS rows —
    element-wise IEEE adds in the same per-pair sequence as
    ``aggregate(zip_with(...))`` from 0.0), multiplication operand
    order is irrelevant (IEEE multiply is bitwise commutative), and
    sqrt/divide are correctly-rounded single ops in both runtimes. Use
    it where the published values are pinned to the fold (the
    similarity_cosine_topk oracle); the default GEMM is the faster
    shape when ~1e-16 accumulation drift is acceptable."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    q_rows = queries.select(query_id_col, vec_col).collect()

    id_field = corpus.schema[id_col].dataType
    schema = StructType(
        [
            StructField(query_id_col, queries.schema[query_id_col].dataType),
            StructField("neighbor_id", id_field),
            StructField("cosine", DoubleType()),
        ]
    )
    if not q_rows:
        # an empty query set legitimately retrieves nothing — return an
        # empty frame with the contract schema (+rnk) instead of letting
        # a 0-row matrix blow up the axis-1 norm inside the UDF (hit in
        # composition when an upstream screen filters every candidate)
        empty = corpus.sparkSession.createDataFrame([], schema)
        return empty.withColumn("rnk", F.lit(1)).select(
            query_id_col, "rnk", "neighbor_id", "cosine"
        )
    qids = np.array([r[query_id_col] for r in q_rows], dtype=np.int64)
    qmat = np.array([list(r[vec_col]) for r in q_rows], dtype=np.float64)
    if preserve_fold_order:
        # dimension-ordered ||q||: same ((0 + q0*q0) + q1*q1) + ...
        # sequence as _norm's fold
        qn2 = np.zeros(len(qids))
        for d in range(qmat.shape[1]):
            qn2 = qn2 + qmat[:, d] * qmat[:, d]
        qnorm = np.sqrt(qn2)
    else:
        qnorm = np.linalg.norm(qmat, axis=1)

    def _fold_scores(cmat: "np.ndarray") -> tuple["np.ndarray", "np.ndarray"]:
        """(dots, corpus norms) accumulated in dimension order — the
        exact IEEE sequence of the zip_with/aggregate fold, vectorized
        across the batch's rows."""
        dots = np.zeros((cmat.shape[0], qmat.shape[0]))
        cn2 = np.zeros(cmat.shape[0])
        for d in range(cmat.shape[1]):
            dots = dots + np.multiply.outer(cmat[:, d], qmat[:, d])
            cn2 = cn2 + cmat[:, d] * cmat[:, d]
        return dots, np.sqrt(cn2)

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            if len(ids) == 0:
                continue
            cmat = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            if preserve_fold_order:
                dots, cnorm = _fold_scores(cmat)
                scores = dots / np.outer(cnorm, qnorm)
            else:
                cnorm = np.linalg.norm(cmat, axis=1)
                scores = (cmat @ qmat.T) / np.outer(cnorm, qnorm)
            out_q, out_n, out_c = [], [], []
            for j in range(len(qids)):
                col = scores[:, j]
                mask = ids != qids[j]
                cand_ids, cand_cos = ids[mask], col[mask]
                kk = min(k, len(cand_ids))
                if kk == 0:
                    continue
                order = np.lexsort((cand_ids, -cand_cos))[:kk]
                out_q.append(np.full(kk, qids[j]))
                out_n.append(cand_ids[order])
                out_c.append(cand_cos[order])
            if out_q:
                yield pd.DataFrame(
                    {
                        query_id_col: np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_n),
                        "cosine": np.concatenate(out_c),
                    }
                )

    scored = corpus.select(id_col, vec_col).mapInPandas(score, schema)
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, "rnk", "neighbor_id", "cosine")
    )


def fit_whitener(
    emb: DataFrame, vec_col: str = "embedding", eps: float = 1e-6
) -> tuple["object", "object"]:
    """Fit a ZCA whitening transform over an embedding column in ONE
    distributed pass: per-Arrow-batch partial moments (n, Σx, XᵀX as a
    single GEMM) stream out of ``mapInPandas`` as one metadata-sized
    row per batch, the driver sums them and eigendecomposes the d×d
    covariance (d² doubles — 32 KB at d=64; driver-side by design,
    like the PQ codebook fit). Returns ``(mean, W)`` numpy arrays with
    ``W = U diag(1/sqrt(λ+eps)) Uᵀ`` — the symmetric (ZCA) whitener,
    so whitened embeddings stay in the original basis.

    Why it belongs in the retrieval tier: embedding corpora routinely
    carry dominant directions (anisotropy) that crush cosine contrast;
    whitening before ANN/semantic-dedup restores it. Scale shape: the
    corpus is read once, never shuffled; the collected frame is
    #batches rows of d+d²+1 doubles, independent of corpus size."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("n", LongType()),
            StructField("s", ArrayType(DoubleType())),
            StructField("xtx", ArrayType(DoubleType())),
        ]
    )

    def partials(batches):
        # accumulate across ALL of the partition's Arrow batches and
        # emit ONE row per partition: the collected frame is then
        # |partitions| x (1 + d + d^2) doubles — ~32 KB/row at d=64,
        # bounded by the partition count, not the corpus row count
        # (per-batch rows would collect corpus_rows/batch_size rows)
        n = 0
        s = None
        xtx = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            n += len(x)
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            g = x.T @ x
            xtx = g if xtx is None else xtx + g
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "xtx": [xtx.ravel().tolist()]}
            )

    rows = emb.select(vec_col).mapInPandas(partials, schema).collect()
    if not rows:
        raise ValueError("fit_whitener needs a non-empty embedding frame")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    xtx = np.sum([np.asarray(r["xtx"]) for r in rows], axis=0)
    d = s.shape[0]
    mean = s / n
    cov = xtx.reshape(d, d) / n - np.outer(mean, mean)
    lam, u = np.linalg.eigh(cov)
    w = (u * (1.0 / np.sqrt(np.maximum(lam, 0.0) + eps))) @ u.T
    return mean, w


def whiten_embeddings(
    emb: DataFrame,
    model: tuple,
    vec_col: str = "embedding",
    out_col: str | None = None,
) -> DataFrame:
    """Apply a fitted whitener: ``(x - mean) @ W`` per Arrow batch as
    one GEMM (the model ships in the UDF closure — d² doubles, far
    under broadcast thresholds). All other columns pass through;
    ``out_col`` defaults to replacing ``vec_col`` (as array<double>)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    mean, w = (np.asarray(model[0]), np.asarray(model[1]))
    out_col = out_col or vec_col
    fields = []
    for f in emb.schema.fields:
        if f.name == out_col:
            fields.append(StructField(out_col, ArrayType(DoubleType())))
        else:
            fields.append(f)
    if out_col not in emb.columns:
        fields.append(StructField(out_col, ArrayType(DoubleType())))
    schema = StructType(fields)

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            white = (x - mean) @ w
            out = pdf.copy()
            out[out_col] = pd.Series(list(white), index=pdf.index).map(
                lambda a: a.tolist()
            )
            yield out[[f.name for f in fields]]

    return emb.mapInPandas(run, schema)


def cosine_pairs_exact(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine pairs (id_a < id_b) above ``threshold`` — the O(n^2)
    baseline the LSH path approximates. Correctness anchor for small
    frames and the oracle for the bucketed variants; at 100 TB only the
    LSH/IVF paths run."""
    v = with_norm(df.select(id_col, vec_col), vec_col, "norm")
    a, b = v.alias("a"), v.alias("b")
    cos = _dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")) / (
        F.col("a.norm") * F.col("b.norm")
    )
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via the LSH bucket join (id_a < id_b,
    cosine >= threshold). The O(n^2) check happens only inside buckets."""
    planes = _hyperplanes(dim, bits)
    v = with_norm(df.select(id_col, vec_col), vec_col, "norm").withColumn(
        "bucket", lsh_bucket(vec_col, planes)
    )
    a = v.alias("a")
    b = v.alias("b")
    cos = _dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")) / (
        F.col("a.norm") * F.col("b.norm")
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )



def _centers_of(model) -> list[list[float]]:
    """Centroid lists from either a fitted MLlib KMeansModel or a plain
    list of centroid lists (the deterministic clustering.kmeans_fit
    path)."""
    if isinstance(model, list):
        return [list(map(float, c)) for c in model]
    return [list(map(float, c)) for c in model.clusterCenters()]


def ivf_index(
    df: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, "object"]:
    """IVF (inverted-file) index: k-means centroids partition the corpus
    into n_lists cells; each vector is assigned to its nearest centroid.

    Returns (assigned corpus with a `cell` column and precomputed norm,
    fitted KMeansModel). Training samples at most ~100k vectors — at
    100 TB the centroids come from a sample, assignment is a map-only
    pass (broadcast centroids), and the index is written partitioned by
    cell so a probe reads only its cells' files.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = with_norm(df.select(id_col, vec_col), vec_col, "norm").withColumn(
        "_fv", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    km = KMeans(k=n_lists, seed=seed, featuresCol="_fv", predictionCol="cell")
    model = km.fit(v.select("_fv"))
    assigned = model.transform(v).drop("_fv")
    return assigned, model


def ivf_index_deterministic(
    df: DataFrame,
    n_lists: int = 16,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int | None = None,
) -> tuple[DataFrame, list[list[float]]]:
    """ivf_index's oracle-replayable twin: cells come from the
    deterministic fixed-round decimal-replay k-means
    (operators/clustering.py) instead of MLlib's KMeans, so the whole
    index — centroids AND per-vector cell assignment — is value-
    checkable in a SQL oracle. Same scale shape: fit is rounds x (one
    combinable aggregate + bounded collect) over the md5-order
    ``sample_n`` slice (MLlib's path samples ~100k vectors for the
    same reason — pass it, always, at scale); assignment is one
    codegen exploded pass. Returns (assigned corpus with `cell` +
    precomputed norm, centroid lists usable directly as ivf_topk's
    model)."""
    from d365fo_db_sync_spark.operators import clustering

    centers = clustering.kmeans_fit(
        df,
        k=n_lists,
        rounds=rounds,
        id_col=id_col,
        vec_col=vec_col,
        sample_n=sample_n,
    )
    v = with_norm(df.select(id_col, vec_col), vec_col, "norm")
    assigned = clustering.kmeans_assign(
        v, centers, id_col=id_col, vec_col=vec_col, out="cell"
    )
    return assigned, centers


def ivf_topk(
    assigned: DataFrame,
    model,
    queries: DataFrame,
    k: int = 10,
    n_probes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    probes: DataFrame | None = None,
) -> DataFrame:
    """ANN top-k over an IVF index: each query scores only the vectors in
    its ``n_probes`` nearest cells (by centroid distance), then exact
    re-rank inside. Recall rises with n_probes (= brute force when
    n_probes = n_lists). The probe join shuffles on the cell id —
    ~n * n_probes / n_lists candidate rows instead of n per query.

    ``model`` is a fitted MLlib KMeansModel or a plain list of centroid
    lists (the deterministic path). ``probes`` optionally overrides
    probe-cell selection with a precomputed (query_id, cell) frame
    (e.g. clustering.probe_cells_exact for oracle-replayable probing)."""
    centers = _centers_of(model)

    # probe-cell assignment as a pure column expression over centroid
    # literals (like lsh_bucket): per query, squared distance to each
    # centroid, array_sort on (dist, cell) structs, keep the n_probes
    # nearest. Queries never touch the driver.
    def _sq_dist(center: list[float]):
        return F.aggregate(
            F.zip_with(
                F.col("q_vec"),
                F.lit(center),
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    dist_structs = F.array(
        *[
            F.struct(_sq_dist(c).alias("d"), F.lit(i).cast("int").alias("cell"))
            for i, c in enumerate(centers)
        ]
    )
    qbase = with_norm(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("q_vec")), "q_vec", "q_norm"
    )
    if probes is not None:
        q = qbase.join(probes, on=query_id_col)
    else:
        q = qbase.withColumn(
            "cell",
            F.explode(
                F.transform(
                    F.slice(F.array_sort(dist_structs), 1, n_probes), lambda s: s["cell"]
                )
            ),
        )
    pairs = q.join(assigned, on="cell")
    cos = _dot(F.col("q_vec"), F.col(vec_col)) / (F.col("q_norm") * F.col("norm"))
    scored = pairs.select(
        query_id_col,
        F.col(id_col).alias("neighbor_id"),
        cos.alias("cosine"),
    ).filter(F.col(query_id_col) != F.col("neighbor_id"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, "rnk", "neighbor_id", "cosine")
    )


def quantize_embeddings(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: (id, qvec array<int>,
    qscale) with q[i] = floor(x / scale + 0.5), scale = max|x| / 127.

    The 100 TB storage lever: 4x smaller vectors (and integer SIMD
    dot products) at ~1% cosine error on unit-ish embeddings. Two
    deliberate choices keep it engine-reproducible: explicit
    floor(x/s + 0.5) instead of round() (engines disagree on tie
    policy; floor does not), and per-vector symmetric scaling so the
    scale CANCELS out of cosine entirely — quantized cosine is pure
    integer arithmetic, exact in any engine."""
    x = F.col(vec_col)
    mx = F.array_max(F.transform(x, lambda v: F.abs(v.cast("double"))))
    scale = (F.greatest(mx, F.lit(1e-30)) / F.lit(127.0)).alias("qscale")
    q = F.transform(x, lambda v: F.floor(v.cast("double") / scale + F.lit(0.5)).cast("int"))
    return emb.select(F.col(id_col), q.alias("qvec"), scale)


def quantized_cosine_topk(
    qcorpus: DataFrame,
    qqueries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Top-k by QUANTIZED cosine: sum(qa*qb) / (sqrt(sum qa^2) *
    sqrt(sum qb^2)) — the per-vector scales cancel, so ranking runs on
    exact integer sums (products bounded by 127^2 * dim, exact in
    long/double) and is bit-identical across engines: no float-tie
    hazards in the rank window at all. Same broadcast discipline as
    the exact path: corpus streams, queries broadcast."""
    c = qcorpus.select(F.col(id_col), F.col("qvec").alias("c_q")).alias("c")
    q = qqueries.select(F.col(query_id_col), F.col("qvec").alias("q_q")).alias("q")

    def idot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    pairs = c.join(F.broadcast(q), F.lit(True))
    cos = idot(F.col("q_q"), F.col("c_q")).cast("double") / (
        F.sqrt(idot(F.col("q_q"), F.col("q_q")).cast("double"))
        * F.sqrt(idot(F.col("c_q"), F.col("c_q")).cast("double"))
    )
    scored = pairs.select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        cos.alias("qcosine"),
    ).filter(F.col(query_id_col) != F.col("neighbor_id"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("qcosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, "rnk", "neighbor_id", "qcosine")
    )


def ivf_write(assigned: DataFrame, model, root: str) -> str:
    """Persist an IVF index: vectors hive-partitioned BY CELL (so a
    probe's scan prunes to its cells' directories — the disk-level
    inverted file) plus the centroids as a tiny parquet sidecar. Uses
    the same atomic-swap ParquetTarget as every other sink, so index
    rebuilds swap in without a read gap."""
    import os

    from d365fo_db_sync_spark.sinks import ParquetTarget

    centers = _centers_of(model)
    spark = assigned.sparkSession
    ParquetTarget(os.path.join(root, "vectors"), partition_by=["cell"]).overwrite(assigned)
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centers)], "cell int, centroid array<double>"
    )
    ParquetTarget(os.path.join(root, "centroids")).overwrite(cent_df.coalesce(1))
    return root


def ivf_read(spark, root: str) -> tuple[DataFrame, list[list[float]]]:
    """Load a persisted IVF index: (cell-partitioned vector frame,
    centroid list). The vector frame's `cell` is a hive partition
    column — filters on it prune directories before any IO."""
    import os

    from d365fo_db_sync_spark.sinks import ParquetTarget

    assigned = ParquetTarget(os.path.join(root, "vectors"), partition_by=["cell"]).read(spark)
    cents = ParquetTarget(os.path.join(root, "centroids")).read(spark).collect()
    centers = [list(r["centroid"]) for r in sorted(cents, key=lambda r: r["cell"])]
    return assigned, centers


def ivf_write_incremental(
    assigned: DataFrame, model, root: str, n_buckets: int | None = None
) -> str:
    """Persist an IVF index on the MANIFEST sink — the maintainable
    variant of :func:`ivf_write`: vectors land in a
    ``ManifestParquetTarget`` keyed on the cell id, so later batches
    join the index via :func:`ivf_append_incremental` as O(batch)
    append-by-reference commits (no full rewrite, OCC-protected,
    time-travelable like every manifest table), and a probe's read is
    an exact driver-side file-list cut over the probed cells' buckets.
    Centroids stay a tiny sidecar. Cell→bucket is many-to-one
    (xxhash), so ``n_buckets`` defaults to 2× the cell count to keep
    bucket collisions — and thus probe over-read — low."""
    import json
    import os

    from d365fo_db_sync_spark.sinks import ParquetTarget

    centers = _centers_of(model)
    spark = assigned.sparkSession
    used_buckets = n_buckets or max(2 * len(centers), 8)
    # persist the bucket count: append/probe MUST hash cell->bucket
    # with the same modulus the writer used — a reader defaulting
    # differently would prune the wrong buckets and silently lose rows
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "_ivf_meta.json"), "w", encoding="utf-8") as f:
        json.dump({"n_buckets": used_buckets}, f)
    target = _incremental_target(root, len(centers), used_buckets)
    target.overwrite(assigned)
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centers)], "cell int, centroid array<double>"
    )
    ParquetTarget(os.path.join(root, "centroids")).overwrite(cent_df.coalesce(1))
    return root


def _incremental_target(root: str, n_centers: int, n_buckets: int | None):
    import json
    import os

    from d365fo_db_sync_spark.sinks import ManifestParquetTarget

    if n_buckets is None:
        meta = os.path.join(root, "_ivf_meta.json")
        if os.path.exists(meta):
            with open(meta, encoding="utf-8") as f:
                n_buckets = int(json.load(f)["n_buckets"])
    return ManifestParquetTarget(
        os.path.join(root, "vectors"),
        key="cell",
        n_buckets=n_buckets or max(2 * n_centers, 8),
    )


def _read_centers(spark, root: str) -> list[list[float]]:
    import os

    from d365fo_db_sync_spark.sinks import ParquetTarget

    rows = ParquetTarget(os.path.join(root, "centroids")).read(spark).collect()
    return [list(r["centroid"]) for r in sorted(rows, key=lambda r: r["cell"])]


def ivf_append_incremental(
    spark,
    root: str,
    new_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_buckets: int | None = None,
    exact: bool = False,
) -> int:
    """Fold a new vector batch into a persisted incremental IVF index:
    assign each vector to its nearest EXISTING centroid (broadcast
    centroid literals, pure column expressions — no refit, the
    standard IVF maintenance contract; recentre by rebuilding when
    drift warrants), then ``append_rows`` — an O(batch) manifest
    commit touching only the buckets the batch's cells hash into.
    Returns the number of vectors appended. ``exact=True`` assigns by
    the decimal-exact distance (clustering.probe_cells_exact) so a SQL
    oracle replays the assignment; default stays the double fold."""
    from d365fo_db_sync_spark.operators.clustering import probe_cells_exact

    centers = _read_centers(spark, root)
    probe = probe_cells_exact if exact else _probe_cells
    assigned = (
        probe(new_df, centers, 1, vec_col=vec_col, query_id_col=id_col)
        .withColumnRenamed(id_col, "__id")
        .join(
            with_norm(new_df.select(id_col, vec_col), vec_col, "norm"),
            F.col("__id") == F.col(id_col),
        )
        .select(id_col, vec_col, "norm", "cell")
    )
    target = _incremental_target(root, len(centers), n_buckets)
    # one materialization: the count and the staged write must see the
    # same rows, and the assignment join should not run twice
    assigned = assigned.persist()
    try:
        n = assigned.count()
        target.append_rows(spark, assigned)
    finally:
        assigned.unpersist()
    return n


def ivf_topk_incremental(
    spark,
    root: str,
    queries: DataFrame,
    k: int = 10,
    n_probes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_buckets: int | None = None,
    exact: bool = False,
) -> DataFrame:
    """ANN top-k against the incremental index: probe cells resolve to
    an exact manifest file-list cut (``target.probe`` reads only the
    buckets the probed cells hash into — no directory listing), then
    exact cosine re-rank inside, the :func:`ivf_topk` contract. Rows
    appended after the base build are first-class: same cells, same
    files-by-reference read path. ``exact=True`` selects probe cells
    by the decimal-exact distance (oracle-replayable)."""
    from d365fo_db_sync_spark.operators.clustering import probe_cells_exact

    centers = _read_centers(spark, root)
    target = _incremental_target(root, len(centers), n_buckets)
    q_cells = (probe_cells_exact if exact else _probe_cells)(
        queries, centers, n_probes, vec_col=vec_col, query_id_col=query_id_col
    )
    q = q_cells.join(
        with_norm(
            queries.select(query_id_col, F.col(vec_col).alias("q_vec")),
            "q_vec",
            "q_norm",
        ),
        on=query_id_col,
    )
    rows = target.probe(spark, q_cells.select("cell").distinct())
    pairs = q.join(rows, on="cell")
    cos = _dot(F.col("q_vec"), F.col(vec_col)) / (F.col("q_norm") * F.col("norm"))
    scored = pairs.select(
        query_id_col,
        F.col(id_col).alias("neighbor_id"),
        cos.alias("cosine"),
    ).filter(F.col(query_id_col) != F.col("neighbor_id"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, "rnk", "neighbor_id", "cosine")
    )


def ivf_topk_on_disk(
    spark,
    root: str,
    queries: DataFrame,
    k: int = 10,
    n_probes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ANN top-k against a PERSISTED index with partition pruning: the
    query set's probe cells (a handful of ints — queries are small by
    construction, like every broadcast side here) are collected and
    pushed as a static `cell IN (...)` predicate, so the scan reads
    ONLY the probed cells' files. At 100 TB with 1024 cells and 4
    probes per query batch, that is ~0.4% of the index touched per
    batch — the disk-level point of an inverted file."""

    class _Centers:
        def __init__(self, centers):
            self._c = centers

        def clusterCenters(self):
            return self._c

    assigned, centers = ivf_read(spark, root)
    probed = _probe_cells(queries, centers, n_probes, vec_col, query_id_col)
    cells = sorted({r["cell"] for r in probed.select("cell").distinct().collect()})
    pruned = assigned.filter(F.col("cell").isin(cells))
    return ivf_topk(
        pruned, _Centers(centers), queries, k=k, n_probes=n_probes,
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
    )


def _probe_cells(
    queries: DataFrame,
    centers: list[list[float]],
    n_probes: int,
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, cell) rows for each query's n_probes nearest
    centroids — the same pure-column-expression assignment ivf_topk
    uses, exposed for pruning and diagnostics."""

    def _sq_dist(center: list[float]):
        return F.aggregate(
            F.zip_with(
                F.col("__qv"),
                F.lit(center),
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    dist_structs = F.array(
        *[
            F.struct(_sq_dist(c).alias("d"), F.lit(i).cast("int").alias("cell"))
            for i, c in enumerate(centers)
        ]
    )
    return queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qv")
    ).select(
        query_id_col,
        F.explode(
            F.transform(F.slice(F.array_sort(dist_structs), 1, n_probes), lambda s: s["cell"])
        ).alias("cell"),
    )


def cosine_pairs_kmeans(
    assigned: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """Within-cell cosine pairs (id_a < id_b, cosine >= threshold) over a
    k-means-partitioned corpus — the candidate generator of SemDeDup-style
    semantic dedup (Abbas et al. 2023, arXiv:2303.09540 — public paper).

    Each cell's pairwise similarity runs as ONE numpy GEMM inside
    ``applyInPandas`` (Arrow batches, no per-row Python): the corpus
    shuffles once on the cell id and nothing else moves. Near-duplicate
    embeddings land in the same cell with high probability because they
    are near the same centroid; cross-cell pairs are the recall loss the
    method trades for never running all-pairs — with n_lists=1 the
    operator IS the exact O(n^2) baseline (the equivalence anchor in
    tests/test_similarity_semdedup.py). At 100 TB, pick n_lists so the
    average cell (corpus/n_lists rows x dim floats) fits an executor's
    memory; the GEMM is O(cell^2 * dim) but vectorized.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def pairs_in_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": np.int64, "id_b": np.int64, "cosine": np.float64}
            )
        m = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
        norms = np.maximum(np.linalg.norm(m, axis=1), 1e-30)
        sims = (m / norms[:, None]) @ (m / norms[:, None]).T
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = sims[iu, ju] >= threshold
        ia, ib = ids[iu[keep]], ids[ju[keep]]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": sims[iu, ju][keep]})

    return assigned.select(cell_col, id_col, vec_col).groupBy(cell_col).applyInPandas(
        pairs_in_cell, schema
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    deterministic: bool = False,
    rounds: int = 2,
    sample_n: int | None = None,
) -> DataFrame:
    """SemDeDup: cluster embeddings with k-means, find within-cluster
    cosine near-duplicates, resolve them into connected components, and
    keep the minimum id per component. Returns (id, cluster_id,
    is_survivor) over the FULL corpus — ``df.join(result.filter
    ("is_survivor"), id)`` is the semantically deduplicated set.

    Plan shape: sampled k-means fit, one map-only assignment pass
    (broadcast centroids), one shuffle on the cell id for the per-cell
    GEMM, star-contraction on the (tiny) pair set, and a final label
    join that broadcasts because the paired-node map is tiny next to
    the corpus."""
    from d365fo_db_sync_spark.operators import graph

    if n_lists < 2:
        # degenerate single-cell case = the exact O(n^2) baseline
        # (Spark ML KMeans requires k >= 2, and there is nothing to fit)
        assigned = df.select(id_col, vec_col).withColumn("cell", F.lit(0))
    elif deterministic:
        # oracle-replayable cells (fixed-round decimal-replay k-means,
        # operators/clustering.py) — same plan shape as the MLlib path
        assigned, _centers = ivf_index_deterministic(
            df,
            n_lists=n_lists,
            rounds=rounds,
            id_col=id_col,
            vec_col=vec_col,
            sample_n=sample_n,
        )
    else:
        assigned, _model = ivf_index(
            df, n_lists=n_lists, id_col=id_col, vec_col=vec_col, seed=seed
        )
    pairs = cosine_pairs_kmeans(
        assigned, threshold, id_col=id_col, vec_col=vec_col
    )
    return graph.near_dup_clusters(
        df, pairs, id_col=id_col, a_col="id_a", b_col="id_b"
    )


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    shortlist: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998)
    diversified top-k: greedily select k results per query maximizing
    ``lam * rel(d) - (1 - lam) * max cosine(d, already-selected)`` —
    the standard rerank that keeps a retrieval set from collapsing
    onto near-duplicate passages (the failure mode of pure top-k over
    a deduplicated-but-still-clumpy corpus).

    Exactness contract: greedy MMR over the ``shortlist``-deep exact
    cosine pool per query. With ``shortlist >= |corpus|`` this IS full
    MMR (pinned in tests against an independent naive implementation);
    smaller shortlists are the standard rerank-pool approximation.

    Scale shape — fully distributed, nothing ever reaches the driver:

    * stage 1: the exact GEMM shortlist (:func:`cosine_topk_bruteforce_np`
      — per-Arrow-batch matmul + per-batch partial top-k);
    * stage 2: pool vectors rejoin by BROADCASTING the pool (|queries|
      x shortlist rows, tiny by construction) so the corpus streams
      map-side;
    * stage 3: ONE shuffle of pool rows on the query id, then the
      greedy runs per query group in ``applyInPandas`` as an
      O(k x C x d) numpy loop over C = shortlist candidates — bounded
      per group, embarrassingly parallel across queries.

    The iterative argmax (each step depends on the selected set) is
    what makes this non-SQL-expressible; determinism comes from full-
    precision float64 scoring with candidate-id ascending tie-breaks.
    Returns ``(query_id, rnk, neighbor_id, relevance, mmr_score)``
    with rnk = selection order (rnk 1 = pure top relevance, by
    definition of the greedy)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    if shortlist < k:
        raise ValueError(f"shortlist ({shortlist}) must be >= k ({k})")

    pool = cosine_topk_bruteforce_np(
        corpus, queries, k=shortlist, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col,
    ).select(query_id_col, "neighbor_id", F.col("cosine").alias("relevance"))
    pool_vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), vec_col
    ).join(F.broadcast(pool), on="neighbor_id")

    schema = StructType(
        [
            StructField(query_id_col, queries.schema[query_id_col].dataType),
            StructField("rnk", IntegerType()),
            StructField("neighbor_id", corpus.schema[id_col].dataType),
            StructField("relevance", DoubleType()),
            StructField("mmr_score", DoubleType()),
        ]
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        # id-ascending input order makes every argmax tie-break
        # deterministic (np.argmax returns the FIRST max)
        pdf = pdf.sort_values("neighbor_id").reset_index(drop=True)
        ids = pdf["neighbor_id"].to_numpy()
        rel = pdf["relevance"].to_numpy(dtype=np.float64)
        mat, norms = vec_matrix_np(pdf[vec_col])
        mat = mat / norms[:, None]
        sims = mat @ mat.T  # C x C, C = shortlist: bounded, tiny
        n = len(ids)
        taken = np.zeros(n, dtype=bool)
        # penalty = max cosine to the selected set, which is EMPTY at
        # step 0 (score is pure relevance) and can be NEGATIVE later —
        # seeding a running max with 0 would silently clamp
        # anti-aligned candidates' penalties to zero
        max_sim_to_sel = None
        out_rnk, out_idx, out_score = [], [], []
        for step in range(min(k, n)):
            if max_sim_to_sel is None:
                score = lam * rel
            else:
                score = lam * rel - (1.0 - lam) * max_sim_to_sel
            score[taken] = -np.inf
            pick = int(np.argmax(score))
            taken[pick] = True
            out_rnk.append(step + 1)
            out_idx.append(pick)
            out_score.append(float(score[pick]))
            col = sims[:, pick]
            max_sim_to_sel = (
                col.copy()
                if max_sim_to_sel is None
                else np.maximum(max_sim_to_sel, col)
            )
        return pd.DataFrame(
            {
                query_id_col: pdf[query_id_col].iloc[out_idx].to_numpy(),
                "rnk": out_rnk,
                "neighbor_id": ids[out_idx],
                "relevance": rel[out_idx],
                "mmr_score": out_score,
            }
        )

    return pool_vecs.groupBy(query_id_col).applyInPandas(greedy, schema)


def mmr_rerank_exact(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    shortlist: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """:func:`mmr_rerank`'s oracle-replayable twin on the decimal-replay
    discipline (clustering/pq/pca — r15): a SQL engine can unroll the
    entire fit because every number is either an exact order-free
    decimal sum or a deterministic IEEE scalar op on identical
    operands.

    * relevance and pairwise candidate similarity are cosines over
      RAW-QUOTIENT normalized vectors (pq.normalized_qvec), each dot
      product an exact DECIMAL(38,18) term sum — combinable
      aggregates, ranked UNCAST so pool ties cannot drift;
    * the greedy runs as ``k`` UNROLLED selection rounds of DataFrame
      ops (no applyInPandas): per round one rank window picks the
      argmax of ``lam * rel - (1 - lam) * maxsim`` — computed in RAW
      double from the exact decimal operands (products and the
      subtraction are correctly rounded over identical doubles, so
      both engines order identically; ties break on neighbor_id) —
      then one join folds the winner's similarity column into each
      survivor's running decimal ``maxsim`` via GREATEST.

    The pool (|queries| x shortlist) and pairwise-sim (distinct pool
    pairs) frames are localCheckpointed once — KB-scale model-side
    state; the corpus-width work is the two combinable cosine
    aggregates, exactly the cosine_topk shuffle shape. Semantics
    equivalence with the production Arrow greedy is pinned by
    tests/test_retrieval.py (same selection sequence on a fixed run).
    """
    from d365fo_db_sync_spark.operators.pq import _DIST_DEC, normalized_qvec

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    if shortlist < k:
        raise ValueError(f"shortlist ({shortlist}) must be >= k ({k})")
    mu = 1.0 - lam  # templated, never re-derived in SQL: repr round-trips

    cn = corpus.select(
        F.col(id_col).alias("_nid"), normalized_qvec(vec_col).alias("_nv")
    ).select("_nid", F.posexplode("_nv").alias("_pos", "_nc"))
    qn = queries.select(
        F.col(query_id_col).alias("_qid"), normalized_qvec(vec_col).alias("_nv")
    ).select("_qid", F.posexplode("_nv").alias("_pos", "_qc"))

    rel = (
        cn.join(F.broadcast(qn), on="_pos")
        .filter(F.col("_qid") != F.col("_nid"))
        .groupBy("_qid", "_nid")
        .agg(F.sum((F.col("_qc") * F.col("_nc")).cast(_DIST_DEC)).alias("_rel"))
    )
    w_pool = Window.partitionBy("_qid").orderBy(F.desc("_rel"), F.asc("_nid"))
    pool = (
        rel.withColumn("_rn", F.row_number().over(w_pool))
        .filter(F.col("_rn") <= shortlist)
        .drop("_rn")
        .localCheckpoint(eager=True)
    )

    # pairwise sims among pool members — distinct unordered id pairs
    # across all pools, each an exact decimal dot product
    pairs = (
        pool.select("_qid", F.col("_nid").alias("_ida"))
        .join(pool.select("_qid", F.col("_nid").alias("_idb")), on="_qid")
        .filter(F.col("_ida") < F.col("_idb"))
        .select("_ida", "_idb")
        .distinct()
    )
    sims = (
        cn.select(F.col("_nid").alias("_ida"), "_pos", F.col("_nc").alias("_ca"))
        .join(F.broadcast(pairs), on="_ida")
        .join(
            cn.select(
                F.col("_nid").alias("_idb"), "_pos", F.col("_nc").alias("_cb")
            ),
            on=["_idb", "_pos"],
        )
        .groupBy("_ida", "_idb")
        .agg(F.sum((F.col("_ca") * F.col("_cb")).cast(_DIST_DEC)).alias("_sim"))
        .localCheckpoint(eager=True)
    )
    sym = sims.select(
        F.col("_ida").alias("_cnid"), F.col("_idb").alias("_csel"), "_sim"
    ).unionByName(
        sims.select(
            F.col("_idb").alias("_cnid"), F.col("_ida").alias("_csel"), "_sim"
        )
    )

    lam_c, mu_c = F.lit(lam), F.lit(mu)
    rel_d = F.col("_rel").cast("double")

    def pick(frame: DataFrame, score, rnk: int) -> DataFrame:
        ww = Window.partitionBy("_qid").orderBy(F.desc("_score"), F.asc("_nid"))
        return (
            frame.withColumn("_score", score)
            .withColumn("_rn", F.row_number().over(ww))
            .filter(F.col("_rn") == 1)
            .select(
                "_qid",
                F.col("_nid").alias("_sel"),
                F.lit(rnk).alias("rnk"),
                F.col("_rel").alias("_selrel"),
                F.col("_score").alias("_selscore"),
            )
            .localCheckpoint(eager=True)
        )

    selected = [pick(pool, lam_c * rel_d, 1)]  # round 1: empty selected set
    cand = pool
    for r in range(2, k + 1):
        sel = selected[-1]
        cand = (
            cand.join(sel.select("_qid", "_sel"), on="_qid")
            .filter(F.col("_nid") != F.col("_sel"))
            .join(
                sym,
                (F.col("_nid") == F.col("_cnid"))
                & (F.col("_sel") == F.col("_csel")),
            )
            .select(
                "_qid",
                "_nid",
                "_rel",
                (
                    F.greatest("_ms", "_sim")
                    if "_ms" in cand.columns
                    else F.col("_sim")
                ).alias("_ms"),
            )
        )
        selected.append(
            pick(cand, lam_c * rel_d - mu_c * F.col("_ms").cast("double"), r)
        )

    out = selected[0]
    for s in selected[1:]:
        out = out.unionByName(s)
    return out.select(
        F.col("_qid").alias(query_id_col),
        F.col("rnk").cast("int").alias("rnk"),
        F.col("_sel").alias("neighbor_id"),
        F.col("_selrel").cast("double").alias("relevance"),
        F.col("_selscore").alias("mmr_score"),
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k_neg: int = 5,
    rank_lo: int = 10,
    rank_hi: int = 30,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Hard-negative mining for contrastive / embedding training: per
    query, pick ``k_neg`` negatives from the cosine-rank band
    ``(rank_lo, rank_hi]`` — similar enough to be informative, far
    enough to be (presumed) non-positives, the standard band heuristic
    (after DPR/ANCE-style mining; the top ranks are skipped as likely
    true positives). The pick WITHIN the band is a deterministic
    pseudo-random md5 order over (query, candidate), so a re-run, a
    different partitioning, or a grown corpus with the same band
    contents selects the same negatives.

    Scale shape: ranks come from the per-batch-partial-top-k GEMM
    shortlist at depth ``rank_hi`` (never a corpus-wide rank), the
    band filter and md5 ordering are codegen expressions over <=
    |queries| x rank_hi rows, and the final per-query window sorts
    metadata-sized groups. Returns ``(query_id, pick, neighbor_id,
    rank, cosine)`` with pick = 1..k_neg in md5 order."""
    if not 0 <= rank_lo < rank_hi:
        raise ValueError(f"need 0 <= rank_lo < rank_hi, got ({rank_lo}, {rank_hi})")
    if k_neg <= 0:
        raise ValueError(f"k_neg must be positive, got {k_neg}")
    shortlist = cosine_topk_bruteforce_np(
        corpus, queries, k=rank_hi, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col,
    )
    band = shortlist.filter(
        (F.col("rnk") > rank_lo) & (F.col("rnk") <= rank_hi)
    ).withColumn(
        "__pick_key",
        F.md5(
            F.concat_ws(":", F.col(query_id_col).cast("string"),
                        F.col("neighbor_id").cast("string"))
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy("__pick_key", "neighbor_id")
    return (
        band.withColumn("pick", F.row_number().over(w))
        .filter(F.col("pick") <= k_neg)
        .select(
            query_id_col,
            "pick",
            "neighbor_id",
            F.col("rnk").alias("rank"),
            "cosine",
        )
    )


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    out_prec: int = 6,
) -> DataFrame:
    """Exact per-label centroid components: one row per (label,
    dimension) with the component count and mean — the diagnostic a
    curation pipeline runs over labeled/clustered embeddings (class
    prototypes for nearest-prototype screening, drift checks on a
    cluster assignment, SemDeDup cell health).

    Cross-engine exactness: each float component casts to double
    (lossless) then quantizes once to DECIMAL(28,12) — a rounding that
    can never land on a decimal half-boundary (5e-13 is not a dyadic
    rational, so no binary float sits exactly on one) — and the sums
    accumulate as order-independent decimals; only the final
    mean-divide runs in double. Built-in avg(double) would be
    partition-order-dependent and un-oracle-able.

    Scale shape: posexplode fans each vector into (label, pos, comp)
    rows and ONE partially-aggregated groupBy reduces them — the
    map-side combine collapses to |labels| x dim rows per partition
    before the shuffle, so the exchange ships sketch-sized partials
    regardless of corpus size. No joins, no UDFs, no driver work."""
    e = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "comp"),
    )
    dec = F.col("comp").cast("double").cast("decimal(28,12)")
    return e.groupBy("label", "pos").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(dec).cast("double") / F.count("*").cast("double"), out_prec
        ).alias("mean_comp"),
    )


def prototype_confusion(
    df: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-prototype confusion matrix: every vector is assigned to
    the closest :func:`label_centroids` prototype (squared L2), and
    the result rolls up ``(label, assigned_label, cnt)`` — the
    label-coherence diagnostic for a clustered/labeled embedding
    corpus (how separable are the classes under their own centroids?).

    Exactness: centroid components are the 6-dp-rounded exact means;
    each squared residual quantizes to DECIMAL(38,18) (a double can
    never sit on a decimal half-boundary) and distances sum
    order-independently, so the argmin — min over a (dist, label)
    struct, ties to the smaller label — is deterministic in any
    engine. No floats are compared that were not derived from
    identical expression trees.

    Scale shape: the 640-row centroid frame broadcasts onto the
    posexploded corpus (no shuffle for the join); map-side combine
    collapses each vector's k x dim residual rows to k partials
    before the one real exchange; the struct-min and the final
    confusion rollup reuse the same key prefix. The corpus is read
    once; nothing collects to the driver."""
    cents = label_centroids(df, label_col=label_col, vec_col=vec_col).select(
        F.col("label").alias("c_label"), "pos", "mean_comp"
    )
    e = df.select(
        F.col(id_col).alias("vid"),
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "comp"),
    )
    diff = F.col("comp").cast("double") - F.col("mean_comp")
    d = (
        e.join(F.broadcast(cents), on="pos")
        .select("vid", "label", "c_label", (diff * diff).cast("decimal(38,18)").alias("sq"))
        .groupBy("vid", "label", "c_label")
        .agg(F.sum("sq").alias("dist"))
    )
    assigned = d.groupBy("vid", "label").agg(
        F.min(F.struct("dist", "c_label")).alias("best")
    )
    return assigned.groupBy(
        "label", F.col("best.c_label").alias("assigned_label")
    ).agg(F.count("*").alias("cnt"))


def centroid_silhouette(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_prec: int = 6,
) -> DataFrame:
    """Simplified (centroid-based) silhouette — the clustering-quality
    readout over a labeled embedding corpus: per vector,
    ``a`` = squared L2 distance to its OWN label centroid, ``b`` = the
    minimum distance to any OTHER label's centroid, and
    ``s = (b - a) / max(a, b)`` in [-1, 1] (positive = the vector sits
    closer to its own prototype than to any rival — medoid/pairwise
    silhouette replaced by the centroid form so the cost is
    |labels| x dim per vector instead of n² pairwise).

    Output: one row per label with ``n_vectors`` and ``sum_sil`` (the
    6-dp-quantized silhouettes summed as exact DECIMAL, surfaced as
    DOUBLE — callers divide for the mean; summing raw doubles would be
    aggregation-order-dependent and unoracleable).

    Exactness discipline matches :func:`prototype_confusion`: exact
    6-dp centroid means, per-component squared residuals quantized to
    DECIMAL(38,18) and summed order-independently; a and b therefore
    arrive bit-identical in any engine, and s evaluates ONCE in double
    through a fixed expression tree before quantization.

    Scale shape: identical to the confusion matrix — centroids
    broadcast onto the posexploded corpus, map-side combine collapses
    each vector's |labels| x dim residuals, one real exchange, then a
    |labels|-row rollup. The label-count guard is one eager
    column-pruned ``distinct().limit(2)`` probe of ``label_col`` (it
    short-circuits after two labels and touches no vector data);
    nothing is persisted and the returned plan is fully lazy.

    Raises ``ValueError`` when the corpus holds fewer than two
    distinct labels: with no rival centroid every ``b`` is NULL, so
    every ``s`` is NULL — rows would still count in ``n_vectors``
    while dropping out of ``sum_sil``, silently deflating the
    documented caller-side mean toward 0. Silhouette is undefined
    there; fail loudly instead."""
    # validation is a deliberately EAGER job, but a cheap one: a
    # column-pruned scan of label_col alone, short-circuited by the
    # limit(2) — no centroid math runs, nothing is persisted, and the
    # returned plan stays fully lazy (the r9 shape persisted the
    # centroid frame for this count and leaked the cached blocks on
    # the success path)
    n_labels = df.select(label_col).distinct().limit(2).count()
    if n_labels < 2:
        raise ValueError(
            f"centroid_silhouette needs >= 2 distinct labels (got "
            f"{n_labels}): with no rival centroid b is NULL for every "
            "vector and the silhouette is undefined"
        )
    cents = label_centroids(df, label_col=label_col, vec_col=vec_col).select(
        F.col("label").alias("c_label"), "pos", "mean_comp"
    )
    e = df.select(
        F.col(id_col).alias("vid"),
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "comp"),
    )
    diff = F.col("comp").cast("double") - F.col("mean_comp")
    d = (
        e.join(F.broadcast(cents), on="pos")
        .select(
            "vid",
            "label",
            "c_label",
            (diff * diff).cast("decimal(38,18)").alias("sq"),
        )
        .groupBy("vid", "label", "c_label")
        .agg(F.sum("sq").alias("dist"))
    )
    per_vec = d.groupBy("vid", "label").agg(
        F.max(F.when(F.col("c_label") == F.col("label"), F.col("dist"))).alias("a"),
        F.min(F.when(F.col("c_label") != F.col("label"), F.col("dist"))).alias("b"),
    )
    a_d, b_d = F.col("a").cast("double"), F.col("b").cast("double")
    s = F.round((b_d - a_d) / F.greatest(a_d, b_d), out_prec)
    sil = per_vec.select(
        "label", s.cast(f"decimal(18,{out_prec})").alias("s")
    )
    return sil.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.sum("s").cast("double").alias("sum_sil"),
    )
