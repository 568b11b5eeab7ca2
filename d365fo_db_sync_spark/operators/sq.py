"""Scalar quantization (SQ8) for embedding search — the FAISS
``ScalarQuantizer`` recipe (Johnson, Douze & Jégou 2021, "Billion-scale
similarity search with GPUs", arXiv:1702.08734; the classic uniform
per-dimension quantizer): each dimension maps linearly onto one byte
between the corpus min and max, cutting vector memory 4-8x versus
float32 while asymmetric scoring (full-precision query against
reconstructed corpus) keeps retrieval quality close to exact search.
The memory cut is the point at 100 TB: an embedding column that doesn't
fit executor memory as doubles often does as codes.

Deterministic and fully value-oracle-able on the repo's decimal-replay
discipline (operators/clustering.py, pq.py) — and simpler than
PQ/k-means because NOTHING here iterates:

* inputs normalize once via :func:`pq.normalized_qvec` (DECIMAL(28,12)
  ingestion quantization, exact decimal norm, RAW IEEE quotient — both
  engines hold the identical double);
* the model is per-dimension MIN/MAX over those doubles — exact,
  order-free, one combinable aggregate, ``dim`` rows of metadata;
* codes are ``floor((x - mn) * 255 / (mx - mn) + 0.5)`` clamped to
  [0, 255] — every operation correctly rounded over identical
  operands, so codes match bit-for-bit cross-engine with no decimal
  re-cast anywhere (the r14 derived-double lesson);
* asymmetric-distance scores are exact DECIMAL(38,18) term sums of
  ``q_i * recon_i`` (the kmeans/pq/mmr terminal-sum idiom), ranked on
  the UNCAST decimal with the id tie-break.

Suite: ``similarity_sq8_topk`` value-oracles fit -> encode ->
reconstruct -> score -> rank end to end.

Reference parity: the reference engine (DBSyncTool) has no vector
operators; this extends the LLM-pipeline ANN tier beside IVF
(similarity.py) and PQ (pq.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators.pq import _DIST_DEC, normalized_qvec

#: one byte per dimension
LEVELS = 255


def fit_sq8(
    corpus: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension quantizer bounds ``(pos, mn, mx)`` over the
    L2-normalized corpus — ONE combinable min/max aggregate after a
    position explode; the model is ``dim`` rows however large the
    corpus. MIN/MAX over doubles is exact and order-free, so the fit
    is deterministic under any partitioning."""
    nv = corpus.select(normalized_qvec(vec_col).alias("_nv"))
    return (
        nv.select(F.posexplode("_nv").alias("pos", "c"))
        .groupBy("pos")
        .agg(F.min("c").alias("mn"), F.max("c").alias("mx"))
    )


def _code_expr(c, mn, mx):
    """The SQ8 code of component ``c`` under bounds (mn, mx): linear
    map to [0, 255], round-half-up via floor(+0.5), clamped; constant
    dimensions (mx == mn) code to 0. Correctly rounded IEEE end to
    end — replayed verbatim by the SQL oracle."""
    scaled = (c - mn) * float(LEVELS) / (mx - mn) + 0.5
    return F.when(
        mx > mn,
        F.least(F.lit(LEVELS), F.greatest(F.lit(0), F.floor(scaled))),
    ).otherwise(F.lit(0))


def sq8_encode(
    corpus: DataFrame,
    model: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, pos, code) — one byte per (vector, dimension). The model
    join broadcasts (``dim`` rows); the corpus explodes once and maps
    without shuffling. Codes are the storage format: 1/8 the bytes of
    the double component, reconstructable to ``mn + code * ((mx - mn)
    / 255)`` without the original vector."""
    exploded = corpus.select(
        F.col(id_col), F.posexplode(normalized_qvec(vec_col)).alias("pos", "c")
    )
    return exploded.join(F.broadcast(model), on="pos").select(
        id_col,
        "pos",
        _code_expr(F.col("c"), F.col("mn"), F.col("mx"))
        .cast("int")
        .alias("code"),
    )


def sq8_pack_codes(codes: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """(id, codes BINARY) — the STORAGE form: one byte per dimension in
    position order, which is where the 8x memory cut actually lands (an
    exploded (id, pos, code-int) table is wider than the doubles it
    replaced). Pure codegen: per-id struct sort, hex render, one
    ``unhex``. At 100 TB this column is what persists beside the
    corpus and what an executor-resident index loads."""
    hexed = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "code"))),
        lambda s: F.lpad(F.conv(s["code"].cast("string"), 10, 16), 2, "0"),
    )
    return (
        codes.groupBy(id_col)
        .agg(F.unhex(F.concat_ws("", hexed)).alias("codes"))
    )


def sq8_unpack_codes(packed: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """(id, pos, code) back from the packed binary — hex pairs sliced
    positionally, still whole-stage codegen. Byte-exact inverse of
    :func:`sq8_pack_codes` (round-trip pinned in tests)."""
    h = F.hex(F.col("codes"))
    idx = F.sequence(F.lit(0), (F.length(h) / F.lit(2)).cast("int") - 1)
    arr = F.transform(
        idx, lambda i: F.conv(h.substr(i * 2 + 1, F.lit(2)), 16, 10).cast("int")
    )
    return packed.select(
        id_col, F.posexplode(arr).alias("pos", "code")
    )


def sq8_reconstruct(codes: DataFrame, model: DataFrame) -> DataFrame:
    """(id, pos, recon) — decode codes back to doubles: ``mn + code *
    ((mx - mn) / 255)``, every operation correctly rounded over
    identical operands (the scale quotient stays a RAW double; no
    decimal re-cast of a derived value)."""
    out_cols = [c for c in codes.columns if c != "code"]
    return codes.join(F.broadcast(model), on="pos").select(
        *out_cols,
        (
            F.col("mn")
            + F.col("code").cast("double")
            * ((F.col("mx") - F.col("mn")) / F.lit(float(LEVELS)))
        ).alias("recon"),
    )


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    model: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric SQ8 top-k: full-precision normalized queries score
    against the RECONSTRUCTED corpus (fit + encode + decode inline
    unless a prefit ``model`` is passed) — the FAISS SQ search shape.
    Scores are exact DECIMAL(38,18) sums of ``q_i * recon_i`` terms
    (combinable aggregate — the cosine_topk shuffle), ranked UNCAST
    with the neighbor-id tie-break. Returns ``(query_id, rnk,
    neighbor_id, score)``; self-matches are excluded. Plan: the model
    is ``dim`` rows (broadcast both into encode and decode), the heavy
    side is one exploded equi-join on ``pos`` + one groupBy — no
    all-pairs, no window over the corpus width."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if model is None:
        model = fit_sq8(corpus, vec_col)
    codes = sq8_encode(corpus, model, id_col=id_col, vec_col=vec_col)
    recon = sq8_reconstruct(
        codes.select(F.col(id_col).alias("_nid"), "pos", "code"), model
    )
    qn = queries.select(
        F.col(query_id_col).alias("_qid"),
        F.posexplode(normalized_qvec(vec_col)).alias("pos", "_qc"),
    )
    scores = (
        recon.join(qn, on="pos")
        .filter(F.col("_qid") != F.col("_nid"))
        .groupBy("_qid", "_nid")
        .agg(
            F.sum((F.col("_qc") * F.col("recon")).cast(_DIST_DEC)).alias(
                "_score"
            )
        )
    )
    return _rank_scores(scores, k, query_id_col)


def _rank_scores(scores: DataFrame, k: int, query_id_col: str) -> DataFrame:
    """Top-k readout shared by the flat and IVF search paths: rank the
    UNCAST decimal score (desc, neighbor-id tie-break), emit the
    double only in the final projection."""
    w = Window.partitionBy("_qid").orderBy(F.desc("_score"), F.asc("_nid"))
    return (
        scores.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("_qid").alias(query_id_col),
            F.col("rnk").cast("int").alias("rnk"),
            F.col("_nid").alias("neighbor_id"),
            F.col("_score").cast("double").alias("score"),
        )
    )


def sq8_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    assigned: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    model: DataFrame | None = None,
) -> DataFrame:
    """IVF + SQ8 — the FAISS ``IVF<n>,SQ8`` index composed from the
    repo's two oracled tiers: coarse candidate selection from the
    deterministic k-means cells (``assigned``: (id, cell) from
    similarity.ivf_index_deterministic; ``probes``: (query_id, cell)
    from clustering.probe_cells_exact), asymmetric SQ8 scoring over
    ONLY the probed cells' vectors. This is the memory-AND-compute
    scale shape: the probe prunes the corpus to ~n*probes/lists
    candidates per query (cell-partitioned storage reads only those
    files at 100 TB), and the candidates score against 1-byte codes
    instead of doubles. Deterministic end to end — every stage is the
    already-replayable k-means / SQ8 math, so the suite value-oracles
    the full composition."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if model is None:
        model = fit_sq8(corpus, vec_col)
    codes = sq8_encode(corpus, model, id_col=id_col, vec_col=vec_col)
    recon = sq8_reconstruct(
        codes.select(F.col(id_col).alias("_nid"), "pos", "code"), model
    )
    cand = (
        probes.select(F.col(query_id_col).alias("_qid"), "cell")
        .join(
            assigned.select(F.col(id_col).alias("_nid"), "cell"), on="cell"
        )
        .filter(F.col("_qid") != F.col("_nid"))
        .select("_qid", "_nid")
    )
    qn = queries.select(
        F.col(query_id_col).alias("_qid"),
        F.posexplode(normalized_qvec(vec_col)).alias("pos", "_qc"),
    )
    scores = (
        cand.join(qn, on="_qid")
        .join(recon, on=["_nid", "pos"])
        .groupBy("_qid", "_nid")
        .agg(
            F.sum((F.col("_qc") * F.col("recon")).cast(_DIST_DEC)).alias(
                "_score"
            )
        )
    )
    return _rank_scores(scores, k, query_id_col)
