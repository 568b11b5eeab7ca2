"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Scale design notes (the whole point of these implementations):

* Exact dedup is a hash-groupBy — ONE shuffle on the fingerprint.
* MinHash-LSH is the sub-quadratic near-dup path: shingle -> K min-hash
  values -> B bands -> candidates join only within identical band
  buckets. Cost is O(docs x K) map-side plus a shuffle per band-bucket,
  never the O(n^2) cross join.
* SimHash packs a document into 64 bits; banding the bits gives
  Hamming-distance candidates with the same bucket-join trick.
* n-gram Jaccard verifies candidates exactly via an explode/join/count —
  at scale it runs on the candidate set, not all pairs.

All hashing uses xxhash64 (Spark built-in, deterministic across runs and
executors with a fixed seed) and stays in codegen; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators.text import tokens

# fixed parameters of the (a*x + b) mod p universal hash family over
# 32-bit base hashes: a < 2^31, x < 2^32, so a*x + b < 2^63 and the
# whole chain stays in overflow-free Long arithmetic (ANSI-safe)
_MERSENNE_P = (1 << 31) - 1


def _hash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs via a seeded LCG (no RNG dependency)."""
    params = []
    state = seed
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = ((state | 1) % _MERSENNE_P) or 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % _MERSENNE_P
        params.append((a, b))
    return params


def exact_dedup(df: DataFrame, cols: list[str], key: str) -> DataFrame:
    """Keep the lowest-key row per exact duplicate group — one shuffle
    on the group hash, map-side combinable."""
    keeper = df.groupBy(*cols).agg(F.min(key).alias(key))
    return df.join(keeper, on=cols + [key], how="left_semi")


def shingles(text_col: str, n: int = 3) -> "F.Column":
    """Word n-gram shingles as an array column (higher-order functions).

    Kept as the array-valued form for expression contexts; the hot paths
    use :func:`exploded_shingles` instead — Spark evaluates higher-order
    functions interpreted (outside codegen), and the window-based
    builder measured ~2.3x faster at corpus scale."""
    t = tokens(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(t) - n + 1, F.lit(1)))
    return F.transform(idx, lambda i: F.array_join(F.slice(t, i, n), " "))


def exploded_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, distinct: bool = True
) -> DataFrame:
    """(id, shingle) rows built with codegen-friendly operators:
    per-document shifted-slice arrays zipped into sliding windows —
    ``arrays_zip(toks, slice(toks, 2, ...), ...)`` + posexplode +
    concat_ws. Entirely MAP-SIDE: no window, no shuffle of the token
    stream (r15 — the previous lead()-window build shuffled and sorted
    every exploded token by (doc, pos) before any consumer aggregated;
    at 100 TB that is a full-corpus exchange for a per-row
    transformation).

    Equivalent to ``explode(array_distinct(shingles(text, n)))`` when
    ``distinct`` (the default) — including the short-document rule (a
    document with < n tokens yields its whole token stream as one
    shingle; concat_ws skips the absent tail fields, exactly as it
    skipped the NULL leads).

    ``distinct=False`` keeps repeated shingles and skips the
    dropDuplicates EXCHANGE on (id, shingle) — the right call whenever
    the consumer is duplicate-insensitive (min-aggregation for MinHash,
    collect_set for set building): duplicate-insensitive aggregates
    then collapse map-side before their one exchange ships bounded
    per-doc partials."""
    # tokenize ONCE: the regex split over full documents is the single
    # most expensive expression here; staging it prevents re-evaluation
    # for the size() and each shifted slice
    toks = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    sz = F.size("__toks")
    shifted = toks.select(
        F.col(id_col),
        sz.alias("__n_tok"),
        F.col("__toks").alias("__a0"),
        # slice() clamps to the array end, so shift i is simply the
        # suffix starting at i+1; arrays_zip pads the short suffixes
        # with NULL struct fields at the tail
        *[
            F.slice("__toks", i + 1, sz).alias(f"__a{i}")
            for i in range(1, n)
        ],
    )
    zipped = shifted.select(
        F.col(id_col),
        F.col("__n_tok"),
        F.posexplode(F.arrays_zip(*[f"__a{i}" for i in range(n)])).alias(
            "__pos", "__w"
        ),
    )
    keep = (F.col("__pos") <= F.col("__n_tok") - n) | (
        (F.col("__n_tok") < n) & (F.col("__pos") == 0)
    )
    out = zipped.filter(keep).select(
        id_col,
        F.concat_ws(
            " ", *[F.col("__w").getField(f"__a{i}") for i in range(n)]
        ).alias("g"),
    )
    return out.dropDuplicates([id_col, "g"]) if distinct else out


def _shingle_sets(exploded: DataFrame, id_col: str) -> DataFrame:
    """(id, sh array, set_size) from exploded shingles (duplicates
    allowed — collect_set dedups in the aggregation buffer). The groupBy
    reuses the explode's doc-id partitioning: no exchange between the
    lead window and the set build."""
    return exploded.groupBy(id_col).agg(F.collect_set("g").alias("sh")).select(
        id_col, "sh", F.size("sh").alias("set_size")
    )


def shingle_sets(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Per-document distinct shingle sets: (id, sh array, set_size).

    The reusable intermediate of the Jaccard family. Callers that verify
    many candidate batches against the same corpus should ``.cache()``
    this frame themselves and unpersist when done — the operators below
    never cache behind the caller's back (a hidden cache pins executor
    memory for the life of the session)."""
    return _shingle_sets(
        exploded_shingles(df, id_col, text_col, n, distinct=False), id_col
    )


def frequent_shingles(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_docs: int = 5,
) -> DataFrame:
    """Corpus boilerplate mining: the word n-grams that appear in at
    least ``min_docs`` DISTINCT documents — headers, footers, license
    blurbs, template chrome. The output feeds a removal/downweight pass
    (or a human review list); a threshold (not top-k) keeps the result
    set tie-stable, so it is value-checkable cross-engine.

    Returns ``(shingle, doc_freq)``. Scale shape: distinct (doc,
    shingle) pairs from the codegen shingle builder, then ONE groupBy
    on the shingle string with map-side partial counts; the ``>=``
    filter runs inside the aggregate's HAVING position, so only the
    boilerplate tail — vanishingly small next to the corpus — survives
    the exchange."""
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    ex = exploded_shingles(df, id_col, text_col, n=n, distinct=True)
    return (
        ex.groupBy("g")
        .agg(F.count("*").alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_docs)
        .select(F.col("g").alias("shingle"), "doc_freq")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_n: int = 3,
    sets: DataFrame | None = None,
) -> DataFrame:
    """(id, minhash[0..K-1]) — explode shingles once, then K min-aggs in a
    single groupBy (map-side partial mins keep the shuffle tiny: K longs
    per doc regardless of document size).

    With ``sets`` (from :func:`shingle_sets`, usually persisted by the
    caller) the shingles come from exploding the prebuilt set arrays
    instead of re-tokenizing ``df`` — the LSH+verify pipeline then
    tokenizes the corpus ONCE for both candidate generation and the
    exact check. min() is duplicate-insensitive, so signatures from the
    distinct set equal signatures from the raw shingle stream."""
    params = _hash_params(num_hashes)
    if sets is not None:
        sh = sets.select(F.col(id_col), F.explode("sh").alias("g"))
    else:
        # distinct=False: min() is duplicate-insensitive, so the
        # dropDuplicates exchange would be pure waste — the groupBy below
        # reuses the shingle window's doc-id partitioning directly
        sh = exploded_shingles(df, id_col, text_col, shingle_n, distinct=False)
    sh = sh.withColumn("h", F.xxhash64("g").bitwiseAND(F.lit(0xFFFFFFFF)))
    mins = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(_MERSENNE_P)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(params)
    ]
    return sh.groupBy(id_col).agg(*mins)


def minhash_band_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    sets: DataFrame | None = None,
) -> DataFrame:
    """(id, band, bucket) band-bucket rows — ``bands`` rows per doc,
    each bucket the hash of that band's minhash tuple. The shared
    substrate of one-shot LSH (self-join below) and the persisted
    near-dup index (:func:`ingest_batch_near_dup`). ``sets`` is passed
    through to :func:`minhash_signatures`."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n, sets=sets)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[f"mh_{b * rows_per_band + r}" for r in range(rows_per_band)]).alias(
                "bucket"
            ),
        )
        for b in range(bands)
    ]
    return sigs.select(F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded MinHash.

    rows/band = num_hashes/bands; two docs are candidates if ANY band's
    hash-tuple matches. The band bucket join shuffles on
    (band, bucket_hash) — collision groups only, never all pairs.
    Pass a persisted ``sets`` to share one tokenize pass with the
    verify stage (see :func:`minhash_signatures`).
    """
    buckets = minhash_band_buckets(
        df, id_col, text_col, num_hashes, bands, shingle_n, sets=sets
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    return pairs


#: signature width per token-hash function: xxhash64 fills all 64 bits;
#: the md5 twin takes 15 hex chars = 60 bits (the repo's cross-engine
#: ``('0x' || substr(md5(tok), 1, 15))::BIGINT`` idiom — 60 bits keeps
#: the value positive in a signed BIGINT on both engines)
_SIMHASH_BITS = {"xxhash64": 64, "md5": 60}


def simhash(
    df: DataFrame, id_col: str, text_col: str, hash_fn: str = "xxhash64"
) -> DataFrame:
    """SimHash per document: sum +/-1 per bit over token hashes, then
    pack the signs. One conditional-sum aggregate per bit in ONE
    groupBy — wide but map-side combinable, shuffle is ``bits`` longs
    per doc. ``hash_fn``: ``xxhash64`` (production, 64-bit) or ``md5``
    (the oracle-replayable 60-bit twin — DuckDB computes identical
    token hashes, so the signature value-checks cross-engine)."""
    bits = _SIMHASH_BITS[hash_fn]
    if hash_fn == "md5":
        h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    else:
        h = F.xxhash64("tok")
    tok = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    ).withColumn("h", h)
    bit_sums = [
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s_{i}")
        for i in range(bits)
    ]
    sums = tok.groupBy(id_col).agg(*bit_sums)
    # shiftleft instead of a 1<<63 literal: bit 63 is the Long sign bit,
    # unrepresentable as a positive literal; distinct-power addition
    # never overflows (the one negative term only pulls the sum down)
    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig + F.when(
            F.col(f"s_{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return sums.select(F.col(id_col), sig.alias("simhash"))


def simhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bands: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Hamming-near candidates: split the signature into bands; pairs
    sharing any band are candidates (catches Hamming distance < bands
    by pigeonhole). ``hash_fn`` as in :func:`simhash`."""
    width = _SIMHASH_BITS[hash_fn] // bands
    sigs = simhash(df, id_col, text_col, hash_fn=hash_fn)
    mask = (1 << width) - 1
    chunks = sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("simhash", b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.chunk")
    # materialized: the self-join's sides otherwise re-run the whole
    # simhash pipeline (tokenize + per-bit majority aggregate) once
    # each — bands rows per doc, metadata-sized (see
    # minhash_lsh_candidates)
    chunks = chunks.localCheckpoint(eager=True)
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs above ``threshold``.

    With ``candidates`` (e.g. from MinHash-LSH) the exact check verifies
    only the candidate pairs via a JVM ``array_intersect`` — no shingle
    self-join at all. Without, candidates come from **prefix filtering**
    (AllPairs / PPJoin family): under a global rarest-first shingle
    ordering, two sets with Jaccard >= t must share an element within
    their first ``sz - floor(t*sz) + 1`` shingles, so the self-join meets
    only on rare prefix shingles instead of every shared shingle — this
    is what keeps the quadratic blowup bounded on low-entropy corpora
    and at 100 TB. Both paths are exact (prefix filtering is complete),
    so results are identical to the naive all-shared-shingles join.

    ``sets`` (from :func:`shingle_sets`) is consumed five times in the
    default plan (three prefix-filter reads + both verify sides); a
    caller running repeated batches can pass a cached frame and own its
    lifecycle. When the frame is built HERE it is localCheckpointed
    (exchange reuse does not cover the differently-keyed consumers, so
    the tokenize+shingle pipeline would otherwise run once per consumer
    — measured on dedup_containment_pairs, the same shape).
    """
    if sets is None:
        sets = shingle_sets(df, id_col, text_col, n).localCheckpoint(
            eager=True
        )
    if candidates is None:
        candidates = _prefix_filter_candidates(sets, id_col, threshold)
    a = sets.select(
        F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"), F.col("set_size").alias("size_a")
    )
    b = sets.select(
        F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"), F.col("set_size").alias("size_b")
    )
    verified = (
        candidates.join(a, on="id_a")
        .join(b, on="id_b")
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
    )
    jac = F.col("common") / (F.col("size_a") + F.col("size_b") - F.col("common"))
    return verified.select(
        "id_a", "id_b", F.round(jac, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def _prefix_filter_candidates(sets: DataFrame, id_col: str, threshold: float) -> DataFrame:
    """Candidate pairs via prefix filtering with a rarest-first global
    ordering. Prefix length ``sz - floor(t*sz) + 1`` is >= the canonical
    ``sz - ceil(t*sz) + 1`` (floor used to dodge float-boundary error on
    t*sz), so completeness is preserved. Size-compatibility pruning
    (``t*max(sa,sb) <= min(sa,sb)``) is applied inside the join.

    Singleton prune (r16): shingles with document frequency 1 are
    dropped BEFORE the rank window — they exist in exactly one set, so
    they can never satisfy ``a.g == b.g`` for two distinct ids.
    Dropping them only shifts the remaining tokens' ranks DOWN, so
    every token inside the canonical prefix stays inside it and the
    positional upper bound only loosens: the candidate set stays a
    SUPERSET of all true pairs (prefix filtering's completeness holds
    under the full ordering, and a shared token's pruned rank is <= its
    full rank), and the exact verification step makes the final output
    identical. Weight depends on corpus entropy: the synthetic bench
    corpus keeps 99.9% of rows (measured, r16 — neutral there), while
    on natural text singleton n-grams are typically the majority of
    the exploded stream."""
    from pyspark.sql import Window

    tok = sets.select(id_col, "set_size", F.explode("sh").alias("g"))
    freq = tok.groupBy("g").agg(F.count("*").alias("df_g"))
    w = Window.partitionBy(id_col).orderBy(F.asc("df_g"), F.asc("g"))
    prefix = (
        tok.join(freq.filter(F.col("df_g") >= 2), on="g")
        .withColumn("r", F.row_number().over(w))
        .filter(
            F.col("r")
            <= F.col("set_size") - F.floor(F.lit(threshold) * F.col("set_size")) + 1
        )
        .select(id_col, "set_size", "g", "r")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    t = F.lit(threshold)
    # PPJoin positional filter: a token matched at prefix positions
    # (ra, rb) bounds the possible overlap at 1 + min(sa-ra, sb-rb);
    # the pair can only reach Jaccard >= t if that bound meets the
    # required overlap t/(1+t)*(sa+sb). The 1e-9 slack keeps float
    # boundary error from ever pruning a true pair.
    ubound = F.lit(1) + F.least(
        F.col("a.set_size") - F.col("a.r"), F.col("b.set_size") - F.col("b.r")
    )
    alpha = (t / (1 + threshold)) * (F.col("a.set_size") + F.col("b.set_size"))
    return (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (F.col("b.set_size") >= t * F.col("a.set_size"))
            & (F.col("a.set_size") >= t * F.col("b.set_size"))
            & (ubound >= alpha - F.lit(1e-9)),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def ingest_batch(
    spark,
    batch: DataFrame,
    index: "object",
    id_col: str = "doc_id",
    fp_col: str = "fp",
    bloom: "object | None" = None,
    stage_novel=None,
) -> DataFrame:
    """Incremental exact dedup for CONTINUOUS corpus ingestion: return
    the batch rows whose fingerprint is new to the persisted index, and
    fold those fingerprints into the index.

    ``index`` is a ``sinks.BucketedParquetTarget`` keyed on ``fp_col``
    holding ``(fp, id)`` rows. The 100 TB shape, mirroring the CDC
    merge sink:

    * within-batch dedup is one shuffle on the fingerprint;
    * the membership check reads ONLY the index buckets the batch's
      fingerprints hash into (``index.probe`` — partition-pruned scan,
      ~|batch buckets|/n_buckets of the index, never a full scan);
    * novel fingerprints merge back via the partial-rewrite path
      (affected buckets rewritten, the rest hardlinked forward);
    * replaying the same batch is a metadata no-op: zero novel rows ->
      ``merge`` sees no affected buckets and never stages a version.

    With ``bloom`` (an :class:`operators.bloom.BloomFilter` covering —
    as a SUPERSET — every fingerprint in the index), rows the bloom
    rejects skip the index probe and the anti-join entirely: in the
    common crawl-ingestion regime where most documents are novel, the
    membership join shrinks to the bloom's false-positive sliver and
    the probe's key frame (hence its bucket read set) shrinks with it.
    The caller owns bloom lifecycle: fold the returned novel rows in
    with ``bloom.update`` after each batch (staleness in the superset
    direction is safe; missing index keys is not).

    ``stage_novel(df)``, when given, runs on the materialized novel
    frame BEFORE the index merge — the hook that makes exactly-once
    downstream delivery possible: stage idempotently (keyed by batch),
    then merge; a crash in any window either replays to the same novel
    set (index unmerged) or finds the staging already present
    (streaming.DedupStreamPipeline's ``novel_dir`` protocol).

    Returns the novel rows (first occurrence per new fingerprint, by
    lowest ``id_col``).
    """
    # materialized up front: the probe's bucket collect, the anti-join,
    # and the novel checkpoint below each re-execute this frame's
    # lineage otherwise (separate actions share no exchanges), and the
    # lineage starts with the batch's fingerprint computation — the
    # heaviest map-side stage (r15: one featurize pass, not three)
    batch_unique = exact_dedup(batch, cols=[fp_col], key=id_col).localCheckpoint(
        eager=True
    )
    if not index.exists():
        if stage_novel is not None:
            stage_novel(batch_unique)
        index.overwrite(batch_unique.select(fp_col, id_col))
        return batch_unique
    if bloom is not None:
        from d365fo_db_sync_spark.operators import bloom as bloom_mod

        hit = bloom_mod.might_contain(bloom, fp_col)
        maybe = batch_unique.filter(hit)
        known = index.probe(spark, maybe.select(fp_col))
        # definitely-new rows bypass the join; the two branches reuse
        # batch_unique's dedup exchange (ReusedExchange in the plan)
        novel = batch_unique.filter(~hit).unionByName(
            maybe.join(known.select(fp_col), on=fp_col, how="left_anti")
        )
    else:
        known = index.probe(spark, batch_unique.select(fp_col))
        novel = batch_unique.join(known.select(fp_col), on=fp_col, how="left_anti")
    # materialize BEFORE the merge: the anti-join's lineage reads the
    # index version that existed at probe time, which the merge below
    # garbage-collects after its pointer swap — a lazy recompute of
    # `novel` after that would fail (or, with caching, silently see the
    # post-merge index and return empty). localCheckpoint truncates the
    # lineage eagerly, so the returned frame is self-contained.
    novel = novel.localCheckpoint(eager=True)
    if stage_novel is not None:
        stage_novel(novel)
    index.merge(spark, novel.select(fp_col, id_col))
    return novel


def ingest_batch_near_dup(
    spark,
    batch: DataFrame,
    index: "object",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-duplicate check of a new batch against a PERSISTED MinHash
    band-bucket index — "have we already ingested something like this
    document?" without recomputing signatures for the historical corpus.

    ``index`` is a ``sinks.BucketedParquetTarget`` keyed on ``bkey``
    (hash of (band, bucket)) holding ``(bkey, band, bucket, id)`` rows —
    an inverted index from LSH bucket to member docs. Per batch:

    * signatures + band buckets for the BATCH only (the historical
      corpus is never re-read, let alone re-hashed);
    * the probe reads only the index partitions the batch's bucket keys
      hash into (partition-pruned);
    * candidates = batch rows joining historical rows in the same
      bucket (downstream exact verification, e.g. ngram_jaccard on the
      pair set, is the caller's second stage — same as one-shot LSH);
    * the batch's NOVEL bucket rows append into the affected partitions
      via the partial-rewrite path (``merge(replace_keys=False)`` — an
      inverted index is multi-row-per-key, so upsert semantics would
      evict the history); replaying a batch appends nothing.

    The index pins (num_hashes, bands, shingle_n): probing with
    different parameters than it was built with yields garbage — keep
    them in the caller's config, like the sync key.

    Returns distinct candidate pairs ``(id_col, dup_id)`` — batch doc
    vs previously-indexed doc. In-batch near-dups are not reported;
    run :func:`minhash_lsh_candidates` on the batch for those.
    """
    bb = minhash_band_buckets(
        batch, id_col, text_col, num_hashes, bands, shingle_n
    ).withColumn("bkey", F.xxhash64("band", "bucket"))
    cols = ["bkey", "band", "bucket", id_col]
    if not index.exists():
        index.overwrite(bb.select(*cols))
        return bb.select(F.col(id_col), F.col(id_col).alias("dup_id")).limit(0)
    known = index.probe(spark, bb.select("bkey"))
    candidates = (
        bb.join(known.select("bkey", F.col(id_col).alias("dup_id")), on="bkey")
        .filter(F.col("dup_id") != F.col(id_col))
        .select(id_col, "dup_id")
        .distinct()
    )
    novel = bb.select(*cols).join(known, on=["bkey", id_col], how="left_anti")
    # materialize before the merge GC's the probed index version (same
    # lineage hazard as ingest_batch)
    candidates = candidates.localCheckpoint(eager=True)
    novel = novel.localCheckpoint(eager=True)
    index.merge(spark, novel.select(*cols), replace_keys=False)
    return candidates


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    para_tokens: int = 16,
) -> DataFrame:
    """Corpus-wide paragraph-level dedup (the MassiveText/RefinedWeb
    intra-corpus pass): documents are cut into fixed ``para_tokens``
    non-overlapping token windows ("paragraphs" — the corpus has no
    structural delimiters, so windows stand in for them; swap the
    splitter for \\n\\n on corpora that have real paragraphs), every
    repeated paragraph keeps only its FIRST occurrence corpus-wide
    (ordered by (doc id, position) — deterministic), and each
    document's surviving paragraphs are reassembled in order.

    Returns (id, kept_text, n_kept, n_dropped): ``kept_text`` is the
    space-joined surviving token windows (token-normalized — original
    whitespace is not preserved), empty when every paragraph of a doc
    was seen earlier.

    Scale shape: paragraph construction is all-codegen array ops
    (transform over a sequence of slices); the keep-first decision is
    a fingerprint-keyed ``min(struct(doc, pos))`` AGGREGATE — NOT a
    row_number window: a boilerplate paragraph shared by millions of
    documents would land every copy in one window partition (the
    classic hot-key trap), while min() combines map-side so the hot
    fingerprint ships one row per input partition. The keeper set
    (fingerprint, doc, pos — no text) then semi-joins back; reassembly
    is one groupBy on the doc id. This is the operator that removes
    boilerplate headers/footers shared across millions of pages
    without dropping whole documents.
    """
    toks = tokens(text_col)
    n_paras = F.ceil(F.size(toks) / F.lit(para_tokens)).cast("int")
    paras = F.transform(
        F.sequence(F.lit(0), F.greatest(n_paras - 1, F.lit(0))),
        lambda i: F.concat_ws(
            " ", F.slice(toks, i * para_tokens + 1, para_tokens)
        ),
    )
    exploded = (
        df.select(F.col(id_col), F.posexplode(paras).alias("pidx", "para"))
        .filter(F.col("para") != "")
        .withColumn("__fp", F.md5("para"))
        # materialized: three consumers (keeper aggregate, semi-join
        # probe, per-doc total) each group/join on DIFFERENT keys, so
        # no exchange is reusable and the tokenize + paragraph-slice +
        # md5 pipeline would otherwise run three times
        .localCheckpoint(eager=True)
    )
    keepers = exploded.groupBy("__fp").agg(
        F.min(F.struct(F.col(id_col), F.col("pidx"))).alias("first")
    ).select(
        "__fp",
        F.col(f"first.{id_col}").alias(id_col),
        F.col("first.pidx").alias("pidx"),
    )
    kept = exploded.join(keepers, on=["__fp", id_col, "pidx"], how="left_semi")
    per_doc_total = exploded.groupBy(id_col).agg(F.count("*").alias("__n_all"))
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pidx", "para"))),
                    lambda s: s["para"],
                ),
            ).alias("kept_text"),
            F.count("*").alias("n_kept"),
        )
    )
    return (
        df.select(id_col)
        .join(rebuilt, on=id_col, how="left")
        .join(per_doc_total, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("kept_text", F.lit("")).alias("kept_text"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (
                F.coalesce("__n_all", F.lit(0)) - F.coalesce("n_kept", F.lit(0))
            ).cast("long").alias("n_dropped"),
        )
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle CONTAINMENT above ``threshold``: directed pairs
    (id_a, id_b, containment) where |A∩B| / |A| >= t — the asymmetric
    near-dup relation symmetric Jaccard structurally misses (a short
    document quoted whole inside a long one has Jaccard ≈ |A|/|B| →
    tiny, containment = 1.0). Self-pairs and A=B id collisions are
    excluded; both directions are reported when both clear the bar.

    Candidates come from the containment prefix filter: if
    |A∩B| >= t*|A|, at most |A| - ceil(t*|A|) of A's shingles are
    unshared, so ANY prefix of length |A| - floor(t*|A|) + 1 must
    contain a shared shingle (floor >= canonical ceil bound —
    complete). The probe side explodes only that prefix under the
    rarest-first global ordering (hot shingles pushed out of
    prefixes); the CONTAINER side cannot be prefix-limited (the
    relation is asymmetric), so prefixes join the full posting list —
    the published AllPairs containment variant. Verification is one
    ``array_intersect`` per candidate, exact.
    """
    from pyspark.sql import Window

    if sets is None:
        # materialized: five consumers read this frame (freq, prefix
        # probe, postings, and both verify sides) under different join
        # keys, so no exchange is reusable and the tokenize+shingle
        # pipeline would otherwise run once per consumer
        sets = shingle_sets(df, id_col, text_col, n).localCheckpoint(
            eager=True
        )
    tok = sets.select(id_col, "set_size", F.explode("sh").alias("g"))
    freq = tok.groupBy("g").agg(F.count("*").alias("df_g"))
    w = Window.partitionBy(id_col).orderBy(F.asc("df_g"), F.asc("g"))
    prefix_len = F.col("set_size") - F.floor(
        F.lit(threshold) * F.col("set_size")
    ) + 1
    # singleton prune (r16, same argument and corpus-entropy caveat as
    # _prefix_filter_candidates): a df_g = 1 shingle lives in one set
    # only, so its posting join yields nothing but the self-pair;
    # dropping it before the rank window only shifts ranks down,
    # keeping the probe prefix a superset of the canonical one —
    # candidates stay complete and the exact verification keeps the
    # output identical
    prefix = (
        tok.join(freq.filter(F.col("df_g") >= 2), on="g")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= prefix_len)
        .select(F.col(id_col).alias("id_a"), "g")
    )
    postings = tok.select(F.col(id_col).alias("id_b"), "g")
    cand = (
        prefix.join(postings, on="g")
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = sets.select(
        F.col(id_col).alias("id_a"),
        F.col("sh").alias("sh_a"),
        F.col("set_size").alias("size_a"),
    )
    b = sets.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (
        cand.join(a, on="id_a")
        .join(b, on="id_b")
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
    )
    cont = F.col("common") / F.col("size_a")
    return verified.select(
        "id_a", "id_b", F.round(cont, 6).alias("containment")
    ).filter(F.col("containment") >= threshold)
