"""Sequence packing for LLM training pipelines.

The standard pretraining data layout concatenates documents in a fixed
order into one virtual token stream and cuts it every ``budget`` tokens
into training sequences ("packs"); a document may straddle a cut. The
operator computes, per document, its offset in the stream and the range
of packs it lands in — the metadata a loader needs to materialize any
pack by fetching only the documents that intersect it.

Scale design — the naive expression is a global cumulative sum
(``SUM() OVER (ORDER BY doc_id)``), which Catalyst executes as a
SINGLE-partition window: a non-starter at 100 TB. Instead the prefix
sum is computed in two stages, the classic distributed scan:

1. documents are range-bucketed on the order key
   (``bucket = doc_id div bucket_span`` — id-range buckets preserve the
   global order across buckets, unlike hash buckets);
2. a per-bucket token cumsum runs as a window PARTITIONED by bucket
   (one shuffle, all buckets in parallel);
3. per-bucket totals (one tiny aggregate, |buckets| rows) are
   prefix-summed on a single partition — safe because the frame is
   ~n_docs/bucket_span rows, metadata-sized by construction — and
   broadcast-joined back.

Total cost: one shuffle of (id, n_tokens) pairs + one broadcast of
bucket offsets. No full-corpus single-partition stage anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    token_count: Column,
    budget: int,
    id_col: str = "doc_id",
    bucket_span: int = 100_000,
) -> DataFrame:
    """Assign every document its global token offset and pack range.

    Returns ``id_col, n_tokens, g_start, first_pack, last_pack,
    n_packs`` where ``g_start`` is the document's offset in the
    concatenated token stream (order = ascending ``id_col``),
    ``first_pack``/``last_pack`` the budget-sized sequences it
    intersects, and ``n_packs`` how many it spans. Zero-token documents
    are dropped (they occupy no stream positions).

    ``bucket_span`` sets the id range per prefix-sum bucket; at corpus
    scale pick it so ``max_id / bucket_span`` stays metadata-sized
    (~10^5 buckets for 10^11 docs at the default).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    sized = (
        docs.select(
            F.col(id_col),
            token_count.cast("long").alias("n_tokens"),
            # integer div, not double division then cast: doubles lose
            # exactness past 2^53 (synthetic/composite ids can exceed
            # it) and truncate instead of flooring for negative ids
            F.expr(f"cast({id_col} as bigint) div {bucket_span}").alias("_pk_bucket"),
        )
        .filter(F.col("n_tokens") > 0)
        # materialized: the in-bucket window (stage 2) and the bucket
        # totals (stage 3) are sibling consumers — without the barrier
        # the upstream lineage (tokenize/size computation) runs twice
        .localCheckpoint(eager=True)
    )
    # stage 2: in-bucket running total (parallel across buckets).
    # id_col must be UNIQUE — it is the stream order key, so the layout
    # is only well-defined when it is; the explicit ROWS frame keeps the
    # sum row-bounded (the default RANGE frame gives every duplicate id
    # the inclusive sum of all its peers).
    in_bucket = (
        Window.partitionBy("_pk_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = sized.withColumn(
        "_local_end", F.sum("n_tokens").over(in_bucket)
    )
    # stage 3: bucket totals -> exclusive prefix; |buckets| rows only,
    # so the single-partition window is driver-small by construction.
    # The partition key pmod(bucket, 1) is constantly 0 — it makes the
    # one-partition choice EXPLICIT so WindowExec stops warning about
    # an undefined partition (the frame is metadata-sized, not a scale
    # hazard). A foldable literal would not survive the optimizer.
    totals = sized.groupBy("_pk_bucket").agg(F.sum("n_tokens").alias("_tot"))
    bucket_order = (
        Window.partitionBy(F.pmod(F.col("_pk_bucket"), F.lit(1)))
        .orderBy("_pk_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_pk_bucket",
        F.coalesce(F.sum("_tot").over(bucket_order), F.lit(0)).alias("_bucket_off"),
    )
    g_start = (F.col("_bucket_off") + F.col("_local_end") - F.col("n_tokens")).alias(
        "g_start"
    )
    packed = local.join(F.broadcast(offsets), on="_pk_bucket").select(
        id_col,
        "n_tokens",
        g_start,
    )
    first = F.expr(f"g_start div {budget}")
    last = F.expr(f"(g_start + n_tokens - 1) div {budget}")
    return packed.select(
        id_col,
        "n_tokens",
        "g_start",
        first.alias("first_pack"),
        last.alias("last_pack"),
        (last - first + 1).alias("n_packs"),
    )


def pack_manifest(packed: DataFrame, budget: int) -> DataFrame:
    """Invert :func:`pack_sequences` into a per-pack manifest:
    ``pack_id, n_docs, tok_start, tok_end`` — the loader-side view
    (which documents to fetch to build each training sequence).

    The explode is bounded: a document spanning k packs emits k rows,
    and sum(k) = total_tokens/budget + n_docs — linear in the corpus,
    never quadratic.
    """
    spans = packed.select(
        packed.columns[0],
        F.explode(F.sequence("first_pack", "last_pack")).alias("pack_id"),
    )
    return (
        spans.groupBy("pack_id")
        .agg(F.count("*").alias("n_docs"))
        .withColumn("tok_start", F.col("pack_id") * budget)
        .withColumn("tok_end", (F.col("pack_id") + 1) * budget - 1)
    )


def hash_banded_prefix_sum(
    sized: DataFrame,
    id_col: str,
    group_cols: tuple[str, ...] = (),
    hash_col: str = "_h",
    value_col: str = "n_tokens",
) -> tuple[DataFrame, DataFrame]:
    """The shared banded two-stage prefix-sum discipline: exclusive
    running total of ``value_col`` in ``(group, hash, id)`` order,
    banded on the hash's first two hex chars (256 uniform bands per
    group). Stage 1 is an in-band running sum — parallel across
    groups x bands; stage 2 an exclusive prefix over the band-total
    frame (|groups|·256 rows, metadata-sized, broadcast back). Returns
    the input columns plus ``tok_before``. One operator owns this
    machinery so the ROWS-frame/tie-order/band-count discipline cannot
    drift between its consumers (shard layout, token-budget mixtures).
    ``hash_col`` must order rows uniformly (md5 of the id in practice);
    with no ``group_cols`` the prefix is global, and the single-
    partition stage-2 window is made explicit via the constant pmod
    partition key (the frame is 256 rows by construction).

    The banded frame is materialized (eager ``localCheckpoint``) before
    the two stages: the in-band window and the band-total aggregate are
    sibling consumers sharing no exchange, so without the barrier Spark
    re-runs the ENTIRE upstream lineage — which for pipeline consumers
    is the full curation pipeline (manifest read, quality gates, dedup
    semi-joins) — once per stage. The checkpointed rows are the narrow
    decision-pass proxy (id, value, hash), never the payload."""
    banded = sized.withColumn(
        "_hb", F.substring(hash_col, 1, 2)
    ).localCheckpoint(eager=True)
    in_band = (
        Window.partitionBy(*group_cols, "_hb")
        .orderBy(hash_col, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = banded.withColumn("_local_end", F.sum(value_col).over(in_band))
    totals = banded.groupBy(*group_cols, "_hb").agg(F.sum(value_col).alias("_tot"))
    if group_cols:
        band_order = (
            Window.partitionBy(*group_cols)
            .orderBy("_hb")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
    else:
        band_order = (
            Window.partitionBy(F.pmod(F.crc32(F.col("_hb")), F.lit(1)))
            .orderBy("_hb")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
    offsets = totals.select(
        *group_cols,
        "_hb",
        F.coalesce(F.sum("_tot").over(band_order), F.lit(0)).alias("_off"),
    )
    prefixed = (
        local.join(F.broadcast(offsets), on=[*group_cols, "_hb"])
        .withColumn(
            "tok_before", F.col("_off") + F.col("_local_end") - F.col(value_col)
        )
        .drop("_hb", "_local_end", "_off")
    )
    # the (group x band) totals frame is metadata-sized and already
    # computed — callers that need per-group totals (phase offsets) sum
    # it instead of re-aggregating the full corpus. One return shape:
    # a flag-dependent DataFrame-or-tuple would fail only at runtime.
    return prefixed, totals


def shuffled_shards(
    docs: DataFrame,
    token_count: Column,
    shard_tokens: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic global shuffle + token-budgeted shard assignment —
    the training-export layout step: randomize document order (so
    consecutive training sequences don't share a source/crawl locality)
    and cut the shuffled stream into ~``shard_tokens``-token shards for
    the dataloader. Returns ``id_col, n_tokens, g_start, shard`` where
    ``g_start`` is the document's offset in the SHUFFLED token stream
    and ``shard = g_start div shard_tokens`` (a document belongs to the
    shard its first token lands in, so shards overshoot by at most one
    document — the usual "~1 GB shards" discipline).

    The shuffle order is ``md5(salt || id)`` — uniform pseudo-random
    but rerun/partitioning-stable (same reasons as operators/sampling:
    a backfill reproduces the byte-identical layout) and
    engine-independent, which is what makes the layout oracle-checkable.
    Unlike ``df.orderBy(rand())``, membership and position never change
    under a different cluster size.

    Scale shape — same two-stage distributed prefix sum as
    :func:`pack_sequences`, but banded on the first two hex chars of
    the hash (256 uniform bands) because the order key is the hash
    itself: band-local running sums in parallel, then an exclusive
    prefix over the 256-row band-total frame, broadcast back. The
    global sort the naive ``SUM() OVER (ORDER BY h)`` would serialize
    into one partition never happens.
    """
    if shard_tokens <= 0:
        raise ValueError(f"shard_tokens must be positive, got {shard_tokens}")
    parts = ([F.lit(salt)] if salt else []) + [F.col(id_col).cast("string")]
    h = F.md5(F.concat_ws("\x1f", *parts))
    sized = docs.select(
        F.col(id_col),
        token_count.cast("long").alias("n_tokens"),
        h.alias("_h"),
    ).filter(F.col("n_tokens") > 0)
    # global order = (_h, id): the band is a prefix of _h, so ordering
    # bands ascending and (_h, id) within a band IS the global hash
    # order — the shared helper owns the two-stage scan
    prefixed, _ = hash_banded_prefix_sum(sized, id_col)
    return (
        prefixed
        .withColumnRenamed("tok_before", "g_start")
        .select(id_col, "n_tokens", "g_start")
        .withColumn("shard", F.expr(f"g_start div {shard_tokens}"))
    )


def shard_manifest(assigned: DataFrame) -> DataFrame:
    """Per-shard summary of :func:`shuffled_shards` output:
    ``shard, n_docs, n_tokens, tok_start, tok_end`` — what an export
    job needs to size/write each shard file and what a loader needs to
    address it. One tiny aggregate (|shards| rows)."""
    return assigned.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min("g_start").alias("tok_start"),
        F.max(F.col("g_start") + F.col("n_tokens") - 1).alias("tok_end"),
    )


def write_shards(
    docs: DataFrame,
    assigned: DataFrame,
    path: str,
    id_col: str = "doc_id",
) -> None:
    """Materialize the :func:`shuffled_shards` layout as one parquet
    directory per shard: join the assignment back to the full documents
    (one equi-join on the id) and write ``partitionBy("shard")`` with
    rows ordered by ``g_start`` inside each task — the physical export
    a dataloader consumes shard-by-shard.

    ``repartition("shard")`` first, so each shard is written by exactly
    ONE task: without it every input task holding rows of shard k opens
    its own file under ``shard=k/`` and a 1000-executor run shatters
    each shard into a thousand small files. One hash shuffle on the
    shard id, whose fan-in also bounds writer memory to a shard's rows.
    """
    out = docs.join(assigned.select(id_col, "g_start", "shard"), on=id_col)
    (
        # sort by (shard, g_start), not g_start alone: the dynamic-
        # partition writer requires child ordering on the partition
        # column and would insert its own Sort(shard) — eliminating a
        # bare g_start sort and leaving in-file row order arbitrary.
        # Leading with shard satisfies the writer's requirement so the
        # g_start order actually survives into each shard file.
        out.repartition("shard")
        .sortWithinPartitions("shard", "g_start")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )


def curriculum_shards(
    docs: DataFrame,
    token_count: Column,
    difficulty: Column,
    shard_tokens: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Curriculum export layout: the token stream is ordered by
    ascending ``difficulty`` bucket FIRST (easy-to-hard training
    phases), with the deterministic md5 shuffle only WITHIN each bucket
    — the curriculum-learning counterpart of :func:`shuffled_shards`.
    Returns ``id_col, difficulty, n_tokens, g_start, shard``.

    Scale shape: the difficulty bucket becomes a GROUP of the shared
    banded prefix sum (parallel across buckets x 256 hash bands); the
    per-bucket totals frame (|buckets| rows, metadata by construction —
    difficulty is a coarse phase label, not a continuous score) is
    prefix-summed on an explicit single partition and broadcast back.
    Still no global-order sort anywhere."""
    if shard_tokens <= 0:
        raise ValueError(f"shard_tokens must be positive, got {shard_tokens}")
    parts = ([F.lit(salt)] if salt else []) + [F.col(id_col).cast("string")]
    h = F.md5(F.concat_ws("\x1f", *parts))
    sized = docs.select(
        F.col(id_col),
        difficulty.cast("long").alias("difficulty"),
        token_count.cast("long").alias("n_tokens"),
        h.alias("_h"),
    ).filter(F.col("n_tokens") > 0)
    prefixed, band_totals = hash_banded_prefix_sum(
        sized, id_col, group_cols=("difficulty",)
    )
    # phase totals from the helper's band-total frame (|phases|·256
    # rows, metadata) — never a second full-corpus aggregate
    totals = band_totals.groupBy("difficulty").agg(F.sum("_tot").alias("_tot"))
    phase_order = (
        Window.partitionBy(F.pmod(F.col("difficulty"), F.lit(1)))
        .orderBy("difficulty")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "difficulty",
        F.coalesce(F.sum("_tot").over(phase_order), F.lit(0)).alias("_phase_off"),
    )
    return (
        prefixed.join(F.broadcast(offsets), on="difficulty")
        .withColumn("g_start", F.col("_phase_off") + F.col("tok_before"))
        .select(id_col, "difficulty", "n_tokens", "g_start")
        .withColumn("shard", F.expr(f"g_start div {shard_tokens}"))
    )


def append_shards(
    docs: DataFrame,
    assigned_new: DataFrame,
    path: str,
    prev_total_tokens: int,
    shard_tokens: int,
    id_col: str = "doc_id",
) -> int:
    """Incremental export: place a NEW batch of documents into shards
    AFTER everything already exported, without touching a single
    published shard file (shards are immutable once a dataloader may
    have opened them). ``assigned_new`` is :func:`shuffled_shards`
    over the new batch alone; its offsets are shifted past the next
    shard boundary above ``prev_total_tokens`` — the pad (at most
    ``shard_tokens - 1`` tokens) is the price of immutability, exactly
    the partial-final-shard waste any append-only shard store accepts.
    Writes with parquet append (new shard directories only) and
    returns the new stream total to persist for the next batch.

    Same physics as the full export: one shard-id shuffle, one writer
    per new shard."""
    if prev_total_tokens < 0:
        raise ValueError(f"prev_total_tokens must be >= 0, got {prev_total_tokens}")
    if shard_tokens <= 0:
        raise ValueError(f"shard_tokens must be positive, got {shard_tokens}")
    base = -(-prev_total_tokens // shard_tokens) * shard_tokens
    # persist: the assignment lineage (two window stages + broadcast
    # join) feeds BOTH the write and the new-total aggregate below —
    # without it the whole prefix sum re-executes for a single scalar
    shifted = (
        assigned_new.withColumn("g_start", F.col("g_start") + F.lit(base))
        .withColumn("shard", F.expr(f"g_start div {shard_tokens}"))
        .persist()
    )
    try:
        out = docs.join(shifted.select(id_col, "g_start", "shard"), on=id_col)
        (
            out.repartition("shard")
            .sortWithinPartitions("shard", "g_start")
            .write.partitionBy("shard")
            .mode("append")
            .parquet(path)
        )
        # the shifted stream is contiguous from base, so the new total
        # is base + batch tokens — one cheap sum over the cached rows
        row = shifted.agg(
            (F.lit(base) + F.coalesce(F.sum("n_tokens"), F.lit(0))).alias("t")
        ).first()
        return int(row["t"])
    finally:
        shifted.unpersist()


def pack_sequences_ffd(
    docs: DataFrame,
    token_count: Column,
    budget: int,
    id_col: str = "doc_id",
    bucket_span: int = 100_000,
) -> DataFrame:
    """First-fit-decreasing packing WITHOUT document straddling: every
    document lands wholly inside one pack (the discipline for
    finetuning/eval sets, where truncating a document mid-sequence is
    wrong). Returns ``id_col, n_tokens, bucket, pack_in_bucket``.

    Bin packing is inherently sequential-stateful, so this is the
    Pandas-UDF tier (applyInPandas), not a composition of built-ins:
    documents are range-bucketed on the id (same bucketing as
    :func:`pack_sequences`), and each bucket runs classic FFD — sort by
    token count descending (id ascending as the deterministic
    tiebreak), place each doc in the first open pack with room, open a
    new pack otherwise. Buckets pack independently and in parallel;
    per-task state is one bucket's (count, remaining-capacity) lists,
    bounded by ``bucket_span`` regardless of corpus size. A document
    larger than ``budget`` gets a pack of its own (never silently
    dropped). The inner first-fit scan is O(docs x open-packs) per
    bucket — fine at bucket granularity; swap in a capacity-indexed
    tree if buckets are sized toward 10^6 docs.

    Packing quality vs the straddling layout: FFD wastes at most the
    classic (11/9 OPT + 1) bound per bucket, while
    :func:`pack_sequences` wastes zero tokens but cuts documents.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    import pandas as pd

    sized = docs.select(
        F.col(id_col),
        token_count.cast("long").alias("n_tokens"),
        # integer div (see pack_sequences): exact past 2^53, floors
        # negatives
        F.expr(f"cast({id_col} as bigint) div {bucket_span}").alias("bucket"),
    ).filter(F.col("n_tokens") > 0)

    schema = f"{id_col} long, n_tokens long, bucket long, pack_in_bucket long"

    def ffd(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["n_tokens", id_col], ascending=[False, True])
        remaining: list[int] = []
        assign: list[int] = []
        for t in pdf["n_tokens"]:
            for j, rem in enumerate(remaining):
                if t <= rem:
                    remaining[j] = rem - t
                    assign.append(j)
                    break
            else:
                remaining.append(max(budget - t, 0))
                assign.append(len(remaining) - 1)
        pdf = pdf.assign(pack_in_bucket=assign)
        return pdf[[id_col, "n_tokens", "bucket", "pack_in_bucket"]]

    return sized.groupBy("bucket").applyInPandas(ffd, schema=schema)
