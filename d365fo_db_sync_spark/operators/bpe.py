"""Distributed BPE (byte-pair-encoding) vocabulary induction.

Training a subword vocabulary ON the corpus is a first-class step of a
pretraining pipeline (Sennrich et al. 2016, arXiv:1508.07909 — public
paper). The classic algorithm is inherently iterative — each round
merges the globally most frequent adjacent symbol pair — and maps onto
Spark as:

* state = a (word, count) WORD TABLE, not the corpus: BPE statistics
  factor through word frequencies, so the corpus is touched ONCE
  (tokenize + groupBy word) and every merge round runs over the
  distinct-word table (orders of magnitude smaller; Zipf means the
  head words carry almost all pair mass);
* each round: explode adjacent symbol pairs weighted by word count →
  one partial-agg shuffle on the pair → global argmax (a 1-row
  TakeOrdered, ties broken lexicographically for determinism) → map-
  side merge of the winning pair inside every word's symbol array
  (pure column expressions — no Python in the loop);
* the merged symbol arrays are re-materialized per round with eager
  localCheckpoint every few rounds — the same lineage-truncation
  discipline as operators/graph.py (without it, plan depth grows
  linearly with merges and analysis cost explodes).

At 100 TB the word table for a web corpus is ~10^8 rows (all distinct
words) — a few GB, comfortably distributed; rounds cost one shuffle
each. ``batch_size=M`` selects the top-M symbol-disjoint pairs per
round (the standard parallel-BPE approximation — disjoint merges
commute), cutting a 32k-merge vocab from ~64k Spark jobs to ~1k;
``batch_size=1`` keeps the exact classic algorithm and is
reference-equality-pinned in tests. ``apply_merges`` is the
encoding side: Arrow-batched rank-greedy BPE with a per-batch word
cache, pinned equivalent to the trained word-table state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators import text

#: end-of-word marker (classic BPE): keeps merges from crossing word
#: boundaries when the learned vocab is later applied
EOW = "</w>"


def word_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt, syms) — the corpus' distinct-word frequency table
    with each word pre-split into its initial character symbols (last
    symbol carries the end-of-word marker). The ONLY pass over the
    corpus; everything after runs on this table."""
    words = docs.select(F.explode(text.tokens(text_col)).alias("word"))
    wt = words.groupBy("word").agg(F.count("*").alias("cnt"))
    chars = F.split(F.col("word"), "")
    n = F.size(chars)
    syms = F.concat(
        F.slice(chars, 1, n - 1),
        F.array(F.concat(F.element_at(chars, -1), F.lit(EOW))),
    )
    # single-char words: slice(1, 0) is empty, element_at(-1) the char
    return wt.withColumn("syms", syms)


def _pair_counts(wt: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the word table, weighted by word
    count — posexplode + self-zip (symbols vs their successors), one
    groupBy shuffle with map-side partial aggregation."""
    pairs = F.zip_with(
        F.slice(F.col("syms"), 1, F.size("syms") - 1),
        F.slice(F.col("syms"), 2, F.size("syms") - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    return (
        wt.filter(F.size("syms") >= 2)
        .select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("freq"))
    )


def _merge_pairs(syms, pairs: list[tuple[str, str]]):
    """Merge every adjacent occurrence of each (a, b) in ``pairs``
    inside a symbol array — pure column expressions. Left-to-right,
    non-overlapping (the classic greedy semantics): fold over the
    array, appending either a merged symbol or the element, tracking
    whether the previous element was consumed.

    With ONE pair this is exactly the classic merge step. With several
    SYMBOL-DISJOINT pairs (no raw symbol shared between pairs — the
    invariant :func:`learn_bpe`'s batch selector enforces) a single
    fold equals applying the pairs sequentially in selection order:
    the skip flag stops a just-created symbol from merging again in
    the same pass, so every pair only consumes occurrences that
    existed at round start, and disjoint pairs' occurrences cannot
    overlap."""
    keys = [a + "\x00" + b for a, b in pairs]
    keyset = F.array(*[F.lit(k) for k in keys])
    # aggregate with state (arr, skip_next) encoded as a struct
    init = F.struct(
        F.array().cast("array<string>").alias("out"), F.lit(False).alias("skip")
    )

    def step(acc, nxt):
        out, skip = acc["out"], acc["skip"]
        prev = F.element_at(out, -1)
        can_merge = (
            (~skip)
            & (F.size(out) > 0)
            & F.array_contains(keyset, F.concat(prev, F.lit("\x00"), nxt))
        )
        merged = F.concat(F.slice(out, 1, F.size(out) - 1), F.array(F.concat(prev, nxt)))
        return F.struct(
            F.when(can_merge, merged).otherwise(F.concat(out, F.array(nxt))).alias("out"),
            can_merge.alias("skip"),
        )

    return F.aggregate(syms, init, step, lambda acc: acc["out"])


def _merge_pair(syms, a: str, b: str):
    """Single-pair merge step (classic BPE round)."""
    return _merge_pairs(syms, [(a, b)])


def learn_bpe(
    docs_or_words: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 4,
    is_word_table: bool = False,
    batch_size: int = 1,
    stats: dict | None = None,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(left, right, freq)] in
    merge order. Deterministic: the argmax tie-breaks on (freq desc,
    a asc, b asc). Stops early when no pair repeats.

    ``batch_size=1`` is exact classic BPE: one pair-count shuffle +
    1-row argmax per merge — fine for vocab bootstraps, but a
    32k-merge production vocab would be ~64k Spark jobs. With
    ``batch_size=M`` each round collects the top candidates and
    greedily keeps up to M pairs that are pairwise SYMBOL-DISJOINT
    (no raw symbol, and no just-merged symbol, shared) — the standard
    parallel-BPE approximation: disjoint merges commute, so applying
    the batch in one pass equals applying them sequentially in rank
    order; the approximation is only that a merge CREATED mid-batch
    cannot be selected until the next round. Job count drops from
    O(n_merges) to O(n_merges / M). Pass ``stats={}`` to receive
    ``stats["rounds"]`` (Spark rounds executed)."""
    wt = docs_or_words if is_word_table else word_table(docs_or_words, text_col)
    wt = wt.select("cnt", "syms").persist()
    wt.count()  # materialize before the loop
    merges: list[tuple[str, str, int]] = []
    i = 0  # checkpoint cadence counter (rounds, not merges)
    while len(merges) < n_merges:
        want = min(batch_size, n_merges - len(merges))
        # over-collect so the disjointness filter can still fill the
        # batch when top candidates share symbols (freq-equal runs
        # from the same word region conflict heavily)
        cand_limit = 1 if want == 1 else max(4 * want, 16)
        top = (
            _pair_counts(wt)
            .orderBy(F.desc("freq"), F.asc("a"), F.asc("b"))
            .limit(cand_limit)
            .collect()
        )
        top = [r for r in top if r["freq"] >= 2]
        if not top:
            break
        selected: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for r in top:
            if len(selected) == want:
                break
            a, b = r["a"], r["b"]
            # a pair conflicts if it shares a raw symbol with an
            # already-selected pair OR touches a symbol equal to one
            # a selected pair is about to create (keeps the one-pass
            # fold equal to sequential rank-order application)
            if a in used or b in used or (a + b) in used:
                continue
            selected.append((a, b, r["freq"]))
            used.update({a, b, a + b})
        merges.extend(selected)
        i += 1
        if stats is not None:
            stats["rounds"] = i
        old = wt
        nxt = old.select(
            "cnt",
            _merge_pairs(F.col("syms"), [(a, b) for a, b, _f in selected]).alias(
                "syms"
            ),
        ).persist()
        if i % checkpoint_every == 0:
            # truncate lineage: each round nests another fold expression;
            # without eager checkpoints plan analysis grows superlinearly
            # (same hazard as graph.connected_components). The checkpoint
            # COPIES the blocks, so the pre-checkpoint cache must be
            # released or the loop leaks one cached word table per
            # checkpoint round — ~8000 copies over a 32k-merge run.
            wt = nxt.localCheckpoint(eager=True)
            nxt.unpersist()
        else:
            nxt.count()
            wt = nxt
        old.unpersist()
    wt.unpersist()
    return merges


def vocab_from_merges(merges: list[tuple[str, str, int]]) -> list[str]:
    """The subword units a merge table induces (in creation order)."""
    return [a + b for a, b, _ in merges]


def merge_summary(spark: SparkSession, merges: list[tuple[str, str, int]]) -> DataFrame:
    """Merge table as a DataFrame: (rank, left, right, merged, freq)."""
    rows = [(i, a, b, a + b, f) for i, (a, b, f) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string, freq long"
    )


def apply_merges(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode documents with a learned merge table: (id, subwords
    array<string>, n_subwords). Applying 32k merges is inherently
    rank-priority iteration per word — not expressible as column
    expressions — so this is the pipeline's sanctioned Python hot path:
    `mapInPandas` (Arrow batches), classic rank-greedy BPE encoding with
    a per-batch word cache (Zipf: a few thousand distinct words cover a
    batch), no per-row Python round trips. Matches ``learn_bpe``'s
    training semantics exactly (pinned in tests/test_bpe.py: encoding
    with the learned table reproduces the trained word table's symbol
    arrays)."""
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    ranks = {(a, b): i for i, (a, b, _f) in enumerate(merges)}
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("subwords", ArrayType(StringType())),
            StructField("n_subwords", IntegerType()),
        ]
    )

    def encode_word(word: str, cache: dict) -> list[str]:
        hit = cache.get(word)
        if hit is not None:
            return hit
        syms = list(word[:-1]) + [word[-1] + EOW] if word else []
        while len(syms) > 1:
            best_i, best_rank = -1, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_i, best_rank = i, r
            if best_rank is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        cache[word] = syms
        return syms

    import re as _re

    # EXACTLY the training tokenizer: text.tokens splits on Java's \s,
    # which (without UNICODE_CHARACTER_CLASS) is only [ \t\n\x0b\f\r] —
    # Python's unicode-aware str.split() would additionally break on
    # NBSP etc. and silently encode a different word stream than the
    # vocab was trained on
    ws = _re.compile("[ \t\n\x0b\f\r]+")

    def run(batches):
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, subs, lens = [], [], []
            for doc_id, txt in zip(pdf[id_col], pdf[text_col]):
                toks = [w for w in ws.split(str(txt).lower()) if w]
                out: list[str] = []
                for w in toks:
                    out.extend(encode_word(w, cache))
                ids.append(doc_id)
                subs.append(out)
                lens.append(len(out))
            yield pd.DataFrame({id_col: ids, "subwords": subs, "n_subwords": lens})

    return docs.select(id_col, text_col).mapInPandas(run, schema)
