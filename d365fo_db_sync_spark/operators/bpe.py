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
each, so learning 32k merges is the expensive OFFLINE job it is in any
framework, run once per tokenizer version. ``apply_merges`` is the
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


def _merge_pair(syms, a: str, b: str):
    """Merge every adjacent (a, b) occurrence inside a symbol array —
    pure column expressions. Left-to-right, non-overlapping (the
    classic greedy semantics): fold over the array, appending either a
    merged symbol or the element, tracking whether the previous element
    was consumed."""
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
            & (prev == F.lit(a))
            & (nxt == F.lit(b))
        )
        merged = F.concat(F.slice(out, 1, F.size(out) - 1), F.array(F.concat(prev, nxt)))
        return F.struct(
            F.when(can_merge, merged).otherwise(F.concat(out, F.array(nxt))).alias("out"),
            can_merge.alias("skip"),
        )

    return F.aggregate(syms, init, step, lambda acc: acc["out"])


def learn_bpe(
    docs_or_words: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 4,
    is_word_table: bool = False,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(left, right, freq)] in
    merge order. Deterministic: the argmax tie-breaks on (freq desc,
    a asc, b asc). Stops early when no pair repeats."""
    wt = docs_or_words if is_word_table else word_table(docs_or_words, text_col)
    wt = wt.select("cnt", "syms").persist()
    wt.count()  # materialize before the loop
    merges: list[tuple[str, str, int]] = []
    for i in range(n_merges):
        top = (
            _pair_counts(wt)
            .orderBy(F.desc("freq"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["freq"] < 2:
            break
        a, b, freq = top[0]["a"], top[0]["b"], top[0]["freq"]
        merges.append((a, b, freq))
        old = wt
        nxt = old.select("cnt", _merge_pair(F.col("syms"), a, b).alias("syms")).persist()
        if (i + 1) % checkpoint_every == 0:
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
