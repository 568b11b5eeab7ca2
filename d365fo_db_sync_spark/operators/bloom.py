"""Expression-level Bloom filter for incremental-ingest membership
pre-checks.

PySpark does not expose ``DataFrameStatFunctions.bloomFilter``, and a
Python-UDF bloom would drop the probe out of codegen — so this builds
the filter WITH DataFrame aggregates and tests membership WITH column
expressions (xxhash64 + pmod + bit ops): both sides run entirely in the
JVM.

Layout: ``m`` bits as ``m/64`` longs. Key ``x`` sets bits
``pmod(xxhash64(x, seed_i), m)`` for ``k`` seeds. Building is one
explode + groupBy(word) + bit_or aggregate; the dense word array (8
bytes per 64 bits) rides into the probe plan as an array literal — the
same mechanism as broadcast hyperplanes in operators/similarity.py.

Scale note (100 TB): a single monolithic bloom over 10^9+ index keys
needs ~1.2 GB at 1% fpp — too big for a plan literal. The intended
deployment is SEGMENTED: one bloom per index bucket/segment (the
incremental dedup index is already hive-partitioned by fingerprint
bucket), each a few MB, loaded for exactly the buckets a batch probes.
The math here is per-segment; ``m`` is the caller's sizing lever
(~10 bits/key for 1% fpp at k=7, ~7.2 bits/key for 3% at k=5).

Correctness contract: the filter must be a SUPERSET of the indexed key
set — a stale bloom that misses index keys turns "definitely new" into
silent duplicate admission. ``update`` exists precisely so callers fold
novel keys in at merge time; it never needs a rebuild to stay sound.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class BloomFilter:
    m_bits: int
    seeds: tuple[int, ...]
    words: tuple[int, ...]  # len == m_bits // 64, dense

    @property
    def n_words(self) -> int:
        return self.m_bits // 64


def _positions(col: Column, m_bits: int, seeds: tuple[int, ...]) -> list[Column]:
    return [F.pmod(F.xxhash64(col, F.lit(s)), F.lit(m_bits)) for s in seeds]


def _one_shl(shift: Column) -> Column:
    # F.shiftleft only takes a Python int for the shift amount; the SQL
    # function accepts a column — call it directly
    return F.call_function("shiftleft", F.lit(1).cast("long"), shift)


def _word_rows(df: DataFrame, key_col: str, m_bits: int, seeds: tuple[int, ...]):
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, seeds))).alias("pos")
    return (
        df.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("word"),
            _one_shl((F.col("pos") % 64).cast("int")).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )


def build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 17,
    k: int = 5,
    seed: int = 42,
) -> BloomFilter:
    """Build a bloom over ``df[key_col]`` distributively: k positions per
    key explode map-side, one groupBy(word)+bit_or shuffle whose result
    is at most ``m_bits/64`` rows — the only driver materialization is
    the finished word array."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    seeds = tuple(seed + i for i in range(k))
    words = [0] * (m_bits // 64)
    for r in _word_rows(df, key_col, m_bits, seeds):
        words[r["word"]] = _signed64(words[r["word"]] | (r["bits"] & _U64))
    return BloomFilter(m_bits=m_bits, seeds=seeds, words=tuple(words))


_U64 = (1 << 64) - 1


def _signed64(v: int) -> int:
    v &= _U64
    return v - (1 << 64) if v >= (1 << 63) else v


def update(bloom: BloomFilter, df: DataFrame, key_col: str) -> BloomFilter:
    """Fold new keys into an existing bloom (supersets never invalidate:
    the result still answers 'definitely not present' correctly for the
    union). Same distributed build, OR'd into the existing words."""
    words = list(bloom.words)
    for r in _word_rows(df, key_col, bloom.m_bits, bloom.seeds):
        words[r["word"]] = _signed64(words[r["word"]] | (r["bits"] & _U64))
    return BloomFilter(m_bits=bloom.m_bits, seeds=bloom.seeds, words=tuple(words))


def might_contain(bloom: BloomFilter, col: Column | str) -> Column:
    """Membership test as a pure column expression: k bit probes into
    the literal word array — whole-stage codegen, no UDF, no shuffle.
    False means DEFINITELY absent; true means 'probe the index'."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.lit(list(bloom.words))
    out = F.lit(True)
    for pos in _positions(c, bloom.m_bits, bloom.seeds):
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        bit = _one_shl((pos % 64).cast("int"))
        out = out & (word.bitwiseAND(bit) != 0)
    return out


def save(bloom: BloomFilter, path: str, index_version: str | None = None) -> None:
    """Persist a bloom as a JSON sidecar (atomic tmp+rename — same
    publish discipline as the sink pointers). A bloom is metadata:
    m/8 bytes of words, driver-sized by construction.

    ``index_version`` stamps which index version this bloom is known to
    cover (or the sentinel ``"pending"`` while a merge is in flight);
    loaders use it to DETECT an index that advanced without bloom
    maintenance — the staleness that would otherwise silently admit
    duplicates."""
    import json
    import os

    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(
            {
                "m_bits": bloom.m_bits,
                "seeds": list(bloom.seeds),
                "words": list(bloom.words),
                "index_version": index_version,
            },
            f,
        )
    os.replace(tmp, path)


def load(path: str) -> tuple[BloomFilter, str | None] | None:
    """Returns (bloom, index_version_stamp) or None if absent."""
    import json

    try:
        with open(path, encoding="utf-8") as f:
            raw = json.load(f)
    except FileNotFoundError:
        return None
    return (
        BloomFilter(
            m_bits=raw["m_bits"], seeds=tuple(raw["seeds"]), words=tuple(raw["words"])
        ),
        raw.get("index_version"),
    )


def empty(m_bits: int = 1 << 17, k: int = 5, seed: int = 42) -> BloomFilter:
    """The no-keys bloom: every membership test answers 'definitely
    absent' — the correct state for a not-yet-created index."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    return BloomFilter(
        m_bits=m_bits, seeds=tuple(seed + i for i in range(k)), words=(0,) * (m_bits // 64)
    )


def build_grouped(
    df: DataFrame,
    group_col: str,
    key_col: str,
    m_bits: int = 1 << 14,
    k: int = 5,
    seed: int = 42,
) -> dict:
    """Per-GROUP blooms in one aggregation — the segmented deployment
    the module docstring describes, built all at once: k positions per
    key explode map-side, one groupBy(group, word)+bit_or shuffle, and
    the driver materializes ``|groups| x m/64`` longs (the caller
    sizes ``m_bits`` so that stays metadata — at the default 2^14
    bits that is 256 longs per group). NULL keys are not indexed
    (membership of NULL is not a supported probe).

    Returns ``{group_value: [signed-64 words]}``; combine with
    :func:`words_or` across batches — bloom union is bitwise OR."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    seeds = tuple(seed + i for i in range(k))
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, seeds))).alias("pos")
    rows = (
        df.select(F.col(group_col).alias("__g"), pos)
        .filter(F.col("pos").isNotNull())
        .select(
            "__g",
            (F.col("pos") / 64).cast("int").alias("word"),
            _one_shl((F.col("pos") % 64).cast("int")).alias("mask"),
        )
        .groupBy("__g", "word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    out: dict = {}
    n_words = m_bits // 64
    for r in rows:
        words = out.setdefault(r["__g"], [0] * n_words)
        words[r["word"]] = _signed64(words[r["word"]] | (r["bits"] & _U64))
    return out


def words_or(a: list, b: list) -> list:
    """Bitwise-OR merge of two word arrays (bloom union)."""
    if len(a) != len(b):
        raise ValueError(f"word arrays differ in size: {len(a)} vs {len(b)}")
    return [_signed64((x & _U64) | (y & _U64)) for x, y in zip(a, b)]


def probe_positions(spark, value, dtype, m_bits: int, seeds: tuple) -> list[int]:
    """The k bit positions a probe value hashes to, computed BY THE
    ENGINE (xxhash64 is a JVM hash with no Python twin) via one 1-row
    job — metadata-sized by construction. ``dtype`` must be the stored
    column's Spark type: xxhash64 hashes the binary encoding, so a
    long and a string of the same digits hash differently."""
    exprs = [
        p.alias(f"p{i}")
        for i, p in enumerate(
            _positions(F.lit(value).cast(dtype), m_bits, tuple(seeds))
        )
    ]
    row = spark.range(1).select(*exprs).first()
    return [row[f"p{i}"] for i in range(len(seeds))]


def words_might_contain(words: list, positions: list[int]) -> bool:
    """Driver-side membership test against a stored word array."""
    for pos in positions:
        if not ((words[pos // 64] & _U64) >> (pos % 64)) & 1:
            return False
    return True
