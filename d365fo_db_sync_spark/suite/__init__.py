"""Named query suite — the engine's public test surface.

Every operator from SURVEY.md §2 marked for t2 correctness registers here
as a named query (PySpark builder) paired with an ANSI-SQL oracle string
that DuckDB can evaluate over the same parquet tables. The driver (and
``tools/check.py``) runs both and compares row-count + schema +
order-insensitive value hash.

Conventions that make the comparison exact:

* every computed column is aliased identically in Spark and SQL;
* money-type double aggregates go through DECIMAL(18,2) so both engines
  sum exactly, then cast back to DOUBLE;
* every LIMIT/top-k orders by a unique key (tie-free);
* timestamps stay naive (session tz UTC == DuckDB naive).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, Query] = {}

# Registration order is load-bearing: the correctness gate grades the
# first 50 registered queries, so every oracled query registers before
# the rows-only tail (tail_q must stay last).
_SUITE_MODULES = (
    "core",
    "delta_q",
    "events_q",
    "text_q",
    "dedup_q",
    "similarity_q",
    "multimodal_q",
    "sync_q",
    "tail_q",
)


def scratch_dir(prefix: str) -> str:
    """A temp workdir that is actually cleaned up: registered with
    atexit so long-lived processes (bench loops, check runs, REPLs)
    don't accumulate orphaned index/target directories across
    invocations."""
    import atexit
    import shutil
    import tempfile

    path = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def await_stream(query, timeout_sec: int = 300) -> None:
    """awaitTermination with a LOUD timeout: a streaming suite query
    that times out has produced only a partial sidecar/state, and the
    downstream view would fail its value oracle with no hint of the
    cause. Raise instead so a slow run fails at the source."""
    if not query.awaitTermination(timeout_sec):
        query.stop()
        raise TimeoutError(
            f"streaming query did not finish within {timeout_sec}s; "
            "state is partial — not comparing it against the oracle"
        )


def register(name: str, oracle: str | None = None, bench: bool = False):
    """Decorator: add a (spark, sf_dir) -> DataFrame builder to the suite."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, bench=bench)
        return fn

    return deco


def _load() -> None:
    for mod in _SUITE_MODULES:
        importlib.import_module(f"{__name__}.{mod}")


def _canonical() -> list[Query]:
    """Registry entries in CANONICAL order — _SUITE_MODULES rank, then
    within-module registration (line) order — independent of which
    module happened to be imported first in this process. Raw
    REGISTRY insertion order is import-order-dependent (a test or
    caller importing e.g. suite.similarity_q directly registers its
    queries before core's), and the driver's correctness gate grades
    the FIRST 50 queries, so iteration order must never depend on who
    imported what."""
    _load()
    rank = {f"{__name__}.{m}": i for i, m in enumerate(_SUITE_MODULES)}
    seq: dict[str, int] = {}
    key: dict[str, tuple[int, int]] = {}
    for q in REGISTRY.values():  # insertion order IS line order per module
        mod = q.fn.__module__
        seq[mod] = seq.get(mod, -1) + 1
        key[q.name] = (rank.get(mod, len(rank)), seq[mod])
    return sorted(REGISTRY.values(), key=lambda q: key[q.name])


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in _canonical()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in _canonical() if q.oracle is not None}


def bench_queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in _canonical() if q.bench}
