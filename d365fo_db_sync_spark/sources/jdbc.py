"""JDBC source with the reference's server-side extraction shapes.

The reference pushes its entire fetch query to the source server
(Tier2DataService.cs:316-331; shapes built at CopyOrchestrator.cs:
1913-1935). Spark's JDBC relation pushes *filters* but NOT
``ORDER BY … LIMIT`` (SURVEY §4 R1), so the top-N / control / watermark
shapes are embedded verbatim into the ``query`` option — the server
executes them, Spark sees the small result. This is the same
"mandatory pushdown slot" contract as the reference's
``@sysRowVersionFilter`` placeholder (README.md:217-221).

For large windows the reader parallelizes with
``partitionColumn/lowerBound/upperBound/numPartitions`` on the sync key
— N concurrent range queries, the JDBC analog of parquet split planning.

SQL generation is pure (no connection), so it is unit-tested without a
database; the DataFrame entry points only assemble reader options.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


def _field_list(fields: Sequence[str] | None) -> str:
    if not fields:
        return "*"
    return ", ".join(f"[{f}]" for f in fields)


def top_n_sql(table: str, key: str, n: int, fields: Sequence[str] | None = None) -> str:
    """S5 — ``SELECT TOP(n) <fields> FROM t ORDER BY key DESC``
    (CopyOrchestrator.cs:1920-1921)."""
    return (
        f"SELECT TOP ({int(n)}) {_field_list(fields)} FROM [{table}] "
        f"ORDER BY [{key}] DESC"
    )


def control_sql(table: str, key: str, version: str, n: int | None = None) -> str:
    """S6 — 2-column control projection (Tier2DataService.cs:336-376)."""
    top = f"TOP ({int(n)}) " if n is not None else ""
    order = f" ORDER BY [{key}] DESC" if n is not None else ""
    return f"SELECT {top}[{key}], [{version}] FROM [{table}]{order}"


def watermark_sql(
    table: str,
    key: str,
    version: str,
    version_threshold: str,
    min_key: int,
    n: int | None = None,
    fields: Sequence[str] | None = None,
) -> str:
    """S7 — watermark + key-floor incremental fetch
    (Tier2DataService.cs:381-434). ``version_threshold`` is the
    0x-prefixed rowversion literal (Helpers/TimestampHelper.cs:37-47)."""
    top = f"TOP ({int(n)}) " if n is not None else ""
    order = f" ORDER BY [{key}] DESC" if n is not None else ""
    return (
        f"SELECT {top}{_field_list(fields)} FROM [{table}] "
        f"WHERE [{version}] >= {version_threshold} AND [{key}] >= {int(min_key)}"
        f"{order}"
    )


def recency_sql(table: str, ts_col: str, days: int, fields: Sequence[str] | None = None) -> str:
    """S8 — recency cutoff (Tier2DataService.cs:291-311)."""
    return (
        f"SELECT {_field_list(fields)} FROM [{table}] "
        f"WHERE [{ts_col}] > DATEADD(DAY, -{int(days)}, GETUTCDATE())"
    )


@dataclass
class JdbcSource:
    """One JDBC endpoint; produces DataFrames for the engine's scan shapes.

    ``fetchsize`` batches the wire protocol (the read-side analog of the
    reference's bulk batch 10,000, AxDbDataService.cs:353).
    """

    url: str
    properties: dict[str, str] = field(default_factory=dict)
    fetchsize: int = 10_000

    def _reader(self, spark: SparkSession, query: str):
        r = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("query", query)
            .option("fetchsize", str(self.fetchsize))
        )
        for k, v in self.properties.items():
            r = r.option(k, v)
        return r

    def read_query(self, spark: SparkSession, query: str) -> DataFrame:
        """S4 — arbitrary pushed-down SQL (the strategy-template path)."""
        return self._reader(spark, query).load()

    def read_top_n(
        self, spark: SparkSession, table: str, key: str, n: int,
        fields: Sequence[str] | None = None,
    ) -> DataFrame:
        return self.read_query(spark, top_n_sql(table, key, n, fields))

    def read_control(
        self, spark: SparkSession, table: str, key: str, version: str, n: int | None = None
    ) -> DataFrame:
        return self.read_query(spark, control_sql(table, key, version, n))

    def read_watermark(
        self,
        spark: SparkSession,
        table: str,
        key: str,
        version: str,
        version_threshold: str,
        min_key: int,
        n: int | None = None,
        fields: Sequence[str] | None = None,
    ) -> DataFrame:
        return self.read_query(
            spark,
            watermark_sql(table, key, version, version_threshold, min_key, n, fields),
        )

    def read_partitioned(
        self,
        spark: SparkSession,
        table: str,
        key: str,
        lower: int,
        upper: int,
        num_partitions: int = 32,
    ) -> DataFrame:
        """Full-table parallel extraction: N concurrent key-range queries.
        The reference serializes one DataAdapter.Fill per table
        (Tier2DataService.cs:461-478); this is the distributed upgrade —
        each executor pulls its own key range."""
        r = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", f"[{table}]")
            .option("partitionColumn", key)
            .option("lowerBound", str(lower))
            .option("upperBound", str(upper))
            .option("numPartitions", str(num_partitions))
            .option("fetchsize", str(self.fetchsize))
        )
        for k, v in self.properties.items():
            r = r.option(k, v)
        return r.load()


def parse_connection_string(text: str) -> dict[str, str]:
    """Connection-string parsing, both reference formats
    (ConnectionStringHelper.cs:19-95):

    * standard ``Key=Value;...`` pairs (keys case-insensitive,
      whitespace-tolerant, values may contain '=');
    * the three-line portal format::

          server.database.windows.net\\db
          user
          password

      recognized by newlines-without-'=' and mapped to
      Server/Database/User Id/Password.

    Returned dict is lowercase-keyed for stable lookups.
    """
    out: dict[str, str] = {}
    if not text or not text.strip():
        return out
    if "\n" in text and "=" not in text:
        lines = [ln.strip() for ln in text.splitlines() if ln.strip()]
        if len(lines) < 3:
            return out
        server_db = lines[0]
        idx = server_db.find("\\")
        if idx > 0:
            out["server"] = server_db[:idx].strip()
            out["database"] = server_db[idx + 1 :].strip()
        out["user id"] = lines[1]
        out["password"] = lines[2]
        return out
    for part in text.split(";"):
        part = part.strip()
        if not part:
            continue
        eq = part.find("=")
        if eq > 0:
            out[part[:eq].strip().lower()] = part[eq + 1 :].strip()
    return out


def to_jdbc(parts: dict[str, str], port: int = 1433) -> tuple[str, dict[str, str]]:
    """Parsed connection parts -> (JDBC URL, reader options) for
    ``spark.read.format("jdbc")``. Credentials travel as options, never
    in the URL (they would leak into plans/logs). Accepts the keys
    :func:`parse_connection_string` emits plus optional ``encrypt`` /
    ``trustservercertificate`` passthroughs."""
    server = parts.get("server") or parts.get("data source") or ""
    database = parts.get("database") or parts.get("initial catalog") or ""
    if not server or not database:
        raise ValueError("connection parts must include server and database")
    if "," in server:  # Server=host,port form
        server, p = server.split(",", 1)
        port = int(p)
    url = f"jdbc:sqlserver://{server}:{port};databaseName={database}"
    for flag in ("encrypt", "trustservercertificate"):
        if flag in parts:
            url += f";{flag}={parts[flag]}"
    options: dict[str, str] = {}
    user = parts.get("user id") or parts.get("uid")
    pwd = parts.get("password") or parts.get("pwd")
    if user:
        options["user"] = user
    if pwd:
        options["password"] = pwd
    return url, options
