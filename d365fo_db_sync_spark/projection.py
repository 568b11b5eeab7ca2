"""Projection / filter family (reference P1-P9).

Schema reconciliation is the reference's core projection idea: the
copyable column set is the case-insensitive intersection of source and
target schemas minus excluded fields (CopyOrchestrator.cs:190-208), and
wildcard include/exclude patterns select tables from the catalog
(CopyOrchestrator.cs:1844-1863).
"""

from __future__ import annotations

import re
from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: D365-style identifier: all uppercase/digit/underscore
#: (Tier2DataService.cs:548-554).
D365_IDENTIFIER_RE = "^[A-Z0-9_]+$"


def schema_intersection(
    source_fields: Sequence[str],
    target_fields: Sequence[str],
    excluded: Iterable[str] = (),
) -> list[str]:
    """Copyable fields = source ∩ target − excluded, case-insensitive,
    preserving source order (CopyOrchestrator.cs:190-208).
    """
    tgt = {f.upper() for f in target_fields}
    excl = {f.upper() for f in excluded}
    return [f for f in source_fields if f.upper() in tgt and f.upper() not in excl]


def project_copyable(
    src: DataFrame,
    target_fields: Sequence[str],
    excluded: Iterable[str] = (),
) -> DataFrame:
    """Project ``src`` to the copyable column set; raises if empty
    (the reference skips such tables)."""
    fields = schema_intersection(src.columns, target_fields, excluded)
    if not fields:
        raise ValueError("no copyable fields after schema intersection")
    return src.select(*fields)


def parse_field_exclusions(lines: Iterable[str]) -> tuple[set[str], dict[str, set[str]]]:
    """Parse ``TABLE.FIELD`` / ``FIELD`` exclusion lines into
    (global_excluded, per_table_excluded) — CopyOrchestrator.cs:1872-1911.
    """
    global_excl: set[str] = set()
    per_table: dict[str, set[str]] = {}
    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("--"):
            continue
        if "." in line:
            table, field = line.split(".", 1)
            per_table.setdefault(table.strip().upper(), set()).add(field.strip().upper())
        else:
            global_excl.add(line.upper())
    return global_excl, per_table


def wildcard_to_regex(pattern: str) -> str:
    """``*``-wildcard -> anchored case-insensitive regex
    (CopyOrchestrator.cs:1861-1862)."""
    return "(?i)^" + re.escape(pattern).replace("\\*", ".*") + "$"


def match_table_names(
    names: Iterable[str],
    include: Sequence[str],
    exclude: Sequence[str] = (),
) -> list[str]:
    """Catalog-name selection: matches any include pattern AND no exclude
    pattern (CopyOrchestrator.cs:127-149). Driver-side (catalog is small)."""
    inc = [re.compile(wildcard_to_regex(p)) for p in include]
    exc = [re.compile(wildcard_to_regex(p)) for p in exclude]
    return [
        n
        for n in names
        if any(r.match(n) for r in inc) and not any(r.match(n) for r in exc)
    ]


def filter_by_wildcard(df: DataFrame, col: str, pattern: str) -> DataFrame:
    """Distributed variant of P4 for name columns inside data."""
    return df.filter(F.col(col).rlike(wildcard_to_regex(pattern)))


def filter_d365_identifiers(df: DataFrame, col: str) -> DataFrame:
    """Keep only D365-style identifiers (P5)."""
    return df.filter(F.col(col).rlike(D365_IDENTIFIER_RE))
