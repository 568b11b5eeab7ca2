"""Incremental view maintenance (operators/ivm.py): the maintained
rollup must be bit-identical to a from-scratch recompute under any
mix of inserts, deletes, and updates."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators.ivm import (
    SIGN_COL,
    apply_rollup_delta,
    rollup_delta,
    rollup_full,
    signed_update,
)

SCHEMA = "g string, v double"


def _view_rows(df):
    return {
        r["g"]: (r["cnt"], float(r["sum_v"]))
        for r in df.select("g", "cnt", F.col("sum_v")).collect()
    }


def test_update_equals_delete_plus_insert(spark):
    base = spark.createDataFrame([("a", 1.5), ("a", 2.0), ("b", 7.0)], SCHEMA)
    view = rollup_full(base, ["g"], ["v"])
    old = spark.createDataFrame([("a", 1.5)], SCHEMA)
    new = spark.createDataFrame([("a", 100.25)], SCHEMA)
    delta = rollup_delta(signed_update(old, new), ["g"], ["v"])
    got = _view_rows(apply_rollup_delta(view, delta, ["g"], ["v"]))
    assert got == {"a": (2, 102.25), "b": (1, 7.0)}


def test_drained_group_drops_and_new_group_appears(spark):
    base = spark.createDataFrame([("a", 3.0)], SCHEMA)
    view = rollup_full(base, ["g"], ["v"])
    ch = spark.createDataFrame([("a", 3.0, -1), ("z", 9.5, 1)], SCHEMA + f", {SIGN_COL} int")
    got = _view_rows(
        apply_rollup_delta(view, rollup_delta(ch, ["g"], ["v"]), ["g"], ["v"])
    )
    assert got == {"z": (1, 9.5)}


@given(
    base=st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(-100, 100)),
        max_size=25,
    ),
    ops=st.lists(
        st.tuples(
            st.sampled_from(["ins", "del"]),
            st.sampled_from("abcd"),
            st.integers(-100, 100),
        ),
        max_size=25,
    ),
)
@settings(max_examples=25, deadline=None)
def test_ivm_model_check(spark, base, ops):
    """Random base + random change batch: maintained view ==
    from-scratch recompute of the mutated table. Deletes target rows
    actually present (the IVM precondition); extra deletes are
    dropped from the op list."""
    table = [(g, float(v) / 4) for g, v in base]
    changes = []
    for kind, g, v in ops:
        if kind == "ins":
            row = (g, float(v) / 4)
            table.append(row)
            changes.append((*row, 1))
        else:
            victim = next((r for r in table if r[0] == g), None)
            if victim is not None:
                table.remove(victim)
                changes.append((*victim, -1))
    view = rollup_full(
        spark.createDataFrame(base and [(g, float(v) / 4) for g, v in base] or [], SCHEMA),
        ["g"], ["v"],
    )
    if changes:
        ch = spark.createDataFrame(changes, SCHEMA + f", {SIGN_COL} int")
        view = apply_rollup_delta(
            view, rollup_delta(ch, ["g"], ["v"]), ["g"], ["v"]
        )
    want = _view_rows(
        rollup_full(spark.createDataFrame(table or [], SCHEMA), ["g"], ["v"])
    )
    assert _view_rows(view) == want
