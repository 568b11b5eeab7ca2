"""Text normalization (operators/normalize.py): byte-exact expected
strings for each stage and the composition, plus the regex-dialect
pin (explicit classes, no \\s shorthand)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from d365fo_db_sync_spark.operators.normalize import (
    clean_lines,
    normalize_text,
    normalize_whitespace,
    strip_control_chars,
    strip_html,
)


def _one(spark, text, expr):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr.alias("out")).collect()[0]["out"]


def test_strip_html_tags_and_entities(spark):
    got = _one(
        spark,
        '<div class="x">a &amp; b</div><br/>c &lt;tag&gt; &quot;q&quot;&#39;s&nbsp;end',
        strip_html("text"),
    )
    assert got == ' a & b  c <tag> "q"\'s end'


def test_strip_control_keeps_structure(spark):
    got = _one(
        spark,
        "a\x00b\x07c\td\ne\rf\x0bg\x7fh",
        strip_control_chars("text"),
    )
    assert got == "abc\td\ne\rfgh"  # tab/newline/CR survive, rest gone


def test_normalize_whitespace(spark):
    got = _one(spark, "  a \t b\n\nc\r\f d  ", normalize_whitespace("text"))
    assert got == "a b c d"


def test_clean_lines_c4_rules(spark):
    text = "\n".join(
        [
            "This line has enough tokens.",   # kept
            "Menu",                           # too short
            "one two three",                  # no terminal punct
            'He said "stop!"',                # kept (quote terminal)
            "short.",                         # too short despite punct
            "   spaced   line   survives.  ", # kept: rtrim before the $ test
        ]
    )
    got = _one(spark, text, clean_lines("text"))
    assert got == "\n".join(
        [
            "This line has enough tokens.",
            'He said "stop!"',
            "   spaced   line   survives.  ",
        ]
    )
    # relax the terminal rule
    got2 = _one(spark, text, clean_lines("text", require_terminal=False))
    assert "one two three" in got2.split("\n")
    with pytest.raises(ValueError, match="min_tokens"):
        clean_lines("text", min_tokens=0)


def test_normalize_text_composition(spark):
    text = (
        "<h1>Ignore</h1>\nThe quick brown fox jumps.\n"
        "cookie\x07 banner\nAll rights reserved &amp; more here.\n\tok"
    )
    got = _one(spark, text, normalize_text("text"))
    assert got == "The quick brown fox jumps. All rights reserved & more here."
    # NULL text -> NULL out (expression semantics), empty doc -> empty
    df = spark.createDataFrame([(None,), ("",)], "text string")
    rows = df.select(normalize_text("text").alias("o")).collect()
    assert rows[0]["o"] is None and rows[1]["o"] == ""
