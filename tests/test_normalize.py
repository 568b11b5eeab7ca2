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


def test_dedup_lines_keeps_first_occurrence_order(spark):
    from d365fo_db_sync_spark.operators.normalize import dedup_lines

    text = "a b c.\ncookie banner\nmid line.\ncookie banner\na b c.\nend."
    got = _one(spark, text, dedup_lines("text"))
    assert got == "a b c.\ncookie banner\nmid line.\nend."


def test_drop_common_lines_corpus_boilerplate(spark):
    """The across-pages half: lines in more than max_occurrences
    documents vanish from every document; in-page repetition does not
    inflate the distinct-doc count; blank lines never count; fully-
    boilerplate docs come back empty, never dropped."""
    from d365fo_db_sync_spark.operators.normalize import drop_common_lines

    docs = spark.createDataFrame(
        [
            (0, "unique zero.\nAll rights reserved.\n\nbody zero."),
            (1, "All rights reserved.\nbody one.\nAll rights reserved."),
            (2, "All rights reserved.\nbody two."),
            (3, "All rights reserved."),
            (4, None),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["text_clean"], r["n_lines_kept"], r["n_lines_dropped"])
        for r in drop_common_lines(docs, max_occurrences=2).collect()
    }
    # the legal line appears in 4 distinct docs (> 2): dropped everywhere
    assert got[0] == ("unique zero.\n\nbody zero.", 3, 1)
    assert got[1] == ("body one.", 1, 2)  # both copies dropped
    assert got[2] == ("body two.", 1, 1)
    assert got[3] == ("", 0, 1)  # fully boilerplate: empty, not missing
    assert got[4] == ("", 1, 0)  # NULL text -> one empty line, kept

    import pytest

    with pytest.raises(ValueError, match="max_occurrences"):
        drop_common_lines(docs, max_occurrences=0)


def test_dedup_paragraphs_and_byte_exact_split(spark):
    """Paragraph dedup keeps first occurrences in order, and the
    literal \\n\\n split/rejoin is byte-exact even for runs of 3+
    newlines (the reason the delimiter is NOT a \\n{2,} regex)."""
    from d365fo_db_sync_spark.operators.normalize import dedup_paragraphs

    rows = [
        (0, "intro block\n\nbody A\n\nintro block\n\nbody B"),
        (1, "a\n\n\nb"),       # 3 newlines: ["a", "\nb"] -> roundtrip
        (2, "x\n\n\n\ny"),     # 4 newlines: ["x", "", "y"] -> roundtrip
        (3, "solo"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", dedup_paragraphs("text").alias("t")
        ).collect()
    }
    assert got[0] == "intro block\n\nbody A\n\nbody B"
    assert got[1] == rows[1][1] and got[2] == rows[2][1]  # byte-exact
    assert got[3] == "solo"


def test_drop_common_paragraphs_corpus_boilerplate(spark):
    """Blocks in >max_occurrences distinct docs vanish everywhere;
    empty blocks never count as boilerplate; rebuild preserves order
    byte-exactly; all-boilerplate docs come back empty, never
    dropped."""
    from d365fo_db_sync_spark.operators.normalize import (
        drop_common_paragraphs,
    )

    promo = "SUBSCRIBE NOW\nfor more content"
    rows = [
        (0, f"{promo}\n\nunique zero\n\nalso zero"),
        (1, f"unique one\n\n{promo}"),
        (2, f"{promo}\n\nunique two"),
        (3, promo),                  # all boilerplate -> empty
        (4, "x\n\n\n\ny"),           # empty middle block survives
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in drop_common_paragraphs(df, max_occurrences=2).collect()
    }
    assert got[0]["text_clean"] == "unique zero\n\nalso zero"
    assert (got[0]["n_paragraphs_kept"], got[0]["n_paragraphs_dropped"]) == (2, 1)
    assert got[1]["text_clean"] == "unique one"
    assert got[2]["text_clean"] == "unique two"
    assert got[3]["text_clean"] == "" and got[3]["n_paragraphs_kept"] == 0
    assert got[4]["text_clean"] == "x\n\n\n\ny"  # "" block kept
    assert got[5]["text_clean"] == ""  # NULL text -> one empty block
    assert len(got) == 6
