"""Hardening guards for the one-parse SQL fragment construction (r15,
ADVICE r14): interpolated identifiers must be plain names, the bloom
probe's working columns must not collide with caller columns, the minhash
shingle weights must stay inside BIGINT, and the session pins the parser
conf the fragments assume.
"""

from __future__ import annotations

import pytest

from tamer_spark.functions.ident import safe_ident


def test_safe_ident_accepts_plain_names():
    for n in ("text", "_hs", "doc_id", "A9", "_"):
        assert safe_ident(n) == n


@pytest.mark.parametrize(
    "bad", ["a.b", "a b", "a-b", "`a`", "a'b", "", "1a", "a;drop"]
)
def test_safe_ident_rejects_quotable_names(bad):
    with pytest.raises(ValueError, match="not a plain SQL identifier"):
        safe_ident(bad)


def test_normalize_text_sql_validates_name():
    from tamer_spark.operators.dedup import normalize_text_sql

    assert "lower(text)" in normalize_text_sql("text")
    with pytest.raises(ValueError):
        normalize_text_sql("body.text")


def test_minhash_rejects_overflowing_shingle_weights(spark):
    # SHINGLE_BASE**5 is 65 bits: at n=6 the weight literal would parse as
    # DECIMAL(38,0) and silently switch the wrapping BIGINT arithmetic —
    # the guard must fail loudly instead
    from tamer_spark.operators.dedup import minhash_signatures

    df = spark.createDataFrame([(1, "a b c d e f g")], "doc_id long, text string")
    with pytest.raises(ValueError, match="exceeds\\s+int64"):
        minhash_signatures(df, n=6)
    # supported range still works (n=5 weight = base**4, 52 bits)
    assert minhash_signatures(df, n=5).count() == 1


def test_bloom_might_contain_rejects_working_column_clash(spark):
    from tamer_spark.operators.bloom import bloom_build, bloom_might_contain

    base = spark.createDataFrame([("x",), ("y",)], "v string")
    words = bloom_build(base, "v", m_bits=1 << 10, k=3)
    ok = bloom_might_contain(base, "v", words, m_bits=1 << 10, k=3)
    assert ok.filter("bloom_hit").count() == 2

    clash = base.selectExpr("v", "1 AS _bp0")
    with pytest.raises(ValueError, match="working columns"):
        bloom_might_contain(clash, "v", words, m_bits=1 << 10, k=3)
    with pytest.raises(ValueError, match="working columns"):
        bloom_might_contain(
            base.selectExpr("v", "true AS bloom_hit"), "v", words,
            m_bits=1 << 10, k=3,
        )
    with pytest.raises(ValueError, match="not a plain SQL identifier"):
        bloom_might_contain(base, "v", words, m_bits=1 << 10, k=3, out="a.b")


def test_session_pins_escaped_string_literals(spark):
    # the SQL-fragment twins encode backslashes assuming the default
    # parser mode; the session must pin it so a foreign getOrCreate
    # session cannot silently flip fragment regex semantics
    assert spark.conf.get("spark.sql.parser.escapedStringLiterals") == "false"
