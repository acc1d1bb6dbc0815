"""Template-collapse dedup: per-mask pins, load-bearing mask order, NULL
singletons, family collapse, and a Spark==python differential over the
masking chain (the url-canonicalizer convention)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from tamer_spark.functions.text import (
    TEMPLATE_DIGIT_RE,
    TEMPLATE_EMAIL_RE,
    TEMPLATE_HEX_RE,
    TEMPLATE_URL_RE,
    template_fingerprint_col,
)
from tamer_spark.operators.dedup import template_dedup_counts


def _mask_py(s: str) -> str:
    """Pure-python reference of the EXACT chain (same pinned patterns, same
    order) — a third engine to triangulate Spark and DuckDB."""
    s = s.lower()
    s = re.sub(TEMPLATE_EMAIL_RE, "<E>", s)
    s = re.sub(TEMPLATE_URL_RE, "<U>", s)
    s = re.sub(TEMPLATE_HEX_RE, "<H>", s)
    s = re.sub(TEMPLATE_DIGIT_RE, "0", s)
    return re.sub(r"\s+", " ", s).strip()


def _fp(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    rows = df.select("i", template_fingerprint_col(F.col("t")).alias("fp")).collect()
    return [r.fp for r in sorted(rows, key=lambda r: r.i)]


def test_each_mask_fires(spark):
    texts = [
        "Contact Bob.Smith+x@Some-Host.example now",
        "see https://a.example/p?q=1#f then stop",
        "commit deadbeefcafe1234 landed",
        "order 12345 of 7 items",
    ]
    got = _fp(spark, texts)
    assert got[0] == "contact <E> now"
    assert got[1] == "see <U> then stop"
    assert got[2] == "commit <H> landed"
    assert got[3] == "order 0 of 0 items"


def test_mask_order_is_load_bearing(spark):
    """The two real order traps: an ALL-DIGIT run of ≥8 must read <H> (hex
    runs before digits), and a url full of digits must collapse to one
    <U> token (urls before hex/digits) — either reversed order would
    leave template instances distinguishable by their volatile values."""
    got = _fp(
        spark,
        [
            "token 123456789012 end",  # all-digit "hash" → <H>, not 0
            "go https://t.example/9999/abcdef123456 end",  # one <U>, nothing inside
        ],
    )
    assert got[0] == "token <H> end"
    assert got[1] == "go <U> end"


def test_template_instances_collapse_and_families_separate(spark):
    a1 = "Order #101 for u1@a.example total 31 item alpha"
    a2 = "Order #202 for u2@b.example total 99 item alpha"
    b1 = "Order #303 for u3@c.example total 12 item beta"
    fps = _fp(spark, [a1, a2, b1])
    assert fps[0] == fps[1] != fps[2]
    counts = template_dedup_counts(
        spark.createDataFrame(
            [(1, a1), (2, a2), (3, b1)], "doc_id long, text string"
        )
    ).collect()
    by_hash = {r.content_hash: (r.keep_id, r.dup_count) for r in counts}
    assert sorted(by_hash.values()) == [(1, 2), (3, 1)]


def test_null_text_singletons_neither_merge_nor_vanish(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "doc_id long, text string"
    )
    rows = template_dedup_counts(df).collect()
    assert len(rows) == 3
    nulls = [r for r in rows if r.content_hash.startswith("nulltmpl-")]
    assert {(r.keep_id, r.dup_count) for r in nulls} == {(1, 1), (2, 1)}


def test_gate_derivation_collapses_to_exactly_four_families(spark):
    from tamer_spark.queries import _derived_template_col, _t
    from tests.conftest import SF_DIR

    d = _t(spark, SF_DIR, "documents").select(
        "doc_id", _derived_template_col().alias("ttext")
    )
    n_docs = d.count()
    fam = template_dedup_counts(d, text_col="ttext").collect()
    assert len(fam) == 4
    assert sum(r.dup_count for r in fam) == n_docs
    # raw strings are all distinct (the masks do ALL the collapsing)
    assert d.select("ttext").distinct().count() == n_docs


def test_spark_equals_python_reference_differential(spark):
    """Fuzz the masking chain across the volatile-token space and a few
    adversarial shapes; Spark must equal the pure-python replay exactly."""
    cases = [
        f"u{i}@h{i % 3}.example Visit https://s{i}.example/p/{i}?t={i} "
        f"code {('%012x' % (i * 2654435761)) } n={i * 7}  tail-{i % 5}"
        for i in range(60)
    ]
    cases += [
        "",
        "   ",
        "no volatile tokens at all",
        "a@b.example@c.example",  # greedy email edge
        "https://x.example/a b@c.example 99 deadbeef00",
        "ALL CAPS WITH Number 8 AND Url HTTPS://X.EXAMPLE/1",
        "hex edge deadbeef (7 chars: abcdef1) stays",
    ]
    got = _fp(spark, cases)
    for s, g in zip(cases, got):
        assert g == _mask_py(s), (s, g, _mask_py(s))
