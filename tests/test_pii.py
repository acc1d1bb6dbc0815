"""PII scrubbing: redaction behavior on crafted cases, including the
boundary semantics the gate's decoy pins."""

from __future__ import annotations

from pyspark.sql import functions as F

from tamer_spark.functions.text import pii_count_cols, scrub_pii_col


def _scrub(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    r = df.select(
        scrub_pii_col(F.col("text")).alias("s"), *pii_count_cols(F.col("text"))
    ).collect()[0]
    return r.s, r.n_emails, r.n_ips


def test_emails_redacted(spark):
    s, ne, ni = _scrub(
        spark, "write to dev.team+crawl@data-example.org or x@y.io today"
    )
    assert s == "write to <EMAIL> or <EMAIL> today"
    assert ne == 2 and ni == 0


def test_ipv4_redacted_with_boundaries(spark):
    s, ne, ni = _scrub(spark, "host 192.168.001.012 and 8.8.8.8 up")
    assert s == "host <IP> and <IP> up"
    assert ni == 2 and ne == 0


def test_five_octet_decoy_partial_match_pinned(spark):
    # leftmost 4 octets match, the '.5' tail survives — the exact behavior
    # the oracle decoy pins so both engines must agree on \b semantics
    s, _, ni = _scrub(spark, "x 1.2.3.4.5 y")
    assert s == "x <IP>.5 y" and ni == 1


def test_long_octet_not_matched(spark):
    s, _, ni = _scrub(spark, "version 1234.5.6.7 stays")
    assert s == "version 1234.5.6.7 stays" and ni == 0


def test_email_before_ip_order(spark):
    # the address is made of digit runs the IP pattern would bite; redacting
    # emails FIRST (pinned order) keeps the whole address as one <EMAIL>.
    # The audit counts are per-pattern over the ORIGINAL text (so the IP
    # pattern still reports its two raw matches) — scrub order affects the
    # rewritten text, never the counts.
    s, ne, ni = _scrub(spark, "mail 10.0.0.1@8.8.8.8.example.com end")
    assert s == "mail <EMAIL> end"
    assert ne == 1 and ni == 2


def test_plain_text_untouched(spark):
    s, ne, ni = _scrub(spark, "no personal identifiers in this sentence at all")
    assert s == "no personal identifiers in this sentence at all"
    assert ne == 0 and ni == 0
