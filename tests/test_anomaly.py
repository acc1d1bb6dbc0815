"""Median/MAD robust anomaly detection: exact medians, masking resistance,
MAD=0 degenerate rule, full-series retention, threshold semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from tamer_spark.operators.anomaly import daily_counts, mad_anomalies


def _series(spark, vals, k="a"):
    return spark.createDataFrame(
        [(k, i, int(v)) for i, v in enumerate(vals)], "k string, day long, n long"
    )


def test_mad_flags_the_planted_outlier_and_nothing_else(spark):
    """A flat-ish series with one spike: the spike flags, the rest don't,
    and med/mad/dev_ppm match the hand computation."""
    vals = [10, 11, 9, 10, 12, 10, 9, 11, 10, 100]
    rows = {r.day: r for r in mad_anomalies(_series(spark, vals), ("k",), "n").collect()}
    assert len(rows) == 10  # every input row is emitted
    # sorted: 9 9 10 10 10 10 11 11 12 100 → percentile_disc(1/2) rank
    # (n+1)//2 = 5 → med = 10; devs sorted: 0 0 0 0 1 1 1 1 2 90 → mad = 1
    assert all(r.med == 10 and r.mad == 1 for r in rows.values())
    spike = rows[9]
    assert spike.dev_ppm == 90 * 1_000_000
    assert spike.is_anomaly
    for d, r in rows.items():
        if d != 9:
            assert not r.is_anomaly, r


def test_mad_resists_masking_where_stddev_fails(spark):
    """Two huge outliers inflate the stddev until neither is 3-sigma out
    (the masking failure the module exists to avoid); the MAD verdict
    still flags both."""
    vals = [10] * 10 + [500, 520]
    df = _series(spark, vals)
    # classical 3-sigma verdict: nothing flags
    stats = df.agg(F.avg("n").alias("mu"), F.stddev_pop("n").alias("sd")).first()
    assert all(abs(v - stats.mu) < 3 * stats.sd for v in vals)
    out = mad_anomalies(df, ("k",), "n").collect()
    flagged = {r.n for r in out if r.is_anomaly}
    assert flagged == {500, 520}


def test_mad_zero_degenerates_to_any_nonzero_deviation(spark):
    """Over half the series identical → MAD = 0: dev_ppm is NULL and any
    nonzero deviation flags (the Iglewicz–Hoaglin fallback), equality
    does not."""
    vals = [7, 7, 7, 7, 7, 7, 7, 9]
    rows = {r.n: r for r in mad_anomalies(_series(spark, vals), ("k",), "n").collect()}
    assert rows[9].mad == 0 and rows[9].dev_ppm is None and rows[9].is_anomaly
    assert rows[7].dev_ppm is None and not rows[7].is_anomaly


def test_mad_keys_are_isolated(spark):
    """Each key gets its own med/MAD — a noisy key cannot raise a quiet
    key's threshold."""
    a = [("a", i, v) for i, v in enumerate([10, 10, 10, 10, 14])]
    b = [("b", i, v) for i, v in enumerate([1000, 1, 2000, 1, 1])]
    sdf = spark.createDataFrame(a + b, "k string, day long, n long")
    rows = mad_anomalies(sdf, ("k",), "n").collect()
    byk = {}
    for r in rows:
        byk.setdefault(r.k, []).append(r)
    assert {r.med for r in byk["a"]} == {10}
    # a's spike of 14 flags against a's own MAD=0 rule (10,10,10,10 majority)
    assert any(r.is_anomaly and r.n == 14 for r in byk["a"])
    assert all(not r.is_anomaly or r.n != 10 for r in byk["a"])


def test_daily_counts_collapses_before_windows(spark):
    """daily_counts output is (k, day, n) at calendar grain, and the full
    mad_anomalies plan over it contains window exchanges only on the key —
    raw event rows never reach a window (the scale contract)."""
    from tests.conftest import SF_DIR

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from tamer_spark.queries import _t

    ev = _t(spark, SF_DIR, "events")
    s = daily_counts(ev)
    assert s.columns == ["k", "day", "n"]
    n_days = s.count()
    out = mad_anomalies(s, ("k",), "n")
    assert out.count() == n_days  # full series retained
    plan = out._jdf.queryExecution().executedPlan().toString()
    # both median windows partition by the key, never by event grain
    import re

    wins = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert wins and all(w == "k" for w in wins), plan
