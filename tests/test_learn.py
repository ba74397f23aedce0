"""Unit tests for operators/learn.py — the trained quality scorer whose
full gradient-descent trajectory the docs_quality_logreg oracle replays."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from impc_etl_spark.operators import learn


def _toy(spark, n=200):
    """Separable toy set: y = 1 iff f1 > 0.5 (f2 is noise-ish)."""
    rows = [
        (i, (i % 100) / 100.0, ((i * 37) % 100) / 100.0, 1 if (i % 100) / 100.0 > 0.5 else 0)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["id", "f1", "f2", "label"])


def test_logreg_learns_separable_direction(spark):
    df = _toy(spark)
    w, b = learn.logreg_fit(df, ["f1", "f2"], "label", iterations=5, lr=2.0)
    # the separating feature must carry the dominant positive weight
    assert w[0] > 0
    assert abs(w[0]) > abs(w[1])
    scored = learn.logreg_score(df, ["f1", "f2"], w, b, score_col="s")
    acc = (
        scored.select(
            F.avg((F.col("s_pred") == F.col("label")).cast("double")).alias("a")
        ).first()["a"]
    )
    assert acc > 0.8  # beats the 0.5 majority baseline decisively


def test_logreg_fit_is_deterministic_and_rounded(spark):
    df = _toy(spark).repartition(8)
    w1, b1 = learn.logreg_fit(df, ["f1", "f2"], "label", iterations=3)
    w2, b2 = learn.logreg_fit(df.repartition(3), ["f1", "f2"], "label", iterations=3)
    assert (w1, b1) == (w2, b2)  # partitioning must not change the trajectory
    for v in [*w1, b1]:
        # every weight sits exactly on the 6dp grid (floor(x*1e6+0.5)/1e6)
        assert v == math.floor(v * 1e6 + 0.5) / 1e6


def test_logreg_null_features_filtered_and_empty_raises(spark):
    df = _toy(spark, 50)
    dirty = df.withColumn(
        "f1", F.when(F.col("id") % 7 == 0, F.lit(None)).otherwise(F.col("f1"))
    )
    clean = df.where(F.col("id") % 7 != 0)
    assert learn.logreg_fit(dirty, ["f1", "f2"], "label", 2) == learn.logreg_fit(
        clean, ["f1", "f2"], "label", 2
    )
    with pytest.raises(ValueError, match="no trainable rows"):
        learn.logreg_fit(df.where(F.lit(False)), ["f1"], "label", 1)
    with pytest.raises(ValueError, match="at least one feature"):
        learn.logreg_fit(df, [], "label", 1)


def test_fast_sigmoid_matches_python_replay(spark):
    df = spark.createDataFrame([(m,) for m in (-3.0, -0.5, 0.0, 0.25, 4.0)], ["m"])
    got = [
        r["p"] for r in df.select(learn.fast_sigmoid(F.col("m")).alias("p"))
        .orderBy("m").collect()
    ]
    want = [0.5 + 0.5 * m / (1.0 + abs(m)) for m in sorted((-3.0, -0.5, 0.0, 0.25, 4.0))]
    assert got == want  # bit-exact: only IEEE add/mul/div/abs involved


def test_linreg_fit_2d_recovers_plane_and_guards(spark):
    df = spark.createDataFrame(
        [(float(i), float((i * 7) % 5), 2.0 * i + 3.0 * ((i * 7) % 5) + 10.0)
         for i in range(50)],
        ["x1", "x2", "y"],
    )
    w1, w2, b, _means = learn.linreg_fit_2d(df, "x1", "x2", "y")
    assert (w1, w2, b) == (2.0, 3.0, 10.0)  # exact plane, exact recovery

    # collinear design must raise, not divide by zero
    col = df.withColumn("x2", df.x1 * 2.0)
    with pytest.raises(ValueError, match="singular"):
        learn.linreg_fit_2d(col, "x1", "x2", "y")
    with pytest.raises(ValueError, match="no rows"):
        learn.linreg_fit_2d(df.where("x1 < 0"), "x1", "x2", "y")


def test_c4_and_extract_never_raise_and_are_idempotent(spark):
    """Hostile-input hardening for the round's text cleaners: arbitrary
    junk lines/markup must filter cleanly (no throw), and re-running the
    C4 filter on its own output keeps it fixed (idempotence — the filter
    is a pure per-line predicate)."""
    from pyspark.sql import functions as F

    from impc_etl_spark.operators.text import c4_line_filter, extract_main_content

    junk = [
        (1, ["", " ", "{weird", 'ends ok with four words."', "\t\n", "a."]),
        (2, []),
        (3, [None]),  # NULL line inside the array
        (4, ["<<<>>>", "N" * 5000 + ".", "cookie jar is a phrase here."]),
    ]
    df = spark.createDataFrame(junk, ["id", "lines"])
    once = df.select("id", c4_line_filter("lines").alias("kept"))
    twice = once.select("id", c4_line_filter("kept").alias("kept"))
    assert [r["kept"] for r in once.orderBy("id").collect()] == [
        r["kept"] for r in twice.orderBy("id").collect()
    ]

    html = [
        (1, "<p>" + "x" * 40 + "</p><div><a href=x>" + "y" * 50 + "</a></div>"),
        (2, ""),
        (3, "no tags at all but long enough to keep as a single block ok"),
        (4, "<script>while(1){}</script><p>short</p>"),
        (5, None),
    ]
    hdf = spark.createDataFrame(html, ["id", "html"])
    out = hdf.select("id", extract_main_content("html").alias("t")).collect()
    got = {r["id"]: r["t"] for r in out}
    assert got[3].startswith("no tags at all")   # tag-free text survives
    assert "y" * 50 not in got[1]                # anchor-dense block dropped
    assert "while(1)" not in got[4]              # script dropped wholesale
    assert got[5] is None                        # NULL in -> NULL out


def test_luhn_check_known_numbers(spark):
    from impc_etl_spark.operators.text import luhn_check

    cases = [
        ("4111111111111111", True),    # canonical test PAN
        ("4111111111111112", False),   # off-by-one check digit
        ("79927398713", False),        # valid Luhn but 11 digits (< 12 min)
        ("799273987130", False),       # 12 digits, bad checksum
        ("not-a-number-16", False),
        ("", False),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], ["s"])
    got = {
        r["s"]: bool(r["v"])
        for r in df.select("s", luhn_check("s").alias("v")).collect()
    }
    assert got == {s: want for s, want in cases}


def test_holt_linear_matches_python_replay_and_skips_nulls(spark):
    """The Holt recurrences must equal a literal Python replay bit-for-bit
    (the contract the recursive-CTE oracle relies on), including NULL
    skip-with-state-carry."""
    import math

    from impc_etl_spark.operators.timeseries import holt_linear

    series = [3.0, 7.5, None, 2.25, 9.0, float("nan"), 4.5]
    rows = [(i, 1, float(i), v) for i, v in enumerate(series)]
    df = spark.createDataFrame(rows, "event_id int, k int, ts double, v double")
    out = {
        r["event_id"]: (r["level"], r["trend"], r["forecast"])
        for r in holt_linear(df, ["k"], "ts", "v", alpha=0.3, beta=0.2,
                             tiebreak_cols=["event_id"]).collect()
    }
    lvl = trd = None
    for i, v in enumerate(series):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            assert out[i] == (None, None, None)
            continue
        if lvl is None:
            lvl, trd = v, 0.0
        else:
            prev = lvl
            lvl = 0.3 * v + 0.7 * (prev + trd)
            trd = 0.2 * (lvl - prev) + 0.8 * trd
        assert out[i] == (lvl, trd, lvl + trd)  # bit-exact


def test_linreg_all_null_feature_raises(spark):
    df = spark.createDataFrame(
        [(None, 1.0, 2.0), (None, 2.0, 3.0)], "x1 double, x2 double, y double"
    )
    with pytest.raises(ValueError, match="all-NULL"):
        learn.linreg_fit_2d(df, "x1", "x2", "y")
