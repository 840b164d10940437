"""Wave-55: group-kfold no-straddle proof, Theil-Sen robustness
property, peak-detection python twin."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from weather_flink_spark.plans import analytics_wave55 as w55
from weather_flink_spark.plans.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_group_kfold_never_straddles_and_covers(spark):
    from weather_flink_spark.io import load

    folds = {r.fold: r for r in all_specs()["q_split_group_kfold"].fn(spark, SF).collect()}
    e = load(spark, SF, "events")
    fold = F.expr(
        "cast(conv(substring(md5(concat('gkfold:', cast(user_id as string))),"
        f" 1, 7), 16, 10) as bigint) % {w55._KFOLD}"
    )
    # the no-straddle property: every user maps to exactly ONE fold
    straddle = (
        e.select("user_id", fold.alias("f"))
        .groupBy("user_id")
        .agg(F.countDistinct("f").alias("nf"))
        .filter(F.col("nf") > 1)
        .count()
    )
    assert straddle == 0
    assert sum(r.n_events for r in folds.values()) == e.count()
    assert abs(sum(r.share for r in folds.values()) - 1.0) < 1e-4
    assert len(folds) == w55._KFOLD  # every fold populated at fixture


def test_theil_sen_resists_outlier_day_where_ols_does_not():
    """The estimator's defining property, replayed in python on a
    synthetic series: one wild day moves OLS but not Theil-Sen."""
    xs = list(range(20))
    ys = [10 + 2 * x for x in xs]

    def theil_sen(xs, ys):
        slopes = sorted(
            (ys[j] - ys[i]) / (xs[j] - xs[i])
            for i in range(len(xs))
            for j in range(i + 1, len(xs))
        )
        n = len(slopes)
        mid = (
            slopes[(n - 1) // 2]
            if n % 2
            else (slopes[n // 2 - 1] + slopes[n // 2]) / 2
        )
        return mid

    def ols(xs, ys):
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        return (n * sxy - sx * sy) / (n * sxx - sx * sx)

    assert abs(theil_sen(xs, ys) - 2.0) < 1e-12
    ys_out = list(ys)
    ys_out[10] = 10_000  # one wild day
    assert abs(theil_sen(xs, ys_out) - 2.0) < 0.2  # barely moves
    assert abs(ols(xs, ys_out) - 2.0) > 5  # OLS dragged far off


def test_theil_sen_entry_matches_python_on_fixture(spark):
    row = all_specs()["q_stats_theil_sen"].fn(spark, SF).collect()[0]
    con = duckdb.connect()
    daily = con.execute(
        f"""
        SELECT DATE_DIFF('day', DATE '{w55._EPOCH}', CAST(ts AS DATE)) AS x,
               COUNT(*) AS y
        FROM read_parquet('{SF}/events.parquet') events GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    xs = [r[0] for r in daily]
    ys = [r[1] for r in daily]
    slopes = sorted(
        (ys[j] - ys[i]) / (xs[j] - xs[i])
        for i in range(len(xs))
        for j in range(i + 1, len(xs))
    )
    n = len(slopes)
    want = (
        slopes[(n - 1) // 2]
        if n % 2
        else (slopes[n // 2 - 1] + slopes[n // 2]) / 2
    )
    assert abs(row.ts_slope - round(want, 6)) <= 1e-6
    assert row.n_days == len(xs)
    assert row.n_pairs == len(slopes)


def test_peaks_match_python_twin(spark):
    got = {
        (r.user_id, r.day_x): (r.n_events, r.rise)
        for r in all_specs()["q_events_peaks"].fn(spark, SF).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT user_id,
               DATE_DIFF('day', DATE '{w55._EPOCH}', CAST(ts AS DATE)) AS x,
               COUNT(*) AS y
        FROM read_parquet('{SF}/events.parquet') events
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict[int, list[tuple[int, int]]] = {}
    for u, x, y in rows:
        series.setdefault(u, []).append((x, y))
    want = {}
    for u, pts in series.items():
        for i in range(1, len(pts) - 1):
            (px, py), (x, y), (nx, ny) = pts[i - 1], pts[i], pts[i + 1]
            if y > py and y >= ny:
                want[(u, x)] = (y, y - py)
    assert got == want
    assert want  # fixture actually has peaks
