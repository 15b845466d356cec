"""Unit tests for the as-of join and rolling window operators
(functions/timeseries.py) — tie semantics, tolerance, empty matches.
The q57/q58 driver oracles check them differentially against DuckDB's
native ASOF JOIN / SQL range frames; these pin the edge semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dask_grblas_spark.functions import timeseries


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _left(spark):
    return spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(20), 101), (2, _ts(15), 102),
         (3, _ts(5), 103)],
        "k long, ts timestamp, lid long")


def _right(spark):
    return spark.createDataFrame(
        [(1, _ts(5), 200), (1, _ts(18), 201), (2, _ts(15), 202),
         (2, _ts(40), 203)],
        "k long, ts timestamp, rid long")


def test_asof_backward_and_unmatched(spark):
    out = timeseries.asof_join(_left(spark), _right(spark), on="k")
    got = {r.lid: r.asof_rid for r in out.collect()}
    assert got == {100: 200,   # 10 -> latest right at 5
                   101: 201,   # 20 -> 18
                   102: 202,   # equal ts matches (inclusive)
                   103: None}  # key 3 has no right rows


def test_asof_tolerance_voids_stale_matches(spark):
    out = timeseries.asof_join(_left(spark), _right(spark), on="k",
                               tolerance_seconds=3)
    got = {r.lid: r.asof_rid for r in out.collect()}
    assert got == {100: None,  # 10 - 5 = 5s > 3s
                   101: 201,   # 20 - 18 = 2s
                   102: 202,   # 0s
                   103: None}


def test_asof_tie_on_equal_right_ts_takes_greatest_row(spark):
    right = spark.createDataFrame(
        [(1, _ts(5), 200), (1, _ts(5), 299)],
        "k long, ts timestamp, rid long")
    out = timeseries.asof_join(_left(spark).filter("lid = 100"),
                               right, on="k")
    assert out.collect()[0].asof_rid == 299


def test_rolling_agg_trailing_window(spark):
    ev = spark.createDataFrame(
        [(1, _ts(0), 1.0, 10), (1, _ts(30), 2.0, 11),
         (1, _ts(31), 4.0, 12), (2, _ts(0), 8.0, 13)],
        "user_id long, ts timestamp, value double, event_id long")
    out = timeseries.rolling_agg(ev, window_seconds=30)
    got = {r.event_id: (r.roll_n, r.roll_sum) for r in out.collect()}
    assert got == {10: (1, 1.0),
                   11: (2, 3.0),    # 0s row inside the 30s trailing frame
                   12: (2, 6.0),    # 0s row fell out; 30s row stays
                   13: (1, 8.0)}    # other user unaffected


# ---- property-based: engine vs brute force --------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# (key, second, is_left): tiny keyspace forces heavy per-key collisions,
# including equal-timestamp ties on both sides
_events = st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50),
                             st.booleans()), max_size=14)

_PROP = dict(max_examples=10, deadline=None,
             suppress_health_check=[HealthCheck.too_slow])


class TestTimeseriesProperties:
    @settings(**_PROP)
    @given(rows=_events)
    def test_asof_matches_bruteforce(self, spark, rows):
        lrows, rrows = [], []
        for i, (k, s, is_left) in enumerate(rows):
            (lrows if is_left else rrows).append((k, _ts(s), 1000 + i))
        if not lrows:
            return
        left = spark.createDataFrame(lrows, "k long, ts timestamp, lid long")
        right = spark.createDataFrame(rrows or [],
                                      "k long, ts timestamp, rid long")
        got = {r.lid: r.asof_rid
               for r in timeseries.asof_join(left, right, on="k").collect()}
        for (k, ts, lid) in lrows:
            cand = [(rts, rid) for (rk, rts, rid) in rrows
                    if rk == k and rts <= ts]
            want = max(cand)[1] if cand else None
            assert got[lid] == want, (k, ts, lid)

    @settings(**_PROP)
    @given(rows=_events)
    def test_rolling_matches_bruteforce(self, spark, rows):
        evs = [(k, _ts(s), float(s % 7), 1000 + i)
               for i, (k, s, _) in enumerate(rows)]
        if not evs:
            return
        df = spark.createDataFrame(
            evs, "user_id long, ts timestamp, value double, event_id long")
        out = timeseries.rolling_agg(df, window_seconds=10)
        got = {r.event_id: (r.roll_n, r.roll_sum) for r in out.collect()}
        for (k, ts, v, eid) in evs:
            sec = int(ts.timestamp())
            peers = [pv for (pk, pts, pv, _) in evs
                     if pk == k and sec - 10 <= int(pts.timestamp()) <= sec]
            assert got[eid] == (len(peers), round(sum(peers), 2)), (k, eid)
