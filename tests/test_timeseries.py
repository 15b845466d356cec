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

    @settings(**_PROP)
    @given(rows=_events)
    def test_rolling_minmax_matches_bruteforce(self, spark, rows):
        """The two-bucket van Herk/Gil-Werman rolling min/max against
        brute force: the 0..50s draw straddles the 11s bucket width
        repeatedly, so same-bucket, cross-bucket, boundary (exactly
        sec-10 / sec) and tied-second cases all occur."""
        evs = [(k, _ts(s), float((s * 13 + i) % 23), 1000 + i)
               for i, (k, s, _) in enumerate(rows)]
        if not evs:
            return
        df = spark.createDataFrame(
            evs, "user_id long, ts timestamp, value double, event_id long")
        out = timeseries.rolling_agg(df, window_seconds=10,
                                     id_col="event_id", agg="minmax")
        got = {r.event_id: (r.roll_min, r.roll_max) for r in out.collect()}
        for (k, ts, v, eid) in evs:
            sec = int(ts.timestamp())
            peers = [pv for (pk, pts, pv, _) in evs
                     if pk == k and sec - 10 <= int(pts.timestamp()) <= sec]
            assert got[eid] == (min(peers), max(peers)), (k, eid)


# ---------------------------------------------------------------------------
# ewma / gapfill (q98/q99)
# ---------------------------------------------------------------------------

def _series(spark):
    return spark.createDataFrame(
        [(1, _ts(1), 1, 4.0), (2, _ts(2), 1, 8.0), (3, _ts(3), 1, 8.0),
         (4, _ts(7), 2, 2.0)],
        "event_id long, ts timestamp, user_id long, value double")


def test_ewma_recurrence(spark):
    out = timeseries.ewma(_series(spark), alpha=0.25)
    got = {r.id: r.ewma for r in out.collect()}
    # y1 = 4; y2 = .25*8 + .75*4 = 5; y3 = .25*8 + .75*5 = 5.75
    assert got == {1: 4.0, 2: 5.0, 3: 5.75, 4: 2.0}


def test_ewma_orders_by_ts_not_input_order(spark):
    df = _series(spark).orderBy(F.col("ts").desc())
    out = timeseries.ewma(df, alpha=0.25)
    assert {r.id: r.ewma for r in out.collect()}[3] == 5.75


def test_ewma_quantizes_to_six_decimals(spark):
    df = spark.createDataFrame(
        [(1, _ts(1), 1, 0.1), (2, _ts(2), 1, 0.2)],
        "event_id long, ts timestamp, user_id long, value double")
    out = timeseries.ewma(df, alpha=0.25)
    got = {r.id: r.ewma for r in out.collect()}
    assert got[2] == 0.125  # floor((0.25*0.2 + 0.75*0.1)*1e6 + .5)/1e6


def test_gapfill_forward_fills_hourly_gaps(spark):
    def _h(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    df = spark.createDataFrame(
        [(1, _h(0, 10), 1, 10.0), (2, _h(0, 20), 1, 11.0),
         (3, _h(3, 5), 1, 12.0),  # hours 1 and 2 are gaps
         (4, _h(5, 0), 2, 20.0)],
        "event_id long, ts timestamp, user_id long, value double")
    out = timeseries.gapfill(df).collect()
    u1 = {r.slot.hour: (r.value, r.observed) for r in out if r.key == 1}
    # slot 0 keeps the LAST observation (ts tie-break), gaps carry it
    assert u1 == {0: (11.0, True), 1: (11.0, False), 2: (11.0, False),
                  3: (12.0, True)}
    u2 = [r for r in out if r.key == 2]
    assert len(u2) == 1 and u2[0].observed and u2[0].value == 20.0


def test_gapfill_grid_is_per_key_span(spark):
    out = timeseries.gapfill(_series(spark))
    # all four events share hour 0 -> one slot per key, no densify
    assert out.count() == 2


# ---------------------------------------------------------------------------
# funnel / cohort retention (q113/q114)
# ---------------------------------------------------------------------------

def _funnel_events(spark):
    return spark.createDataFrame(
        [  # user 1: full ordered conversion
         (1, _ts(1), 1, "signup", 0.0), (2, _ts(5), 1, "click", 0.0),
         (3, _ts(9), 1, "purchase", 0.0),
         # user 2: purchase BEFORE click -> stops at 2 steps
         (4, _ts(1), 2, "signup", 0.0), (5, _ts(3), 2, "purchase", 0.0),
         (6, _ts(7), 2, "click", 0.0),
         # user 3: never signed up -> 0 steps (click alone doesn't count)
         (7, _ts(2), 3, "click", 0.0)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double")


def test_funnel_ordered_steps(spark):
    out = timeseries.funnel(_funnel_events(spark),
                            ["signup", "click", "purchase"])
    got = {r.key: (r.n_steps, r.converted, r.latency_us)
           for r in out.collect()}
    assert got[1] == (3, True, 8_000_000)
    assert got[2] == (2, False, None)
    assert got[3] == (0, False, None)


def test_funnel_window_bound(spark):
    out = timeseries.funnel(_funnel_events(spark),
                            ["signup", "click", "purchase"],
                            window_seconds=5)
    got = {r.key: (r.n_steps, r.converted) for r in out.collect()}
    # user 1's purchase at +8s exceeds the 5s window; click at +4s stays
    assert got[1] == (2, False)


def test_cohort_retention_weekly(spark):
    def _d(day):
        return dt.datetime(2024, 1, day)  # 2024-01-01 is a Monday

    df = spark.createDataFrame(
        [(1, _d(1), 1, "view", 0.0), (2, _d(2), 1, "view", 0.0),
         (3, _d(9), 1, "view", 0.0),   # week+1
         (4, _d(9), 2, "view", 0.0)],  # cohort week 2
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double")
    got = {(r.cohort, r.offset): r.n_active
           for r in timeseries.cohort_retention(df).collect()}
    w1 = int(dt.datetime(2024, 1, 1).timestamp())
    w2 = int(dt.datetime(2024, 1, 8).timestamp())
    assert got == {(w1, 0): 1, (w1, 1): 1, (w2, 0): 1}


def test_interval_union_merges_overlaps(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), 1, "view", 0.0),    # [0, 10)
         (2, _ts(5), 1, "view", 0.0),    # [5, 15) merges
         (3, _ts(30), 1, "view", 0.0),   # [30, 40) separate
         (4, _ts(0), 2, "view", 0.0)],   # single interval
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double")
    got = {r.key: (r.n_intervals, r.active_us)
           for r in timeseries.interval_union(
               df, interval_seconds=10).collect()}
    assert got[1] == (2, 25_000_000)  # [0,15) + [30,40)
    assert got[2] == (1, 10_000_000)


def test_interval_union_touching_intervals_merge(spark):
    # end is exclusive: an event exactly at a prior interval's end
    # extends it (s > prev_end is false at equality)
    df = spark.createDataFrame(
        [(1, _ts(0), 1, "view", 0.0), (2, _ts(10), 1, "view", 0.0)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double")
    got = timeseries.interval_union(df, interval_seconds=10).collect()[0]
    assert (got.n_intervals, got.active_us) == (1, 20_000_000)


def test_scd2_collapses_runs_and_chains_validity(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), 1, "view", 0.0), (2, _ts(10), 1, "view", 0.0),
         (3, _ts(20), 1, "click", 0.0), (4, _ts(30), 1, "view", 0.0)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double")
    got = (timeseries.scd2(df, "user_id", "ts", ["event_type"],
                           order_cols=["ts", "event_id"])
           .orderBy("version").collect())
    assert [(r.event_type, r.version) for r in got] == [
        ("view", 1), ("click", 2), ("view", 3)]
    # validity chains: each version closes where the next opens
    assert got[0].valid_to == got[1].valid_from
    assert got[1].valid_to == got[2].valid_from
    assert got[2].valid_to is None


def test_scd2_null_attr_first_row_kept_and_null_transition(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), 1, None, 0.0), (2, _ts(10), 1, None, 0.0),
         (3, _ts(20), 1, "x", 0.0)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double")
    got = (timeseries.scd2(df, "user_id", "ts", ["event_type"],
                           order_cols=["ts", "event_id"])
           .orderBy("version").collect())
    # NULL first version survives; NULL -> 'x' is a change; NULL==NULL
    # (null-safe) is NOT a change
    assert [(r.event_type, r.version) for r in got] == [(None, 1), ("x", 2)]


def test_range_join_matches_inequality_join(spark):
    from pyspark.sql import functions as F

    from dask_grblas_spark.functions.joins import range_join

    pts = spark.createDataFrame(
        [(i, (i * 37) % 211 - 50) for i in range(300)], "pid long, x long")
    ivs = spark.createDataFrame(
        [(j, (j * 53) % 190 - 60, (j * 53) % 190 - 60 + (j % 31))
         for j in range(80)], "iid long, s long, e long")
    got = set(map(tuple, range_join(pts, ivs, "x", "s", "e",
                                    bucket_width=16)
                  .select("pid", "iid").collect()))
    want = set(map(tuple,
                   pts.join(ivs, (F.col("x") >= F.col("s"))
                            & (F.col("x") < F.col("e")))
                      .select("pid", "iid").collect()))
    assert got == want and len(want) > 0


def test_range_join_end_exclusive_and_empty_interval(spark):
    from dask_grblas_spark.functions.joins import range_join

    pts = spark.createDataFrame([(1, 10)], "pid long, x long")
    ivs = spark.createDataFrame(
        [(1, 0, 10),    # ends exactly at the point: no match
         (2, 10, 10),   # empty interval: no match
         (3, 10, 11)],  # starts at the point: match
        "iid long, s long, e long")
    got = [r.iid for r in range_join(pts, ivs, "x", "s", "e",
                                     bucket_width=5).collect()]
    assert got == [3]


def test_event_transitions_counts_and_probs(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), 1, "a", 0.0), (2, _ts(1), 1, "b", 0.0),
         (3, _ts(2), 1, "a", 0.0), (4, _ts(3), 1, "b", 0.0),
         (5, _ts(0), 2, "a", 0.0), (6, _ts(1), 2, "a", 0.0)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double")
    got = {(r.cur, r.nxt): (r.n, r.p)
           for r in timeseries.event_transitions(df).collect()}
    # user1: a->b, b->a, a->b; user2: a->a
    assert got[("a", "b")] == (2, round(2 / 3, 6))
    assert got[("a", "a")] == (1, round(1 / 3, 6))
    assert got[("b", "a")] == (1, 1.0)


def test_cusum_matches_recursion(spark):
    import datetime

    from dask_grblas_spark.functions.timeseries import cusum_changepoints

    # flat at 4/day, then a hard burst (strong enough to clear the
    # 4-sigma bar even though the shift inflates sigma itself) —
    # recompute the classic recursion in python and compare day by day
    counts = [4] * 20 + [30, 30, 30]
    rows = []
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, datetime.datetime(2024, 3, 1 + d, 12, 0),
                         1, "click", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    got = {r["day"]: r for r in cusum_changepoints(df).collect()}
    import statistics
    mu = round(statistics.fmean(counts), 6)
    sg = round(statistics.pstdev(counts), 6)
    s = 0.0
    for d, c in enumerate(counts):
        s = max(0.0, s + (c - mu - 0.5 * sg))
        day = f"2024-03-{1 + d:02d}"
        assert got[day]["n"] == c
        assert abs(got[day]["s"] - round(s, 6)) < 1e-9
        assert got[day]["flag"] == (round(s, 6) > 4.0 * sg)
    # the burst days must alarm, the leading flat days must not
    assert not got["2024-03-03"]["flag"]
    assert got["2024-03-23"]["flag"]


def test_rolling_correlation_perfect_and_inverse(spark):
    import datetime

    from dask_grblas_spark.functions.timeseries import rolling_correlation

    # 8 days: clicks = 2*views (perfect corr 1.0) then inverse tail
    rows = []
    eid = 0
    vals = [(1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (4.0, 8.0),
            (5.0, 10.0), (6.0, 12.0), (7.0, 14.0), (8.0, 16.0)]
    for d, (v, c) in enumerate(vals):
        rows.append((eid, datetime.datetime(2024, 5, 1 + d), 1,
                     "view", v, "{}")); eid += 1
        rows.append((eid, datetime.datetime(2024, 5, 1 + d), 1,
                     "click", c, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    got = {r["day"]: r for r in rolling_correlation(df).collect()}
    assert got["2024-05-01"]["corr"] is None  # single-day window
    assert got["2024-05-04"]["corr"] == 1.0
    assert got["2024-05-08"]["n_days"] == 7
    assert got["2024-05-08"]["corr"] == 1.0


def test_rolling_correlation_zero_variance_is_null(spark):
    import datetime

    from dask_grblas_spark.functions.timeseries import rolling_correlation

    rows = []
    for d in range(4):
        rows.append((d * 2, datetime.datetime(2024, 5, 1 + d), 1,
                     "view", 5.0, "{}"))       # constant
        rows.append((d * 2 + 1, datetime.datetime(2024, 5, 1 + d), 1,
                     "click", float(d), "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    assert all(r["corr"] is None
               for r in rolling_correlation(df).collect())


def test_event_paths_counts_and_rank(spark):
    import datetime

    from dask_grblas_spark.functions.timeseries import event_paths

    base = datetime.datetime(2024, 6, 1)
    rows = []
    eid = 0
    # user 1: a b c a b c -> paths a>b>c x2, b>c>a x1, c>a>b x1
    for i, t in enumerate("abcabc"):
        rows.append((eid, base + datetime.timedelta(seconds=i), 1, t,
                     0.0, "{}")); eid += 1
    # user 2: a b c -> a>b>c x1 (no cross-user paths)
    for i, t in enumerate("abc"):
        rows.append((eid, base + datetime.timedelta(seconds=i), 2, t,
                     0.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    got = {r["path"]: (r["n"], r["rank"])
           for r in event_paths(df).collect()}
    assert got["a>b>c"] == (3, 1)
    assert got["b>c>a"] == (1, 2)  # ties rank by path string
    assert got["c>a>b"] == (1, 3)
    assert len(got) == 3           # never crosses the user boundary


def test_sax_symbols_shapes(spark):
    import datetime

    from dask_grblas_spark.functions.timeseries import sax_symbols

    rows = []
    eid = 0
    # user 1: strictly increasing daily sums over 8 days -> 'abcd'-ish
    for d in range(8):
        rows.append((eid, datetime.datetime(2024, 6, 1 + d), 1,
                     "view", float(d * 10), "{}")); eid += 1
    # user 2: constant -> zero variance -> all 'b'
    for d in range(4):
        rows.append((eid, datetime.datetime(2024, 6, 1 + d), 2,
                     "view", 5.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    got = {r["key"]: r for r in sax_symbols(df).collect()}
    assert got[1]["n_days"] == 8
    assert got[1]["sax"] == "abcd"  # monotone ramp crosses all quartiles
    assert got[2]["sax"] == "bbbb"  # degenerate sigma -> middle letter


def test_seasonal_decompose_identity_and_constant(spark):
    import datetime

    from dask_grblas_spark.functions.timeseries import seasonal_decompose

    rows = []
    eid = 0
    # constant 5 events/day for 14 days -> trend = 5, seasonal = 0
    for d in range(14):
        for _ in range(5):
            rows.append((eid, datetime.datetime(2024, 7, 1 + d), 1,
                         "view", 1.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = seasonal_decompose(df).collect()
    assert len(out) == 14
    for r in out:
        assert r["trend"] == 5.0
        assert r["seasonal"] == 0.0
        assert r["resid"] == 0.0
        # additive identity holds by construction
        assert abs(r["n"] - (r["trend"] + r["seasonal"] + r["resid"])) \
            < 1e-9


def test_debounce_keeps_burst_starts(spark):
    import datetime

    from dask_grblas_spark.functions.timeseries import debounce

    base = datetime.datetime(2024, 8, 1)
    rows = [
        (1, base, 1, "click", 0.0, "{}"),
        (2, base + datetime.timedelta(seconds=10), 1, "click", 0.0, "{}"),
        (3, base + datetime.timedelta(seconds=200), 1, "click", 0.0, "{}"),
        (4, base + datetime.timedelta(seconds=205), 1, "view", 0.0, "{}"),
        (5, base + datetime.timedelta(seconds=500), 2, "click", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    got = {r["id"]: r["burst_no"]
           for r in debounce(df, gap_seconds=60).collect()}
    # event 2 is inside event 1's burst; 3 starts burst 2; 4 and 5 are
    # firsts of their own keys
    assert got == {1: 1, 3: 2, 4: 1, 5: 1}


def test_peak_detection_hand_computed(spark):
    from dask_grblas_spark.functions.timeseries import peak_detection

    rows = [("u", i, float(v)) for i, v in
            enumerate([1, 3, 2, 5, 5, 4, 9])]  # peaks: 3, first 5, 9
    rows += [("w", 0, 7.0)]                    # singleton = peak
    df = spark.createDataFrame(rows, "user_id string, ts long, "
                                     "value double")
    got = sorted((r.key, r.ts, r.value, r.delta)
                 for r in peak_detection(df, min_delta=0.0).collect())
    assert got == [("u", 1, 3.0, 1.0), ("u", 3, 5.0, 0.0),
                   ("u", 6, 9.0, 5.0),
                   ("w", 0, 7.0, float("inf"))]
    # min_delta screens the plateau peak (delta 0)
    got2 = sorted((r.ts, r.value) for r in peak_detection(
        df, min_delta=0.5).collect() if r.key == "u")
    assert got2 == [(1, 3.0), (6, 9.0)]


def test_ohlc_hand_computed(spark):
    from dask_grblas_spark.functions.timeseries import ohlc

    import datetime as dt
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        ("a", t0 + dt.timedelta(minutes=5), 3.0, 1),
        ("a", t0 + dt.timedelta(minutes=1), 7.0, 2),   # open (earliest)
        ("a", t0 + dt.timedelta(minutes=50), 1.0, 3),  # close + low
        ("a", t0 + dt.timedelta(minutes=20), 9.0, 4),  # high
        # same-ts tie: event_id breaks it (id 5 before id 6)
        ("b", t0, 4.0, 5), ("b", t0, 8.0, 6),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, "
                                     "value double, event_id long")
    got = {r.key: r for r in ohlc(df).collect()}
    a = got["a"]
    assert (a.open, a.high, a.low, a.close, a.n) == (7.0, 9.0, 1.0,
                                                     1.0, 4)
    b = got["b"]
    assert (b.open, b.close, b.n) == (4.0, 8.0, 2)


def test_lag_features_calendar_gaps(spark):
    """Days 0, 1, 3: lag_1 at day 3 is NULL (day 2 absent — calendar
    lag, not row lag); trailing window counts only observed days."""
    import datetime as dt

    from dask_grblas_spark.functions.timeseries import lag_features

    d0 = dt.datetime(1970, 1, 1)
    rows = [(1, d0, 10.0), (1, d0, 5.0),
            (1, d0 + dt.timedelta(days=1), 7.0),
            (1, d0 + dt.timedelta(days=3), 2.0)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, "
                                     "value double")
    got = {r.day: r for r in lag_features(df, trail=3).collect()}
    assert got[0].v == 15.0 and got[0].n == 2
    assert got[1].lag_1 == 15.0
    assert got[3].lag_1 is None          # day 2 missing
    assert got[3].lag_7 is None
    assert got[1].trail_sum == 22.0 and got[1].trail_days == 2
    assert got[3].trail_sum == 9.0 and got[3].trail_days == 2  # days 1,3


def test_holt_smoothing_hand_recursion(spark):
    """Three days of counts 2, 4, 1 for one key: replay the quantized
    recursion by hand (alpha=.5, beta=.3)."""
    import datetime as dt
    import math

    from dask_grblas_spark.functions.timeseries import holt_smoothing

    def q6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    d0 = dt.datetime(1970, 1, 5)
    rows = []
    for day, n in [(0, 2), (1, 4), (2, 1)]:
        for _ in range(n):
            rows.append((9, d0 + dt.timedelta(days=day)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r.day - got_min: r for got_min in [4]
           for r in holt_smoothing(df).collect()}
    l1, b1 = 2.0, 0.0
    l2 = q6(0.5 * 4 + 0.5 * (l1 + b1))
    b2 = q6(0.3 * (l2 - l1) + 0.7 * b1)
    l3 = q6(0.5 * 1 + 0.5 * (l2 + b2))
    b3 = q6(0.3 * (l3 - l2) + 0.7 * b2)
    assert (got[0].level, got[0].trend) == (l1, b1)
    assert (got[1].level, got[1].trend) == (l2, b2)
    assert (got[2].level, got[2].trend) == (l3, b3)


def test_histogram_2d_clamps_and_nulls(spark):
    from dask_grblas_spark.functions.profiling import histogram_2d

    import pytest as _pt

    rows = [(0.5, 0.5), (9.9, 9.9), (-5.0, 20.0), (10.0, 10.0),
            (None, 1.0), (1.0, None)]
    df = spark.createDataFrame(rows, "x double, y double")
    got = {(r.bx, r.by): (r.x_edge, r.y_edge, r.n)
           for r in histogram_2d(df, "x", "y", 0.0, 10.0, 0.0, 10.0,
                                 nx=5, ny=5).collect()}
    assert got[(0, 0)] == (0.0, 0.0, 1)
    assert got[(4, 4)][2] == 2          # 9.9 and the hi-clamped 10.0
    assert got[(0, 4)] == (0.0, 8.0, 1)  # -5 clamps low, 20 clamps high
    assert sum(v[2] for v in got.values()) == 4  # NULL rows excluded
    with _pt.raises(ValueError):
        histogram_2d(df, "x", "y", 1.0, 1.0, 0.0, 10.0)


def test_rate_limit_admits_earliest(spark):
    """Key 'a' has 5 events in one hour -> first 3 by (ts, id) admitted;
    key 'b' under the cap keeps all; two-phase == single-window."""
    import datetime as dt

    from dask_grblas_spark.functions.timeseries import rate_limit

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [("a", t0 + dt.timedelta(minutes=m), i)
            for i, m in enumerate([40, 10, 20, 30, 50])] \
        + [("b", t0, 100), ("b", t0, 101)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, "
                                     "event_id long")
    got = {(r.key, r.id): r.admit_rank
           for r in rate_limit(df, key_col="event_type",
                               max_per_window=3, n_salts=4).collect()}
    # earliest three of 'a' are minutes 10, 20, 30 -> ids 1, 2, 3
    assert got == {("a", 1): 1, ("a", 2): 2, ("a", 3): 3,
                   ("b", 100): 1, ("b", 101): 2}
    import pytest as _pt
    with _pt.raises(ValueError):
        rate_limit(df, max_per_window=0)


def test_volume_anomaly_flags_burst_day(spark):
    """Flat 2-week daily baseline of 4 events + one 80-event burst day:
    the burst's residual blows past the MAD fence, baseline days don't."""
    import datetime as dt

    from dask_grblas_spark.functions.timeseries import volume_anomaly

    d0 = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for day in range(14):
        n = 80 if day == 7 else 4
        for k in range(n):
            rows.append((eid, d0 + dt.timedelta(days=day, minutes=k)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = {r.day: r for r in volume_anomaly(df, k=3.5).collect()}
    assert got["2024-03-08"].is_anomaly
    assert sum(1 for r in got.values() if r.is_anomaly) <= 3
    assert not got["2024-03-02"].is_anomaly


def test_holt_smoothing_string_key(spark):
    """r8 review find: the Arrow schema hardcoded a bigint key — a
    string key column must work (schema derived from the input)."""
    import datetime as dt

    from dask_grblas_spark.functions.timeseries import holt_smoothing

    d0 = dt.datetime(2024, 1, 1)
    rows = [("a", d0), ("a", d0 + dt.timedelta(days=1)),
            ("b", d0)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = holt_smoothing(df, key_col="event_type").collect()
    assert {r.key for r in got} == {"a", "b"} and len(got) == 3


def test_recency_profile_decay_and_cutoff(spark):
    """Hand-check the half-life arithmetic: an event exactly one
    half-life old weighs 0.5; events after the snapshot are excluded
    entirely; NULL values drop from score/n but not last_age_days."""
    import datetime as dt

    from dask_grblas_spark.functions.timeseries import recency_profile

    snap = "2024-01-08 00:00:00"
    rows = [(1, dt.datetime(2024, 1, 1), 10.0),    # age 7d -> w 0.5
            (1, dt.datetime(2024, 1, 8), 4.0),     # age 0 -> w 1.0
            (1, dt.datetime(2024, 1, 9), 99.0),    # future: excluded
            (2, dt.datetime(2024, 1, 7), None)]    # null value
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, "
                                     "value double")
    got = {r.key: r for r in recency_profile(df, snap).collect()}
    assert got[1].n == 2 and got[1].score == round(10 * 0.5 + 4.0, 6)
    assert got[1].last_age_days == 0.0
    assert got[2].n == 0 and got[2].score is None
    assert got[2].last_age_days == 1.0


def test_autocorrelation_alternating_and_gaps(spark):
    """Alternating daily series: acf(1) < 0 < acf(2); a missing
    calendar day enters as a true zero (grid join), shifting the
    lag alignment the way a volume series requires."""
    import datetime as dt

    from dask_grblas_spark.functions.timeseries import autocorrelation

    rows = [(dt.datetime(2024, 1, 1 + i, 12),
             10.0 if i % 2 == 0 else 0.0) for i in range(20)]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = {r.lag: r for r in autocorrelation(df, max_lag=3).collect()}
    assert out[1].acf < -0.8 and out[2].acf > 0.8
    assert out[1].n_terms == 19 and out[3].n_terms == 17
    # constant series -> zero variance -> NULL acf
    const = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1 + i), 5.0) for i in range(5)],
        "ts timestamp, value double")
    assert all(r.acf is None
               for r in autocorrelation(const, max_lag=2).collect())
    import pytest
    with pytest.raises(ValueError):
        autocorrelation(df, max_lag=0)


def test_twap_holds_until_next_observation(spark):
    """10.0 held 10 s then 20.0 held 30 s -> twap 17.5 (a plain AVG
    says 43); the last observation carries no weight; single-
    observation keys report NULL with span 0."""
    import datetime as dt

    from dask_grblas_spark.functions.timeseries import twap

    rows = [(1, dt.datetime(2024, 1, 1, 0, 0, 0), 1, 10.0),
            (1, dt.datetime(2024, 1, 1, 0, 0, 10), 2, 20.0),
            (1, dt.datetime(2024, 1, 1, 0, 0, 40), 3, 99.0),
            (2, dt.datetime(2024, 1, 1, 0, 0, 0), 4, 5.0)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double")
    out = {r.key: r for r in twap(df).collect()}
    assert out[1].twap == 17.5 and out[1].span_us == 40_000_000
    assert out[1].n_obs == 3
    assert out[2].twap is None and out[2].span_us == 0


def test_asof_join_directions(spark):
    """backward/forward/nearest semantics on a hand timeline; exact
    tie (equidistant) goes backward; tolerance voids per direction."""
    import datetime as dt

    import pytest

    from dask_grblas_spark.functions.timeseries import asof_join

    def T(s):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [(1, T(10), "l1"), (1, T(30), "l2"), (1, T(100), "l3")],
        "k long, ts timestamp, lv string")
    right = spark.createDataFrame(
        [(1, T(8), "r8"), (1, T(12), "r12"), (1, T(30), "r30"),
         (1, T(95), "r95")], "k long, ts timestamp, rv string")

    def got(direction, tol=None):
        return {r.lv: r.asof_rv
                for r in asof_join(left, right, "k",
                                   tolerance_seconds=tol,
                                   direction=direction).collect()}

    assert got("backward") == {"l1": "r8", "l2": "r30", "l3": "r95"}
    assert got("forward") == {"l1": "r12", "l2": "r30", "l3": None}
    # l1 equidistant (2 s each way) -> backward wins
    assert got("nearest") == {"l1": "r8", "l2": "r30", "l3": "r95"}
    assert got("nearest", tol=3) == {"l1": "r8", "l2": "r30",
                                     "l3": None}
    with pytest.raises(ValueError):
        asof_join(left, right, "k", direction="sideways")


def test_attribution_last_first_and_none(spark):
    import datetime as dt

    import pytest

    from dask_grblas_spark.functions import timeseries as ts
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: click, view, purchase -> last=view, first=click
        (1, t0, "click", 0.0),
        (1, t0 + dt.timedelta(minutes=1), "view", 0.0),
        (1, t0 + dt.timedelta(minutes=2), "purchase", 10.0),
        # user 2: purchase with no prior touch -> none
        (2, t0, "purchase", 5.0),
        # user 2: later click then purchase -> click
        (2, t0 + dt.timedelta(minutes=1), "click", 0.0),
        (2, t0 + dt.timedelta(minutes=2), "purchase", 7.5),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double")
    last = {r["touch_type"]: (r["n_conversions"], r["value_sum"])
            for r in ts.attribution(df).collect()}
    assert last == {"view": (1, 10.0), "none": (1, 5.0),
                    "click": (1, 7.5)}
    first = {r["touch_type"]: r["n_conversions"]
             for r in ts.attribution(df, model="first_touch").collect()}
    assert first == {"click": 2, "none": 1}
    with pytest.raises(ValueError):
        ts.attribution(df, model="multi_touch")


def test_lttb_keeps_peaks_and_endpoints(spark):
    import datetime as dt

    from dask_grblas_spark.functions import timeseries as ts
    t0 = dt.datetime(2024, 1, 1)
    # 40 points over 4 buckets: flat at 1.0 except a spike at i=17
    rows = [(1, t0 + dt.timedelta(minutes=i),
             100.0 if i == 17 else 1.0) for i in range(40)]
    df = spark.createDataFrame(rows,
                               "user_id long, ts timestamp, value double")
    out = {r["bucket"]: r for r in
           ts.downsample_lttb(df, n_buckets=4).collect()}
    assert len(out) == 4
    # endpoint rule: bucket 0 keeps the first point, bucket 3 the last
    import calendar
    us0 = int(calendar.timegm(t0.timetuple())) * 1_000_000
    assert out[0]["ts_us"] == us0
    assert out[3]["ts_us"] == us0 + 39 * 60 * 1_000_000
    # the spike (i=17 -> bucket 1) must be the bucket-1 survivor
    assert out[1]["v"] == 100.0


def test_attribution_lookback_expires_stale_touch(spark):
    import datetime as dt

    from dask_grblas_spark.functions import timeseries as ts
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, "click", 0.0),
        (1, t0 + dt.timedelta(seconds=100), "purchase", 10.0),
        (2, t0, "click", 0.0),
        (2, t0 + dt.timedelta(seconds=10), "purchase", 5.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double")
    # 30s lookback: user 1's click (100s old) expires; user 2's holds
    out = {r["touch_type"]: r["n_conversions"]
           for r in ts.attribution(df, lookback_seconds=30).collect()}
    assert out == {"none": 1, "click": 1}
    # unbounded: both credit the click
    full = {r["touch_type"]: r["n_conversions"]
            for r in ts.attribution(df).collect()}
    assert full == {"click": 2}


def test_attribution_lookback_masked_path_matches_semantics(spark):
    """The O(n) masked unbounded-frame rewrite of last_touch+lookback
    (r10) must match the declarative sliding-frame semantics: the
    most RECENT preceding touch wins iff it is inside the window (an
    out-of-window newest touch implies every older touch is out too,
    so masking the running last is exact). Cover: two in-window
    touches (last vs first disagree), an expired touch behind an
    in-window one, and same-ts touch exclusion."""
    import datetime as dt

    from dask_grblas_spark.functions import timeseries as ts
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: view at -25s (in window), click at -10s (in window)
        # -> last_touch credits click, first_touch credits view
        (1, t0 - dt.timedelta(seconds=25), "view", 0.0),
        (1, t0 - dt.timedelta(seconds=10), "click", 0.0),
        (1, t0, "purchase", 1.0),
        # user 2: click at -100s (out), view at -20s (in)
        # -> both models credit view
        (2, t0 - dt.timedelta(seconds=100), "click", 0.0),
        (2, t0 - dt.timedelta(seconds=20), "view", 0.0),
        (2, t0, "purchase", 1.0),
        # user 3: touch AT the conversion's own timestamp -> excluded
        (3, t0, "click", 0.0),
        (3, t0, "purchase", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double")
    last = {r["touch_type"]: r["n_conversions"]
            for r in ts.attribution(df, lookback_seconds=30).collect()}
    assert last == {"click": 1, "view": 1, "none": 1}
    first = {r["touch_type"]: r["n_conversions"]
             for r in ts.attribution(df, lookback_seconds=30,
                                     model="first_touch").collect()}
    assert first == {"view": 2, "none": 1}


def test_attribution_first_touch_window_brute_force(spark):
    """The bucketized two-pass prefix-MIN first_touch+lookback (r10)
    against a brute-force python oracle on randomized event streams —
    boundary cases (touch exactly at c-W: in; at c-1: in; at c: out;
    cross-bucket and same-bucket) all land in the random draw."""
    import datetime as dt
    import random

    from dask_grblas_spark.functions import timeseries as ts

    rnd = random.Random(1234)
    W = 60  # seconds
    rows = []
    for u in range(25):
        t = 0
        for _ in range(rnd.randint(3, 40)):
            t += rnd.randint(1, 45)  # gaps straddle the 60s window
            et = rnd.choice(["click", "view", "purchase", "error"])
            rows.append((u, dt.datetime(2024, 1, 1)
                         + dt.timedelta(seconds=t), et,
                         float(rnd.randint(0, 100))))
    # brute force: per purchase, earliest touch with
    # c-W <= tus <= c-1 (whole seconds here)
    expect = {}
    by_user = {}
    for u, tsv, et, v in rows:
        by_user.setdefault(u, []).append((tsv, et, v))
    for u, evs in by_user.items():
        touches = sorted((tsv, et) for tsv, et, _ in evs
                         if et in ("click", "view"))
        for tsv, et, v in evs:
            if et != "purchase":
                continue
            lo = tsv - dt.timedelta(seconds=W)
            cands = [(t2, e2) for t2, e2 in touches
                     if lo <= t2 < tsv]
            credit = min(cands)[1] if cands else "none"
            n, s = expect.get(credit, (0, 0.0))
            expect[credit] = (n + 1, s + v)
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double")
    got = {r["touch_type"]: (r["n_conversions"], r["value_sum"])
           for r in ts.attribution(df, lookback_seconds=W,
                                   model="first_touch").collect()}
    assert set(got) == set(expect)
    for k in expect:
        assert got[k][0] == expect[k][0], (k, got[k], expect[k])
        assert abs(got[k][1] - expect[k][1]) < 1e-6, k


def test_rolling_min_only_synthetic_id(spark):
    """agg='min' without id_col: the monotonic-id localCheckpoint
    branch feeds _rolling_minmax; output has roll_min only."""
    from dask_grblas_spark.functions import timeseries as ts
    rows = [(1, _ts(s), float(v))
            for s, v in [(0, 5.0), (3, 2.0), (12, 9.0), (14, 1.0),
                         (30, 4.0)]]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = ts.rolling_agg(df, window_seconds=10, agg="min")
    assert "roll_min" in out.columns and "roll_max" not in out.columns
    got = sorted((int(r["ts"].timestamp()), r["roll_min"])
                 for r in out.collect())
    # windows: [0]=5; [3]covers{0,3}=2; [12]covers{3,12}=2;
    # [14]covers{12,14}=1 (3 is 11s back, out); [30]=4
    base = got[0][0]
    assert [(s - base, v) for s, v in got] == \
        [(0, 5.0), (3, 2.0), (12, 2.0), (14, 1.0), (30, 4.0)]
