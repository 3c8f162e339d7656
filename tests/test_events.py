

def test_attribution_linear_conserves_value(spark, sf_dir):
    """Multi-touch credit must CONSERVE purchase value: the sum of
    attributed value equals the sum of value over purchases that have at
    least one in-window click (up to 6-dp rounding per credit), and every
    credited click also appears in the pair relation of the last-touch
    model."""
    from serene_spark.functions.sqlgen import SPARK as SP, epoch_us
    from serene_spark.operators.events import ATTRIBUTION_WINDOW_S
    from serene_spark.registry import load_all

    from serene_spark.catalog import register_views

    qs = load_all()
    rows = qs["events_attribution_linear"].spark(spark, sf_dir).collect()
    assert rows
    total_attr = sum(r["attributed_value"] for r in rows)

    register_views(spark, sf_dir, ("events",))
    pus = epoch_us(SP, "p.ts")
    cus = epoch_us(SP, "c.ts")
    expected = spark.sql(f"""
        SELECT SUM(value) AS v, COUNT(*) AS n FROM (
          SELECT DISTINCT p.event_id, p.value
          FROM events p JOIN events c
            ON p.event_type = 'purchase' AND c.event_type = 'click'
           AND p.user_id = c.user_id
           AND {pus} - {cus} BETWEEN 0
               AND CAST({ATTRIBUTION_WINDOW_S} AS BIGINT) * 1000000
        ) t
    """).collect()[0]
    # each credit rounds at 6 dp; error bounded by touches * 5e-7
    assert abs(total_attr - float(expected["v"])) < max(1, expected["n"]) * 1e-4
    # multi-touch credits at least as many clicks as last-touch does
    last_touch_clicks = {
        r["click_id"] for r in qs["events_attribution"].spark(spark, sf_dir).collect()
    }
    linear_clicks = {r["click_id"] for r in rows}
    assert last_touch_clicks <= linear_clicks


def test_attribution_decay_properties(spark, sf_dir):
    """Decay credits conserve value (normalized per purchase) and shift
    credit toward RECENT clicks relative to the linear model: for any
    purchase with >1 touches, the most recent click's decay credit exceeds
    its linear credit."""
    from serene_spark.registry import load_all

    qs = load_all()
    decay = {r["click_id"]: r for r in qs["events_attribution_decay"].spark(spark, sf_dir).collect()}
    linear = {r["click_id"]: r for r in qs["events_attribution_linear"].spark(spark, sf_dir).collect()}
    assert set(decay) == set(linear)  # same credited click set
    total_d = sum(r["attributed_value"] for r in decay.values())
    total_l = sum(r["attributed_value"] for r in linear.values())
    assert abs(total_d - total_l) < max(1, len(decay)) * 1e-4  # both conserve
    # the corpus has no multi-touch purchases at this SF (every attributable
    # purchase has exactly one in-window click), so decay == linear here;
    # the recency-shift property needs a constructed multi-touch stream
    import datetime

    from serene_spark.operators.events import attribution_decay_sql, attribution_linear_sql
    from serene_spark.functions.sqlgen import SPARK as SP

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, typ, minutes, value=0.0):
        return (eid, "u1", typ, t0 + datetime.timedelta(minutes=minutes), value)

    rows = [
        ev(1, "click", 0),       # old click (30 min before purchase)
        ev(2, "click", 25),      # recent click (5 min before purchase)
        ev(3, "purchase", 30, 100.0),
    ]
    spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, ts timestamp, value double"
    ).createOrReplaceTempView("events")
    try:
        dec = {r["click_id"]: r["attributed_value"]
               for r in spark.sql(attribution_decay_sql(SP)).collect()}
        lin = {r["click_id"]: r["attributed_value"]
               for r in spark.sql(attribution_linear_sql(SP)).collect()}
    finally:
        spark.catalog.dropTempView("events")
    assert lin[1] == lin[2] == 50.0            # linear: equal split
    assert dec[2] > 50.0 > dec[1]              # decay: recent click wins
    assert abs(dec[1] + dec[2] - 100.0) < 1e-4  # still conserves
    # 15-min half-life, ages 5 and 30 min: w2/w1 = 2^(25/15) ~ 3.17
    assert 3.0 < dec[2] / dec[1] < 3.4


def test_retention_days_matches_pandas(spark, sf_dir):
    from serene_spark.catalog import load_table
    from serene_spark.operators.events import RETENTION_DAYS
    from serene_spark.registry import load_all

    ev = load_table(spark, sf_dir, "events").selectExpr(
        "user_id", "CAST(unix_timestamp(ts) / 86400 AS BIGINT) AS day"
    ).toPandas().drop_duplicates()
    days_by_user = ev.groupby("user_id")["day"].apply(set)
    firsts = {u: min(d) for u, d in days_by_user.items()}
    cohorts: dict[int, dict] = {}
    for u, f in firsts.items():
        c = cohorts.setdefault(f, {"n": 0, **{n: 0 for n in RETENTION_DAYS}})
        c["n"] += 1
        for n in RETENTION_DAYS:
            if f + n in days_by_user[u]:
                c[n] += 1

    rows = {r["cohort_day"]: r
            for r in load_all()["events_retention_days"].spark(spark, sf_dir).collect()}
    assert set(rows) == set(cohorts)
    max_day = max(d for days in days_by_user for d in [max(days)])
    for day, exp in cohorts.items():
        r = rows[day]
        assert r["n_users"] == exp["n"]
        for n in RETENTION_DAYS:
            if day + n > max_day:  # right-censored: NULL, never a fake 0
                assert r[f"d{n}_retained"] is None and r[f"d{n}_rate"] is None
            else:
                assert r[f"d{n}_retained"] == exp[n], (day, n)
                assert abs(r[f"d{n}_rate"] - round(exp[n] / exp["n"], 6)) < 1e-6


def test_retention_days_right_censoring(spark):
    """A cohort near the data edge must report NULL for unobservable
    horizons, not a fake 0% (every corpus cohort here starts early, so
    censoring needs a constructed stream)."""
    import datetime

    from serene_spark.functions.sqlgen import SPARK as SP
    from serene_spark.operators.events import retention_days_sql

    t0 = datetime.datetime(2024, 3, 1)
    rows = [
        # u1: first active day 0, also active day 1 -> D1=1; D7/D14 unobservable
        (1, "u1", "view", t0, 0.0),
        (2, "u1", "view", t0 + datetime.timedelta(days=1), 0.0),
        # u2: first active day 2 (the data edge) -> everything unobservable
        (3, "u2", "view", t0 + datetime.timedelta(days=2), 0.0),
    ]
    spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, ts timestamp, value double"
    ).createOrReplaceTempView("events")
    try:
        got = {r["cohort_day"]: r
               for r in spark.sql(retention_days_sql(SP)).collect()}
    finally:
        spark.catalog.dropTempView("events")
    d0, d2 = sorted(got)
    assert got[d0]["d1_retained"] == 1 and got[d0]["d1_rate"] == 1.0
    assert got[d0]["d7_retained"] is None and got[d0]["d14_rate"] is None
    assert got[d2]["d1_retained"] is None and got[d2]["d1_rate"] is None


def test_asof_fwd_strictness_tolerance_and_direction(spark):
    """Forward as-of semantics on a hand-built cohort: strict (> ts)
    boundary, earliest-next selection, 7-day tolerance NULLing, and
    probe users with no target passing through with NULLs."""
    import datetime
    import os
    import tempfile

    import pandas as pd

    from serene_spark.operators.events import asof_fwd_click_purchase

    t0 = datetime.datetime(2020, 6, 1, 12, 0, 0)
    rows = [
        # u1: purchase at the SAME instant (excluded, strict) + one 2 days out
        (1, t0, 1, "click", 1.0, "{}"),
        (10, t0, 1, "purchase", 5.0, "{}"),
        (11, t0 + datetime.timedelta(days=2), 1, "purchase", 5.0, "{}"),
        # u2: two purchases, earliest must win; equal-ts pair tie-breaks on id
        (2, t0, 2, "click", 1.0, "{}"),
        (21, t0 + datetime.timedelta(days=1), 2, "purchase", 5.0, "{}"),
        (20, t0 + datetime.timedelta(days=1), 2, "purchase", 5.0, "{}"),
        (22, t0 + datetime.timedelta(days=3), 2, "purchase", 5.0, "{}"),
        # u3: next purchase 8 days out (> 7-day tolerance) -> NULL
        (3, t0, 3, "click", 1.0, "{}"),
        (30, t0 + datetime.timedelta(days=8), 3, "purchase", 5.0, "{}"),
        # u4: no purchases at all
        (4, t0, 4, "click", 1.0, "{}"),
        (40, t0 + datetime.timedelta(days=1), 4, "view", 0.0, "{}"),
    ]
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(ev).write.parquet(os.path.join(d, "events.parquet"))
        got = {
            r["event_id"]: r for r in asof_fwd_click_purchase(spark, d).collect()
        }
    assert set(got) == {1, 2, 3, 4}  # exactly the probes, one row each
    assert got[1]["next_purchase_id"] == 11  # same-instant target skipped
    assert got[2]["next_purchase_id"] == 20  # earliest ts, then min id
    assert got[3]["next_purchase_id"] is None  # beyond tolerance
    assert got[3]["next_purchase_ts"] is None
    assert got[4]["next_purchase_id"] is None  # no targets


def test_asof_fwd_corpus_invariants(spark):
    """On the real corpus: every match is strictly in the future, within
    the horizon, and is the EARLIEST qualifying purchase (pandas recheck);
    the corpus must actually exercise both match and no-match paths."""
    import pandas as pd

    from serene_spark.catalog import load_table
    from serene_spark.operators.events import (
        ASOF_FWD_PROBE,
        ASOF_FWD_TARGET,
        ASOF_FWD_TOLERANCE_DAYS,
        asof_fwd_click_purchase,
    )

    sf = "/root/testdata/sf0.001"
    out = asof_fwd_click_purchase(spark, sf).toPandas()
    ev = load_table(spark, sf, "events").toPandas()
    probes = ev[ev["event_type"] == ASOF_FWD_PROBE]
    targets = ev[ev["event_type"] == ASOF_FWD_TARGET]
    assert len(out) == len(probes)

    horizon = pd.Timedelta(days=ASOF_FWD_TOLERANCE_DAYS)
    t_by_user = dict(tuple(targets.groupby("user_id")))
    ts = dict(zip(probes["event_id"], probes["ts"]))
    n_matched = n_null = 0
    for _, r in out.iterrows():
        t = ts[r["event_id"]]
        cands = t_by_user.get(r["user_id"])
        exp = None
        if cands is not None:
            fut = cands[(cands["ts"] > t) & (cands["ts"] - t <= horizon)]
            if len(fut):
                first_ts = fut["ts"].min()
                exp = int(fut[fut["ts"] == first_ts]["event_id"].min())
        if exp is None:
            n_null += 1
            assert pd.isna(r["next_purchase_id"])
        else:
            n_matched += 1
            assert int(r["next_purchase_id"]) == exp
    assert n_matched > 0 and n_null > 0


def test_session_routes_pandas_recheck(spark):
    """Entry/exit routes + bounce accounting recomputed independently by
    replaying the 30-min session rule in pandas."""
    import pandas as pd

    from serene_spark.catalog import load_table
    from serene_spark.operators.events import SESSION_GAP_US
    from serene_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    out = load_all()["session_entry_exit"].spark(spark, sf).toPandas()
    ev = (
        load_table(spark, sf, "events").toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    ev["us"] = ev["ts"].astype("int64") // 1000
    routes: dict[tuple, list] = {}
    n_total = n_bounce = 0
    for _, g in ev.groupby("user_id"):
        gaps = g["us"].diff()
        new_s = (gaps > SESSION_GAP_US).fillna(False).cumsum()
        for _, s in g.groupby(new_s):
            entry = s.iloc[0]["event_type"]
            exit_ = s.iloc[-1]["event_type"]
            span = (s["us"].max() - s["us"].min()) / 1e6
            routes.setdefault((entry, exit_), []).append((len(s), span))
            n_total += 1
            n_bounce += int(len(s) == 1)
    assert len(out) == len(routes)
    for _, r in out.iterrows():
        sessions = routes[(r["entry_type"], r["exit_type"])]
        assert r["n_sessions"] == len(sessions)
        assert r["n_bounces"] == sum(1 for n, _ in sessions if n == 1)
        assert abs(r["avg_events"] - round(sum(n for n, _ in sessions) / len(sessions), 6)) < 1e-6
        assert abs(r["avg_span_sec"] - round(sum(s for _, s in sessions) / len(sessions), 6)) < 1e-5
        assert abs(r["corpus_bounce_rate"] - round(n_bounce / n_total, 6)) < 1e-9
    # session accounting closes: route sessions sum to the sessionizer's total
    tot_sessions = (
        load_all()["events_sessionize"].spark(spark, sf).toPandas()["n_sessions"].sum()
    )
    assert int(out["n_sessions"].sum()) == int(tot_sessions)
