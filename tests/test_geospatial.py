"""Geospatial family (operators/geospatial.py).

Oracle parity (Spark == DuckDB) runs in the driver gate; these pin the
semantics against an independent numpy haversine on the raw parquet, plus
the load-bearing plan property (the grid candidate pass is an equi-join,
never a cartesian product over the point set).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from serene_spark.registry import load_all

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"

R_EARTH = 6371.0088


def _coords(keys: np.ndarray, p_lat: int, m_lat: int, p_lon: int, m_lon: int):
    k = keys.astype(np.int64)
    lat = (-60000 + (k * k % p_lat) * m_lat % 120000) / 1000.0
    lon = (-180000 + (k * k % p_lon) * m_lon % 360000) / 1000.0
    return lat, lon


def _cust_coords(keys):
    return _coords(keys, 999983, 7919, 999979, 104729)


def _haversine(lat1, lon1, lat2, lon2):
    la1, lo1, la2, lo2 = map(np.radians, (lat1, lon1, lat2, lon2))
    h = np.sin((la2 - la1) / 2) ** 2 + np.cos(la1) * np.cos(la2) * np.sin((lo2 - lo1) / 2) ** 2
    return 2 * R_EARTH * np.arcsin(np.sqrt(h))


def test_nation_bbox_matches_numpy(spark):
    out = load_all()["geo_nation_bbox"].spark(spark, SF001).toPandas()
    cust = pd.read_parquet(f"{SF001}/customer.parquet")
    nation = pd.read_parquet(f"{SF001}/nation.parquet")
    lat, lon = _cust_coords(cust["c_custkey"].to_numpy())
    cust = cust.assign(lat=lat, lon=lon).merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    )
    ref = cust.groupby("n_name").agg(
        n=("lat", "size"), lat_min=("lat", "min"), lat_max=("lat", "max"),
        lat_centroid=("lat", "mean"), lon_centroid=("lon", "mean"),
    )
    assert len(out) == len(ref)
    for _, r in out.iterrows():
        e = ref.loc[r["nation"]]
        assert r["n_customers"] == e["n"]
        assert abs(r["lat_min"] - e["lat_min"]) < 1e-6
        assert abs(r["lat_centroid"] - e["lat_centroid"]) < 1e-6
        assert abs(r["lon_centroid"] - e["lon_centroid"]) < 1e-6


def test_nearest_supplier_matches_numpy_brute_force(spark):
    out = load_all()["geo_nearest_supplier"].spark(spark, SF001).toPandas()
    cust = pd.read_parquet(f"{SF001}/customer.parquet")
    supp = pd.read_parquet(f"{SF001}/supplier.parquet")
    clat, clon = _cust_coords(cust["c_custkey"].to_numpy())
    slat, slon = _coords(supp["s_suppkey"].to_numpy(), 999961, 6101, 999959, 95789)
    d = _haversine(clat[:, None], clon[:, None], slat[None, :], slon[None, :])
    d4 = np.round(d, 4)
    # deterministic winner: min rounded distance, then min suppkey
    skeys = supp["s_suppkey"].to_numpy()
    order = np.argsort(skeys)
    d4 = d4[:, order]
    best = np.argmin(d4, axis=1)  # argmin takes the FIRST minimum -> min suppkey
    expect = dict(zip(cust["c_custkey"], zip(skeys[order][best], d4[np.arange(len(cust)), best])))
    assert len(out) == len(cust)
    for _, r in out.iterrows():
        sk, dk = expect[r["c_custkey"]]
        assert r["nearest_suppkey"] == sk
        assert abs(r["dist_km"] - dk) < 1e-3


def test_grid_pairs_equals_brute_force(spark):
    out = load_all()["geo_grid_pairs"].spark(spark, SF01).toPandas()
    cust = pd.read_parquet(f"{SF01}/customer.parquet")
    lat, lon = _cust_coords(cust["c_custkey"].to_numpy())
    d = np.round(_haversine(lat[:, None], lon[:, None], lat[None, :], lon[None, :]), 4)
    keys = cust["c_custkey"].to_numpy()
    ii, jj = np.where((d <= 25.0) & (keys[:, None] < keys[None, :]))
    expect = {(int(min(keys[i], keys[j])), int(max(keys[i], keys[j]))) for i, j in zip(ii, jj)}
    got = {(int(a), int(b)) for a, b in zip(out["custkey_a"], out["custkey_b"])}
    assert expect, "fixture degenerated: no pairs within radius at sf0.01"
    assert got == expect


def test_grid_pairs_plan_has_no_point_cartesian(spark):
    from serene_spark.operators.geospatial import _grid_pairs_sql
    from serene_spark.functions.sqlgen import SPARK
    from serene_spark.catalog import register_views

    register_views(spark, SF001, ("customer",))
    plan = spark.sql(_grid_pairs_sql(SPARK))._jdf.queryExecution().executedPlan().toString()
    # the 9-row offsets relation may broadcast, but the point-set self-join
    # must be an equi-join on (cx, cy) -- never a cartesian product
    assert "CartesianProduct" not in plan
