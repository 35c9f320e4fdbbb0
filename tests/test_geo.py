"""Geospatial operators (terasort_spark/operators/geo.py). Oracle
equality (vs the brute-force theta join) runs in tests/test_oracle.py;
here: the cell-size correctness bound, plan shape, and metric sanity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from terasort_spark.operators.geo import (
    CELL_LAT,
    CELL_LON,
    EARTH_KM,
    RADIUS_KM,
    _lat,
    _lon,
)
from terasort_spark.registry import queries

_Q = queries()


def _hav(lat1, lon1, lat2, lon2):
    dlat = math.radians(lat2 - lat1)
    dlon = math.radians(lon2 - lon1)
    a = (
        math.sin(dlat / 2) ** 2
        + math.cos(math.radians(lat1))
        * math.cos(math.radians(lat2))
        * math.sin(dlon / 2) ** 2
    )
    return 2 * EARTH_KM * math.asin(math.sqrt(a))


def test_cell_dimensions_dominate_radius():
    """The correctness precondition of the 3x3 neighbor expansion: one
    grid cell must span >= RADIUS_KM in BOTH dimensions everywhere in
    the constrained lat band, so points within R are never more than
    one cell index apart."""
    # worst case latitude span: anywhere (meridians don't converge)
    assert CELL_LAT * 111.19 >= RADIUS_KM
    # worst case longitude span: at the band edge |lat| = 60
    min_lon_km = CELL_LON * 111.19 * math.cos(math.radians(60.0))
    assert min_lon_km >= RADIUS_KM
    # and synthesized coordinates stay inside the band
    for k in range(1, 5000):
        assert -60 <= _lat(k) < 60
        assert -170 <= _lon(k) < 170


def test_grid_join_matches_local_brute_force(spark, sf_dir):
    """Full local replay: the grid join's pair set must equal the
    brute-force O(S*C) scan in Python (independent of the SQL oracle,
    which shares the haversine formula text with the Spark side)."""
    rows = _Q["join_spatial_grid"](spark, sf_dir).collect()
    got = {(r["s_suppkey"], r["c_custkey"]) for r in rows}
    s_keys = [
        r[0]
        for r in spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .select("s_suppkey")
        .collect()
    ]
    c_keys = [
        r[0]
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey")
        .collect()
    ]
    expect = {
        (s, c)
        for s in s_keys
        for c in c_keys
        if _hav(_lat(s), _lon(s), _lat(c), _lon(c)) < RADIUS_KM
    }
    assert got == expect
    assert expect  # non-vacuous at every SF


def test_grid_join_plan_is_equi_join_no_nested_loop(spark, sf_dir):
    """The whole point of the grid: a hashable equi-key. The plan must
    contain a BroadcastHashJoin on cell and no nested-loop/cartesian
    pair scan."""
    plan = (
        _Q["join_spatial_grid"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_fn_geo_metric_sanity(spark, sf_dir):
    """Distances in [0, half circumference]; bearings in (-180, 180];
    the haversine to one's own position is 0."""
    rows = _Q["fn_geo"](spark, sf_dir).collect()
    assert rows
    half = math.pi * EARTH_KM
    for r in rows:
        assert 0 <= r["dist_km"] <= half + 1
        assert -180.0 <= r["bearing_deg"] <= 180.0
    df = spark.createDataFrame([(10.0, 20.0)], "lat double, lon double")
    from terasort_spark.operators.geo import _haversine

    z = df.select(
        _haversine(F.col("lat"), F.col("lon"), F.col("lat"), F.col("lon")).alias(
            "d"
        )
    ).first()["d"]
    assert z == 0.0
