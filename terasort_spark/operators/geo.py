"""Geospatial operators: haversine scalar geometry and a grid-bucketed
radius join — the two building blocks of location analytics at scale
(geofencing, nearest-facility, spatial enrichment).

Coordinates are synthesized deterministically from TPC-H keys (the
corpus has no native lat/lon): integer modular arithmetic → identical
doubles on both engines. Latitudes stay inside ±60° and longitudes
inside ±170° so a fixed 2°×4° grid cell is ≥ the search radius in km
everywhere (no dateline wrap, no polar cell shrink) — the precondition
the radius-join's neighbor-cell expansion relies on, stated here
instead of discovered in production.

Scale design: the naive radius join is a BroadcastNestedLoopJoin over
|A|×|B| haversine evaluations. The grid rewrite snaps every point to a
cell sized ≥ R, explodes the SMALL side to its 3×3 neighbor cells, and
equi-joins on the cell id — Catalyst gets a hashable key, the distance
formula runs only on co-located candidates, and the plan is asserted
nested-loop-free (tests/test_geo.py). This is how Sedona/PostGIS-style
engines execute distance joins when no spatial index exists.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from terasort_spark.catalog import table
from terasort_spark.operators._util import rnd
from terasort_spark.registry import register

EARTH_KM = 6371.0
RADIUS_KM = 200.0
# 2° lat ≈ 222 km ≥ R; 4° lon ≥ 4·111·cos(60°) = 222 km ≥ R at |lat|≤60
CELL_LAT, CELL_LON = 2, 4

# lat ∈ [-60, 59.9], lon ∈ [-170, 169.9], one decimal place
_LAT_SQL = "(({k} * 7919) % 1200) / 10.0 - 60.0"
_LON_SQL = "(({k} * 104729) % 3400) / 10.0 - 170.0"


def _lat(k):
    return ((k * 7919) % 1200) / 10.0 - 60.0


def _lon(k):
    return ((k * 104729) % 3400) / 10.0 - 170.0


def _haversine(lat1, lon1, lat2, lon2):
    """Great-circle distance in km; radians/sin/cos/asin are the same
    libm calls on both engines, so distances are bit-identical."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlon / 2)
        * F.sin(dlon / 2)
    )
    return 2 * EARTH_KM * F.asin(F.sqrt(a))


def _haversine_sql(lat1, lon1, lat2, lon2):
    return f"""2 * {EARTH_KM} * asin(sqrt(
        sin(radians(({lat2}) - ({lat1})) / 2) * sin(radians(({lat2}) - ({lat1})) / 2)
        + cos(radians({lat1})) * cos(radians({lat2}))
          * sin(radians(({lon2}) - ({lon1})) / 2)
          * sin(radians(({lon2}) - ({lon1})) / 2)))"""


@register(
    "fn_geo",
    oracle=f"""
SELECT c_custkey,
       {_LAT_SQL.format(k='c_custkey')} AS lat,
       {_LON_SQL.format(k='c_custkey')} AS lon,
       floor(({_haversine_sql(_LAT_SQL.format(k='c_custkey'),
                              _LON_SQL.format(k='c_custkey'),
                              '48.8566', '2.3522')}) * 10000 + 0.5) / 10000
           AS dist_km,
       floor(degrees(atan2(
           sin(radians(2.3522 - ({_LON_SQL.format(k='c_custkey')}))) *
               cos(radians(48.8566)),
           cos(radians({_LAT_SQL.format(k='c_custkey')})) * sin(radians(48.8566))
             - sin(radians({_LAT_SQL.format(k='c_custkey')})) *
               cos(radians(48.8566)) *
               cos(radians(2.3522 - ({_LON_SQL.format(k='c_custkey')})))
       )) * 10000 + 0.5) / 10000 AS bearing_deg
FROM customer WHERE c_custkey <= 500
""",
)
def fn_geo(spark, sf_dir):
    """Scalar geodesy: haversine distance and initial bearing from each
    customer's synthesized position to a fixed reference point — pure
    codegen trig, evaluated in the scan stage; the shape of any
    geofence/DISTANCE() predicate before a spatial join enters."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    lat, lon = _lat(F.col("c_custkey")), _lon(F.col("c_custkey"))
    rlat, rlon = F.lit(48.8566), F.lit(2.3522)
    y = F.sin(F.radians(rlon - lon)) * F.cos(F.radians(rlat))
    x = F.cos(F.radians(lat)) * F.sin(F.radians(rlat)) - F.sin(
        F.radians(lat)
    ) * F.cos(F.radians(rlat)) * F.cos(F.radians(rlon - lon))
    return c.select(
        "c_custkey",
        lat.alias("lat"),
        lon.alias("lon"),
        rnd(_haversine(lat, lon, rlat, rlon), "dist_km"),
        rnd(F.degrees(F.atan2(y, x)), "bearing_deg"),
    )


@register(
    "join_spatial_grid",
    oracle=f"""
SELECT s.s_suppkey AS s_suppkey, c.c_custkey AS c_custkey,
       floor(({_haversine_sql(_LAT_SQL.format(k='s.s_suppkey'),
                              _LON_SQL.format(k='s.s_suppkey'),
                              _LAT_SQL.format(k='c.c_custkey'),
                              _LON_SQL.format(k='c.c_custkey'))})
             * 10000 + 0.5) / 10000 AS dist_km
FROM supplier s JOIN customer c
  ON ({_haversine_sql(_LAT_SQL.format(k='s.s_suppkey'),
                      _LON_SQL.format(k='s.s_suppkey'),
                      _LAT_SQL.format(k='c.c_custkey'),
                      _LON_SQL.format(k='c.c_custkey'))}) < {RADIUS_KM}
""",
)
def join_spatial_grid(spark, sf_dir):
    """Radius join (all customers within 200 km of each supplier) via
    grid bucketing: snap points to 2°×4° cells (each ≥ R km at the
    constrained latitudes), explode the SMALL supplier side into its
    3×3 neighbor cells, broadcast-equi-join on the cell id, then apply
    the exact haversine as a residual filter.

    The oracle is the brute-force theta join — the grid must return
    IDENTICAL pairs (the cell size bound is a correctness proof, not a
    heuristic): any pair within R differs by < 1 cell index in each
    dimension, so it meets in the neighbor expansion. Cost:
    9·|small| join keys vs |A|×|B| distance evaluations; candidates
    per cell are bounded by local density, the residual is codegen.
    At 100 TB the small side is whichever input is facility-sized; two
    large sides → shuffle equi-join on cell id with AQE skew split on
    dense cells (cities), same plan family as join_salted."""
    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        _lat(F.col("s_suppkey")).alias("s_lat"),
        _lon(F.col("s_suppkey")).alias("s_lon"),
    )
    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        _lat(F.col("c_custkey")).alias("c_lat"),
        _lon(F.col("c_custkey")).alias("c_lon"),
    )
    cell = lambda lat, lon: (  # noqa: E731
        F.floor(lat / CELL_LAT) * 1000 + F.floor(lon / CELL_LON)
    )
    c = c.withColumn("cell", cell(F.col("c_lat"), F.col("c_lon")))
    # neighbor expansion on the small side: 9 cells per supplier
    offs = (-1001, -1000, -999, -1, 0, 1, 999, 1000, 1001)
    s9 = s.select(
        "*", F.explode(F.array(*[F.lit(o) for o in offs])).alias("off")
    ).withColumn(
        "cell", cell(F.col("s_lat"), F.col("s_lon")) + F.col("off")
    )
    dist = _haversine(
        F.col("s_lat"), F.col("s_lon"), F.col("c_lat"), F.col("c_lon")
    )
    return (
        c.join(F.broadcast(s9), "cell")
        .filter(dist < RADIUS_KM)
        .select("s_suppkey", "c_custkey", rnd(dist, "dist_km"))
    )
