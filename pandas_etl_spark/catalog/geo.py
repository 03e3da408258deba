"""Geospatial catalog queries (grid density, blocked radius join,
broadcast kNN join) over deterministic synthetic coordinates.

The TPC-H-ish fixtures carry no geo columns, so customers/suppliers get
coordinates derived from their keys via the repo's portable md5-bucket
hash (operators/sampling.py): both engines compute bit-identical
doubles, lat uniform in [-60, 60], lon in [-180, 180). The haversine
formula is ONE shared SQL text (operators/geo.HAVERSINE_SQL) evaluated
by Spark and DuckDB alike, so the only cross-engine float risk is
libm's last-ulp sin/cos drift — orders of magnitude below the round-6
compare contract (and the 3-decimal output rounding used here).

Scale shapes (see operators/geo.py): density = one cell-keyed shuffle;
radius join = 3x3-neighborhood blocking equi-join (the 9x explode rides
on the SMALL side), never an all-pairs product — the brute-force cross
join lives only in the DuckDB oracles; kNN = broadcast dim + per-key
top-k window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_etl_spark.catalog.registry import query
from pandas_etl_spark.operators.geo import (
    haversine_sql,
    knn_join,
    radius_join,
    synthetic_coord_sql,
    with_synthetic_coords,
)
from pandas_etl_spark.sources import load_table
from pandas_etl_spark.sources.io import ensure_parallelism

_CLAT, _CLON = synthetic_coord_sql("c_custkey", "duckdb")
_SLAT, _SLON = synthetic_coord_sql("s_suppkey", "duckdb")

_RADIUS_KM = 500.0


@query(
    "geo_cell_density",
    oracle=f"""
    SELECT CAST(floor({_CLAT} / 10.0) AS BIGINT) AS cell_y,
           CAST(floor({_CLON} / 10.0) AS BIGINT) AS cell_x,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(c_acctbal), 2) AS total_acctbal
    FROM customer
    GROUP BY 1, 2
    """,
)
def q_geo_cell_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer density + balance per 10-degree grid cell. Single
    shuffle keyed on the cell id; the coordinate derivation and floor
    are codegen'd expressions on the scan."""
    c = with_synthetic_coords(
        ensure_parallelism(load_table(spark, sf_dir, "customer")), "c_custkey"
    )
    return (
        c.groupBy(
            F.floor(F.col("lat") / 10.0).cast("bigint").alias("cell_y"),
            F.floor(F.col("lon") / 10.0).cast("bigint").alias("cell_x"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


_HAV_ORACLE = haversine_sql("s.slat", "s.slon", "c.clat", "c.clon")


@query(
    "spatial_radius_join",
    oracle=f"""
    WITH s AS (
        SELECT s_suppkey, {_SLAT} AS slat, {_SLON} AS slon FROM supplier
    ), c AS (
        SELECT c_custkey, {_CLAT} AS clat, {_CLON} AS clon FROM customer
    )
    SELECT s.s_suppkey, c.c_custkey,
           round({_HAV_ORACLE}, 3) AS dist_km
    FROM s, c
    WHERE {_HAV_ORACLE} <= {_RADIUS_KM}
    """,
)
def q_spatial_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(supplier, customer) pairs within 500 km. Spark plan: grid-cell
    blocking — suppliers (the small side) explode into their 3x3 cell
    neighborhood, customers map to one cell each, one equi-join shuffle
    on (cy, cx), exact haversine filter after. The oracle is the
    all-pairs cross join the blocking avoids (O(N*M) is fine at oracle
    SF, never run by the Spark side)."""
    s = with_synthetic_coords(
        load_table(spark, sf_dir, "supplier").select("s_suppkey"),
        "s_suppkey",
        "slat",
        "slon",
    )
    c = with_synthetic_coords(
        ensure_parallelism(load_table(spark, sf_dir, "customer")).select(
            "c_custkey"
        ),
        "c_custkey",
        "clat",
        "clon",
    )
    out = radius_join(
        s,
        c,
        _RADIUS_KM,
        left_coords=("slat", "slon"),
        right_coords=("clat", "clon"),
    )
    return out.select(
        "s_suppkey", "c_custkey", F.round("dist_km", 3).alias("dist_km")
    )


_KNN_HAV = haversine_sql("c.clat", "c.clon", "s.slat", "s.slon")


@query(
    "nearest_suppliers_knn",
    oracle=f"""
    WITH s AS (
        SELECT s_suppkey, {_SLAT} AS slat, {_SLON} AS slon FROM supplier
    ), c AS (
        SELECT c_custkey, {_CLAT} AS clat, {_CLON} AS clon FROM customer
    ), d AS (
        SELECT c.c_custkey, s.s_suppkey, {_KNN_HAV} AS dist,
               row_number() OVER (PARTITION BY c.c_custkey
                                  ORDER BY {_KNN_HAV} ASC, s.s_suppkey ASC)
                   AS nn_rank
        FROM c, s
    )
    SELECT c_custkey, s_suppkey, CAST(nn_rank AS INTEGER) AS nn_rank,
           round(dist, 3) AS dist_km
    FROM d WHERE nn_rank <= 3
    """,
)
def q_nearest_suppliers_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 nearest suppliers per customer: broadcast the supplier dim
    (the fact side never shuffles for the join), per-customer top-3
    window with rank-limit pushdown, suppkey tie-break."""
    s = with_synthetic_coords(
        load_table(spark, sf_dir, "supplier").select("s_suppkey"),
        "s_suppkey",
        "slat",
        "slon",
    )
    c = with_synthetic_coords(
        ensure_parallelism(load_table(spark, sf_dir, "customer")).select(
            "c_custkey"
        ),
        "c_custkey",
        "clat",
        "clon",
    )
    out = knn_join(
        c,
        s,
        3,
        fact_key="c_custkey",
        dim_key="s_suppkey",
        fact_coords=("clat", "clon"),
        dim_coords=("slat", "slon"),
    )
    return out.select(
        "c_custkey",
        "s_suppkey",
        F.col("nn_rank").cast("int").alias("nn_rank"),
        F.round("dist_km", 3).alias("dist_km"),
    )


_EPS_KM = 300.0
_PTS_CTE = f"""
    pts AS (
        SELECT c_custkey AS id, {_CLAT} AS lat, {_CLON} AS lon FROM customer
    )
"""


@query(
    "spatial_cluster_eps",
    oracle=f"""
    WITH RECURSIVE
    {_PTS_CTE},
    e AS (
        SELECT a.id AS src, b.id AS dst
        FROM pts a, pts b
        WHERE a.id <> b.id
          AND {haversine_sql("a.lat", "a.lon", "b.lat", "b.lon")} <= {_EPS_KM}
    ),
    reach AS (
        SELECT id, id AS r FROM pts
        UNION
        SELECT e.src AS id, reach.r FROM e JOIN reach ON reach.id = e.dst
    ),
    lab AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
    SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
    FROM lab GROUP BY cluster_id
    """,
)
def q_spatial_cluster_eps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density clusters of customers: two points connect when within
    300 km, clusters are the connected components of that graph
    (DBSCAN with minPts=1 — eps-connectivity). Spark plan: the edge
    list comes from the grid-blocked ``radius_join`` (one cell-keyed
    equi-join shuffle, never all-pairs), then the O(log n)-round
    star-contraction CC shared with the dedup family
    (functions/dedup.py connected_components) labels every customer
    with its component minimum; singletons label themselves. The
    all-pairs edge enumeration and transitive-closure recursion live
    only in the DuckDB oracle."""
    from pandas_etl_spark.functions import dedup as dd

    c = with_synthetic_coords(
        ensure_parallelism(load_table(spark, sf_dir, "customer")).select(
            F.col("c_custkey")
        ),
        "c_custkey",
    )
    a = c.select(
        F.col("c_custkey").alias("id_a"),
        F.col("lat").alias("alat"),
        F.col("lon").alias("alon"),
    )
    b = c.select(
        F.col("c_custkey").alias("id_b"),
        F.col("lat").alias("blat"),
        F.col("lon").alias("blon"),
    )
    pairs = radius_join(
        a,
        b,
        _EPS_KM,
        left_coords=("alat", "alon"),
        right_coords=("blat", "blon"),
    ).filter(F.col("id_a") < F.col("id_b"))
    labeled = dd.connected_components(
        pairs.select("id_a", "id_b"),
        nodes=c.select(F.col("c_custkey").alias("id")),
        id_col="id",
    )
    return labeled.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )


def _pip_cases(engine: str) -> list[str]:
    from pandas_etl_spark.operators.geo import (
        DEMO_POLYGONS,
        point_in_polygon_sql,
    )

    lat, lon = (
        ("lat", "lon")
        if engine == "spark"
        else (_CLAT, _CLON)
    )
    return [
        f"CAST({point_in_polygon_sql(poly, lon, lat)} AS INT) AS in_{name}"
        for name, poly in DEMO_POLYGONS.items()
    ]


@query(
    "point_in_polygon_counts",
    oracle=f"""
    WITH flags AS (
        SELECT c_acctbal, {", ".join(_pip_cases("duckdb"))}
        FROM customer
    )
    SELECT 'atlantic_box' AS region, CAST(sum(in_atlantic_box) AS BIGINT) AS n_inside,
           round(sum(in_atlantic_box * c_acctbal), 2) AS total_acctbal
    FROM flags
    UNION ALL
    SELECT 'indo_pacific_tri', CAST(sum(in_indo_pacific_tri) AS BIGINT),
           round(sum(in_indo_pacific_tri * c_acctbal), 2)
    FROM flags
    UNION ALL
    SELECT 'europe_pent', CAST(sum(in_europe_pent) AS BIGINT),
           round(sum(in_europe_pent * c_acctbal), 2)
    FROM flags
    """,
)
def q_point_in_polygon_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geofence containment rollup: even-odd ray casting compiled to ONE
    shared SQL expression per polygon (operators/geo.point_in_polygon_sql
    — plain CASE/arithmetic over vertex literals, identical text both
    engines). Zero joins: all three fences evaluate inside the scan
    projection of a single customer pass; the only shuffle is the final
    3-row rollup. The natural 100 TB shape for tens-of-vertices fences;
    thousands of polygons would switch to the grid-cell blocking of
    radius_join with a polygon bounding-box index."""
    c = with_synthetic_coords(
        ensure_parallelism(load_table(spark, sf_dir, "customer")), "c_custkey"
    )
    flags = c.select("c_acctbal", *[F.expr(e) for e in _pip_cases("spark")])
    from pandas_etl_spark.operators.geo import DEMO_POLYGONS

    # ONE aggregate produces all 2*|polygons| measures in a single
    # customer pass (ADVICE r5: three separate .agg() unions scanned the
    # table three times); the 1-row result then unpivots to one row per
    # fence with stack() — driver-free, constant-size reshape.
    measures = []
    for name in DEMO_POLYGONS:
        measures.append(F.sum(f"in_{name}").cast("bigint").alias(f"n_{name}"))
        measures.append(
            F.round(F.sum(F.col(f"in_{name}") * F.col("c_acctbal")), 2).alias(
                f"t_{name}"
            )
        )
    one = flags.agg(*measures)
    stack_args = ", ".join(
        f"'{name}', n_{name}, t_{name}" for name in DEMO_POLYGONS
    )
    return one.select(
        F.expr(
            f"stack({len(DEMO_POLYGONS)}, {stack_args}) "
            "AS (region, n_inside, total_acctbal)"
        )
    )


_ELAT, _ELON = synthetic_coord_sql("event_id", "duckdb")
_TRAJ_HAV = haversine_sql("plat", "plon", "lat", "lon")


@query(
    "trajectory_length_daily",
    oracle=f"""
    WITH pts AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               ts, event_id, {_ELAT} AS lat, {_ELON} AS lon
        FROM events
    ),
    seq AS (
        SELECT user_id, day, lat, lon,
               lag(lat) OVER w AS plat, lag(lon) OVER w AS plon
        FROM pts
        WINDOW w AS (PARTITION BY user_id, day ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(day AS VARCHAR) AS day,
           CAST(count(*) AS BIGINT) AS n_points,
           round(sum(CASE WHEN plat IS NOT NULL
                          THEN {_TRAJ_HAV} END), 6) AS km_travelled
    FROM seq GROUP BY user_id, day
    HAVING count(*) > 1
    """,
)
def q_trajectory_length_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily trajectory length per user: great-circle distance summed
    over consecutive event positions (deterministic md5-derived
    coordinates stand in for device pings) — the movement-analytics
    staple (delivery routes, fleet telemetry, mobility studies). ONE
    (user, day) shuffle shared by the lag window and the aggregate;
    the haversine text is shared verbatim with the oracle."""
    from pyspark.sql import Window as W

    lat_sql, lon_sql = synthetic_coord_sql("event_id", "spark")
    ev = ensure_parallelism(load_table(spark, sf_dir, "events")).select(
        "user_id",
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        "ts",
        "event_id",
        F.expr(lat_sql).alias("lat"),
        F.expr(lon_sql).alias("lon"),
    )
    w = W.partitionBy("user_id", "day").orderBy("ts", "event_id")
    seq = ev.withColumn("plat", F.lag("lat").over(w)).withColumn(
        "plon", F.lag("lon").over(w)
    )
    return (
        seq.groupBy("user_id", F.col("day").cast("string").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.round(
                F.sum(
                    F.when(
                        F.col("plat").isNotNull(), F.expr(_TRAJ_HAV)
                    )
                ),
                6,
            ).alias("km_travelled"),
        )
        .filter(F.col("n_points") > 1)
    )
