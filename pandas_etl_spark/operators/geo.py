"""Geospatial join/aggregation primitives (SURVEY §2 extension family).

The reference's pandas users do geo work with driver-side libraries
(geopy-style haversine loops); at 100 TB the shapes that matter are

- **grid-cell density aggregation** — one shuffle keyed on the cell id;
- **radius join** — pair points within R km WITHOUT the all-pairs cross
  product, via grid-cell blocking: any pair within R lands in the same
  or an adjacent cell when the cell edge is at least R in both axes, so
  one side maps to its cell, the other explodes to its 3x3 neighborhood
  and the join is a plain equi-join on the cell id (candidate volume
  O(density^2 * cells), never O(N*M)), followed by the exact haversine
  filter;
- **k-nearest join against a broadcastable dimension** — distances via
  a broadcast hash join (the dim never shuffles the fact side), then a
  per-key top-k window.

Everything is Catalyst expressions (sin/cos/asin/sqrt/radians are JVM
intrinsics inside whole-stage codegen) — no UDFs, no driver loops.

Cross-engine determinism: the haversine formula is kept as ONE SQL text
template (`HAVERSINE_SQL`) used verbatim by both the Spark side
(``F.expr``) and the DuckDB oracles, so both engines evaluate the same
expression tree over the same doubles. The synthetic coordinate
derivation uses the repo's portable md5-bucket hash
(operators/sampling.py) — exact in both engines (32-bit int divided by
2^32 is an exact double).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0
# Conservative km-per-degree constants: latitude degrees are ~110.574 km
# everywhere; longitude degrees are ~111.320*cos(lat) km. Using the
# SMALLER divisor (110.0) makes cells slightly larger than R — blocking
# stays correct (never misses a pair), only candidate volume grows ~1%.
_KM_PER_LAT_DEG = 110.0
_KM_PER_LON_DEG_EQUATOR = 111.0

# One formula text, two engines. `{lat1}` etc. are SQL sub-expressions.
HAVERSINE_SQL = (
    "2.0 * {r} * asin(sqrt("
    "pow(sin(radians(({lat2}) - ({lat1})) / 2), 2)"
    " + cos(radians({lat1})) * cos(radians({lat2}))"
    " * pow(sin(radians(({lon2}) - ({lon1})) / 2), 2)"
    "))"
)


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """The shared haversine SQL text (km) over four column names /
    sub-expressions — valid Spark SQL and DuckDB SQL alike."""
    return HAVERSINE_SQL.format(
        r=EARTH_RADIUS_KM, lat1=lat1, lon1=lon1, lat2=lat2, lon2=lon2
    )


def haversine_km(lat1: str, lon1: str, lat2: str, lon2: str) -> Column:
    return F.expr(haversine_sql(lat1, lon1, lat2, lon2))


def synthetic_coord_sql(key: str, engine: str) -> tuple[str, str]:
    """(lat_sql, lon_sql) deriving deterministic coordinates from a key
    column — for fixtures that carry no geo columns. lat is uniform in
    [-60, 60] (so cos(lat) >= 0.5 and longitude-cell blocking never
    degenerates toward the poles), lon in [-180, 180). The md5-bucket
    hash is the repo's portable sampling hash: identical doubles on
    Spark (`conv(substring(md5(..),1,8),16,10)`) and DuckDB
    (`CAST('0x'||substring(md5(..),1,8) AS BIGINT)`)."""
    # NB: divide by an explicit DOUBLE — a bare `4294967296.0` literal is
    # DECIMAL in both engines' SQL dialects, and bigint/decimal division
    # yields engine-specific decimal scales. bigint→double division by a
    # power of two is IEEE-exact in both.
    if engine == "spark":
        def u(salt: str) -> str:
            return (
                f"(cast(conv(substring(md5(concat(cast({key} as string),"
                f" '{salt}')), 1, 8), 16, 10) as bigint)"
                f" / cast(4294967296 as double))"
            )
    elif engine == "duckdb":
        def u(salt: str) -> str:
            return (
                f"(CAST('0x' || substring(md5(CAST({key} AS VARCHAR)"
                f" || '{salt}'), 1, 8) AS BIGINT)"
                f" / CAST(4294967296 AS DOUBLE))"
            )
    else:  # pragma: no cover - caller bug
        raise ValueError(f"unknown engine {engine!r}")
    return f"(-60.0 + 120.0 * {u('-lat')})", f"(-180.0 + 360.0 * {u('-lon')})"


def with_synthetic_coords(
    df: DataFrame, key: str, lat_col: str = "lat", lon_col: str = "lon"
) -> DataFrame:
    lat_sql, lon_sql = synthetic_coord_sql(key, "spark")
    return df.withColumn(lat_col, F.expr(lat_sql)).withColumn(
        lon_col, F.expr(lon_sql)
    )


def _cell_sizes(radius_km: float, max_abs_lat: float = 60.0) -> tuple[float, int]:
    """(lat cell size in degrees, number of longitude cells).

    Longitude wraps at the antimeridian, so its cells are modular: the
    circle is split into ``n_lon = floor(360 / required)`` equal cells,
    each ``360 / n_lon >= required`` degrees wide — a uniform partition
    (no narrow last cell that could break the 1-cell adjacency bound)
    whose neighbors are taken mod n_lon, so a pair straddling ±180 is
    still found. ``required`` itself uses the worst-case (pole-most)
    latitude: any pair within R km satisfies |Δlon| <= R / (111 *
    cos(max_abs_lat)) degrees.
    """
    import math

    lat_deg = radius_km / _KM_PER_LAT_DEG
    lon_deg = radius_km / (
        _KM_PER_LON_DEG_EQUATOR * math.cos(math.radians(max_abs_lat))
    )
    n_lon = max(1, int(360.0 // lon_deg))
    if n_lon <= 3:
        # -1/0/+1 offsets would alias to the same cell mod n_lon,
        # duplicating pairs; a single band is the honest fallback.
        n_lon = 1
    return lat_deg, n_lon


def grid_cell(
    lat: str, lon: str, cell_lat_deg: float, n_lon_cells: int
) -> tuple[Column, Column]:
    """(cy, cx) integer grid cell of a point; cx is modular in
    [0, n_lon_cells) so longitude cell 0 is adjacent to the last one."""
    lon_width = 360.0 / n_lon_cells
    return (
        F.floor(F.col(lat) / F.lit(cell_lat_deg)).cast("int"),
        F.pmod(
            F.floor((F.col(lon) + F.lit(180.0)) / F.lit(lon_width)),
            F.lit(n_lon_cells),
        ).cast("int"),
    )


def radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    left_coords: tuple[str, str] = ("lat", "lon"),
    right_coords: tuple[str, str] = ("lat", "lon"),
    max_abs_lat: float = 60.0,
    dist_col: str = "dist_km",
) -> DataFrame:
    """All (left, right) pairs within ``radius_km``, grid-cell blocked.

    Right side maps each point to its cell; left side replicates each
    point into its 3x3 cell neighborhood (a 9x narrow explode of the
    SMALLER frame is the conventional choice — pass the smaller frame
    as ``left``). One equi-join shuffle on (cy, cx), then the exact
    haversine predicate. Requires |lat| <= max_abs_lat on both inputs
    (cell sizing uses cos(max_abs_lat); beyond it longitude cells are
    too narrow and pairs could be missed).
    """
    cell_lat, n_lon = _cell_sizes(radius_km, max_abs_lat)
    llat, llon = left_coords
    rlat, rlon = right_coords

    cy, cx = grid_cell(rlat, rlon, cell_lat, n_lon)
    r = right.withColumn("__cy", cy).withColumn("__cx", cx)

    cy, cx = grid_cell(llat, llon, cell_lat, n_lon)
    offsets = F.expr("array(-1, 0, 1)")
    lon_offsets = offsets if n_lon > 1 else F.expr("array(0)")
    l = (
        left.withColumn("__cy0", cy)
        .withColumn("__cx0", cx)
        .withColumn("__dy", F.explode(offsets))
        .withColumn("__dx", F.explode(lon_offsets))
        .withColumn("__cy", F.col("__cy0") + F.col("__dy"))
        .withColumn(
            "__cx",
            F.pmod(F.col("__cx0") + F.col("__dx"), F.lit(n_lon)).cast("int"),
        )
        .drop("__cy0", "__cx0", "__dy", "__dx")
    )
    dist = haversine_km(llat, llon, rlat, rlon)
    joined = l.join(r, ["__cy", "__cx"]).withColumn(dist_col, dist)
    return joined.filter(F.col(dist_col) <= F.lit(radius_km)).drop(
        "__cy", "__cx"
    )


def knn_join(
    fact: DataFrame,
    dim: DataFrame,
    k: int,
    fact_key: str,
    dim_key: str,
    fact_coords: tuple[str, str] = ("lat", "lon"),
    dim_coords: tuple[str, str] = ("lat", "lon"),
    dist_col: str = "dist_km",
) -> DataFrame:
    """k nearest ``dim`` rows for every ``fact`` row. The dim side is
    explicitly broadcast (the operator's contract: dim fits in an
    executor — true for the classic store/warehouse/POI dims), so the
    fact side NEVER shuffles for the join; the only shuffle is the
    per-fact-key top-k window, and rank<=k prunes inside the window via
    the rank-limit pushdown. Ties broken on the dim key for
    determinism.

    r11 (guide §1.2 "per-task work"): the N·M pair scoring no longer
    evaluates the 6-trig-call haversine per pair. Each side precomputes
    its unit-sphere (x, y, z) ONCE PER ROW (3 trig calls per row, not
    per pair); the pair-level shortlist comparator is the squared chord
    distance (3 subtractions + 3 multiplies), which is exactly
    monotone in the central angle — chord² = 4·sin²(θ/2) is 4× the
    haversine formula's inner term — so ordering by it is ordering by
    distance. The shortlist keeps k + 5 candidates per fact key (ties
    on exact-equal coordinates hash identically under both metrics and
    break on the dim key in both, so the slack only guards against
    last-bit floating-point divergence between the two formulas —
    distances among distinct synthetic points differ at ~1e-3 relative
    vs ~1e-15 arithmetic noise), then the final rank and the emitted
    distance are computed by the SAME shared haversine expression as
    before on <= k+5 rows per key — output provably identical
    (oracle-hash-verified at sf0.001/0.01/0.1). Profiled at sf0.1
    (customer×supplier, 15M pairs): the scoring stage dominated the
    query at 62 executor-CPU-s; per-pair trig was the bulk of it."""
    flat, flon = fact_coords
    dlat, dlon = dim_coords

    def unit_xyz(lat: str, lon: str, p: str) -> list[Column]:
        rlat, rlon = f"radians({lat})", f"radians({lon})"
        return [
            F.expr(f"cos({rlat}) * cos({rlon})").alias(f"{p}x"),
            F.expr(f"cos({rlat}) * sin({rlon})").alias(f"{p}y"),
            F.expr(f"sin({rlat})").alias(f"{p}z"),
        ]

    fact2 = fact.select("*", *unit_xyz(flat, flon, "__f"))
    dim2 = dim.select("*", *unit_xyz(dlat, dlon, "__d"))
    chord2 = F.expr(
        "(__fx - __dx) * (__fx - __dx) + (__fy - __dy) * (__fy - __dy)"
        " + (__fz - __dz) * (__fz - __dz)"
    )
    w0 = Window.partitionBy(fact_key).orderBy(
        F.col("__c2").asc(), F.col(dim_key).asc()
    )
    short = (
        fact2.join(F.broadcast(dim2), how="cross")
        .withColumn("__c2", chord2)
        .withColumn("__r0", F.row_number().over(w0))
        .filter(F.col("__r0") <= k + 5)
        .drop("__c2", "__r0", "__fx", "__fy", "__fz", "__dx", "__dy", "__dz")
    )
    dist = haversine_km(flat, flon, dlat, dlon)
    w = Window.partitionBy(fact_key).orderBy(
        F.col(dist_col).asc(), F.col(dim_key).asc()
    )
    return (
        short.withColumn(dist_col, dist)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .withColumnRenamed("__rn", "nn_rank")
    )


# Demo polygons for the containment operator: contiguous in [-180,180]
# (ray casting is planar — a polygon crossing the antimeridian must be
# split by the caller), no horizontal edges (the crossing test skips
# them, but avoiding them keeps the generated SQL division total).
DEMO_POLYGONS: dict[str, list[tuple[float, float]]] = {
    "atlantic_box": [(-60.0, 0.5), (-10.0, 1.5), (-12.0, 40.0), (-58.0, 39.0)],
    "indo_pacific_tri": [(100.0, 30.0), (120.0, -40.0), (160.0, 20.0)],
    "europe_pent": [(0.0, 35.0), (40.0, 36.0), (45.0, 50.0), (20.0, 60.0), (-5.0, 50.0)],
}


def point_in_polygon_sql(
    polygon: list[tuple[float, float]], lon: str, lat: str
) -> str:
    """Even-odd ray-casting containment as ONE SQL boolean expression —
    plain arithmetic/CASE over numeric literals, valid Spark SQL and
    DuckDB SQL alike, so both engines evaluate the identical expression
    tree (the repo's shared-formula convention, cf. HAVERSINE_SQL).
    Zero joins: per-point evaluation is a codegen'd projection; the
    polygon rides in the expression text, the natural shape for
    dims of tens-of-vertices fences at 100 TB fact scans."""
    terms = []
    n = len(polygon)
    for i in range(n):
        x1, y1 = polygon[i]
        x2, y2 = polygon[(i + 1) % n]
        terms.append(
            f"(CASE WHEN (({y1!r} > {lat}) <> ({y2!r} > {lat}))"
            f" AND {lon} < ({x2!r} - {x1!r}) * ({lat} - {y1!r})"
            f" / ({y2!r} - {y1!r}) + {x1!r}"
            " THEN 1 ELSE 0 END)"
        )
    return "((" + " + ".join(terms) + ") % 2 = 1)"
