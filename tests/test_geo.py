"""Geospatial operators: blocked radius join ≡ brute force (including
the antimeridian wrap case), kNN join vs brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_etl_spark.operators.geo import (
    haversine_km,
    knn_join,
    radius_join,
    with_synthetic_coords,
)


def _brute_pairs(spark, left_rows, right_rows, radius_km):
    l = spark.createDataFrame(left_rows, "lid int, slat double, slon double")
    r = spark.createDataFrame(right_rows, "rid int, clat double, clon double")
    d = haversine_km("slat", "slon", "clat", "clon")
    return {
        (row.lid, row.rid)
        for row in l.crossJoin(r)
        .withColumn("d", d)
        .filter(F.col("d") <= radius_km)
        .collect()
    }


def test_radius_join_finds_antimeridian_pair(spark):
    """Regression: lon -176.9 vs +178.1 at lat ~57-59 is ~417 km apart
    but sits in the first/last longitude cells — modular cx must pair
    them (missed before the pmod fix; caught at sf0.01)."""
    left = [(1, 59.0745, -176.9461)]
    right = [(2, 56.3929, 178.1399)]
    l = spark.createDataFrame(left, "lid int, slat double, slon double")
    r = spark.createDataFrame(right, "rid int, clat double, clon double")
    out = radius_join(
        l, r, 500.0, left_coords=("slat", "slon"), right_coords=("clat", "clon")
    )
    rows = out.select("lid", "rid", "dist_km").collect()
    assert [(x.lid, x.rid) for x in rows] == [(1, 2)]
    assert 400 < rows[0].dist_km < 500


def test_radius_join_equals_brute_force(spark):
    """Blocked plan returns exactly the brute-force pair set over a
    synthetic-coordinate grid spanning latitude band edges, the
    antimeridian, and cell boundaries."""
    left_df = with_synthetic_coords(
        spark.range(0, 40).select(F.col("id").cast("int").alias("lid")),
        "lid",
        "slat",
        "slon",
    )
    right_df = with_synthetic_coords(
        spark.range(100, 300).select(F.col("id").cast("int").alias("rid")),
        "rid",
        "clat",
        "clon",
    )
    left_rows = [(r.lid, r.slat, r.slon) for r in left_df.collect()]
    right_rows = [(r.rid, r.clat, r.clon) for r in right_df.collect()]
    for radius in (250.0, 900.0):
        expected = _brute_pairs(spark, left_rows, right_rows, radius)
        got = {
            (row.lid, row.rid)
            for row in radius_join(
                left_df,
                right_df,
                radius,
                left_coords=("slat", "slon"),
                right_coords=("clat", "clon"),
            ).collect()
        }
        assert got == expected
    # no duplicate pairs from the neighborhood explode
    out = radius_join(
        left_df,
        right_df,
        900.0,
        left_coords=("slat", "slon"),
        right_coords=("clat", "clon"),
    )
    assert out.count() == out.select("lid", "rid").distinct().count()


def test_radius_join_huge_radius_single_lon_band(spark):
    """Radius big enough that fewer than 4 longitude cells fit: the
    operator falls back to one modular band and still matches brute
    force (correctness over pruning)."""
    left_rows = [(1, 10.0, -170.0), (2, -50.0, 20.0)]
    right_rows = [(3, 12.0, 175.0), (4, -55.0, 30.0), (5, 55.0, 30.0)]
    l = spark.createDataFrame(left_rows, "lid int, slat double, slon double")
    r = spark.createDataFrame(right_rows, "rid int, clat double, clon double")
    expected = _brute_pairs(spark, left_rows, right_rows, 5000.0)
    got = {
        (row.lid, row.rid)
        for row in radius_join(
            l, r, 5000.0, left_coords=("slat", "slon"), right_coords=("clat", "clon")
        ).collect()
    }
    assert got == expected and len(got) >= 2


def test_knn_join_matches_brute_force_topk(spark):
    fact = with_synthetic_coords(
        spark.range(0, 30).select(F.col("id").cast("int").alias("fid")),
        "fid",
        "flat",
        "flon",
    )
    dim = with_synthetic_coords(
        spark.range(500, 520).select(F.col("id").cast("int").alias("did")),
        "did",
        "dlat",
        "dlon",
    )
    out = knn_join(
        fact,
        dim,
        3,
        fact_key="fid",
        dim_key="did",
        fact_coords=("flat", "flon"),
        dim_coords=("dlat", "dlon"),
    ).collect()
    by_fact = {}
    for row in out:
        by_fact.setdefault(row.fid, []).append((row.nn_rank, row.did, row.dist_km))
    d = haversine_km("flat", "flon", "dlat", "dlon")
    brute = (
        fact.crossJoin(dim).withColumn("d", d).collect()
    )
    dists = {}
    for row in brute:
        dists.setdefault(row.fid, []).append((row.d, row.did))
    assert len(by_fact) == 30
    for fid, got in by_fact.items():
        got.sort()
        expect = sorted(dists[fid])[:3]
        assert [g[1] for g in got] == [e[1] for e in expect]
        assert all(abs(g[2] - e[0]) < 1e-9 for g, e in zip(got, expect))


def test_ahash_signatures_edges(spark):
    """Block-mean hash: identical payloads hash identically (hamming 0
    through the blocked pairing); payloads shorter than `bits` bytes or
    NULL are dropped, not crashed on."""
    from pandas_etl_spark.functions.dedup import simhash_neighbors
    from pandas_etl_spark.functions.multimodal import ahash_signatures

    rows = [
        (1, ("A" * 50 + "z" * 40).encode()),
        (2, ("A" * 50 + "z" * 40).encode()),  # exact dup of 1
        (3, b"short"),                          # < 60 bytes -> dropped
        (4, None),                              # NULL -> dropped
        (5, bytes(range(60, 180))),             # distinct content
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    sig = ahash_signatures(df, "payload", "doc_id", bits=60)
    got = {r.id: r.sim for r in sig.collect()}
    assert set(got) == {1, 2, 5}
    assert got[1] == got[2]
    assert 0 <= got[1] < 2**60
    pairs = simhash_neighbors(sig, max_hamming=0).collect()
    assert [(p.id_a, p.id_b, p.hamming) for p in pairs] == [(1, 2, 0)]


def test_point_in_polygon_ray_casting(spark):
    """Pinned containment cases: inside, outside, and a concave-ish
    probe near an edge of each demo polygon."""
    from pandas_etl_spark.operators.geo import (
        DEMO_POLYGONS,
        point_in_polygon_sql,
    )

    probes = [
        # (lon, lat, polygon, expected)
        (-30.0, 20.0, "atlantic_box", True),
        (-70.0, 20.0, "atlantic_box", False),
        (-30.0, 45.0, "atlantic_box", False),
        (125.0, 0.0, "indo_pacific_tri", True),
        (100.0, -40.0, "indo_pacific_tri", False),
        (20.0, 45.0, "europe_pent", True),
        (20.0, 61.0, "europe_pent", False),
        (-4.0, 36.0, "europe_pent", False),  # outside the slanted west edge
    ]
    df = spark.createDataFrame(
        [(i, p[0], p[1]) for i, p in enumerate(probes)],
        "i int, lon double, lat double",
    )
    for name, poly in DEMO_POLYGONS.items():
        expr = point_in_polygon_sql(poly, "lon", "lat")
        got = {r.i: r.inside for r in df.selectExpr("i", f"{expr} AS inside").collect()}
        for i, (_, _, pname, want) in enumerate(probes):
            if pname == name:
                assert got[i] == want, (name, probes[i])


def test_radius_join_hypothesis_random_coords(spark):
    """Property: blocked radius join ≡ brute force on adversarial
    coordinates (clusters hugging the antimeridian, the ±60 latitude
    band edges, and cell boundaries)."""
    import random

    rng = random.Random(20260815)
    spots = [(-179.99, 59.9), (179.9, -59.9), (0.0, 0.0), (45.0, 30.0)]
    rows = []
    i = 0
    for lon0, lat0 in spots:
        for _ in range(12):
            lon = ((lon0 + rng.uniform(-6, 6) + 180) % 360) - 180
            lat = max(-59.99, min(59.99, lat0 + rng.uniform(-6, 6)))
            rows.append((i, lat, lon))
            i += 1
    half = len(rows) // 2
    left_rows = [(i, la, lo) for (i, la, lo) in rows[:half]]
    right_rows = [(i, la, lo) for (i, la, lo) in rows[half:]]
    l = spark.createDataFrame(left_rows, "lid int, slat double, slon double")
    r = spark.createDataFrame(right_rows, "rid int, clat double, clon double")
    for radius in (150.0, 700.0):
        expected = _brute_pairs(spark, left_rows, right_rows, radius)
        got = {
            (row.lid, row.rid)
            for row in radius_join(
                l, r, radius,
                left_coords=("slat", "slon"),
                right_coords=("clat", "clon"),
            ).collect()
        }
        assert got == expected, radius
