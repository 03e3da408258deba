"""Storage-layout scale features proven executable: bucketed co-located
joins (no exchange) and partition pruning (pruned file listing)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _formatted_plan(df):
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_bucketed_join_needs_no_exchange(spark, sf_dir, tmp_path):
    """Both sides bucketed+sorted on the join key → sort-merge join with
    ZERO Exchange operators (the 100 TB co-location strategy)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    from pandas_etl_spark.sources.layout import to_table_bucketed

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    to_table_bucketed(li, "li_b", ["l_orderkey"], num_buckets=8)
    to_table_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "o_b",
        ["l_orderkey"],
        num_buckets=8,
    )
    try:
        # disable broadcast so the co-location (not a broadcast) is what
        # avoids the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.table("li_b")
            .join(spark.table("o_b"), "l_orderkey")
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("q"))
        )
        plan = _formatted_plan(joined)
        assert "SortMergeJoin" in plan
        join_section = plan.split("HashAggregate")[0]
        assert "Exchange" not in join_section.replace("BroadcastExchange", "")
        # values still correct
        exp = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("q"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, exp.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


def test_partition_pruning(spark, sf_dir, tmp_path):
    """Writing partitioned by a derived key and filtering on it prunes
    the file listing (PartitionFilters in the scan)."""
    out = str(tmp_path / "orders_by_year")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate")
    )
    o.write.partitionBy("o_year").mode("overwrite").parquet(out)

    filtered = spark.read.parquet(out).filter(F.col("o_year") == 1997)
    plan = _formatted_plan(filtered)
    assert "PartitionFilters" in plan and "o_year" in plan.split("PartitionFilters")[1].split("\n")[0]
    n_all = spark.read.parquet(out).count()
    n_1997 = filtered.count()
    assert 0 < n_1997 < n_all

def test_orc_roundtrip_with_pruning(spark, sf_dir, tmp_path):
    """ORC sink/scan parity with parquet: partitioned write, partition
    pruning on read, values preserved."""
    from pandas_etl_spark.sources.io import read_orc, to_orc

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    path = str(tmp_path / "orders_orc")
    to_orc(orders, path, partition_by=["o_orderpriority"])

    back = read_orc(spark, path)
    assert back.count() == orders.count()
    one = back.filter(F.col("o_orderpriority") == "1-URGENT")
    plan = one._jdf.queryExecution().executedPlan().toString()
    # partition filter reaches the ORC scan (no full-data read)
    assert "1-URGENT" in plan
    expected = orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert one.count() == expected
    got = {r.o_orderkey: r.o_totalprice for r in one.limit(100).collect()}
    chk = {
        r.o_orderkey: r.o_totalprice
        for r in orders.filter(F.col("o_orderkey").isin(*got.keys())).collect()
    }
    assert got == chk


def test_text_roundtrip_and_wholetext(spark, tmp_path):
    """Raw-corpus ingestion: line mode and whole-file mode."""
    from pandas_etl_spark.sources.io import read_text, to_text

    src = tmp_path / "docs"
    src.mkdir()
    (src / "a.txt").write_text("line one\nline two\n")
    (src / "b.txt").write_text("solo\n")
    lines = read_text(spark, str(src))
    assert {r.value for r in lines.collect()} == {"line one", "line two", "solo"}
    whole = read_text(spark, str(src), wholetext=True)
    assert whole.count() == 2  # one row per FILE
    out = str(tmp_path / "out_text")
    to_text(lines, out)
    assert read_text(spark, out).count() == 3


def test_xml_roundtrip(spark, tmp_path):
    from pandas_etl_spark.sources.io import read_xml, to_xml

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    p = str(tmp_path / "x")
    to_xml(df, p, row_tag="doc", root_tag="docs")
    back = read_xml(spark, p, row_tag="doc")
    assert {(r.id, r.name) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_avro_gated_clearly(spark, tmp_path):
    import pytest

    from pandas_etl_spark.sources.io import read_avro

    with pytest.raises(NotImplementedError, match="spark-avro"):
        read_avro(spark, str(tmp_path / "none.avro"))


def test_sorted_write_produces_disjoint_file_ranges(spark, sf_dir, tmp_path):
    """to_parquet_sorted: range-partitioned + sorted output must yield
    per-file [min,max] spans on the sort key that are pairwise
    non-overlapping — the physical property that makes parquet min/max
    stats selective (row-group/file skipping on range predicates)."""
    import glob

    import pyarrow.parquet as pq

    from pandas_etl_spark.sources.io import to_parquet_sorted

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "user_id")
    out = str(tmp_path / "sorted")
    to_parquet_sorted(ev, out, ["event_id"], n_files=8)

    spans = []
    for f in glob.glob(out + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index("event_id")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            spans.append((min(mins), max(maxs)))
    assert len(spans) >= 4  # actually fanned out into multiple files
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo, f"overlapping file ranges: {spans}"
    # round-trip intact
    assert spark.read.parquet(out).count() == ev.count()


def test_schema_evolution_merge_read(spark, tmp_path):
    """Schema drift across ingestion days (added column) must be
    readable as the merged superset via mergeSchema — the
    append-only-table evolution path; rows from the old layout read the
    new column as null."""
    base = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    ).write.parquet(base + "/day=1")
    spark.createDataFrame(
        [(3, "c", 9.5)], "id long, name string, score double"
    ).write.parquet(base + "/day=2")

    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) == {"id", "name", "score", "day"}
    rows = {r.id: (r.name, r.score) for r in merged.collect()}
    assert rows[1] == ("a", None) and rows[3] == ("c", 9.5)


def _file_spans(out_dir, col):
    """Per-file (min, max) of ``col`` from parquet footer statistics."""
    import glob

    import pyarrow.parquet as pq

    spans = []
    for f in glob.glob(out_dir + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            spans.append((min(mins), max(maxs)))
    return spans


def test_zorder_write_clusters_every_dimension(spark, sf_dir, tmp_path):
    """to_parquet_zorder on (user_id, value): every output file must
    cover a narrow range of BOTH columns (the property single-column
    sorting cannot give: sorted-by-user files span the full value
    domain), so min/max stats skip files for predicates on either."""
    from pandas_etl_spark.sources.layout import to_parquet_zorder

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    out = str(tmp_path / "zorder")
    to_parquet_zorder(ev, out, ["user_id", "value"], bits=4, n_files=8)

    for col in ("user_id", "value"):
        spans = _file_spans(out, col)
        assert len(spans) >= 4, f"{col}: expected fan-out, got {len(spans)} files"
        glo = min(s[0] for s in spans)
        ghi = max(s[1] for s in spans)
        width = float(ghi - glo) or 1.0
        avg_span = sum(float(hi - lo) for lo, hi in spans) / len(spans) / width
        assert avg_span < 0.7, f"{col}: avg normalized file span {avg_span:.2f}"
        assert min(float(hi - lo) / width for lo, hi in spans) < 0.5

    # round-trip intact (z column dropped, content preserved)
    back = spark.read.parquet(out)
    assert back.columns == ["event_id", "user_id", "value"]
    assert back.count() == ev.count()
    assert back.exceptAll(ev).count() == 0


def test_zorder_string_column_hash_buckets(spark, sf_dir, tmp_path):
    """Non-numeric z-columns hash-bucket (no range locality to exploit):
    the write must succeed and preserve content."""
    from pandas_etl_spark.sources.layout import to_parquet_zorder

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "n_chars"
    )
    out = str(tmp_path / "zdocs")
    to_parquet_zorder(docs, out, ["source", "n_chars"], bits=3, n_files=4)
    assert spark.read.parquet(out).exceptAll(docs).count() == 0


def test_compact_parquet_binpacks_small_files(spark, sf_dir, tmp_path):
    """compact_parquet: a 32-small-file directory rewrites into
    ceil(total/target) files with identical content — and with
    sort_cols, compaction doubles as layout repair (disjoint ranges)."""
    import glob

    from pandas_etl_spark.sources.layout import compact_parquet

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "user_id")
    frag = str(tmp_path / "fragmented")
    ev.repartition(32).write.parquet(frag)
    assert len(glob.glob(frag + "/*.parquet")) == 32

    import os

    total = sum(
        os.path.getsize(f) for f in glob.glob(frag + "/*.parquet")
    )
    out = str(tmp_path / "compacted")
    n = compact_parquet(spark, frag, out, target_file_bytes=total // 4 + 1)
    files = glob.glob(out + "/*.parquet")
    assert len(files) == n <= 5
    assert spark.read.parquet(out).exceptAll(ev).count() == 0

    out2 = str(tmp_path / "compacted_sorted")
    compact_parquet(
        spark, frag, out2, target_file_bytes=total // 4 + 1, sort_cols=["event_id"]
    )
    spans = sorted(_file_spans(out2, "event_id"))
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo, f"overlapping ranges after sorted compaction: {spans}"


def test_zorder_single_column_behaves_like_sort(spark, sf_dir, tmp_path):
    """Degenerate z-order on ONE column must still produce near-disjoint
    per-file ranges on it (Morton code of one dim = its bucket rank)."""
    from pandas_etl_spark.sources.layout import to_parquet_zorder

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "user_id")
    out = str(tmp_path / "z1")
    to_parquet_zorder(ev, out, ["user_id"], bits=4, n_files=4)
    spans = sorted(_file_spans(out, "user_id"))
    glo, ghi = spans[0][0], max(s[1] for s in spans)
    width = float(ghi - glo) or 1.0
    assert sum(float(hi - lo) for lo, hi in spans) / len(spans) / width < 0.5
    assert spark.read.parquet(out).count() == ev.count()


def test_compact_to_single_file_when_target_exceeds_total(spark, sf_dir, tmp_path):
    import glob

    from pandas_etl_spark.sources.layout import compact_parquet

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id")
    frag = str(tmp_path / "frag")
    ev.repartition(8).write.parquet(frag)
    out = str(tmp_path / "one")
    n = compact_parquet(spark, frag, out, target_file_bytes=1 << 40)
    assert n == 1
    assert len(glob.glob(out + "/*.parquet")) == 1
    assert spark.read.parquet(out).count() == ev.count()


def test_to_parquet_auto_sizes_from_estimate(spark, tmp_path):
    """File count tracks the optimizer's size estimate: a small frame
    collapses to 1 file; a tiny target splits the same frame into more
    files (bounded by its partition count)."""
    import glob

    from pandas_etl_spark.sources.layout import to_parquet_auto

    df = spark.range(0, 200_000, 1, 8).selectExpr(
        "id", "repeat('x', 64) AS pad"
    )
    one = str(tmp_path / "one")
    n1 = to_parquet_auto(df, one, target_file_bytes=1 << 30)
    assert n1 == 1
    assert len(glob.glob(one + "/part-*.parquet")) == 1

    many = str(tmp_path / "many")
    n2 = to_parquet_auto(df, many, target_file_bytes=64 << 10)
    assert n2 > 1
    # the requested count is a CAP under shuffle-free coalesce: actual
    # files = min(cap, source partitions) = 8 here
    produced = len(glob.glob(many + "/part-*.parquet"))
    assert 1 < produced <= n2
    assert produced == 8


# ---------------------------------------------------------------- evolution


def test_widen_type_lattice():
    from pyspark.sql import types as T

    from pandas_etl_spark.sources.evolution import widen_type

    assert isinstance(widen_type(T.IntegerType(), T.LongType()), T.LongType)
    assert isinstance(widen_type(T.FloatType(), T.DoubleType()), T.DoubleType)
    assert isinstance(widen_type(T.LongType(), T.FloatType()), T.DoubleType)
    assert isinstance(widen_type(T.DateType(), T.TimestampType()), T.TimestampType)
    assert widen_type(T.StringType(), T.LongType()) is None
    assert isinstance(widen_type(T.StringType(), T.StringType()), T.StringType)


def test_read_parquet_evolved_reconciles_drift(spark, sf_dir, tmp_path):
    """int→bigint + float→double widening, added/dropped columns
    null-filled with the right types, version tag per snapshot — and
    the motivation: Spark's own mergeSchema HARD-FAILS on this drift."""
    import pytest

    from pandas_etl_spark.sources.evolution import read_parquet_evolved

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    v1 = o.limit(10).select(
        F.col("o_orderkey").cast("int").alias("k"),
        F.col("o_totalprice").cast("float").alias("p"),
        F.col("o_orderstatus").alias("s"),
    )
    v2 = o.limit(5).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("p"),
        F.col("o_orderpriority").alias("prio"),
    )
    p1, p2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    v1.write.parquet(p1)
    v2.write.parquet(p2)

    with pytest.raises(Exception, match="[Mm]erge|SCHEMA"):
        spark.read.option("mergeSchema", "true").parquet(p1, p2).collect()

    ev = read_parquet_evolved(spark, [p1, p2], version_col="v")
    got = dict(ev.dtypes)
    assert got == {
        "k": "bigint",
        "p": "double",
        "s": "string",
        "prio": "string",
        "v": "int",
    }
    # first-seen column order: v1's columns lead, v2's addition follows
    assert ev.columns == ["k", "p", "s", "prio", "v"]
    assert ev.count() == 15
    assert ev.filter((F.col("v") == 1) & F.col("s").isNull()).count() == 5
    assert ev.filter((F.col("v") == 0) & F.col("prio").isNull()).count() == 10


def test_read_parquet_evolved_conflict_modes(spark, tmp_path):
    import pytest

    from pandas_etl_spark.sources.evolution import read_parquet_evolved

    a = spark.createDataFrame([(1, "x")], "k int, val string")
    b = spark.createDataFrame([(2, 7)], "k int, val int")
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    a.write.parquet(pa)
    b.write.parquet(pb)
    with pytest.raises(TypeError, match="val.*non-widenable"):
        read_parquet_evolved(spark, [pa, pb])
    ev = read_parquet_evolved(spark, [pa, pb], on_conflict="string")
    assert dict(ev.dtypes)["val"] == "string"
    assert {r["val"] for r in ev.collect()} == {"x", "7"}


def test_dynamic_partition_overwrite_touches_only_emitted_days(spark, sf_dir, tmp_path):
    """Backfill via partitionOverwriteMode=dynamic must replace exactly
    the partitions the job emits: the corrected day's files change, every
    other day keeps its files byte-for-byte (same paths, sizes, mtimes)."""
    import os

    from pyspark.sql import functions as F

    from pandas_etl_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    tgt = str(tmp_path / "t")
    ev.write.partitionBy("day").parquet(tgt)

    def listing(exclude_day: str) -> dict[str, tuple[int, float]]:
        out = {}
        for root, _, files in os.walk(tgt):
            if exclude_day in root:
                continue
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    st = os.stat(p)
                    out[p] = (st.st_size, st.st_mtime)
        return out

    d0 = str(ev.agg(F.min("day")).collect()[0][0])
    before = listing(f"day={d0}")
    fixed = (
        spark.read.parquet(tgt)
        .filter(F.col("day") == F.lit(d0))
        .filter(F.col("event_type") != "error")
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        fixed.write.mode("overwrite").partitionBy("day").parquet(tgt)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    assert listing(f"day={d0}") == before  # untouched partitions intact
    # and the corrected day really changed
    got = (
        spark.read.parquet(tgt)
        .filter((F.col("day") == F.lit(d0)) & (F.col("event_type") == "error"))
        .count()
    )
    assert got == 0


def test_erasure_rewrite_touches_only_affected_days(spark, sf_dir, tmp_path):
    """GDPR erasure must rewrite exactly the partitions containing the
    erase set: every day WITHOUT erased users keeps its files
    byte-for-byte; affected days lose every erased row; a day whose
    rows are ALL erased disappears entirely."""
    import os

    from pyspark.sql import functions as F

    tgt = str(tmp_path / "t")
    rows = (
        # day A: mixed (user 97 erased, 1/2 kept)
        [("2024-01-01", u, 10) for u in (97, 1, 2)]
        # day B: untouched (no erased users)
        + [("2024-01-02", u, 20) for u in (3, 4)]
        # day C: fully erased
        + [("2024-01-03", u, 30) for u in (194, 291)]
    )
    spark.createDataFrame(
        rows, "day string, user_id long, cents long"
    ).write.partitionBy("day").parquet(tgt)

    def listing(day: str) -> dict[str, tuple[int, float]]:
        out = {}
        root_dir = os.path.join(tgt, f"day={day}")
        for root, _, files in os.walk(root_dir):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    st = os.stat(p)
                    out[p] = (st.st_size, st.st_mtime)
        return out

    before_b = listing("2024-01-02")
    erased = F.col("user_id") % 97 == 0
    affected = [
        r["day"]
        for r in spark.read.parquet(tgt)
        .filter(erased)
        .select("day")
        .distinct()
        .collect()
    ]
    # partition values read back as DATE under inference
    assert sorted(str(d) for d in affected) == ["2024-01-01", "2024-01-03"]
    fixed = (
        spark.read.parquet(tgt).filter(F.col("day").isin(affected)).filter(~erased)
    )
    kept_days = {str(r["day"]) for r in fixed.select("day").distinct().collect()}
    import shutil

    # rewrite FIRST (its lazy plan scans the fully-erased partition),
    # drop the all-erased day after — same order as erasure_rewrite
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        fixed.write.mode("overwrite").partitionBy("day").parquet(tgt)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    for d0 in (str(d) for d in affected):
        if d0 not in kept_days:
            shutil.rmtree(os.path.join(tgt, f"day={d0}"), ignore_errors=True)
    assert listing("2024-01-02") == before_b  # untouched day intact
    assert not os.path.isdir(os.path.join(tgt, "day=2024-01-03"))  # dropped
    store = spark.read.parquet(tgt)
    assert store.filter(erased).count() == 0  # zero residue
    assert store.count() == 4  # 2 kept on day A + 2 on day B
