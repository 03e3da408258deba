"""pandas-flavored Table/Grouped adapter semantics (SURVEY §2.3–§2.7):
each method vs the equivalent pandas computation on the same small data."""

from __future__ import annotations

import pandas as pd
import pytest

from pandas_etl_spark.pandas_ops import Table, concat, merge


@pytest.fixture(scope="module")
def pdf():
    return pd.DataFrame(
        {
            "k": ["a", "a", "b", "b", "c"],
            "x": [1, 2, 3, 4, 5],
            "y": [10.0, 20.0, 30.0, 40.0, None],
            "s": ["p", "q", "r", "s", "t"],
        }
    )


@pytest.fixture(scope="module")
def t(spark, pdf):
    return Table(spark.createDataFrame(pdf))


def rows(table, order_by):
    return [tuple(r) for r in table.df.orderBy(*order_by).collect()]


class TestTable:
    def test_groupby_max_matches_pandas(self, t, pdf):
        got = {r.k: (r.x, r.s) for r in t.groupby("k").max().df.collect()}
        exp = pdf.groupby("k")[["x", "s"]].max()
        assert got == {k: (row.x, row.s) for k, row in exp.iterrows()}

    def test_groupby_agg_dict(self, t, pdf):
        got = {r.k: (r.x, r.y) for r in t.groupby("k").agg({"x": "sum", "y": "mean"}).df.collect()}
        exp_x = pdf.groupby("k").x.sum()
        exp_y = pdf.groupby("k").y.mean()
        for k in exp_x.index:
            assert got[k][0] == exp_x[k]
            ey = exp_y[k]
            assert (got[k][1] is None and pd.isna(ey)) or got[k][1] == ey

    def test_global_max_one_row(self, t):
        row = t.max().df.collect()
        assert len(row) == 1 and row[0].x == 5 and row[0].s == "t"

    def test_query_filter(self, t):
        assert t.query("x > 2 and k != 'c'").df.count() == 2

    def test_sort_head_nlargest(self, t):
        assert [r.x for r in t.sort_values("x", ascending=False).head(2).df.collect()] == [5, 4]
        assert [r.x for r in t.nlargest(2, "x").df.collect()] == [5, 4]
        assert [r.x for r in t.nsmallest(2, "x").df.collect()] == [1, 2]

    def test_rename_astype_assign(self, t):
        out = t.rename({"x": "xx"}).astype({"xx": "float64"}).assign(z=1)
        assert "xx" in out.columns and "z" in out.columns
        assert dict(out.df.dtypes)["xx"] == "double"

    def test_fillna_dropna(self, t, pdf):
        assert t.fillna(-1.0).df.filter("y = -1.0").count() == 1
        assert t.dropna(subset=["y"]).df.count() == len(pdf.dropna(subset=["y"]))

    def test_drop_duplicates(self, t):
        assert t.drop_duplicates(["k"]).df.count() == 3

    def test_explode(self, spark):
        t2 = Table(spark.createDataFrame([(1, [1, 2]), (2, [])], "id int, v array<int>"))
        got = rows(t2.explode("v"), ["id", "v"])
        assert got == [(1, 1), (1, 2), (2, None)]

    def test_spark_fluent_passthrough(self, t):
        out = t.select("k", "x").filter("x >= 3")
        assert isinstance(out, Table) and out.df.count() == 3


class TestCombinators:
    def test_concat_aligns_by_name(self, spark):
        a = Table(spark.createDataFrame([(1, "x")], "id int, a string"))
        b = Table(spark.createDataFrame([(2, "y")], "id int, b string"))
        got = rows(concat([a, b]), ["id"])
        assert got == [(1, "x", None), (2, None, "y")]

    def test_concat_axis1_raises(self, spark):
        a = Table(spark.createDataFrame([(1,)], "id int"))
        with pytest.raises(NotImplementedError):
            concat([a, a], axis=1)

    def test_merge_how_variants(self, spark):
        l = Table(spark.createDataFrame([(1, "a"), (2, "b")], "id int, lv string"))
        r = Table(spark.createDataFrame([(2, "B"), (3, "C")], "id int, rv string"))
        assert merge(l, r, on="id").df.count() == 1
        assert merge(l, r, on="id", how="left").df.count() == 2
        assert merge(l, r, on="id", how="outer").df.count() == 3
        assert merge(l, r, on="id", how="leftanti").df.count() == 1
        got = merge(l, r, left_on="id", right_on="id").df.count()
        assert got == 1

    def test_merge_suffixes_overlapping_columns(self, spark):
        """pandas _x/_y disambiguation (ADVICE r1: bare Spark join keeps
        duplicate names → later references are ambiguous)."""
        l = Table(spark.createDataFrame([(1, 10.0)], "id int, val double"))
        r = Table(spark.createDataFrame([(1, 20.0)], "id int, val double"))
        out = merge(l, r, on="id")
        assert sorted(out.df.columns) == ["id", "val_x", "val_y"]
        row = out.df.collect()[0]
        assert (row["val_x"], row["val_y"]) == (10.0, 20.0)
        # custom suffixes, pandas-style
        out2 = merge(l, r, on="id", suffixes=("_l", "_r"))
        assert sorted(out2.df.columns) == ["id", "val_l", "val_r"]
        # left_on/right_on: shared non-key name still suffixed
        out3 = merge(l, r, left_on="id", right_on="id")
        assert {"val_x", "val_y"} <= set(out3.df.columns)

    def test_merge_indicator_with_overlap(self, spark):
        l = Table(spark.createDataFrame([(1, "a"), (2, "a")], "id int, v string"))
        r = Table(spark.createDataFrame([(2, "b"), (3, "b")], "id int, v string"))
        out = merge(l, r, on="id", how="outer", indicator=True)
        got = {row["id"]: row["_merge"] for row in out.df.collect()}
        assert got == {1: "left_only", 2: "both", 3: "right_only"}
        assert {"v_x", "v_y"} <= set(out.df.columns)

    def test_groupby_first_last_deterministic(self, spark):
        df = spark.createDataFrame(
            [("a", 3, None), ("a", 1, "x"), ("a", 2, "y"), ("b", 1, None)],
            "k string, o int, v string",
        )
        t = Table(df)
        first = {
            r["k"]: (r["o"], r["v"])
            for r in t.groupby("k").first(order_by="o").df.collect()
        }
        # per-column first NON-NULL by order (pandas skips NaN likewise)
        assert first == {"a": (1, "x"), "b": (1, None)}
        last = {
            r["k"]: (r["o"], r["v"])
            for r in t.groupby("k").last(order_by="o").df.collect()
        }
        assert last == {"a": (3, "y"), "b": (1, None)}
        with pytest.raises(ValueError, match="order_by"):
            t.groupby("k").first()

    def test_groupby_first_ignores_null_order_keys(self, spark):
        """A null ORDER key is not a position — such rows are ignored
        (documented divergence from pandas' NaN-sorts-last)."""
        df = spark.createDataFrame(
            [("a", None, "null-o"), ("a", 2, "real")], "k string, o int, v string"
        )
        t = Table(df)
        first = t.groupby("k").first(order_by="o").df.collect()[0]
        last = t.groupby("k").last(order_by="o").df.collect()[0]
        assert (first.o, first.v) == (2, "real")
        assert (last.o, last.v) == (2, "real")


class TestDescribeDummies:
    def test_get_dummies_dynamic_values(self, spark):
        from pandas_etl_spark.pandas_ops import get_dummies

        df = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, None)], "id int, cat string"
        )
        out = get_dummies(df, "cat")
        assert {"cat_a", "cat_b"} <= set(out.df.columns)
        rows = {r.id: (r.cat_a, r.cat_b) for r in out.df.collect()}
        assert rows == {1: (1, 0), 2: (0, 1), 3: (0, 0)}

    def test_describe_matches_pandas(self, spark):
        import pandas as pd

        pdf = pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0, 100.0]})
        t = Table(spark.createDataFrame(pdf))
        row = t.describe(["x"]).df.collect()[0]
        desc = pdf["x"].describe()
        assert row.n == 5
        assert abs(row.mean - desc["mean"]) < 1e-6
        assert abs(row.sd - desc["std"]) < 1e-6
        assert (row.min_v, row.p25, row.p50, row.p75, row.max_v) == (
            desc["min"], desc["25%"], desc["50%"], desc["75%"], desc["max"],
        )


class TestWideSurface:
    def test_melt_roundtrip(self, spark):
        df = spark.createDataFrame([(1, 10.0, 20.0)], "id int, a double, b double")
        out = Table(df).melt(["id"]).df.orderBy("variable").collect()
        assert [(r.variable, r.value) for r in out] == [("a", 10.0), ("b", 20.0)]

    def test_value_counts(self, t, pdf):
        got = [(r.k, r["count"]) for r in t.value_counts("k").df.collect()]
        exp = pdf.k.value_counts()
        assert dict(got) == exp.to_dict()
        assert got[0][1] == exp.max()  # ordered desc

    def test_nunique(self, t, pdf):
        row = t.nunique(["k", "x"]).df.collect()[0]
        assert (row.k, row.x) == (pdf.k.nunique(), pdf.x.nunique())

    def test_sample_deterministic_with_key(self, spark):
        df = spark.createDataFrame([(i,) for i in range(500)], "id long")
        a = {r.id for r in Table(df).sample(0.3, key="id").df.collect()}
        b = {r.id for r in Table(df.repartition(7)).sample(0.3, key="id").df.collect()}
        assert a == b and 0.15 < len(a) / 500 < 0.45

    def test_pivot_table_matches_pandas(self, spark):
        import pandas as pd

        pdf = pd.DataFrame(
            {
                "g": ["a", "a", "b", "b"],
                "c": ["x", "y", "x", "x"],
                "v": [1.0, 2.0, 3.0, 5.0],
            }
        )
        got = Table(spark.createDataFrame(pdf)).pivot_table(
            "g", "c", "v", aggfunc="mean", fill_value=0.0
        )
        rows = {r.g: (r.x, r.y) for r in got.df.collect()}
        exp = pdf.pivot_table(index="g", columns="c", values="v", aggfunc="mean", fill_value=0.0)
        assert rows == {g: (exp.loc[g, "x"], exp.loc[g, "y"]) for g in ("a", "b")}


class TestCutQcut:
    def test_cut_matches_pandas(self, spark):
        from pandas_etl_spark.pandas_ops import cut

        pdf = pd.DataFrame({"v": [-5.0, 0.0, 1.0, 5.0, 10.0, 11.0]})
        t = cut(Table(spark.createDataFrame(pdf)), "v", bins=[0, 5, 10], labels=["lo", "hi"])
        got = [r.v_bin for r in t.df.orderBy("v").collect()]
        exp = pd.cut(pdf.v, bins=[0, 5, 10], labels=["lo", "hi"]).astype(object)
        assert got == [None if pd.isna(x) else x for x in exp.sort_index()]

    def test_qcut_matches_pandas(self, spark):
        from pandas_etl_spark.pandas_ops import qcut

        pdf = pd.DataFrame({"v": [float(i) for i in range(1, 101)]})
        t = qcut(Table(spark.createDataFrame(pdf)), "v", q=4)
        got = {r.v: r.v_qbin for r in t.df.collect()}
        exp = pd.qcut(pdf.v, q=4, labels=False)
        assert got == {pdf.v[i]: exp[i] for i in range(len(pdf))}


class TestMergeGuards:
    def test_left_on_without_right_on_raises(self, spark):
        l = Table(spark.createDataFrame([(1, "a")], "id int, v string"))
        r = Table(spark.createDataFrame([(1, "b")], "id int, w string"))
        with pytest.raises(ValueError, match="left_on and right_on"):
            merge(l, r, left_on="id")
        with pytest.raises(ValueError, match="left_on and right_on"):
            merge(l, r, right_on="id")

    def test_suffix_collision_raises(self, spark):
        l = Table(spark.createDataFrame([(1, 1.0, 2.0)], "id int, val double, val_x double"))
        r = Table(spark.createDataFrame([(1, 3.0)], "id int, val double"))
        with pytest.raises(ValueError, match="val_x"):
            merge(l, r, on="id")

    def test_qcut_single_bin(self, spark):
        from pandas_etl_spark.pandas_ops import qcut

        t = Table(spark.createDataFrame([(1.0,), (2.0,)], "v double"))
        assert [r.v_qbin for r in qcut(t, "v", q=1).df.collect()] == [0, 0]

    def test_describe_no_numeric_raises(self, spark):
        t = Table(spark.createDataFrame([("a",)], "s string"))
        with pytest.raises(ValueError, match="numeric"):
            t.describe()

    def test_chunk_documents_weird_column_name(self, spark):
        from pandas_etl_spark.functions.text import chunk_documents

        df = spark.createDataFrame([(1, "abcdef")], "doc_id long, `my text` string")
        out = chunk_documents(df, text_col="my text", chunk_size=4, overlap=1).collect()
        assert [r.chunk_text for r in sorted(out, key=lambda r: r.chunk_id)] == ["abcd", "def"]


class TestRound3Additions:
    def test_qcut_null_input_yields_null_bin(self, spark):
        from pandas_etl_spark.pandas_ops import qcut

        pdf = pd.DataFrame({"v": [1.0, 2.0, 3.0, 4.0, None, None]})
        t = qcut(Table(spark.createDataFrame(pdf)), "v", q=2)
        got = {r.v: r.v_qbin for r in t.df.collect()}
        assert got[None] is None  # pandas qcut: NaN in → NaN bin
        exp = pd.qcut(pdf.v, q=2, labels=False)
        for v, b in got.items():
            if v is not None:
                assert b == exp[pdf.v.tolist().index(v)]
        # q == 1 keeps nulls null too
        t1 = qcut(Table(spark.createDataFrame(pdf)), "v", q=1)
        got1 = {r.v: r.v_qbin for r in t1.df.collect()}
        assert got1[None] is None and got1[1.0] == 0

    def test_merge_on_and_left_on_raises(self, spark):
        l = Table(spark.createDataFrame([(1, "a")], "id int, v string"))
        r = Table(spark.createDataFrame([(1, "b")], "id int, w string"))
        with pytest.raises(ValueError, match="not a combination"):
            merge(l, r, on="id", left_on="id", right_on="id")

    def test_merge_indicator_left_on_right_on(self, spark):
        l = Table(spark.createDataFrame([(1, "a"), (2, "b")], "lid int, v string"))
        r = Table(spark.createDataFrame([(2, "x"), (3, "y")], "rid int, w string"))
        out = merge(l, r, left_on="lid", right_on="rid", how="outer", indicator=True)
        got = {(row.lid, row.rid): row._merge for row in out.df.collect()}
        assert got[(1, None)] == "left_only"
        assert got[(2, 2)] == "both"
        assert got[(None, 3)] == "right_only"

    def test_get_dummies_cardinality_guard(self, spark):
        import pandas_etl_spark.pandas_ops as po

        old = po._MAX_DYNAMIC_CATEGORIES
        po._MAX_DYNAMIC_CATEGORIES = 5
        try:
            t = Table(spark.range(0, 50).selectExpr("cast(id as string) AS k"))
            with pytest.raises(ValueError, match="values="):
                po.get_dummies(t, "k")
            with pytest.raises(ValueError, match="distinct"):
                po.crosstab(t, t, "k", "k")
        finally:
            po._MAX_DYNAMIC_CATEGORIES = old

    def test_to_excel_guards(self, spark, tmp_path):
        t = Table(spark.range(0, 10).selectExpr("id", "cast(id as string) AS s"))
        with pytest.raises(ValueError, match="max_rows"):
            t.to_excel(str(tmp_path / "x.xlsx"), max_rows=5)
        try:
            import openpyxl  # noqa: F401

            path = t.to_excel(str(tmp_path / "ok.xlsx"))
            back = pd.read_excel(path)
            assert len(back) == 10
        except ImportError:
            with pytest.raises(NotImplementedError, match="openpyxl"):
                t.to_excel(str(tmp_path / "ok.xlsx"))

    def test_str_accessor_matches_pandas(self, spark):
        pdf = pd.DataFrame({"s": ["  Hello World ", "spark-4.1", "a,b,c", "x9y"]})
        t = Table(spark.createDataFrame(pdf))
        out = t.assign(
            up=t["s"].str.upper(),
            lo=t["s"].str.lower(),
            n=t["s"].str.len(),
            stripped=t["s"].str.strip(),
            first_num=t["s"].str.extract(r"(\d+)"),
            piece=t["s"].str.split(",").str.get(0),
            sliced=t["s"].str.slice(0, 3),
            z=t["s"].str.zfill(20),
            chained=t["s"].str.strip().str.upper(),
        ).df.collect()
        got = {r.s: r for r in out}
        for s in pdf.s:
            r = got[s]
            assert r.up == s.upper()
            assert r.lo == s.lower()
            assert r.n == len(s)
            assert r.stripped == s.strip()
            assert r.piece == s.split(",")[0]
            assert r.sliced == s[0:3]
            assert r.z == s.zfill(20)
            assert r.chained == s.strip().upper()
        assert got["x9y"].first_num == "9"
        assert got["a,b,c"].first_num == ""  # no match → '' like Spark

    def test_dt_accessor_matches_pandas(self, spark):
        pdf = pd.DataFrame(
            {"ts": pd.to_datetime(["2024-03-07 14:45:33", "2023-12-25 01:02:03"])}
        )
        t = Table(spark.createDataFrame(pdf))
        out = t.assign(
            yr=t["ts"].dt.year,
            mo=t["ts"].dt.month,
            dow=t["ts"].dt.dayofweek,
            hb=t["ts"].dt.floor("H"),
            db=t["ts"].dt.floor("D"),
            fmt=t["ts"].dt.strftime("%Y/%m/%d"),
        ).df.collect()
        got = {pd.Timestamp(r.ts): r for r in out}
        for ts in pdf.ts:
            r = got[ts]
            assert r.yr == ts.year
            assert r.mo == ts.month
            assert r.dow == ts.dayofweek  # Monday=0 pandas convention
            assert pd.Timestamp(r.hb) == ts.floor("h")
            assert pd.Timestamp(r.db) == ts.floor("D")
            assert r.fmt == ts.strftime("%Y/%m/%d")

    def test_series_col_comparisons_filter(self, spark):
        t = Table(spark.range(0, 10).selectExpr("id", "cast(id as string) AS s"))
        n = t.df.filter(t["id"] >= 5).count()
        assert n == 5

    def test_dt_floor_bad_freq_raises(self, spark):
        import datetime

        t = Table(
            spark.createDataFrame([(datetime.datetime(2024, 1, 1),)], "ts timestamp")
        )
        with pytest.raises(ValueError, match="unsupported freq"):
            t.assign(b=t["ts"].dt.floor("5min"))


class TestRankDuplicated:
    def test_rank_methods_match_pandas(self, spark):
        pdf = pd.DataFrame(
            {"g": ["a", "a", "a", "b", "b", "b"], "v": [1.0, 2.0, 2.0, 5.0, 5.0, 7.0]}
        )
        t = Table(spark.createDataFrame(pdf.reset_index()))
        for method in ("average", "min", "max", "dense"):
            got = {
                r["index"]: r["v_rank"]
                for r in t.groupby("g").rank("v", method=method).df.collect()
            }
            exp = pdf.groupby("g").v.rank(method=method)
            assert got == {i: exp[i] for i in range(len(pdf))}, method

    def test_rank_first_requires_tie_break(self, spark):
        t = Table(spark.createDataFrame([("a", 1.0)], "g string, v double"))
        with pytest.raises(ValueError, match="tie_break"):
            t.groupby("g").rank("v", method="first")

    def test_duplicated_flags(self, spark):
        t = Table(
            spark.createDataFrame(
                [(1, "x"), (2, "x"), (3, "y")], "id long, k string"
            )
        )
        got = {r.id: r.duplicated for r in t.duplicated(["k"], order_by="id").df.collect()}
        assert got == {1: False, 2: True, 3: False}
        last = {
            r.id: r.duplicated
            for r in t.duplicated(["k"], order_by="id", keep="last").df.collect()
        }
        assert last == {1: True, 2: False, 3: False}


class TestPivotMargins:
    def test_margins_match_pandas(self, spark):
        pdf = pd.DataFrame(
            {
                "g": ["a", "a", "b", "b", "b"],
                "c": ["x", "y", "x", "x", "y"],
                "v": [1.0, 2.0, 3.0, 4.0, 5.0],
            }
        )
        t = Table(spark.createDataFrame(pdf))
        out = t.pivot_table(
            index="g", columns="c", values="v", aggfunc="sum", margins=True
        )
        got = {r.g: (r.x, r.y, r.All) for r in out.df.collect()}
        exp = pd.pivot_table(
            pdf, index="g", columns="c", values="v", aggfunc="sum", margins=True
        )
        for g in ("a", "b", "All"):
            row = exp.loc[g]
            assert got[g] == (row["x"], row["y"], row["All"]), g

    def test_margins_multi_index_raises(self, spark):
        t = Table(spark.createDataFrame([("a", "b", "x", 1.0)], "g string, h string, c string, v double"))
        with pytest.raises(ValueError, match="single index"):
            t.pivot_table(index=["g", "h"], columns="c", values="v", margins=True)


class TestGroupbyColumns:
    def test_axis_columns_matches_pandas(self, spark):
        pdf = pd.DataFrame(
            {
                "a1": [1.0, None, 3.0],
                "a2": [10.0, 20.0, None],
                "b1": [100.0, 200.0, 300.0],
            }
        )
        mapping = {"a1": "a", "a2": "a", "b1": "b"}
        t = Table(spark.createDataFrame(pdf))
        for fn in ("sum", "max", "min", "mean"):
            got = [
                (r.a, r.b)
                for r in getattr(t.groupby(mapping, axis="columns"), fn)().df.collect()
            ]
            exp = getattr(pdf.groupby(mapping, axis=1), fn)()
            for i, (ga, gb) in enumerate(got):
                ea, eb = exp.iloc[i]["a"], exp.iloc[i]["b"]
                assert (ga is None and pd.isna(ea)) or ga == ea, (fn, i)
                assert (gb is None and pd.isna(eb)) or gb == eb, (fn, i)

    def test_axis_columns_requires_mapping(self, spark):
        t = Table(spark.createDataFrame([(1.0,)], "x double"))
        with pytest.raises(ValueError, match="mapping"):
            t.groupby("x", axis="columns")
        with pytest.raises(ValueError, match="unknown columns"):
            t.groupby({"nope": "g"}, axis="columns")


class TestFillCompare:
    def test_ffill_bfill_match_pandas(self, spark):
        pdf = pd.DataFrame(
            {"i": [1, 2, 3, 4, 5], "v": [None, 10.0, None, None, 40.0]}
        )
        t = Table(spark.createDataFrame(pdf))
        f = {r.i: r.v for r in t.ffill(["v"], order_by="i").df.collect()}
        b = {r.i: r.v for r in t.bfill(["v"], order_by="i").df.collect()}
        ef = pdf.set_index("i").v.ffill()
        eb = pdf.set_index("i").v.bfill()
        for i in pdf.i:
            assert (f[i] is None and pd.isna(ef[i])) or f[i] == ef[i]
            assert (b[i] is None and pd.isna(eb[i])) or b[i] == eb[i]

    def test_compare_reports_differing_cells(self, spark):
        a = Table(spark.createDataFrame([(1, "x", 1.0), (2, "y", 2.0)], "id long, s string, v double"))
        b = Table(spark.createDataFrame([(1, "x", 9.0), (2, "z", 2.0), (3, "w", 0.0)], "id long, s string, v double"))
        got = {
            (r.id, r.col_name): (r.self_value, r.other_value)
            for r in a.compare(b, keys=["id"]).df.collect()
        }
        # key 3 excluded (aligned-frames semantics); only differing cells
        assert got == {(1, "v"): ("1.0", "9.0"), (2, "s"): ("y", "z")}


class TestMergeOrdered:
    """pd.merge_ordered parity: outer alignment on an ordered key,
    per-group right replication (left_by), ffill of join gaps."""

    L = pd.DataFrame(
        {
            "grp": ["a", "a", "b", "b"],
            "t": [1, 3, 2, 4],
            "lv": [10.0, 30.0, 20.0, 40.0],
        }
    )
    R = pd.DataFrame({"t": [1, 2, 3], "rv": [100.0, 200.0, 300.0]})

    @staticmethod
    def _canon(pdf):
        cols = sorted(pdf.columns)
        return (
            pdf[cols]
            .sort_values(cols)
            .reset_index(drop=True)
            .astype({c: "float64" for c in cols if c not in ("grp",)})
        )

    def test_plain_outer_alignment(self, spark):
        from pandas_etl_spark.pandas_ops import merge_ordered

        l = Table(spark.createDataFrame(self.L[["t", "lv"]]))
        r = Table(spark.createDataFrame(self.R))
        got = merge_ordered(l, r, on="t").df.toPandas()
        exp = pd.merge_ordered(self.L[["t", "lv"]], self.R, on="t")
        pd.testing.assert_frame_equal(self._canon(got), self._canon(exp))

    def test_left_by_with_ffill(self, spark):
        from pandas_etl_spark.pandas_ops import merge_ordered

        l = Table(spark.createDataFrame(self.L))
        r = Table(spark.createDataFrame(self.R))
        got = merge_ordered(
            l, r, on="t", left_by="grp", fill_method="ffill"
        ).df.toPandas()
        exp = pd.merge_ordered(
            self.L, self.R, on="t", left_by="grp", fill_method="ffill"
        )
        pd.testing.assert_frame_equal(
            self._canon(got).reset_index(drop=True),
            self._canon(exp).reset_index(drop=True),
        )

    def test_bad_fill_method_raises(self, spark):
        from pandas_etl_spark.pandas_ops import merge_ordered

        l = Table(spark.createDataFrame(self.L))
        with pytest.raises(ValueError, match="fill_method"):
            merge_ordered(l, Table(spark.createDataFrame(self.R)), on="t", fill_method="bfill")
