#!/usr/bin/env python
"""Measure parquet file-skipping effectiveness of the three layout
strategies on the sf0.1 events table (SCALE.md 'Z-order' section).

For each layout (unsorted / sorted-by-user_id / z-ordered on
(user_id, value)) writes 16 files, then — from footer min/max stats
alone, the same information the parquet reader's row-group filter
uses — counts how many files a reader must touch for:
  A) 1-dim predicate: user_id in a ~12%-wide range
  B) 1-dim predicate: value in a ~10%-deep range
  C) 2-dim predicate: A AND B
"""

from __future__ import annotations

import glob
import sys

import pyarrow.parquet as pq

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pandas_etl_spark.session import get_spark
from pandas_etl_spark.sources.io import to_parquet_sorted
from pandas_etl_spark.sources.layout import to_parquet_zorder

N_FILES = int(sys.argv[1]) if len(sys.argv) > 1 else 16


def spans(out_dir: str, col: str) -> list[tuple]:
    res = []
    for f in glob.glob(out_dir + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        st = [md.row_group(rg).column(idx).statistics for rg in range(md.num_row_groups)]
        if st:
            res.append((f, min(s.min for s in st), max(s.max for s in st)))
    return res


def touched(out_dir: str, preds: dict[str, tuple]) -> int:
    per_col = {c: {f: (lo, hi) for f, lo, hi in spans(out_dir, c)} for c in preds}
    files = next(iter(per_col.values())).keys()
    n = 0
    for f in files:
        if all(
            per_col[c][f][0] <= hi and per_col[c][f][1] >= lo
            for c, (lo, hi) in preds.items()
        ):
            n += 1
    return n


def main() -> None:
    import tempfile

    spark = get_spark("zorder-eval")
    ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet").select(
        "event_id", "user_id", "value"
    )
    u_lo, u_hi, v_lo, v_hi = 100, 279, 30.0, 40.0  # ~12% of users, ~10% of value depth
    pred_u = {"user_id": (u_lo, u_hi)}
    pred_v = {"value": (v_lo, v_hi)}
    pred_uv = {**pred_u, **pred_v}

    tmp = tempfile.mkdtemp()
    layouts = {}
    ev.repartition(N_FILES).write.parquet(f"{tmp}/plain")
    layouts["unsorted"] = f"{tmp}/plain"
    to_parquet_sorted(ev, f"{tmp}/sorted", ["user_id"], n_files=N_FILES)
    layouts["sorted(user_id)"] = f"{tmp}/sorted"
    to_parquet_zorder(ev, f"{tmp}/zorder", ["user_id", "value"], bits=8, n_files=N_FILES)
    layouts["zorder(user_id,value)"] = f"{tmp}/zorder"

    print(f"{'layout':24s} {'user pred':>10s} {'value pred':>11s} {'both':>6s}  (files touched of {N_FILES})")
    for name, path in layouts.items():
        print(
            f"{name:24s} {touched(path, pred_u):>10d} {touched(path, pred_v):>11d} "
            f"{touched(path, pred_uv):>6d}"
        )


if __name__ == "__main__":
    main()
