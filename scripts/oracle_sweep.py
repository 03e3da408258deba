#!/usr/bin/env python
"""One-command replica of the driver's correctness gate at any SF.

Runs every oracle-backed catalog query on Spark AND its DuckDB oracle
over the same parquet dir, compares rows/schema/values with the exact
harness semantics (tests/oracle_harness), and prints one line per
failure plus a summary. Exit code 1 on any mismatch.

Usage:
    python scripts/oracle_sweep.py [--shard i/n] [sf_dir] [name-substring ...]

Defaults to /root/testdata/sf0.01 (the driver's gate scale — the pytest
suite runs the same comparison at sf0.001). Optional name substrings
restrict the sweep, e.g. `python scripts/oracle_sweep.py
/root/testdata/sf0.01 tpch stream_`.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    argv = list(sys.argv[1:])
    # --shard i/n (or --shard=i/n): run only the i-th (1-based) of n
    # round-robin shards, so CI-style runs can parallelize the full
    # sweep across processes (registry order is stable, so shards are
    # disjoint and together cover every oracle-backed query).
    shard_i, shard_n = 0, 1
    spec = None
    if "--shard" in argv:
        k = argv.index("--shard")
        spec = argv[k + 1]
        del argv[k : k + 2]
    else:
        for a in list(argv):
            if a.startswith("--shard="):
                spec = a.split("=", 1)[1]
                argv.remove(a)
    if spec is not None:
        i_s, n_s = spec.split("/")
        shard_i, shard_n = int(i_s) - 1, int(n_s)
        if not (0 <= shard_i < shard_n):
            print(f"oracle_sweep: bad --shard {spec!r} (want 1/n..n/n)")
            return 2
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    needles = argv[1:]

    from pandas_etl_spark.catalog import ORACLES, QUERIES
    from pandas_etl_spark.session import get_spark
    from tests.oracle_harness import compare, run_oracle

    spark = get_spark("oracle_sweep", shuffle_partitions=8)
    names = [
        n for n in QUERIES
        if n in ORACLES and (not needles or any(s in n for s in needles))
    ]
    names = [n for i, n in enumerate(names) if i % shard_n == shard_i]
    if not names:
        print(
            f"oracle_sweep: no oracle query matches {needles!r} — "
            "refusing to report an empty sweep as green"
        )
        return 2
    fails = 0
    t0 = time.time()
    for n in names:
        try:
            problems = compare(QUERIES[n](spark, sf_dir), run_oracle(ORACLES[n], sf_dir))
        except Exception as e:  # noqa: BLE001 - sweep collects
            problems = [f"{type(e).__name__}: {str(e)[:200]}"]
        if problems:
            fails += 1
            print(f"FAIL {n}: " + "; ".join(problems))
    print(
        f"oracle_sweep: {len(names) - fails}/{len(names)} green at {sf_dir} "
        f"in {time.time() - t0:.0f}s"
    )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
