"""CLI entry point (F17): ``python -m pandas_etl_spark --file run.yaml
--var a=b --imports extra.yaml`` — same flags as the reference
(/root/reference/pandas_etl/__main__.py:7-59) plus Spark knobs."""

from __future__ import annotations

import argparse
import sys

from pandas_etl_spark.pipeline import Pipeline
from pandas_etl_spark.pipeline.yaml_loader import parse_command_line_variables


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="pandas_etl_spark", description="Run a YAML-defined Spark ETL pipeline"
    )
    parser.add_argument("-f", "--file", required=True, help="pipeline YAML file")
    parser.add_argument(
        "-i",
        "--imports",
        action="extend",
        nargs="+",
        default=[],
        help="additional YAML files to import",
    )
    parser.add_argument(
        "--var",
        action="extend",
        nargs="+",
        default=[],
        metavar="name=value",
        help="override variables",
    )
    parser.add_argument("--master", default=None, help="Spark master (default local[*cpus])")
    parser.add_argument(
        "--conf",
        action="extend",
        nargs="+",
        default=[],
        metavar="key=value",
        help="extra Spark conf",
    )
    parser.add_argument(
        "--explain",
        action="store_true",
        help=(
            "dry run: build every step's plan but skip sink/checkpoint "
            "writes, printing a per-sink plan audit (scans, exchanges, "
            "join strategies, pushdown, red-flag lint) instead"
        ),
    )
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    spark = None
    if args.master or args.conf:
        from pandas_etl_spark.session import get_spark

        extra = dict(kv.split("=", 1) for kv in args.conf)
        spark = get_spark("pandas_etl_spark.cli", master=args.master, extra_conf=extra)
    pipeline = Pipeline(
        yamlData=args.file,
        includeImports=args.imports,
        overrideVariables=parse_command_line_variables(args.var),
        spark=spark,
    )
    if args.explain:
        from pandas_etl_spark.pandas_ops import EXPLAIN_ONLY

        token = EXPLAIN_ONLY.set(True)
        try:
            pipeline.run()
        finally:
            EXPLAIN_ONLY.reset(token)
    else:
        pipeline.run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
