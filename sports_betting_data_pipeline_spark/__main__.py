"""Command-line runner for the query catalog:

    python -m sports_betting_data_pipeline_spark --list
    python -m sports_betting_data_pipeline_spark q01_pricing_summary \\
        --sf-dir /data/sf0.1 --show 20
    python -m sports_betting_data_pipeline_spark l08_minhash_lsh \\
        --sf-dir /data/sf0.1 --out /tmp/near_dups.parquet

(also installed as the ``sbdp-query`` console script). Every catalog
query is a pure ``(SparkSession, sf_dir) -> DataFrame`` callable, so
the runner is a thin argparse shim: build/reuse a session via
:func:`session.get_spark` (cluster deployments submit this module via
``spark-submit`` and the active session is reused as-is), resolve the
query, and either show rows or write parquet.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="sbdp-query",
        description="Run a catalog query against a fixture/table directory.",
    )
    parser.add_argument("query", nargs="?", help="catalog query id (see --list)")
    parser.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR"),
        help="directory holding the parquet tables (default: $SPARK_GRAFT_SF_DIR)",
    )
    parser.add_argument(
        "--list", action="store_true", help="list query ids and exit"
    )
    parser.add_argument(
        "--show", type=int, default=20, metavar="N", help="print N rows (default 20)"
    )
    parser.add_argument(
        "--out", metavar="PATH", help="write the full result as parquet instead of showing"
    )
    args = parser.parse_args(argv)

    from sports_betting_data_pipeline_spark.plans import ORACLES, QUERIES

    if args.list:
        for name in sorted(QUERIES):
            kind = "hash-oracle" if name in ORACLES else "rows-only"
            print(f"{name}  [{kind}]")
        return 0
    if not args.query:
        parser.error("a query id is required (or --list)")
    if args.query not in QUERIES:
        import difflib

        close = difflib.get_close_matches(args.query, QUERIES, n=3)
        parser.error(
            f"unknown query {args.query!r}"
            + (f"; did you mean: {', '.join(close)}?" if close else "")
        )
    if not args.sf_dir:
        parser.error("--sf-dir is required (or set $SPARK_GRAFT_SF_DIR)")
    if not os.path.isdir(args.sf_dir):
        parser.error(f"--sf-dir {args.sf_dir!r} is not a directory")

    from sports_betting_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"sbdp-{args.query}")
    df = QUERIES[args.query](spark, args.sf_dir)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        df.show(args.show, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
