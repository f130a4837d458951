"""CLI entry — the engine's equivalent of the reference's ``python etl.py``
(reference etl.py:425-457): construct the pipeline, run extract→transform→
load, print the summary. Source/output/formats come from flags instead of
hard-coded paths + env vars.

    python -m sales_etl_pipeline_spark \
        --source /root/testdata/sf0.001 --output /tmp/out \
        --formats csv parquet sqlite
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="sales_etl_pipeline_spark",
        description="Run the star-schema analytics ETL (extract → transform → load).",
    )
    parser.add_argument("--source", required=True, help="input dir with star-schema parquet tables")
    parser.add_argument("--output", required=True, help="output directory for sinks")
    parser.add_argument(
        "--formats",
        nargs="+",
        default=["csv", "parquet", "sqlite"],
        choices=["csv", "parquet", "sqlite"],
        help="sink formats (JDBC sinks go through the writers API)",
    )
    parser.add_argument(
        "--training-data",
        action="store_true",
        help="also run the documents curation pipeline (dedup + filters)",
    )
    parser.add_argument(
        "--versioned",
        action="store_true",
        help="publish output tables as versioned-snapshot commits "
        "(sources/table.py: time travel, consistent reads mid-publish) "
        "instead of flat-file sinks; --formats is ignored",
    )
    parser.add_argument(
        "--catalog",
        action="store_true",
        help="publish ALL output tables in one multi-table ACID "
        "transaction (sources/catalog.py) — cross-table-consistent "
        "snapshots, catalog-wide time travel; --formats is ignored",
    )
    args = parser.parse_args(argv)

    from pyspark.sql import SparkSession

    from .operators.pipeline import AnalyticsPipeline, TrainingDataPipeline
    from .session import get_spark

    # getOrCreate may hand back a session owned by the embedding process
    # (tests, notebooks) — only stop what we created.
    preexisting = SparkSession.getActiveSession()
    spark = get_spark(app_name="sales-etl-cli")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        pipe = AnalyticsPipeline(spark, args.source, args.output)
        if args.versioned or args.catalog:
            import time

            start = time.time()
            pipe.extract()
            pipe.transform()
            written = pipe.load(versioned=args.versioned, catalog=args.catalog)
            summary = {
                "elapsed_seconds": round(time.time() - start, 2),
                "written": written,
                **pipe.get_summary(),
            }
        else:
            summary = pipe.run(args.formats)
        if args.training_data:
            summary["training_data"] = TrainingDataPipeline(
                spark, args.source, args.output
            ).run()
        print(json.dumps(summary, default=str, indent=2))
    finally:
        if preexisting is None:
            spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
