"""spark-submit entrypoint for the quality-filter pipeline.

    spark-submit --py-files soda_core_spark.zip -m ... \
        cli.py --input /path/webpages --output /path/out \
               --lineage /path/lineage --state /path/state --buckets 64

or locally:

    python -m soda_core_spark.cli --input ... --output ...

Mirrors the reference's CLI verify flow (soda-core cli/cli.py:120-307) in
spirit: parse args → build session → run → exit code from result status.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_session(app_name: str = "soda_core_spark", cpus: str | None = None):
    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName(app_name)
    if cpus:  # local mode; on a cluster spark-submit supplies the master
        builder = builder.master(f"local[{cpus}]")
        builder = builder.config("spark.sql.shuffle.partitions", str(cpus))
        builder = builder.config("spark.driver.memory", "90g")
    spark = (
        builder.config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    return spark


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="webtext quality-filter pipeline")
    p.add_argument("--input", required=True, help="input web_pages table path")
    p.add_argument("--output", required=True, help="annotated output path")
    p.add_argument("--lineage", default=None, help="per-host lineage table path")
    p.add_argument("--state", default=None, help="checkpoint state dir (resumable)")
    p.add_argument("--buckets", type=int, default=16)
    p.add_argument("--salt", action="store_true", help="salted repartition for host-clustered inputs")
    p.add_argument("--local-cpus", default=None, help="run local[N] instead of cluster master")
    args = p.parse_args(argv)

    from soda_core_spark.operators.filter_pipeline import QualityFilterPipeline
    from soda_core_spark.sources.checkpoint import run_resumable

    spark = build_session(cpus=args.local_cpus)
    df = spark.read.parquet(args.input)
    pipeline = QualityFilterPipeline()

    if args.state:
        states = run_resumable(
            pipeline,
            df,
            output_path=args.output,
            state_dir=args.state,
            n_buckets=args.buckets,
            lineage_path=args.lineage,
        )
        summary = {
            "buckets": len(states),
            "n_docs": sum(s.n_docs for s in states),
            "n_kept": sum(s.n_kept for s in states),
        }
    else:
        res = pipeline.run(
            df,
            output_path=args.output,
            lineage_path=args.lineage,
            salt=args.salt,
        )
        summary = {
            "n_docs": res.n_input,
            "n_kept": res.n_kept,
            "docs_per_second": round(res.docs_per_second, 1),
            "per_rule_fail": res.per_rule_fail,
        }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
