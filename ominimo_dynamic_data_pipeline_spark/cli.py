"""CLI entry point (reference parity: ``python main.py --input-path P
--dataflow-name N``, ``/root/reference/main.py:159-177``).

    python -m ominimo_dynamic_data_pipeline_spark \
        --metadata examples/motor_pipeline.json \
        --dataflow-name motor-ingestion \
        --input-path 'Data/*.json' [--no-write] [--verbose]

Differences from the reference, per SURVEY.md §3: the metadata path is an
explicit argument (not hardcoded), the input-path binding never mutates the
metadata document, and debug count/show only run under --verbose.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="ominimo-dynamic-data-pipeline-spark",
        description="Run a metadata-declared dataflow on Spark.",
    )
    p.add_argument("--metadata", required=True, help="metadata JSON path")
    p.add_argument(
        "--dataflow-name", default=None, help="dataflow to run (default: first)"
    )
    p.add_argument(
        "--input-path",
        default=None,
        help="override the first source's path (glob or comma-list ok)",
    )
    p.add_argument("--master", default=None, help="Spark master override")
    p.add_argument(
        "--no-write", action="store_true", help="compile + stats only, skip sinks"
    )
    p.add_argument(
        "--verbose", action="store_true", help="debug counts + show() per sink"
    )
    p.add_argument(
        "--log-dir",
        default="Data/output/logs",
        help="directory for the timestamped run log file",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from ominimo_dynamic_data_pipeline_spark.logger import setup_logging

    logger = setup_logging(log_dir=args.log_dir)
    from ominimo_dynamic_data_pipeline_spark.config import load_metadata
    from ominimo_dynamic_data_pipeline_spark.pipeline import run_pipeline
    from ominimo_dynamic_data_pipeline_spark.session import get_spark

    input_path: str | list[str] | None = args.input_path
    if input_path and "," in input_path:
        input_path = [p for p in input_path.split(",") if p]

    spark = get_spark(app_name="pipeline-cli", master=args.master)
    try:
        meta = load_metadata(args.metadata)
        result = run_pipeline(
            spark,
            meta,
            args.dataflow_name,
            input_path=input_path,
            write=not args.no_write,
            verbose=args.verbose,
        )
        for name, count in result.counts.items():
            logger.info("%s: %d rows", name, count)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
