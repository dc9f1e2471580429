"""CLI entry — the reference's `nextflow run main.nf -params-file
config.json [-resume]` invocation (README.md:199-212) as
`python -m cellphe_data_pipeline_spark`:

    python -m cellphe_data_pipeline_spark \
        --input raw/ --config config.json --out out/ \
        [--glob '*.tiff'] [--resume-dir stages/] [--stages summary,timeseries]

Runs the config-gated pipeline (plans/pipeline.run_pipeline_from_config;
run-flag sub-DAG gating identical to the reference's `if params.run.*`
blocks) and publishes the requested stage DataFrames as parquet under
--out, one directory per stage — the same published-artifact layout the
reference's publishDir produces, minus the CSV tax. With --resume-dir
each stage is staged to parquet and reused when already present
(run_pipeline_resumable — the `-resume` contract at stage granularity).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="cellphe_data_pipeline_spark")
    ap.add_argument("--input", required=True, help="raw image directory (S1 glob scan)")
    ap.add_argument("--config", required=True, help="params-file JSON (S13)")
    ap.add_argument("--out", required=True, help="output directory (parquet per stage)")
    ap.add_argument("--glob", default="*.fake", help="image filename glob")
    ap.add_argument(
        "--resume-dir",
        default=None,
        help="stage-granular resume directory (the reference's -resume)",
    )
    ap.add_argument(
        "--stages",
        default="summary,timeseries",
        help="comma-separated stages to publish (default: the two final tables)",
    )
    ap.add_argument("--master", default=None, help="spark master override")
    args = ap.parse_args(argv)

    from cellphe_data_pipeline_spark.session import get_spark
    from cellphe_data_pipeline_spark.sources.io import publish, read_config

    spark = get_spark(app_name="cellphe-pipeline", master=args.master)
    cfg = read_config(spark, args.config)

    if args.resume_dir:
        from cellphe_data_pipeline_spark.domain.images import scan_images
        from cellphe_data_pipeline_spark.plans.pipeline import (
            config_to_run_kwargs,
            run_pipeline_resumable,
        )

        binaries = scan_images(spark, args.input, glob=args.glob).select(
            "path", "content"
        )
        # same config -> same pipeline on BOTH entry paths: the resumable
        # form takes run_pipeline kwargs, translated by the same helper
        # run_pipeline_from_config uses
        stages = run_pipeline_resumable(
            spark, binaries, args.resume_dir, **config_to_run_kwargs(cfg)
        )
    else:
        from cellphe_data_pipeline_spark.plans.pipeline import run_pipeline_from_config

        stages = run_pipeline_from_config(spark, args.input, cfg, glob=args.glob)

    import os

    wanted = [s.strip() for s in args.stages.split(",") if s.strip()]
    missing = [s for s in wanted if s not in stages]
    if missing:
        print(
            f"unknown stage(s) {missing}; available: {sorted(stages)}",
            file=sys.stderr,
        )
        return 2
    for stage in wanted:
        path = os.path.join(args.out, stage)
        publish(stages[stage], path)
        print(f"published {stage} -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
