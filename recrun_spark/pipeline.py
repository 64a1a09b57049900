"""End-to-end KG-construction pipeline with batch-level checkpoint/resume.

``run_pipeline(spark, input_path, out_dir)`` executes:

  stage1_extract   documents → extractions            (zero-shuffle map)
  stage2_mentions  extractions → mentions → linked    (broadcast dict join)
  stage3_canonical aliases → canonical map            (large/small-star CC)
  stage4_triples   → deduped triples, partitioned by pred

Each stage writes ``<out_dir>/<stage>/`` via TableIO with a ``_MANIFEST.json``
completion marker; a re-run skips any stage whose manifest is complete
(kill-and-resume reproduces identical triples — tests/test_stages_kg.py).

CLI:  python -m recrun_spark.pipeline --input spans.parquet --out /tmp/kg
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

from .io.tableio import read_manifest, read_table, write_table
from .readability import Settings
from .stage1 import extract_documents
from .stage2 import detect_mentions, link_mentions, load_aliases
from .stage3 import canonicalize
from .stage4 import assemble_triples

STAGES = ("stage1_extract", "stage2_mentions", "stage3_canonical",
          "stage4_triples")


def _stage(spark: SparkSession, out_dir: str, name: str, build,
           partition_by=None, lineage_key: str = "doc_id",
           force: bool = False) -> DataFrame:
    path = os.path.join(out_dir, name)
    m = None if force else read_manifest(path)
    if m is not None:
        return read_table(spark, path)
    df = build()
    write_table(df, path, partition_by=partition_by, stage=name,
                lineage_key=lineage_key)
    return read_table(spark, path)


def run_pipeline(spark: SparkSession, input_path: str, out_dir: str,
                 aliases_df: DataFrame | None = None,
                 settings: Settings | None = None,
                 force: bool = False,
                 include_renders: bool = True) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    aliases = aliases_df if aliases_df is not None else load_aliases(spark)
    surfaces = [r["alias"] for r in aliases.select("alias").distinct().collect()]

    documents = spark.read.parquet(input_path)

    extractions = _stage(
        spark, out_dir, "stage1_extract",
        lambda: extract_documents(documents, settings,
                                  include_renders=include_renders),
        force=force)

    linked = _stage(
        spark, out_dir, "stage2_mentions",
        lambda: link_mentions(detect_mentions(extractions, surfaces), aliases),
        force=force)

    canonical = _stage(
        spark, out_dir, "stage3_canonical",
        lambda: canonicalize(aliases),
        lineage_key="entity_id", force=force)

    built4 = {}

    def _build4():
        df = assemble_triples(extractions, linked, canonical)
        built4["df"] = df
        return df

    triples = _stage(
        spark, out_dir, "stage4_triples", _build4,
        partition_by=["pred"], force=force)
    if built4.get("df") is not None:
        from .operators import release_caches
        release_caches(built4["df"])

    # doc count comes from the stage-1 manifest lineage (one extraction row
    # per document) — NOT an upfront documents.count(), which would be a
    # full extra scan of the input at 10^12-doc scale
    stage1_manifest = read_manifest(os.path.join(out_dir, "stage1_extract"))
    summary = {
        "input": input_path,
        "docs": (stage1_manifest or {}).get("rows"),
        "triples": triples.count(),
        "wall_sec": round(time.time() - t0, 3),
        "stages": {s: read_manifest(os.path.join(out_dir, s)) for s in STAGES},
    }
    with open(os.path.join(out_dir, "_PIPELINE.json"), "w") as f:
        json.dump(summary, f, indent=1, default=str)
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--no-renders", action="store_true",
                    help="skip text/html renderings (KG-only outputs; "
                         "halves fold cost and most of stage-1 write bytes)")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()
    from .session import get_spark
    # Python-fold cost per input byte is ~100x a columnar scan's, so size
    # splits for CPU balance, not IO: small maxPartitionBytes keeps every
    # core busy in stage 1 (at real cluster scale, tune to ~docs-per-task
    # x fold-cost; the default 128m would starve a 32-core node on a
    # sub-GB corpus)
    spark = get_spark("recrun_pipeline", cpus=args.cpus, extra_conf={
        "spark.sql.files.maxPartitionBytes": "8m",
        "spark.sql.files.openCostInBytes": "2m",
    })
    summary = run_pipeline(spark, args.input, args.out, force=args.force,
                           include_renders=not args.no_renders)
    print(json.dumps({k: v for k, v in summary.items() if k != "stages"}))


if __name__ == "__main__":
    main()
