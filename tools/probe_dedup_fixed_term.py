"""Decompose the dedup job's fixed (core-count-independent) driver term.

VERDICT r04 #2 / BENCH_SCALING_DEDUP: `dedup_clusters` on 50k near-uniform
docs scales 0.476 at 2→8 cores; the Amdahl fit puts ~10 s of the 2-core
27.7 s in a core-count-independent term.  This probe times each job
boundary of the operator separately at one parallelism level so the term
can be ATTRIBUTED rather than guessed at:

  scan      — corpus read + length aggregate (page-cache warm-up)
  cands     — LSH candidate job (shingle cache fill + 64 min-agg + banding)
  edges     — verify pipeline → CC probe collect (the edge transfer)
  finalize  — canonical-map join + final count + cache release

Usage: python tools/probe_dedup_fixed_term.py [--cpus 8] [--docs 50000]
Runs each phase `--repeats` times in ONE JVM (phases re-run end-to-end —
caches are released between repeats so repeat N doesn't read repeat N-1's
warm cache) and prints one JSON line with per-phase medians.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--docs", type=int, default=50000)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from tools.bench_scaling import ensure_dedup_corpus
    corpus = ensure_dedup_corpus(args.docs, mega=100)

    from recrun_spark.session import get_spark
    from pyspark.sql import functions as F
    from recrun_spark.functions import dedup
    from recrun_spark.operators import connected_components, release_caches

    spark = get_spark(f"probe{args.cpus}", cpus=args.cpus, extra_conf={
        "spark.sql.files.maxPartitionBytes": "4m",
        "spark.sql.files.openCostInBytes": "4m"})
    docs = spark.read.parquet(corpus)
    docs.agg(F.sum(F.length("text"))).collect()  # warm page cache

    phases: dict[str, list[float]] = {}

    def t(name, fn):
        t0 = time.time()
        r = fn()
        phases.setdefault(name, []).append(round(time.time() - t0, 3))
        return r

    for _ in range(args.repeats):
        t("scan", lambda: docs.agg(F.sum(F.length("text"))).collect())
        pairs = dedup.minhash_lsh_pairs(docs, 0.6, materialize=False)
        caches = list(getattr(pairs, "_recrun_caches", []))
        # phase: candidate job exactly as materialize=True runs it
        cands = None
        for c in caches:
            # minhash_lsh_pairs appends [sh, cands, sh_c...]; find the
            # (doc_a, doc_b) frame by schema
            if set(c.columns) == {"doc_a", "doc_b"}:
                cands = c
        if cands is not None:
            t("cands", cands.count)
        edges = pairs.select(F.col("doc_a").alias("src"),
                             F.col("doc_b").alias("dst"))
        comp = t("edges_cc", lambda: connected_components(edges,
                                                          "src", "dst"))
        ids = docs.select("doc_id").distinct()
        out = (ids.join(comp, ids["doc_id"] == comp["node"], "left")
               .select("doc_id", F.coalesce("component", "doc_id")
                       .alias("canonical_doc_id")))
        t("finalize", out.count)
        for c in caches + list(getattr(comp, "_recrun_caches", [])):
            try:
                c.unpersist()
            except Exception:
                pass
        release_caches(out)

    med = {k: statistics.median(v) for k, v in phases.items()}
    print(json.dumps({"metric": "dedup_fixed_term_probe",
                      "cpus": args.cpus, "docs": args.docs,
                      "phase_medians_s": med, "phase_runs_s": phases}))


if __name__ == "__main__":
    main()
