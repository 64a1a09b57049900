"""Decompose dedup_minhash_lsh wall time: signature agg variants + stage
timings.  Usage: python3 tools/probe_minhash_r06.py [sf_dir]

Stages probed (each timed separately with noop-style count actions):
  shingle     — distinct doc shingles
  sig64       — current 64-min-aggregate signatures
  sig_arr     — variant: per-row 64-hash array, then 64 min(xs[i]) aggs
  band+cand   — banded self-join candidates
  verify      — exact-Jaccard verification
  entry       — the full entry, bench-identical
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def t(label, fn, n=3):
    durs = []
    for _ in range(n):
        t0 = time.time()
        fn()
        durs.append(time.time() - t0)
    print(f"{label:12} " + " ".join(f"{d:6.2f}" for d in durs), flush=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from recrun_spark.session import get_spark
    spark = get_spark("probe_minhash", cpus=cpus)
    import pandas as pd

    def _noop(batches):
        for pdf in batches:
            yield pd.DataFrame({"n": [len(pdf)]})
    spark.range(1000).selectExpr("id", "cast(id as string) s") \
        .mapInPandas(_noop, "n long").agg(F.sum("n")).collect()

    from recrun_spark.functions.dedup import (
        MH_K, MH_PRIME, _hash60, _mh_params, minhash_lsh_pairs, shingles)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    sh = shingles(docs)
    t("shingle", lambda: sh.agg(F.count(F.lit(1))).collect())

    params = _mh_params(MH_K, 7)
    h = sh.select("doc_id",
                  F.pmod(_hash60(F.col("shingle")), F.lit(MH_PRIME))
                  .alias("x"))

    def sig64():
        mins = h.groupBy("doc_id").agg(*[
            F.min(F.pmod(F.lit(a) * F.col("x") + F.lit(b), F.lit(MH_PRIME)))
            .alias(f"h{i}") for i, (a, b) in enumerate(params)])
        mins.agg(F.count(F.lit(1))).collect()
    t("sig64", sig64)

    def sig_arr():
        ab = F.lit([list(p) for p in params])
        xs = h.select("doc_id", F.transform(
            ab, lambda p: F.pmod(p[0] * F.col("x") + p[1],
                                 F.lit(MH_PRIME))).alias("xs"))
        mins = xs.groupBy("doc_id").agg(*[
            F.min(F.col("xs")[i]).alias(f"h{i}") for i in range(MH_K)])
        mins.agg(F.count(F.lit(1))).collect()
    t("sig_arr", sig_arr)

    def entry():
        from recrun_spark.operators import release_caches
        out = minhash_lsh_pairs(docs, threshold=0.30)
        out.agg(F.count(F.lit(1))).collect()
        release_caches(out)
    t("entry", entry)


if __name__ == "__main__":
    main()
