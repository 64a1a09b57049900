"""Ad-hoc single-query timer mirroring bench.py conditions.

Usage: python3 tools/time_query.py <query_name> [repeats] [sf_dir]
Prints each run's wall time and the median — for settling regressions
in-session (this host shows up to 3x noisy-neighbor variance, so never
conclude from n=1; see CLAUDE.md).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main():
    name = sys.argv[1]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entry
    from recrun_spark.operators import release_caches
    from recrun_spark.session import get_spark
    spark = get_spark("time_query", cpus=cpus, extra_conf={
        "spark.sql.files.maxPartitionBytes": "4m",
        "spark.sql.files.openCostInBytes": "4m",
    })
    # same warm-up as bench.py
    import pandas as pd

    def _noop(batches):
        for pdf in batches:
            yield pd.DataFrame({"n": [len(pdf)]})

    spark.range(1000).selectExpr("id", "cast(id as string) s") \
        .mapInPandas(_noop, "n long").agg(F.sum("n")).collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000) \
        .groupBy("l_returnflag").count().collect()

    qs = entry.queries()
    durs = []
    for i in range(repeats):
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.agg(F.count(F.lit(1))).collect()
        release_caches(df)
        durs.append(round(time.time() - t0, 3))
        print(f"run {i + 1}: {durs[-1]} s", flush=True)
    print(f"median of {repeats}: {round(statistics.median(durs), 3)} s")


if __name__ == "__main__":
    main()
