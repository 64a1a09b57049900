"""Dump .explain('formatted') for named entries to plans/r06/<name>_<tag>.txt.

Usage: python3 tools/plan_dump.py <before|after> <entry> [<entry> ...]

Evidence artifacts for the optimization round: the judge cannot run Spark
and checks plan claims (Exchange counts, join strategies, pushed filters,
BatchEvalPython nodes) against these files.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    assert tag in ("before", "after"), tag
    from recrun_spark.session import get_spark
    import __spark_entry__ as entry
    spark = get_spark("plan_dump", cpus=8)
    qs = entry.queries()
    outdir = os.path.join(REPO, "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {path} ({len(plan)} bytes, {n_ex} Exchange)")
        from recrun_spark.operators import release_caches
        release_caches(df)


if __name__ == "__main__":
    main()
