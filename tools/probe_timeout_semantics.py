"""One-off probe: which watermark does applyInPandasWithState use for
EventTimeTimeout in micro-batch mode?

Model A (eviction watermark): batch k fires timeouts against
  max_event_ts(batches 1..k) - delay  (includes the CURRENT batch's data)
Model B (late-event watermark): against max_event_ts(batches 1..k-1) - delay

Layout (delay=10s, gap=1800s):
  file1: u1 @ 1000s, 1010s      -> u1 timeout_ts = 2810s
  file2: u2 @ 4600s             -> u2 timeout_ts = 6400s
  file3: u3 @ 11000s
Model A => u1 AND u2 trailing sessions emitted.
Model B => only u1 emitted.
"""
import os
import shutil
import sys
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recrun_spark.session import get_spark  # noqa: E402
from recrun_spark.streaming.sessions import (  # noqa: E402
    run_sessionize_available_now)

BASE = 1_700_000_000  # epoch seconds


def mkfile(rows, path):
    pdf = pd.DataFrame({
        "event_id": [r[0] for r in rows],
        "ts": pd.to_datetime([int(round((BASE + r[2]) * 1_000_000))
                              for r in rows],
                             unit="us").astype("datetime64[us]"),
        "user_id": [r[1] for r in rows],
        "event_type": "x", "value": 1.0, "props": "{}",
    })
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)


def main():
    spark = get_spark("probe_timeout", cpus=4, shuffle_partitions=4)
    work = tempfile.mkdtemp(prefix="probe_timeout_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    if len(sys.argv) > 1 and sys.argv[1] == "boundary":
        # wm(2) = 2810s - 10s = 2800s.  Timeout_ts: A == wm exactly,
        # B = wm - 1ms, C = wm + 1ms.  (gap = 1800s)
        files = [
            [(1, 10, 1000.0), (2, 11, 999.999), (3, 12, 1000.001)],
            [(4, 99, 2810.0)],
        ]
    else:
        files = [
            [(1, 1, 1000), (2, 1, 1010)],
            [(3, 2, 4600)],
            [(4, 3, 11000)],
        ]
    for i, rows in enumerate(files):
        p = os.path.join(src, f"part-{i:03d}.parquet")
        mkfile(rows, p)
        os.utime(p, (1_000_000 + i, 1_000_000 + i))
    schema = spark.read.parquet(os.path.join(src, "part-000.parquet")).schema
    sink = run_sessionize_available_now(spark, src, os.path.join(work, "out"),
                                        schema, gap_s=1800, delay_ms=10_000)
    rows = sorted((r["user_id"], r["n_events"], r["start_us"], r["end_us"])
                  for r in spark.read.parquet(sink).collect())
    for r in rows:
        print("EMITTED", r)
    users = {r[0] for r in rows}
    if len(sys.argv) > 1 and sys.argv[1] == "boundary":
        if users == {11}:
            print("VERDICT: STRICT (fires when timeout_ts < wm)")
        elif users == {10, 11}:
            print("VERDICT: INCLUSIVE (fires when timeout_ts <= wm)")
        else:
            print("VERDICT: UNEXPECTED", users)
    elif users == {1, 2}:
        print("VERDICT: Model A (eviction watermark incl current batch)")
    elif users == {1}:
        print("VERDICT: Model B (previous-batch watermark)")
    else:
        print("VERDICT: UNEXPECTED", users)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
