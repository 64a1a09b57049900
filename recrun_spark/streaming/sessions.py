"""Custom stateful streaming operator: per-key sessionization via
``applyInPandasWithState`` (SURVEY.md §2.8 — the stateful counterpart of
the batch ``events_sessionized`` query).

Semantics: events grouped by ``user_id``; a new session starts when the
gap to the previous event exceeds ``gap_s``.  A session is EMITTED when it
closes (a later event opens the next one); the trailing open session stays
in state — exactly what a production stream would do, and exactly what the
SQL oracle expresses by dropping each user's last session.

Ordering contract: within a micro-batch the operator sorts each group by
(ts, event_id); ACROSS micro-batches the input files must be time-ranged
(``prepare_ranged_events``) so a user's later events arrive in later
batches.  That is the standard file-backed replay shape; a live source
with out-of-order arrival would add a watermark + buffer in front (event
times in the corpus are naive timestamps, compared as integer
microseconds, timezone-free).

State: (last_us, session_id, n_events, start_us) per user — O(1) per key,
partitioned by the groupBy hash; scales to any key cardinality the state
store can shard.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("user_id bigint, session_id int, n_events bigint, "
                 "start_us bigint, end_us bigint")
STATE_SCHEMA = "last_us bigint, session_id int, n_events bigint, start_us bigint"

DEFAULT_GAP_S = 1800


def _fn_factory(gap_us: int):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState
           ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        parts = [p for p in pdfs if len(p)]
        if state.exists:
            last_us, sess_id, n_ev, start_us = state.get
        else:
            last_us, sess_id, n_ev, start_us = -1, 0, 0, -1
        out = {"user_id": [], "session_id": [], "n_events": [],
               "start_us": [], "end_us": []}
        if parts:
            pdf = pd.concat(parts, ignore_index=True).sort_values(
                ["ts", "event_id"])
            for t in (pdf["ts"].astype("int64") // 1000).tolist():
                if sess_id == 0 or t - last_us > gap_us:
                    if sess_id > 0:  # close the previous session
                        out["user_id"].append(user_id)
                        out["session_id"].append(sess_id)
                        out["n_events"].append(n_ev)
                        out["start_us"].append(start_us)
                        out["end_us"].append(last_us)
                    sess_id += 1
                    n_ev = 1
                    start_us = t
                else:
                    n_ev += 1
                last_us = t
        state.update((last_us, sess_id, n_ev, start_us))
        yield pd.DataFrame(out)

    return fn


def sessionize_stream(events: DataFrame, gap_s: int = DEFAULT_GAP_S
                      ) -> DataFrame:
    """events stream -> closed sessions (OUTPUT_SCHEMA), stateful per
    user_id."""
    return (events.groupBy("user_id")
            .applyInPandasWithState(_fn_factory(gap_s * 1_000_000),
                                    OUTPUT_SCHEMA, STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))


def prepare_ranged_events(events_parquet: str, out_dir: str,
                          n_files: int = 3) -> str:
    """Split an events parquet into ``n_files`` time-ranged files (equal-ts
    rows kept together, file mtimes ascending) so the file stream source
    replays them oldest-first and per-key order holds across micro-batches.
    Pure pyarrow/pandas — this is test/replay scaffolding, not a pipeline
    stage."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(out_dir, exist_ok=True)
    table = pq.read_table(events_parquet)
    pdf = table.to_pandas().sort_values(["ts", "event_id"]) \
        .reset_index(drop=True)
    n = len(pdf)
    cuts = [0]
    for i in range(1, n_files):
        c = (n * i) // n_files
        while c < n and c > 0 and pdf["ts"].iloc[c] == pdf["ts"].iloc[c - 1]:
            c += 1  # keep equal timestamps in one file
        cuts.append(c)
    cuts.append(n)
    base_mtime = None
    for i in range(n_files):
        part = pdf.iloc[cuts[i]:cuts[i + 1]]
        path = os.path.join(out_dir, f"part-{i:03d}.parquet")
        pq.write_table(pa.Table.from_pandas(part, schema=table.schema,
                                            preserve_index=False), path)
        st = os.stat(path)
        if base_mtime is None:
            base_mtime = st.st_mtime
        os.utime(path, (base_mtime + i, base_mtime + i))
    return out_dir


def run_sessionize_available_now(spark: SparkSession, events_dir: str,
                                 out_dir: str, schema,
                                 gap_s: int = DEFAULT_GAP_S) -> str:
    """Drain the ranged event files through the stateful sessionizer into a
    parquet sink (exactly-once via checkpoint); returns the sink path."""
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")   # force multi-batch state
              .parquet(events_dir))
    sink = os.path.join(out_dir, "sessions")
    q = (sessionize_stream(stream, gap_s)
         .writeStream.format("parquet")
         .option("path", sink)
         .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
         .trigger(availableNow=True)
         .outputMode("append")
         .start())
    q.awaitTermination()
    return sink
