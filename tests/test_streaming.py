"""Structured Streaming ingestion: AvailableNow drain, incremental pickup
of new files, and parity of streaming vs batch extraction output."""

import os

import pyarrow.parquet as pq

import __spark_entry__ as _entry

from recrun_spark.fixtures.generator import corpus_to_arrow, make_corpus
from recrun_spark.streaming import run_available_now


def _write_batch(corpus, path):
    pq.write_table(corpus_to_arrow(corpus), path)


def test_streaming_incremental_extraction(spark, tmpdir_path):
    in_dir = os.path.join(tmpdir_path, "in")
    out_dir = os.path.join(tmpdir_path, "out")
    os.makedirs(in_dir)
    corpus = make_corpus(30)

    # first arrival window: 20 docs
    _write_batch(corpus[:20], os.path.join(in_dir, "b0.parquet"))
    run_available_now(spark, in_dir, out_dir)
    got = spark.read.parquet(os.path.join(out_dir, "extractions"))
    assert got.count() == 20

    # second window: 10 more docs — only the new file is processed
    _write_batch(corpus[20:], os.path.join(in_dir, "b1.parquet"))
    run_available_now(spark, in_dir, out_dir)
    got = spark.read.parquet(os.path.join(out_dir, "extractions"))
    assert got.count() == 30

    # streaming output == batch output (same fold, same results)
    from recrun_spark.stage1 import extract_documents
    batch = extract_documents(spark.read.parquet(in_dir))
    a = sorted((r["doc_id"], r["score"], r["text_length"])
               for r in got.collect())
    b = sorted((r["doc_id"], r["score"], r["text_length"])
               for r in batch.collect())
    assert a == b


def test_stateful_sessionization_across_microbatches(spark, tmpdir_path):
    """applyInPandasWithState sessionizer: 3 time-ranged files -> 3
    micro-batches, per-user state carried across them; closed sessions must
    equal the batch SQL computation (sessionize, drop each user's last)."""
    import duckdb

    from recrun_spark.streaming.sessions import (prepare_ranged_events,
                                                 run_sessionize_available_now)
    events = "/root/testdata/sf0.001/events.parquet"
    src = prepare_ranged_events(events, os.path.join(tmpdir_path, "in"), 3)
    assert len(os.listdir(src)) == 3
    schema = spark.read.parquet(events).schema
    out_dir = os.path.join(tmpdir_path, "out")
    sink = run_sessionize_available_now(spark, src, out_dir, schema)
    got = sorted((r["user_id"], r["session_id"], r["n_events"],
                  r["start_us"], r["end_us"])
                 for r in spark.read.parquet(sink).collect())

    # state REALLY carried across micro-batches: one offset file per batch
    offsets = os.listdir(os.path.join(out_dir, "_checkpoint", "offsets"))
    assert len([f for f in offsets if not f.startswith(".")]) == 3

    oracle = sorted(map(tuple, duckdb.sql(
        _entry.closed_sessions_sql(f"read_parquet('{events}')")
    ).fetchall()))
    assert len(oracle) > 0 and got == oracle


def test_stateful_sessionization_resumes_across_restarts(spark, tmpdir_path):
    """State must survive a query RESTART, not just micro-batches: drain 3
    time-ranged files, stop, land a 4th (later) file, drain again with the
    SAME checkpoint — the second run continues each user's open session
    from the state store, and the accumulated closed sessions equal the
    batch computation over ALL events."""
    import shutil

    import duckdb

    from recrun_spark.streaming.sessions import (prepare_ranged_events,
                                                 run_sessionize_available_now)
    events = "/root/testdata/sf0.001/events.parquet"
    staging = prepare_ranged_events(events,
                                    os.path.join(tmpdir_path, "staging"), 4)
    files = sorted(os.listdir(staging))
    src = os.path.join(tmpdir_path, "in")
    os.makedirs(src)
    for f in files[:3]:
        shutil.copy2(os.path.join(staging, f), os.path.join(src, f))
    schema = spark.read.parquet(events).schema
    out_dir = os.path.join(tmpdir_path, "out")

    sink = run_sessionize_available_now(spark, src, out_dir, schema)
    n_first = spark.read.parquet(sink).count()
    shutil.copy2(os.path.join(staging, files[3]), os.path.join(src, files[3]))
    sink = run_sessionize_available_now(spark, src, out_dir, schema)

    got = sorted((r["user_id"], r["session_id"], r["n_events"],
                  r["start_us"], r["end_us"])
                 for r in spark.read.parquet(sink).collect())
    assert len(got) > n_first  # the restart emitted additional sessions

    oracle = sorted(map(tuple, duckdb.sql(
        _entry.closed_sessions_sql(f"read_parquet('{events}')")
    ).fetchall()))
    assert got == oracle


def test_incremental_kg_stream_equals_batch(spark, tmpdir_path):
    """Incremental KG over a document stream: 3 arrival files → 3
    foreachBatch micro-batches writing batch=<id>/ triples; their union
    must equal the batch pipeline over the same 60 docs EXACTLY (every
    triple rule is doc-scoped, each doc lands in one batch).  A 4th file
    landing later is processed alone (resume via checkpoint), and the
    combined output equals the 80-doc batch computation."""
    import pyarrow.parquet as pq

    from recrun_spark.fixtures.generator import corpus_to_arrow, make_corpus
    from recrun_spark.stage2 import detect_mentions, link_mentions, load_aliases
    from recrun_spark.stage3 import canonicalize
    from recrun_spark.stage4 import assemble_triples
    from recrun_spark.stage1 import extract_documents
    from recrun_spark.streaming.kg import run_kg_available_now

    corpus = make_corpus(80)
    src = os.path.join(tmpdir_path, "docs_in")
    os.makedirs(src)
    for i, sl in enumerate((corpus[0:20], corpus[20:40], corpus[40:60])):
        pq.write_table(corpus_to_arrow(sl),
                       os.path.join(src, f"arrival-{i:02d}.parquet"))

    out_dir = os.path.join(tmpdir_path, "kg_stream")
    root = run_kg_available_now(spark, src, out_dir)
    batches = sorted(d for d in os.listdir(root) if d.startswith("batch="))
    assert len(batches) == 3

    def triple_set(df):
        return {(r["subj"], r["pred"], r["obj"], r["doc_id"])
                for r in df.collect()}

    def batch_triples(n_docs):
        docs_path = os.path.join(tmpdir_path, f"all_{n_docs}.parquet")
        pq.write_table(corpus_to_arrow(corpus[:n_docs]), docs_path)
        docs = spark.read.parquet(docs_path)
        aliases = load_aliases(spark)
        surfaces = [r["alias"]
                    for r in aliases.select("alias").distinct().collect()]
        ex = extract_documents(docs)
        linked = link_mentions(detect_mentions(ex, surfaces), aliases)
        return triple_set(assemble_triples(ex, linked, canonicalize(aliases)))

    got60 = triple_set(spark.read.parquet(os.path.join(root, "batch=*")))
    assert got60 == batch_triples(60) and len(got60) > 0

    # a late 4th arrival: only it is processed, union covers all 80 docs
    pq.write_table(corpus_to_arrow(corpus[60:80]),
                   os.path.join(src, "arrival-03.parquet"))
    run_kg_available_now(spark, src, out_dir)
    batches = sorted(d for d in os.listdir(root) if d.startswith("batch="))
    assert len(batches) == 4
    got80 = triple_set(spark.read.parquet(os.path.join(root, "batch=*")))
    assert got80 == batch_triples(80)
