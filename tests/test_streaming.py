"""Structured Streaming ingestion: AvailableNow drain, incremental pickup
of new files, and parity of streaming vs batch extraction output."""

import os

import pyarrow.parquet as pq

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
