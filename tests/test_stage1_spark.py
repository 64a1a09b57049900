"""Stage-1 distributed extraction must equal the Node-oracle golden
extractions exactly — the span-equality suite running through Spark."""

import json
import os

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "data", "golden",
                      "extractions.jsonl")


@pytest.fixture(scope="module")
def golden_shipped():
    recs = {}
    with open(GOLDEN) as f:
        for line in f:
            r = json.loads(line)
            if r["config"] == "shipped":
                recs[r["doc_id"]] = r
    return recs


def test_stage1_matches_oracle(spark, corpus_parquet, golden_shipped):
    from recrun_spark.stage1 import extract_documents
    docs = spark.read.parquet(corpus_parquet)
    out = extract_documents(docs).collect()
    assert len(out) == len(golden_shipped) == 200
    bad = []
    for row in out:
        ref = golden_shipped[row["doc_id"]]
        mine = [[s["kind"], s["text"], s["media_ref"], s["offset"]]
                for s in row["retained_spans"]]
        if mine != ref["retained_spans"]:
            bad.append((row["doc_id"], "spans"))
        for k in ("title", "next_page", "text_length", "score", "text",
                  "html"):
            if row[k] != ref[k]:
                bad.append((row["doc_id"], k))
    assert not bad, bad[:5]


def test_stage1_determinism_across_partitionings(spark, corpus_parquet):
    """North-rule determinism: N vs 4N parallelism yields identical output."""
    from recrun_spark.stage1 import extract_documents
    docs = spark.read.parquet(corpus_parquet)
    a = sorted(map(tuple, extract_documents(docs.repartition(2))
                   .select("doc_id", "score", "text_length").collect()))
    b = sorted(map(tuple, extract_documents(docs.repartition(16))
                   .select("doc_id", "score", "text_length").collect()))
    assert a == b


def test_explode_retained_order(spark, corpus_parquet):
    """getEvents-replay analog: posexplode preserves document order."""
    from recrun_spark.stage1 import explode_retained, extract_documents
    docs = spark.read.parquet(corpus_parquet).limit(20)
    rows = (explode_retained(extract_documents(docs))
            .orderBy("doc_id", "pos").collect())
    assert rows, "no retained spans"
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["pos"], r["offset"]))
    for doc_id, seq in by_doc.items():
        poss = [p for p, _ in seq]
        offs = [o for _, o in seq]
        assert poss == list(range(len(poss))), doc_id
        assert offs == sorted(offs), doc_id
