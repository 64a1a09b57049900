"""Stages 2-4 + pipeline: triple parity vs golden (P/R >= 0.95 gate —
BASELINE.json), CC correctness vs union-find, salted join equivalence,
checkpoint/resume."""

import json
import os
import random

import pytest
from pyspark.sql import functions as F

GOLDEN_TRIPLES = os.path.join(os.path.dirname(__file__), "..", "data",
                              "golden", "triples.jsonl")


def load_golden_triples():
    with open(GOLDEN_TRIPLES) as f:
        return {tuple(json.loads(line)) for line in f}


def test_connected_components_vs_union_find(spark):
    from recrun_spark.operators import connected_components
    rng = random.Random(7)
    nodes = [f"n{i:03d}" for i in range(60)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(70)]
    edges = [(a, b) for a, b in edges if a != b]

    # golden union-find
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    expected = {n: find(n) for n in nodes
                if any(n in e for e in edges)}

    df = spark.createDataFrame(edges, ["src", "dst"])
    touched = {n for e in edges for n in e}
    want = {n: expected[n] for n in touched}
    # BOTH paths must emit identical min-label assignments: the distributed
    # large/small-star loop (small_graph_rows=0 forces it) and the
    # driver-local union-find fast path (default takes it at this size)
    for kwargs in ({"small_graph_rows": 0}, {}):
        got = {r["node"]: r["component"]
               for r in connected_components(df, **kwargs).collect()}
        assert set(got) == touched, kwargs
        assert got == want, kwargs


def test_canonicalize_matches_golden(spark):
    from recrun_spark.fixtures.aliases import make_aliases
    from recrun_spark.linking import canonical_map
    from recrun_spark.stage2 import load_aliases
    from recrun_spark.stage3 import canonicalize
    rows = make_aliases(42)
    golden = canonical_map(rows)
    got = {r["entity_id"]: r["canonical_id"]
           for r in canonicalize(load_aliases(spark, rows)).collect()}
    assert got == golden


def test_salted_join_equivalence(spark):
    from recrun_spark.operators import salted_join
    big = spark.createDataFrame(
        [(f"k{i % 3}", i) for i in range(100)], ["k", "v"])
    small = spark.createDataFrame(
        [("k0", "a"), ("k1", "b"), ("k2", "c"), ("k9", "z")], ["kk", "w"])
    plain = sorted(map(tuple, big.join(small, big.k == small.kk)
                       .select("k", "v", "w").collect()))
    salted = sorted(map(tuple, salted_join(big, small, "k", "kk", buckets=4)
                        .select("k", "v", "w").collect()))
    assert plain == salted


@pytest.fixture(scope="module")
def pipeline_out(spark, corpus_parquet, tmp_path_factory):
    from recrun_spark.pipeline import run_pipeline
    out = str(tmp_path_factory.mktemp("kg_out"))
    summary = run_pipeline(spark, corpus_parquet, out)
    return out, summary


def test_triple_parity(spark, pipeline_out):
    """P/R >= 0.95 on (subj, pred, obj) vs reference-derived golden triples.
    (By construction of the shared rules we expect exact equality; the 0.95
    gate is the BASELINE.json requirement.)"""
    out, _ = pipeline_out
    got = {(r["subj"], r["pred"], r["obj"])
           for r in spark.read.parquet(os.path.join(out, "stage4_triples"))
           .select("subj", "pred", "obj").distinct().collect()}
    ref = {(s, p, o) for s, p, o, _d in load_golden_triples()}
    tp = len(got & ref)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(ref) if ref else 0.0
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    # and, since the rules are shared code, expect exact match:
    assert got == ref


def test_resume_skips_completed_stages(spark, corpus_parquet, pipeline_out):
    """Kill-and-resume: a second run must reuse manifests (fast) and
    reproduce identical triples."""
    import time

    from recrun_spark.pipeline import run_pipeline
    out, first = pipeline_out
    t0 = time.time()
    second = run_pipeline(spark, corpus_parquet, out)
    resume_wall = time.time() - t0
    assert second["triples"] == first["triples"]
    assert resume_wall < first["wall_sec"]  # stages skipped, only reads

    # simulate a crash after stage1: delete stage2+ manifests, re-run
    for s in ("stage2_mentions", "stage3_canonical", "stage4_triples"):
        os.remove(os.path.join(out, s, "_MANIFEST.json"))
    third = run_pipeline(spark, corpus_parquet, out)
    assert third["triples"] == first["triples"]


def test_triples_partitioned_by_pred(pipeline_out):
    out, _ = pipeline_out
    parts = [d for d in os.listdir(os.path.join(out, "stage4_triples"))
             if d.startswith("pred=")]
    assert sorted(parts) == ["pred=co_mentioned_with", "pred=illustrated_by",
                             "pred=mentioned_in", "pred=next_page_of"]
    manifest = json.load(open(os.path.join(out, "stage4_triples",
                                           "_MANIFEST.json")))
    assert manifest["complete"] and manifest["rows"] > 0
    assert {p["pred"] for p in manifest["partitions"]} == {
        "co_mentioned_with", "illustrated_by", "mentioned_in",
        "next_page_of"}
