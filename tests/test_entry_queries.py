"""Driver-contract checks: every queries() entry runs on Spark at sf0.01 and
matches its oracle_sql() in DuckDB on row count + order-insensitive value
hash (columns sorted by name) — mimicking the driver's CORRECTNESS gate."""

import datetime
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_val(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm_val(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


ORACLED = sorted(entrymod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entrymod.queries()) - set(ORACLED))


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    rel = ddb.sql(entrymod.oracle_sql()[name])
    d_cols = rel.columns
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), \
        f"{name}: columns {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), \
        f"{name}: rowcount {len(s_rows)} vs {len(d_rows)}"
    a = _normalize(s_rows, s_cols)
    b = _normalize(d_rows, d_cols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        raise AssertionError(f"{name}: value mismatch, e.g. {diffs}")


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    q = entrymod.queries()[name]
    df = q(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert [f.name for f in df.schema.fields] == ["subj", "pred", "obj",
                                                  "doc_id"]


def test_finalize_releases_operator_caches(spark):
    """ADVICE r02: the driver harness never calls release_caches, so the
    cache-attaching entry queries must clean up after themselves.  Checks
    both layers deterministically: release_caches flips every attached
    frame's storage level back to NONE, and the _finalize'd driver wrapper
    returns a frame with no cache handles left to leak."""
    from recrun_spark.functions.dedup import minhash_lsh_pairs
    from recrun_spark.operators import release_caches
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = minhash_lsh_pairs(docs, threshold=0.30)
    out.count()
    caches = out._recrun_caches
    assert caches and all(c.storageLevel.useMemory for c in caches)
    release_caches(out)
    assert all(not c.storageLevel.useMemory for c in caches)

    df = entrymod.queries()["dedup_minhash_lsh"](spark, SF_DIR)
    assert getattr(df, "_recrun_caches", None) in (None, [])
    assert df.count() > 0
