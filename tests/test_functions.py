"""Invariant and quality tests for the training-data operators (beyond the
per-query DuckDB value oracles in test_entry_queries.py): signature
invariants, dedup/ANN recall vs exact baselines, multimodal determinism,
and the stage-2 salted-join path."""

from pyspark.sql import functions as F


def test_simhash_invariants(spark):
    docs = spark.createDataFrame(
        [("a", "the quick brown fox jumps over the lazy dog"),
         ("b", "the quick brown fox jumps over the lazy dog"),
         ("c", "the quick brown fox jumps over the lazy cat"),
         ("d", "completely different vocabulary entirely unrelated words")],
        ["doc_id", "text"])
    from recrun_spark.functions.dedup import simhash
    sig = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sig["a"] == sig["b"]  # identical text -> identical signature

    def hamming(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    assert hamming(sig["a"], sig["c"]) < hamming(sig["a"], sig["d"])


def test_minhash_signature_shape_and_determinism(spark):
    from recrun_spark.functions.dedup import MH_K, minhash_signatures
    docs = spark.createDataFrame(
        [("a", "alpha beta gamma delta epsilon zeta eta theta")],
        ["doc_id", "text"])
    s1 = minhash_signatures(docs).collect()[0]["sig"]
    s2 = minhash_signatures(docs).collect()[0]["sig"]
    assert len(s1) == MH_K and s1 == s2
    assert all(0 <= v < (1 << 31) for v in s1)


def test_multimodal_features_deterministic(spark):
    from recrun_spark.functions.multimodal import (extract_features,
                                                   frame_sample_plan,
                                                   synth_media)
    media = synth_media(spark, n=24)
    f1 = sorted((r["media_id"], r["sha1"], tuple(r["feature"]))
                for r in extract_features(media).collect())
    f2 = sorted((r["media_id"], r["sha1"], tuple(r["feature"]))
                for r in extract_features(media).collect())
    assert f1 == f2
    assert all(len(t[2]) == 8 for t in f1)
    plan = frame_sample_plan(media, every_ms=1000)
    rows = plan.groupBy("media_id").count().collect()
    # every video contributes >= 1 frame timestamp; non-videos contribute 0
    vids = media.where(F.col("modality") == "video").count()
    assert len(rows) == vids
    assert all(r["count"] >= 1 for r in rows)


def test_near_dups_bucketed_recall_vs_exact(spark):
    """The bucketed (IVF multi-probe) near-dup path must be a subset of the
    exact all-pairs result (verification is exact cosine) and recover every
    exact pair at sf0.01 with the default 16 centroids / 6 probes — the
    boundary-pair coverage multi-probe exists for."""
    from recrun_spark.functions.similarity import embedding_near_dups
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact = {(r["id_a"], r["id_b"]) for r in
             embedding_near_dups(emb, threshold=0.45,
                                 method="exact").collect()}
    bucketed = {(r["id_a"], r["id_b"]) for r in
                embedding_near_dups(emb, threshold=0.45).collect()}
    assert bucketed <= exact            # exact verify => no false positives
    assert len(exact) > 0
    recall = len(bucketed) / len(exact)
    assert recall == 1.0, f"recall {recall:.3f}: missed {exact - bucketed}"


def test_stage2_salted_path_equivalence(spark, corpus_parquet):
    """Forcing the salted repartition-join must produce byte-identical
    linking to the broadcast path (skew handling is a physical choice,
    not a semantic one)."""
    from recrun_spark.stage1 import extract_documents
    from recrun_spark.stage2 import detect_mentions, link_mentions, load_aliases
    docs = spark.read.parquet(corpus_parquet).limit(50)
    aliases = load_aliases(spark)
    surfaces = [r["alias"] for r in aliases.select("alias").distinct().collect()]
    mentions = detect_mentions(extract_documents(docs), surfaces).persist()
    cols = ["doc_id", "surface", "span_offset", "start", "entity_id", "prior"]
    broadcasted = sorted(map(tuple, link_mentions(mentions, aliases)
                             .select(*cols).collect()))
    salted = sorted(map(tuple, link_mentions(mentions, aliases,
                                             broadcast_max_rows=0,
                                             salt_buckets=7)
                        .select(*cols).collect()))
    assert broadcasted == salted and len(broadcasted) > 0
    mentions.unpersist()


def test_head_alias_skew_share(spark, corpus_parquet):
    """FIXTURES.md §2 invariant: the head alias accounts for >30% of all
    mentions — the skew the salted join / AQE skew handling is sized for."""
    from pyspark.sql import functions as F

    from recrun_spark.fixtures.aliases import head_alias, make_aliases
    from recrun_spark.stage1 import extract_documents
    from recrun_spark.stage2 import detect_mentions
    surfaces = sorted({r[0] for r in make_aliases(42)})
    docs = spark.read.parquet(corpus_parquet)
    mentions = detect_mentions(extract_documents(docs), surfaces)
    head = head_alias()
    # exact equality: startswith would also count 'orion dynamics' etc. —
    # distinct join keys — overstating the single hot key's share
    counts = {r["is_head"]: r["count"] for r in mentions.groupBy(
        (F.col("surface") == head).alias("is_head")).count().collect()}
    total = sum(counts.values())
    share = counts.get(True, 0) / total
    assert share > 0.30, f"head share {share:.2f}"


def test_ivf_topk_recall_quality(spark):
    """IVF recall@10 vs brute force: ≥0.75 mean at the default-shaped
    nprobe=4/16, and monotonically improving with more probes — the
    quality/cost knob a user actually turns (deterministic corpus, so the
    measured values are stable)."""
    from recrun_spark.functions.similarity import cosine_topk, ivf_topk
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qids = list(range(20))

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    exact = topk_sets(cosine_topk(emb, qids, k=10))
    mean_recall = {}
    for nprobe in (2, 4, 6):
        approx = topk_sets(ivf_topk(emb, qids, k=10, n_centroids=16,
                                    nprobe=nprobe))
        rs = [len(exact[q] & approx.get(q, set())) / len(exact[q])
              for q in exact]
        mean_recall[nprobe] = sum(rs) / len(rs)
    assert mean_recall[4] >= 0.75, mean_recall
    assert mean_recall[2] < mean_recall[6], mean_recall
