"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design
------------
* **exact**: hash-groupBy on a 16-byte fingerprint — one shuffle keyed by
  the fingerprint; canonical = min doc_id per group.
* **n-gram Jaccard (exact)**: shingle co-occurrence join — pairs are
  generated ONLY for docs sharing at least one shingle (inverted-index
  pattern), never O(n²).  Hot shingles are capped (``max_shingle_freq``,
  df-style stopword cut) — the standard trick to stop a boilerplate shingle
  from exploding the candidate join at corpus scale.
* **MinHash+LSH**: K permutation-free min-hashes h_i = (a_i*x + b_i) mod p
  over md5-derived shingle values; banded into B bands → candidates share a
  band signature (groupBy band, join within bucket); exact-Jaccard verify
  of candidates.  All built-ins: explode → groupBy(doc) with array of mins
  via sequence+transform.
* **SimHash**: 60-bit signature via per-bit majority over token hashes —
  computed with explode + bit arithmetic, JVM-side.

Hash portability: token/shingle hashes are md5-derived (``_hash60``) rather
than engine-specific xxhash64, so any engine with md5 (DuckDB, Trino, …)
reproduces the signatures bit-for-bit — this is what makes the driver's
value-level oracle possible for minhash_sigs/simhash_sigs.  xxhash64 is
still used where the value never leaves the engine (LSH band buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import fingerprint_md5, normalize_text

# deterministic MinHash parameters (Mersenne prime scheme).  31-bit space:
# a*x+b stays < 2^62, safe under Spark 4's default ANSI overflow checking.
MH_PRIME = (1 << 31) - 1
MH_K = 64          # number of hash functions
LSH_BANDS = 32     # bands of MH_K // LSH_BANDS rows each (r=2)

SIMHASH_BITS = 60  # md5-prefix width that stays within signed 64-bit in
                   # every engine (15 hex chars = 60 bits, no sign games)


def _hash60(col: Column) -> Column:
    """Portable 60-bit hash: first 15 hex chars of md5 as an integer.
    Same cost class as xxhash64 (one digest per value) but reproducible in
    any SQL engine: DuckDB mirror is a fold over the hex digits."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _mh_params(k: int = MH_K, seed: int = 7):
    import random
    rng = random.Random(seed)
    return [(rng.randrange(1, MH_PRIME), rng.randrange(0, MH_PRIME))
            for _ in range(k)]


def exact_duplicates(documents: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, canonical_doc_id) — canonical = min doc_id per fingerprint."""
    fp = documents.select(F.col(id_col).alias("doc_id"),
                          fingerprint_md5(F.col(text_col)).alias("fp"))
    canon = fp.groupBy("fp").agg(F.min("doc_id").alias("canonical_doc_id"))
    return (fp.join(canon, "fp")
            .select("doc_id", "canonical_doc_id"))


def _shingle_toks(text_col: str) -> Column:
    """The exact token stream the shingle ops normalize to — shared with
    the exact-collapse fingerprint in dedup_clusters so that equal token
    streams ⇔ equal shingle sets, by construction."""
    return F.split(F.trim(F.regexp_replace(
        F.lower(F.col(text_col)), r"[^a-z0-9 ]", " ")), r"\s+")


def shingles(documents: DataFrame, n: int = 3, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams of the normalized text."""
    toks = _shingle_toks(text_col)
    d = documents.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    sh = d.select(
        "doc_id",
        F.explode(F.when(
            F.size("toks") >= n,
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - n),
                lambda i: F.concat_ws(" ", F.slice("toks", i + 1, n)))
        ).otherwise(F.array(F.concat_ws(" ", "toks")))).alias("shingle"))
    return sh.distinct()


def _df_cut(sh: DataFrame, max_shingle_freq: int) -> DataFrame:
    """Drop shingles present in more than ``max_shingle_freq`` docs —
    boilerplate that would explode the candidate join.  Numerator AND
    denominator of the Jaccard are computed over this same kept universe,
    so the score stays a true Jaccard of the kept-shingle sets (identical
    docs always score 1.0)."""
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    return sh.join(freq.where(F.col("df") <= max_shingle_freq)
                   .select("shingle"), "shingle")


def _kept_shingles(documents: DataFrame, n: int, text_col: str,
                   id_col: str, max_shingle_freq: int) -> DataFrame:
    """Distinct doc shingles after the df-cut."""
    return _df_cut(shingles(documents, n, text_col, id_col),
                   max_shingle_freq)


def _jaccard_of_pairs(pairs: DataFrame, sh_kept: DataFrame,
                      threshold: float, restrict: bool = True) -> DataFrame:
    """Exact Jaccard for the given (doc_a, doc_b) candidate pairs over the
    kept-shingle sets; pairs=None means all co-occurring pairs.

    With ``pairs`` given, the kept shingles are restricted ONCE to the
    union of candidate docs (one semi-join, persisted small frame) and
    sizes + both join sides all derive from that restricted frame — a
    doc's own kept-shingle count is unchanged by dropping other docs, so
    the Jaccard is identical to the full-universe computation.  (The r4
    shape ran two separate per-side semi-joins plus a third full-corpus
    kept-shingle cache fill; this collapses the verify stage onto one
    cached frame — VERDICT r04 #2.)  Extra co-occurring pairs inside the
    candidate-doc subset that never shared a band are filtered by the
    inner join back to ``pairs`` after the per-pair aggregate (after, not
    before: the groupBy combiner shrinks the shuffle first).

    ``restrict=False`` skips the candidate-doc semi-join and reads
    ``sh_kept`` directly — for callers whose candidate set already spans
    most of the corpus (the exact prefix-filter path: nearly every doc has
    SOME candidate, so the restriction buys nothing and costs two jobs +
    a duplicate cache of the shingle frame).

    Sets ``out._jp_caches`` to the persisted handles this stage created so
    callers can fold them into ``_recrun_caches``."""
    caches: list = []
    if pairs is None or not restrict:
        sh_c = sh_kept
    else:
        docs = (pairs.select(
                    F.explode(F.array("doc_a", "doc_b")).alias("doc_id"))
                .distinct())
        sh_c = sh_kept.join(docs, "doc_id").persist()
        caches.append(sh_c)
    sizes = sh_c.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh_c.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh_c.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (a.join(b, "shingle")
             .where(F.col("doc_a") < F.col("doc_b"))
             .groupBy("doc_a", "doc_b")
             .agg(F.count(F.lit(1)).alias("n_inter")))
    if pairs is not None:
        inter = inter.join(pairs, ["doc_a", "doc_b"])
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n_sh").alias("n_b"))
    out = (inter.join(sa, "doc_a").join(sb, "doc_b")
           .withColumn("jaccard",
                       F.round(F.col("n_inter")
                               / (F.col("n_a") + F.col("n_b")
                                  - F.col("n_inter")), 6))
           .where(F.col("jaccard") >= threshold)
           .select("doc_a", "doc_b", "jaccard"))
    out._jp_caches = caches
    return out


def jaccard_pairs(documents: DataFrame, threshold: float = 0.6,
                  n: int = 3, text_col: str = "text",
                  id_col: str = "doc_id",
                  max_shingle_freq: int = 1000) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs via the inverted-index
    co-occurrence join.  Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    # the kept-shingle frame feeds sizes + both join sides: persist so the
    # shingling and df-cut aggregate run once, not three times
    sh_kept = _kept_shingles(documents, n, text_col, id_col,
                             max_shingle_freq).persist()
    out = _jaccard_of_pairs(None, sh_kept, threshold)
    out._recrun_caches = [sh_kept]
    return out


def containment_pairs(documents: DataFrame,
                      min_containment_bp: int = 5000, n: int = 3,
                      text_col: str = "text", id_col: str = "doc_id",
                      max_shingle_freq: int = 1000,
                      min_intersection: int = 2) -> DataFrame:
    """ASYMMETRIC shingle containment C(A→B) = |S_A ∩ S_B| / |S_A|
    (Broder 1997 — *containment*, the directional companion of the
    resemblance the Jaccard ops compute): detects docs QUOTED OR
    EMBEDDED in a larger doc, where Jaccard stays low because the host's
    extra content inflates the union.  The standard quote/subset catch
    in pretraining dedup (a small doc fully contained in a big one).

    Same inverted-index shape as ``jaccard_pairs`` (co-occurrence join on
    the shared shingle over the df-cut universe — never all-pairs; the
    df-cut bounds the per-shingle fan-out) but DIRECTED: each ordered
    pair is scored against the SOURCE's shingle count only.  The ratio is
    integer basis points and the threshold is the exact cross-multiplied
    rational 10⁴·common ≥ bp·|S_A| — no float anywhere, value-hashable
    cross-engine.

    Returns (doc_a, doc_b, n_common:long, size_a:long,
    containment_bp:long): doc_a's kept shingles are ≥ bp/10⁴ contained
    in doc_b's."""
    sh = _kept_shingles(documents, n, text_col, id_col,
                        max_shingle_freq).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("size_a"))
    m1 = sh.select("shingle", F.col("doc_id").alias("doc_a"))
    m2 = sh.select("shingle", F.col("doc_id").alias("doc_b"))
    inter = (m1.join(m2, "shingle")
             .where(F.col("doc_a") != F.col("doc_b"))
             .groupBy("doc_a", "doc_b")
             .agg(F.count(F.lit(1)).alias("n_common"))
             .where(F.col("n_common") >= min_intersection))
    out = (inter.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
           .where(F.lit(10000) * F.col("n_common")
                  >= F.lit(min_containment_bp) * F.col("size_a"))
           .select("doc_a", "doc_b",
                   F.col("n_common").cast("long").alias("n_common"),
                   F.col("size_a").cast("long").alias("size_a"),
                   F.expr("10000 * n_common div size_a")
                   .cast("long").alias("containment_bp")))
    out._recrun_caches = [sh]
    return out


def _signatures_from_shingles(sh: DataFrame, k: int, seed: int) -> DataFrame:
    params = _mh_params(k, seed)
    h = sh.select("doc_id",
                  F.pmod(_hash60(F.col("shingle")), F.lit(MH_PRIME)).alias("x"))
    mins = h.groupBy("doc_id").agg(*[
        F.min(F.pmod(F.lit(a) * F.col("x") + F.lit(b), F.lit(MH_PRIME)))
        .alias(f"h{i}") for i, (a, b) in enumerate(params)])
    return mins.select("doc_id", F.array(*[F.col(f"h{i}")
                                           for i in range(k)]).alias("sig"))


def minhash_signatures(documents: DataFrame, k: int = MH_K, n: int = 3,
                       text_col: str = "text", id_col: str = "doc_id",
                       seed: int = 7) -> DataFrame:
    """(doc_id, sig array<bigint>) — k min-hashes over md5-derived shingle
    hashes (``_hash60`` — portable across engines for the value oracle)."""
    return _signatures_from_shingles(shingles(documents, n, text_col, id_col),
                                     k, seed)


def _banded_from_sig(sig: DataFrame, k: int, bands: int) -> DataFrame:
    """(doc_id, band, bucket) — LSH band buckets from the signature array
    (xxhash64 of the band's slice; engine-internal, never oracle-facing)."""
    rows = k // bands
    return sig.select(
        "doc_id",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda bnd: F.struct(
                bnd.alias("band"),
                F.xxhash64(F.concat_ws(
                    ",", F.transform(F.slice("sig", bnd * rows + 1, rows),
                                     lambda v: v.cast("string")))
                ).alias("bucket")))).alias("bb")) \
        .select("doc_id", F.col("bb.band").alias("band"),
                F.col("bb.bucket").alias("bucket"))


def minhash_lsh_pairs(documents: DataFrame, threshold: float = 0.6,
                      k: int = MH_K, bands: int = LSH_BANDS, n: int = 3,
                      text_col: str = "text", id_col: str = "doc_id",
                      seed: int = 7, materialize: bool = True) -> DataFrame:
    """LSH candidate generation + exact-Jaccard verification.

    Returns (doc_a, doc_b, jaccard) — candidates that share at least one
    band signature AND verify at exact Jaccard >= threshold.

    ``materialize=True`` (default) runs the LSH candidate job EAGERLY at
    construction so the three verify-stage consumers deterministically hit
    a fully-built cache (see the inline note).  Pass ``materialize=False``
    for plan-only callers (explain/audit, lazy composition) — the frames
    are still marked for caching, but no Spark job runs until an action.
    """
    # shingle the corpus ONCE: the same persisted frame feeds signature
    # computation AND the df-cut behind candidate verification (three
    # consumers — without the persist, three full shingle passes).
    # The portable md5-derived hash measures within noise of xxhash64 here
    # (the 64 min-aggregates dominate), so LSH banding uses the SAME
    # signatures the minhash_sigs query publishes.
    sh = shingles(documents, n, text_col, id_col).persist()
    sig = _signatures_from_shingles(sh, k, seed)
    banded = _banded_from_sig(sig, k, bands)
    # persist the banded frame: the candidate self-join consumes it on BOTH
    # sides, and without the cache each side re-runs the whole
    # signature+banding pipeline (the 64 min-aggregates, the most expensive
    # stage here) — two full signature computations inside one job (no
    # exchange reuse: the two subtrees differ by their projections).  The
    # eager count (materialize=True) fills the cache in one deterministic
    # job before the join touches it (r5 measured cold-cache races among
    # concurrent consumers re-running the pipeline).
    banded = banded.persist()
    if materialize:
        banded.count()
    ca = banded.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    cb = banded.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    # the candidate-pair frame is consumed THREE times by the verify stage
    # (doc_a filter, doc_b filter, final semi-join) — persist so each
    # consumer reads the cache instead of recomputing the LSH join.
    cands = (ca.join(cb, ["band", "bucket"])
             .where(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b").distinct().persist())
    if materialize:
        cands.count()
        # the verify stage never reads banded again — release it now so the
        # block manager isn't pinning signature rows through verification
        banded.unpersist()
    # the df-cut is a lazy agg+join over the CACHED shingle frame (skew-safe
    # partial aggregation — a windowed count per shingle would funnel every
    # row of a boilerplate shingle through one partition at corpus scale);
    # it is consumed exactly once now (to build the candidate-restricted
    # frame inside _jaccard_of_pairs), so it no longer needs its own
    # persist + cache-fill barrier (r4 ran a third full-corpus cache here)
    sh_kept = _df_cut(sh, max_shingle_freq=1000)
    # exact-Jaccard verification restricted to the CANDIDATE pairs only —
    # the whole point of LSH is to never run the full co-occurrence join
    out = _jaccard_of_pairs(cands, sh_kept, threshold)
    # expose the persisted intermediates so callers can release them after
    # materializing (operators.release_caches); on the materialize path
    # banded was already released at the candidate barrier, so only
    # plan-only callers still hold its handle
    out._recrun_caches = ([sh, cands] if materialize
                          else [sh, banded, cands]) + out._jp_caches
    return out


def dedup_clusters(documents: DataFrame, threshold: float = 0.6,
                   text_col: str = "text", id_col: str = "doc_id",
                   **lsh_kwargs) -> DataFrame:
    """End-to-end corpus dedup: (doc_id, canonical_doc_id) for EVERY
    document — LSH near-dup pairs → connected components (transitive
    closure: a≈b, b≈c puts a,c in one cluster even if a,c never paired) →
    canonical = min doc_id per cluster; non-duplicates map to themselves.

    This is the shape a training-data pipeline actually materializes (keep
    one representative per cluster).  All pieces are the scale-safe ones:
    banded LSH candidates, O(log n)-round large/small-star CC, one
    broadcast-free left join back to the corpus.

    EXACT-DUPLICATE COLLAPSE (guide §8 — decide with small rows): byte-
    identical token streams are grouped FIRST (md5 of the shingle token
    stream, so equal fingerprint ⇔ equal shingle set by construction) and
    only one REPRESENTATIVE per group runs through signatures, banding
    and verification — a mega-cluster of g identical crawls costs 1 doc,
    not g²/2 candidate pairs.  The df-cut keeps counting document
    frequency over the FULL corpus (not the collapsed one), so every
    pairwise Jaccard is numerically unchanged.  The result is IDENTICAL
    to the uncollapsed computation: identical docs always band together
    and verify at Jaccard 1.0 ≥ threshold (when they have ≥1 kept
    shingle), so each exact group is a clique that lands in its
    representative's component; groups whose shingles were all df-cut
    never pair in the original either and map to themselves.
    """
    from ..operators import connected_components
    k = lsh_kwargs.get("k", MH_K)
    bands = lsh_kwargs.get("bands", LSH_BANDS)
    n = lsh_kwargs.get("n", 3)
    seed = lsh_kwargs.get("seed", 7)
    max_freq = lsh_kwargs.get("max_shingle_freq", 1000)

    # per-doc exact fingerprint over the SAME token stream the shingles
    # normalize to; a doc_id appearing with conflicting texts (fp min !=
    # max) is left uncollapsed (fp NULL → its own representative), which
    # matches the original semantics of unioned shingle sets per doc_id
    fp_row = F.md5(F.concat_ws(" ", _shingle_toks(text_col)))
    fpd = (documents.select(F.col(id_col).alias("doc_id"),
                            fp_row.alias("_fp"))
           .groupBy("doc_id")
           .agg(F.min("_fp").alias("_fmin"), F.max("_fp").alias("_fmax"),
                F.count(F.lit(1)).alias("_nrow"),
                F.count("_fp").alias("_nfp")))
    fmap = fpd.select(
        "doc_id",
        F.when((F.col("_nfp") == F.col("_nrow"))
               & (F.col("_fmin") == F.col("_fmax")), F.col("_fmin"))
        .alias("fp"))
    rep = (fmap.where(F.col("fp").isNotNull())
           .groupBy("fp").agg(F.min("doc_id").alias("rep")))
    # doc -> representative (itself when uncollapsible); persisted — it
    # feeds the rep universe, the group sizes, and the final expansion
    docmap = (fmap.join(rep, "fp", "left")
              .select("doc_id", F.coalesce("rep", "doc_id").alias("rep"))
              .persist())
    reps = docmap.select(F.col("rep").alias("doc_id")).distinct()

    # the r5 candidate-barrier discipline (banded/cands persisted + eagerly
    # counted) — signatures and banding run over REPRESENTATIVES only;
    # the shingle frame and the df-cut stay full-corpus
    sh = shingles(documents, n, text_col, id_col).persist()
    sig = _signatures_from_shingles(
        sh.join(reps, "doc_id", "left_semi"), k, seed)
    banded = _banded_from_sig(sig, k, bands).persist()
    banded.count()
    ca = banded.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    cb = banded.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    cands = (ca.join(cb, ["band", "bucket"])
             .where(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b").distinct().persist())
    cands.count()
    banded.unpersist()
    sh_kept = _df_cut(sh, max_freq)
    pairs = _jaccard_of_pairs(cands, sh_kept, threshold)

    comp = connected_components(
        pairs.select(F.col("doc_a").alias("src"),
                     F.col("doc_b").alias("dst")), "src", "dst")
    # expansion: component(rep) if the rep paired; else the rep itself for
    # real groups (≥2 members) with ≥1 surviving kept shingle (the clique
    # the uncollapsed run would have formed at Jaccard 1.0); else identity
    gsz = docmap.groupBy("rep").agg(F.count(F.lit(1)).alias("_gn"))
    kept_reps = (sh_kept.join(reps, "doc_id", "left_semi")
                 .select(F.col("doc_id").alias("rep")).distinct()
                 .withColumn("_kept", F.lit(1)))
    out = (docmap.join(comp, docmap["rep"] == comp["node"], "left")
           .join(gsz, "rep")
           .join(kept_reps, "rep", "left")
           .select("doc_id",
                   F.coalesce(
                       F.col("component"),
                       F.when((F.col("_gn") >= 2)
                              & F.col("_kept").isNotNull(), F.col("rep")),
                       F.col("doc_id"))
                   .alias("canonical_doc_id")))
    # banded was released at the candidate barrier above — not listed
    out._recrun_caches = ([sh, docmap, cands]
                          + list(getattr(pairs, "_jp_caches", [])))
    return out


def decontaminate(documents: DataFrame, benchmark: DataFrame, n: int = 3,
                  text_col: str = "text", id_col: str = "doc_id",
                  bench_text_col: str | None = None,
                  broadcast_benchmark: bool = True) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any word
    ``n``-gram with a held-out evaluation set — the step that keeps test
    answers out of a pretraining corpus.  Returns one row per corpus doc:
    ``(doc_id, n_hits, contaminated)`` where ``n_hits`` counts DISTINCT
    shared shingles (the same normalization + shingling as the dedup
    operators, so the two universes are comparable) and ``contaminated``
    is ``n_hits > 0``.

    Scale shape: the benchmark shingle set is tiny next to the corpus
    (eval suites are thousands of docs, the corpus is billions) —
    ``broadcast_benchmark=True`` (default) ships it to every executor so
    the corpus-side shingle stream is filtered map-side with ZERO corpus
    shuffle before the per-doc hit count (a small aggregate over matches
    only).  Pass ``False`` for an oversized benchmark to take a shuffle
    equi-join on the shingle key instead.  Docs shorter than ``n`` tokens
    fall back to their whole normalized text as one shingle (same rule as
    ``shingles``), so short exact quotes still match."""
    bench_sh = (shingles(benchmark, n,
                         bench_text_col or text_col, id_col)
                .select("shingle").distinct())
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    doc_sh = shingles(documents, n, text_col, id_col)
    hits = (doc_sh.join(bench_sh, "shingle")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_hits")))
    ids = (documents.where(F.col(id_col).isNotNull())
           .select(F.col(id_col).alias("doc_id")).distinct())
    return (ids.join(hits, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_hits", F.lit(0).cast("long"))
                    .alias("n_hits"),
                    (F.coalesce("n_hits", F.lit(0)) > 0)
                    .alias("contaminated")))


def derive_simhash_blocks(n_docs: int, max_hamming: int = 3,
                          max_tables: int = 64,
                          collision_slack: int = 8) -> int:
    """Pick the SimHash block count m from the corpus size (the
    ``target_bucket_size`` pattern embedding_near_dups uses for K).

    The banding splits the signature into m blocks and keys candidates on
    every (m - k)-subset of blocks (k = ``max_hamming``) — exact by
    pigeonhole for ANY m > k: ≤ k differing bits touch ≤ k blocks, so at
    least one (m - k)-subset is untouched and still collides.  m = k + 1
    is the classic single-block-key scheme (key width 60/(k+1) bits);
    larger m widens each key to ~60·(m-k)/m bits, shrinking random
    band-bucket collisions at the cost of C(m, m-k) tables per doc.

    Returns the smallest m whose expected random collision volume
    ``C(m, m-k) · n² / 2^width`` stays within ``collision_slack · n``
    (linear in corpus size), capped at ``max_tables`` tables — so a
    10⁷-doc corpus automatically takes wider keys instead of silently
    drowning in the documented n²/2¹⁵ candidate flood."""
    import math
    k = max_hamming
    best = k + 1
    for m in range(k + 1, SIMHASH_BITS + 1):
        n_tables = math.comb(m, m - k)
        if n_tables > max_tables:
            break
        best = m
        width = (m - k) * (SIMHASH_BITS // m)   # conservative (min) width
        if n_tables * float(n_docs) ** 2 / (2.0 ** width) \
                <= collision_slack * max(n_docs, 1):
            return m
    return best


def simhash_near_dups(documents: DataFrame, max_hamming: int = 3,
                      text_col: str = "text", id_col: str = "doc_id",
                      n_blocks: int | None = None,
                      corpus_count: int | None = None) -> DataFrame:
    """(doc_a, doc_b, hamming) — pairs whose SimHash signatures differ in at
    most ``max_hamming`` bits.  EXACT result at LSH cost: signatures are
    split into ``n_blocks`` blocks, candidates share every block of at
    least one (n_blocks - max_hamming)-subset (pigeonhole: ≤ k differing
    bits cannot touch more than k blocks), and candidates are verified
    with the true Hamming distance.  One groupBy per key bucket + one
    equi-join — never an all-pairs comparison.

    ``n_blocks=None`` (default) derives the block count from a corpus
    count (one metadata-cheap count, or pass ``corpus_count`` to skip it)
    via ``derive_simhash_blocks`` — small corpora take the classic
    ``max_hamming + 1`` single-block keys, large corpora automatically
    widen keys so candidate volume stays ~linear in n instead of
    n²/2^(60/(k+1))."""
    from itertools import combinations
    k = max_hamming
    if n_blocks is None:
        n = corpus_count if corpus_count is not None \
            else documents.count()
        n_blocks = derive_simhash_blocks(n, k)
    if not (k < n_blocks <= SIMHASH_BITS):
        raise ValueError(
            f"n_blocks must be in ({k}, {SIMHASH_BITS}], got {n_blocks}")
    widths = [SIMHASH_BITS // n_blocks + (1 if i < SIMHASH_BITS % n_blocks
                                          else 0)
              for i in range(n_blocks)]
    offsets = [sum(widths[:i]) for i in range(n_blocks)]

    def block(i):
        return (F.shiftright(F.col("simhash"), offsets[i])
                .bitwiseAND(F.lit((1 << widths[i]) - 1)))

    sig = simhash(documents, text_col, id_col)
    keys = [
        F.struct(F.lit(ci).alias("band"),
                 F.concat_ws("_", *[block(i).cast("string")
                                    for i in combo]).alias("bucket"))
        for ci, combo in enumerate(combinations(range(n_blocks),
                                                n_blocks - k))]
    banded = sig.select(
        "doc_id", "simhash",
        F.explode(F.array(*keys)).alias("bb")) \
        .select("doc_id", "simhash", F.col("bb.band").alias("band"),
                F.col("bb.bucket").alias("bucket"))
    a = banded.select(F.col("doc_id").alias("doc_a"),
                      F.col("simhash").alias("sig_a"), "band", "bucket")
    b = banded.select(F.col("doc_id").alias("doc_b"),
                      F.col("simhash").alias("sig_b"), "band", "bucket")
    cands = (a.join(b, ["band", "bucket"])
             .where(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b", "sig_a", "sig_b").distinct())
    return (cands.withColumn(
                "hamming",
                F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
                .cast("int"))
            .where(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming"))


def simhash(documents: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash bigint) — SIMHASH_BITS-bit SimHash: bit b of the
    signature is 1 iff the majority of token hashes have bit b set.  Pure
    expressions: explode tokens → per-bit ±1 sums via shiftright/bitwise-and
    → reassemble.  60 bits (``_hash60``) keeps the signature non-negative
    and bit-identical across engines, so the DuckDB oracle reproduces it.
    """
    toks = F.split(F.trim(F.regexp_replace(
        F.lower(F.col(text_col)), r"[^a-z0-9 ]", " ")), r"\s+")
    t = (documents.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
         .select("doc_id", F.explode("toks").alias("tok"))
         .where(F.col("tok") != "")
         .select("doc_id", _hash60(F.col("tok")).alias("h")))
    bit_sums = t.groupBy("doc_id").agg(*[
        F.sum(F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1,
                     1).otherwise(-1)).alias(f"b{b}")
        for b in range(SIMHASH_BITS)])
    sig = bit_sums.select(
        "doc_id",
        sum((F.when(F.col(f"b{b}") > 0, F.lit(1 << b).cast("long"))
             .otherwise(F.lit(0).cast("long"))
             for b in range(SIMHASH_BITS)),
            start=F.lit(0).cast("long")).alias("simhash"))
    return sig


def duplicated_spans(documents: DataFrame, n: int = 8, min_docs: int = 2,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document exact duplicated-span profile — the ExactSubstr
    complement to MinHash/SimHash (Lee et al., "Deduplicating Training
    Data Makes Language Models Better", ACL'22 — PAPERS.md): near-dup
    methods score WHOLE documents, this finds verbatim n-token spans
    shared ACROSS documents (boilerplate, licenses, templated intros)
    that whole-doc scores dilute.

    Every stride-1 n-token window (raw whitespace tokens — content
    verbatim, same convention as chunk_windows) is keyed by a portable
    16-byte md5 of its text; a span is "duplicated" when it occurs in at
    least ``min_docs`` DISTINCT documents (within-doc self-repetition is
    repetition_stats' job).  Output: one row per document — total
    windows and duplicated windows, i.e. the fraction an
    exact-substring dedup pass would cut.  Docs shorter than ``n``
    tokens report 0/0.

    Scale shape: windows explode to ~n_tokens rows/doc; the span
    aggregate is one md5-keyed shuffle with map-side combine, and the
    ``min_docs`` threshold IS the df-cut — the duplicated-span index
    that comes back is the (tiny) head of the span distribution, joined
    against the window stream on the 16-byte key.  No all-pairs
    anything.

    Returns (doc_id, n_windows:long, n_dup_windows:long)."""
    if n < 1 or min_docs < 2:
        raise ValueError(
            f"need n >= 1 and min_docs >= 2, got n={n} min_docs={min_docs}")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = (documents.where(F.col(id_col).isNotNull())
            .select(F.col(id_col).alias("doc_id"), toks.alias("_toks")))
    wins = (base
            .where(F.size("_toks") >= n)
            .select("doc_id",
                    F.explode(F.transform(
                        F.sequence(F.lit(0), F.size("_toks") - n),
                        lambda i: F.md5(F.concat_ws(
                            " ", F.slice("_toks", i + 1, n)))))
                    .alias("span_h")))
    dup = (wins.groupBy("span_h")
           .agg(F.countDistinct("doc_id").alias("df"))
           .where(F.col("df") >= min_docs)
           .select("span_h"))
    per_doc = (wins.join(dup, "span_h", "left_semi")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_dup_windows")))
    totals = wins.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_windows"))
    return (base.select("doc_id")
            .join(totals, "doc_id", "left")
            .join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_windows", F.lit(0)).cast("long")
                    .alias("n_windows"),
                    F.coalesce("n_dup_windows", F.lit(0)).cast("long")
                    .alias("n_dup_windows")))


def jaccard_pairs_prefix(documents: DataFrame, threshold: float = 0.6,
                         n: int = 3, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Exact n-gram Jaccard pairs by PREFIX FILTERING (AllPairs — Bayardo
    et al. WWW'07; PPJoin — Xiao et al. WWW'08; PAPERS.md): the
    guaranteed-complete alternative to ``jaccard_pairs``'s df-cut when NO
    qualifying pair may be missed at scale.

    Shingles get a global order (df asc, shingle asc — rarest first);
    doc x INDEXES only its first ``|x| - ceil(t·|x|) + 1`` shingles.
    Any pair with J ≥ t shares ≥ ceil(t·|x|) shingles (the union contains
    x), so at least one shared shingle falls inside x's prefix — and that
    shingle is in y's FULL set, so the prefix(x) ⋈ full(y) join generates
    every qualifying pair.  Candidate volume is Σ_s prefdf(s)·df(s)
    instead of the full inverted index's Σ_s df(s)², and the rarest-first
    order makes prefixes the LOW-df shingles — boilerplate never enters
    the index.  ``ceil(t·|x|)`` is computed in INTEGER arithmetic (4-
    decimal threshold) — a float ceil landing one ulp above an integer
    would silently shorten a prefix and break the completeness proof.

    Verification reuses the shared exact-Jaccard stage over FULL shingle
    sets.  Returns (doc_a, doc_b, jaccard) with doc_a < doc_b — equal to
    ``jaccard_pairs`` with the df-cut disabled, by construction.

    Job shape (the r5 restructure — same class of fix as the LSH fixed-term
    shrink, VERDICT r04 #2): df, set size, and prefix position are all
    computed as WINDOW passes over the one persisted shingle frame — an
    Exchange by shingle, then an Exchange by doc_id whose sort serves both
    per-doc windows — instead of the old two groupBy aggregates + two
    joins back (five exchanges and two extra eager jobs for the same
    numbers).  The candidate join carries both docs' set sizes, so the
    AllPairs LENGTH filter (J ≥ t ⇒ min·10⁴ ≥ tp·max, integer form) prunes
    size-incompatible pairs BEFORE the distinct shuffle; the verify stage
    reads the same persisted frame directly (restrict=False — the exact
    path's candidate set spans nearly every doc, so the LSH-style
    candidate-doc semi-join would cost two jobs and buy nothing)."""
    from pyspark.sql import Window
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0,1], got {threshold}")
    tp = round(threshold * 10000)
    w_sh = Window.partitionBy("shingle")
    w_doc = Window.partitionBy("doc_id")
    w_ord = w_doc.orderBy(F.col("_df").asc(), F.col("shingle").asc())
    # shingles are distinct per doc, so (_df, shingle) is a strict total
    # order within a doc and row_number is deterministic
    pos = (shingles(documents, n, text_col, id_col)
           .withColumn("_df", F.count(F.lit(1)).over(w_sh))
           .withColumn("_n_sh", F.count(F.lit(1)).over(w_doc))
           .withColumn("_pos", F.row_number().over(w_ord))
           .persist())
    prefix = pos.where(F.col("_pos")
                       <= F.col("_n_sh")
                       - F.expr(f"cast(({tp} * _n_sh + 9999) div 10000 "
                                "as int)") + 1)
    cand = (prefix.select(F.col("doc_id").alias("_p"), "shingle",
                          F.col("_n_sh").alias("_np"))
            .join(pos.select(F.col("doc_id").alias("_f"), "shingle",
                             F.col("_n_sh").alias("_nf")),
                  "shingle")
            .where((F.col("_p") != F.col("_f"))
                   & (F.least("_np", "_nf") * 10000
                      >= tp * F.greatest("_np", "_nf")))
            .select(F.least("_p", "_f").alias("doc_a"),
                    F.greatest("_p", "_f").alias("doc_b"))
            .distinct())
    sh = pos.select("doc_id", "shingle")
    out = _jaccard_of_pairs(cand, sh, threshold, restrict=False)
    out._recrun_caches = [pos] + list(getattr(out, "_jp_caches", []))
    return out


def sorted_neighborhood_pairs(records: DataFrame, key_col: str,
                              id_col: str = "id", window: int = 4,
                              max_dist: int | None = None) -> DataFrame:
    """SORTED-NEIGHBORHOOD entity-resolution blocking (Hernández &
    Stolfo, SIGMOD 1995): sort the corpus by a blocking key, slide a
    window of size ``window`` over the sorted order, and emit every
    in-window pair as a candidate — n·(window−1) candidates instead of
    the n² cross join, the classic cheap blocking when near-duplicates
    sort near each other (names, normalized addresses, alias surfaces).
    Candidates are verified with exact Levenshtein distance; pass
    ``max_dist`` to keep only matches (None emits all candidates with
    their distances — the blocking-quality audit view).

    The global sort position comes from operators.global_rank — the
    two-phase prefix pattern (per-bucket counts to the driver, exclusive
    offsets broadcast back, in-bucket windows PARTITIONED by bucket), so
    there is NO single-partition window at any scale.  The window slide
    is a row-local explode of (rank+1 … rank+window−1) joined back on
    the target rank — one equi-join on an integer key.

    Keys must be non-null and UNIQUE per row (the pack_blocks/
    global_rank contract — duplicate keys would tie nondeterministically;
    callers append a unique suffix such as the id).  Returns
    (id_a, id_b, key_a, key_b, dist) with rank(id_a) < rank(id_b).

    Reference analog: none — recrun has no ER blocking; this generalizes
    the alias-matching family (linking.py, fuzzy_token_match) with the
    third classic candidate-generation strategy after deletion-variant
    equi-joins (SymSpell) and LSH banding."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    from recrun_spark.operators import global_rank

    ranked = global_rank(
        records.select(F.col(id_col), F.col(key_col)), key_col)
    left = ranked.select(
        F.col(id_col).alias("id_a"), F.col(key_col).alias("key_a"),
        F.explode(F.sequence(F.col("rank") + 1,
                             F.col("rank") + window - 1)).alias("trank"))
    right = ranked.select(
        F.col(id_col).alias("id_b"), F.col(key_col).alias("key_b"),
        F.col("rank").alias("trank"))
    out = (left.join(right, "trank")
           .select("id_a", "id_b", "key_a", "key_b",
                   F.levenshtein("key_a", "key_b").alias("dist")))
    if max_dist is not None:
        out = out.where(F.col("dist") <= max_dist)
    out._recrun_caches = list(getattr(ranked, "_recrun_caches", []))
    return out
