"""Frequency sketches over unbounded key domains — the streaming-safe
counterpart of exact groupBy counts.

``count_min_sketch`` builds a COUNT-MIN SKETCH (Cormode & Muthukrishnan;
PAPERS.md) as a plain DataFrame of (hash_row, bucket, cnt) cells:

* ``depth`` independent hash rows, each ``width`` buckets — fixed-size
  state regardless of key cardinality (the whole point at 100 TB: a
  per-key exact count needs a shuffle keyed by every distinct key; the
  sketch shuffles into depth x width cells);
* hashes are md5-derived (``dedup._hash60`` over "i<US>key") — the same
  portability trick as the MinHash/SimHash signatures, so ANY SQL engine
  rebuilds the identical sketch and the driver's value oracle can check
  it cell-for-cell (a property xxhash-based sketches cannot offer);
* point estimate = min over rows of the key's cell — one-sided error:
  estimate >= true count always, and P[err > 2N/width] < (1/2)^depth.

The sketch is a DataFrame, so it composes: union sketches of two corpora
cell-wise (sum cnt) to sketch the union — the merge property CMS is used
for in distributed settings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _hash60

CMS_DEPTH = 4
CMS_WIDTH = 256

_SEP = "\x1f"   # unit separator: cannot appear in the decimal row index


def cms_bucket(i: Column, key: Column, width: int) -> Column:
    """Bucket of ``key`` in hash row ``i`` — md5-derived, engine-portable."""
    return F.pmod(_hash60(F.concat_ws(_SEP, i.cast("string"),
                                      key.cast("string"))), F.lit(width))


def count_min_sketch(df: DataFrame, key_col: str,
                     depth: int = CMS_DEPTH, width: int = CMS_WIDTH,
                     weight_col: str | None = None) -> DataFrame:
    """(i, bucket, cnt) — the CMS cells of ``key_col``'s frequency (or
    ``weight_col``-weighted mass).  One explode (depth x |rows|) + one
    groupBy bounded at depth x width output cells; cells that received no
    keys are absent (implicitly zero).  NULL keys are excluded — there is
    no meaningful frequency of "no key", and concat-based hashing would
    otherwise conflate every null into one phantom key (and diverge from
    SQL mirrors, where a null key hashes to NULL)."""
    w = (F.col(weight_col) if weight_col is not None
         else F.lit(1)).cast("long").alias("_w")
    rows = (df.where(F.col(key_col).isNotNull())
            .select(F.col(key_col).cast("string").alias("_k"), w))
    exploded = rows.select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("i"),
        "_k", "_w")
    return (exploded
            .select("i", cms_bucket(F.col("i"), F.col("_k"), width)
                    .alias("bucket"), "_w")
            .groupBy("i", "bucket")
            .agg(F.sum("_w").alias("cnt")))


def cms_join_size(a_cells: DataFrame, b_cells: DataFrame,
                  depth: int = CMS_DEPTH) -> DataFrame:
    """Equi-join cardinality estimate from two count-min sketches — the
    AMS/CMS inner-product estimator (Cormode & Muthukrishnan §4.2):
    |A ⋈ B| = Σ_key f_A(key)·f_B(key) is estimated by min over hash rows
    of Σ_bucket a_cnt·b_cnt.  One-sided like the point estimate
    (estimate ≥ exact always; error bounded by N_A·N_B/width per row) —
    the query-planning primitive for sizing a shuffle BEFORE running it,
    at depth×width state per table instead of a distinct-key aggregate.
    All-integer (int64 products/sums), so the estimate value-hashes
    cross-engine.

    Scale/overflow: Σ a·b ≤ N_A·N_B must fit int64 — fine to ~3·10⁹ rows
    a side (ANSI mode makes an overflow loud).  A hash row whose buckets
    never collide across the two sketches contributes 0 (estimate 0 ⇒
    the join is provably empty — no false negatives the other way).

    Returns a 1-row frame (estimate:long)."""
    spark = a_cells.sparkSession
    rows = spark.range(depth).select(F.col("id").cast("int").alias("i"))
    per = (a_cells.alias("a").join(b_cells.alias("b"), ["i", "bucket"])
           .groupBy("i")
           .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("_ip")))
    full = rows.join(per, "i", "left").select(
        F.coalesce("_ip", F.lit(0)).cast("long").alias("_ip"))
    return full.agg(F.min("_ip").cast("long").alias("estimate"))


HLL_P = 9                 # 2^9 = 512 registers; std err ~1.04/sqrt(512) ≈ 4.6%
HLL_M = 1 << HLL_P
_HLL_WBITS = 60 - HLL_P   # rank bits left after the register index


def hll_registers(df: DataFrame, key_col: str, p: int = HLL_P) -> DataFrame:
    """(reg, max_rho) — HYPERLOGLOG register table for the distinct count
    of ``key_col`` (Flajolet et al.; PAPERS.md).  Register = low ``p``
    bits of the portable md5-derived 60-bit hash; rho = leading-zero rank
    of the remaining bits + 1; one groupBy bounded at 2^p output rows —
    fixed-size state at any key cardinality (an exact COUNT DISTINCT
    shuffles every distinct key).

    Portability: the bit-rank is computed via base-2 string length
    (``conv``/``bin``) — integer-exact in any engine, no float log2 — so
    a SQL mirror rebuilds the IDENTICAL register table and the driver
    value-oracle checks it cell-for-cell, like the CMS.

    Mergeable: register tables of two corpora combine by cell-wise MAX
    into exactly the union's table (max is idempotent/commutative — the
    property that makes HLL the standard distributed distinct counter)."""
    wbits = 60 - p
    h = _hash60(F.col(key_col).cast("string"))
    reg = h.bitwiseAND(F.lit((1 << p) - 1))
    w = F.shiftright(h, p)
    bitlen = F.length(F.conv(w.cast("string"), 10, 2))
    rho = F.when(w == 0, F.lit(wbits + 1)) \
        .otherwise(F.lit(wbits + 1) - bitlen)
    rows = (df.where(F.col(key_col).isNotNull())
            .select(reg.alias("reg"), rho.cast("int").alias("rho")))
    return rows.groupBy("reg").agg(F.max("rho").alias("max_rho"))


def hll_estimate(cells, p: int = HLL_P) -> float:
    """Cardinality estimate from collected (reg, max_rho) rows —
    driver-side helper (standard HLL bias-corrected estimator with the
    small-range linear-counting correction)."""
    import math
    m = 1 << p
    regs = [0] * m
    for reg, max_rho in cells:
        regs[int(reg)] = int(max_rho)
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / sum(2.0 ** -r for r in regs)
    zeros = regs.count(0)
    if e <= 2.5 * m and zeros:
        e = m * math.log(m / zeros)
    return e


BLOOM_M = 1 << 14          # bit-space size (16384)
BLOOM_K = 6                # hash functions per key


def bloom_bits(df: DataFrame, key_col: str, m: int = BLOOM_M,
               k: int = BLOOM_K) -> DataFrame:
    """(pos) — the DISTINCT set bit positions of a BLOOM FILTER over
    ``key_col`` (membership sketch; completes the sketch family next to
    CMS=frequency and HLL=distinct).  Each key sets ``k`` md5-derived
    positions (the same "i<US>key" row-hash scheme as the CMS, so any
    SQL engine rebuilds the identical bit set); output is bounded at
    ``m`` rows regardless of key cardinality.

    Mergeable: the filter of a union is the UNION of the position sets
    (bitwise OR) — `bloom_a.union(bloom_b).distinct()`.  Query-side:
    `bloom_might_contain` for driver-side checks; for a join-shaped
    probe, an equi-join on pos with a HAVING count == k per candidate.
    False-positive rate ~(1 - e^{-kn/m})^k; NULL keys are excluded."""
    rows = (df.where(F.col(key_col).isNotNull())
            .select(F.col(key_col).cast("string").alias("_k")))
    exploded = rows.select(
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"), "_k")
    return (exploded
            .select(cms_bucket(F.col("i"), F.col("_k"), m).alias("pos"))
            .distinct())


def bloom_might_contain(positions, key, m: int = BLOOM_M,
                        k: int = BLOOM_K) -> bool:
    """Driver-side membership probe against collected bit positions
    (an iterable of pos ints): True = maybe present (false positives
    possible), False = DEFINITELY absent."""
    import hashlib
    pset = {int(p) for p in positions} if not isinstance(positions, set) \
        else positions
    for i in range(k):
        h = int(hashlib.md5(f"{i}{_SEP}{key}".encode())
                .hexdigest()[:15], 16) % m
        if h not in pset:
            return False
    return True


def bloom_prefilter(df: DataFrame, key_col: str, positions,
                    m: int = BLOOM_M, k: int = BLOOM_K) -> DataFrame:
    """Map-side Bloom semi-join reduction — the predicate-transfer /
    sideways-information-passing pattern (Bloom-join; cf. the SIGMOD'25
    predicate-transfer line in PAPERS.md): ``positions`` is the collected
    bit set of `bloom_bits` over the SMALL side's join key (≤ m rows —
    metadata-scale by construction, the whole point of the sketch), and
    this keeps only the big-side rows whose ``k`` md5 positions are all
    set.  Definite non-members are dropped AT THE SCAN, before any
    shuffle: at 100 TB the exact join then moves only maybe-members
    (true matches + the ~(1-e^{-kn/m})^k false-positive sliver), which
    for a selective dimension filter is the difference between shuffling
    the fact table and shuffling a few percent of it.

    The m bits ride into the plan as m/64 int64 literal words (256 longs
    at the default 16384 bits — smaller than a broadcast relation and
    free of the broadcast-join machinery); the membership test is pure
    JVM expressions (`getbit` over the word array), no UDF, no extra
    scan.  No false negatives ⇒ any downstream exact join is unchanged.
    NULL keys are dropped (they cannot equi-join anyway)."""
    words = [0] * (m // 64)
    for p in positions:
        words[int(p) >> 6] |= 1 << (int(p) & 63)
    signed = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    arr = F.lit(signed)   # one foldable ArrayType literal, not a per-row
    #                       CreateArray of m/64 elements per hash probe
    key = F.col(key_col)
    cond = key.isNotNull()
    for i in range(k):
        pos = cms_bucket(F.lit(i), key, m)
        word = F.element_at(arr, (F.shiftright(pos, 6) + 1).cast("int"))
        cond = cond & (F.getbit(word, pos.bitwiseAND(F.lit(63))) == 1)
    return df.where(cond)


KMV_K = 64            # sketch size; std err of the estimate ~1/sqrt(k-2) ≈ 13%
_KMV_T = 1 << 60      # the hash space size (hv ∈ [0, 2^60))


def kmv_sketch(df: DataFrame, key_col: str, k: int = KMV_K) -> DataFrame:
    """(hv) — the ``k`` smallest DISTINCT md5 hash values of ``key_col``:
    the K-minimum-values / theta distinct sketch (Beyer et al. SIGMOD'07;
    the Apache DataSketches theta family).  Bounded at k rows whatever
    the key cardinality, and plans as distinct + TakeOrdered (per-
    partition top-k merge — no global sort).  Unlike HLL the sketch
    keeps hash VALUES, so two sketches compose into SET operations —
    `kmv_overlap` below estimates the intersection, the segment-overlap
    question registers fundamentally cannot answer (HLL only unions).
    Hashes are `dedup._hash60` (md5-derived), so any SQL engine rebuilds
    the identical sketch value-for-value.  NULL keys are excluded."""
    return (df.where(F.col(key_col).isNotNull())
            .select(_hash60(F.col(key_col).cast("string")).alias("hv"))
            .distinct().orderBy("hv").limit(k))


def _kmv_scale(n, theta) -> Column:
    """Exact integral n·2^60 div θ — decimal(38) product, integral div.
    Exact while the quotient fits int64, i.e. θ ≥ 8 for n ≤ k-1=63 (a
    60-bit hash below 8 happens w.p. ~2^-57 per key; Spark's decimal
    `div` would wrap silently there, documented not guarded)."""
    return F.expr(
        f"(cast({n} as decimal(38,0)) * cast({_KMV_T} as decimal(38,0)))"
        f" div cast({theta} as decimal(38,0))").cast("long")


def kmv_overlap(a: DataFrame, b: DataFrame, k: int = KMV_K) -> DataFrame:
    """1-row (est_a, est_b, est_common) from two `kmv_sketch` frames —
    the theta-sketch set algebra: θ_X = 2^60 while X is in exact mode
    (|X| < k ⇒ the sketch IS the key set), else X's kth-smallest hash;
    θ = min(θ_A, θ_B); the intersection candidates are the common hash
    values strictly below θ, scaled by 2^60/θ (in exact mode θ = 2^60
    makes est_common the exact common count with no branch).  Distinct
    estimates are the standard (k-1)·2^60/θ_X.  All integer, so every
    output value-hashes cross-engine; inputs are ≤ k rows, so every join
    here is sketch-sized."""
    sa = a.agg(F.count(F.lit(1)).alias("ca"), F.max("hv").alias("ma"))
    sb = b.agg(F.count(F.lit(1)).alias("cb"), F.max("hv").alias("mb"))
    base = (sa.crossJoin(sb)
            .withColumn("tha", F.when(F.col("ca") < k, F.lit(_KMV_T))
                        .otherwise(F.col("ma")))
            .withColumn("thb", F.when(F.col("cb") < k, F.lit(_KMV_T))
                        .otherwise(F.col("mb")))
            .withColumn("theta", F.least("tha", "thb")))
    ncomm = (a.join(b, "hv")
             .crossJoin(F.broadcast(base.select("theta")))
             .where(F.col("hv") < F.col("theta"))
             .agg(F.count(F.lit(1)).alias("nc")))
    return (base.crossJoin(ncomm).select(
        F.when(F.col("ca") < k, F.col("ca"))
         .otherwise(_kmv_scale(k - 1, "tha")).cast("long").alias("est_a"),
        F.when(F.col("cb") < k, F.col("cb"))
         .otherwise(_kmv_scale(k - 1, "thb")).cast("long").alias("est_b"),
        _kmv_scale("nc", "theta").alias("est_common")))


_XXH_M = (1 << 64) - 1
_XXH_P1 = 0x9E3779B185EBCA87
_XXH_P2 = 0xC2B2AE3D27D4EB4F
_XXH_P3 = 0x165667B19E3779F9
_XXH_P4 = 0x85EBCA77C2B2AE63
_XXH_P5 = 0x27D4EB2F165667C5


def _xxh64_long(value: int, seed: int) -> int:
    """Spark's XxHash64 over ONE LongType value (unsigned result) —
    bit-for-bit the JVM `F.xxhash64` (verified against live Spark; the
    public XXH64 single-8-byte-lane path).  Chain for multiple columns
    exactly as Spark does: seed 42, then fold each column through."""
    v = value & _XXH_M
    h = (seed + _XXH_P5 + 8) & _XXH_M
    k = (((v * _XXH_P2) & _XXH_M) << 31 | ((v * _XXH_P2) & _XXH_M) >> 33) \
        & _XXH_M
    k = (k * _XXH_P1) & _XXH_M
    h ^= k
    h = (((h << 27 | h >> 37) & _XXH_M) * _XXH_P1 + _XXH_P4) & _XXH_M
    h ^= h >> 33
    h = (h * _XXH_P2) & _XXH_M
    h ^= h >> 29
    h = (h * _XXH_P3) & _XXH_M
    h ^= h >> 32
    return h


def dyadic_cms_cells(df: DataFrame, key_col: str, levels: int = 21,
                     depth: int = CMS_DEPTH,
                     width: int = CMS_WIDTH) -> DataFrame:
    """(l, i, bucket, cnt) — a CMS per dyadic level: level ``l`` sketches
    the prefix ``key >> l`` (so level 0 is the plain key sketch and the
    top level has one prefix covering the whole domain).  One pass over
    the data: a (levels+1)·depth explode, partial-combined map-side into
    ≤ (levels+1)·depth·width cells — ~85 integer updates per row at the
    defaults, shuffle bounded at ~22k cells regardless of input size.
    Keys MUST lie in [0, 2^levels); a violating key raises loudly from
    inside the scan expression (the guard is fused into the prefix
    computation so Catalyst cannot prune it).

    Hashing: ONE native `xxhash64(l, prefix)` per (row, level) — the
    ``depth`` row-buckets are disjoint bit fields of that single 64-bit
    digest (requires power-of-two ``width`` with depth·log2(width) ≤
    64).  Unlike every oracle-facing sketch here this one is NOT
    md5-derived: the heavy-hitter ANSWER is exact and oracle'd against
    the plain GROUP BY, so the scheme owes no SQL mirror, and the
    md5+conv string path it replaced was 3-5× the whole build's wall
    (one digest per (row, level, hash-row) first, then one md5 per
    (row, level) — both measurably dominated).  The driver drill-down
    mirrors Spark's XXH64-for-longs bit-for-bit (`_xxh64_long`,
    verified against `F.xxhash64`)."""
    wbits = width.bit_length() - 1
    if width != 1 << wbits or depth * wbits > 64:
        raise ValueError(f"need power-of-two width with depth*log2(width)"
                         f" <= 60, got depth={depth} width={width}")
    key = F.col(key_col)
    rows = (df.where(key.isNotNull())
            .select(F.expr(
                f"CASE WHEN {key_col} >= 0 AND {key_col} < {1 << levels}"
                f" THEN CAST({key_col} AS BIGINT)"
                f" ELSE CAST(raise_error('dyadic_cms_cells: key out of"
                f" [0, 2^{levels})') AS BIGINT) END").alias("_k")))
    lv = rows.select(
        F.explode(F.sequence(F.lit(0), F.lit(levels))).alias("l"), "_k")
    h = F.xxhash64(F.col("l").cast("long"),
                   F.expr("shiftright(_k, cast(l as int))"))
    buckets = F.array(*[
        F.shiftrightunsigned(F.col("_h"), i * wbits)
        .bitwiseAND(F.lit(width - 1))
        for i in range(depth)])
    return (lv.select("l", h.alias("_h"))
            .select("l", F.posexplode(buckets).alias("i", "bucket"))
            .groupBy("l", "i", "bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt")))


HH_MAX_CANDIDATES = 4096   # drill-down frontier bound — a blown bound
#                            means the threshold is far too low for the
#                            domain (or the sketch width too narrow)


def heavy_hitters_dyadic(df: DataFrame, key_col: str, threshold: int,
                         levels: int = 21, depth: int = CMS_DEPTH,
                         width: int = CMS_WIDTH) -> DataFrame:
    """EXACT heavy hitters over a non-negative integer key WITHOUT a
    full-key groupBy: the dyadic CMS drill-down (Cormode & Muthukrishnan
    §5 hierarchical heavy hitters).  Build one CMS per dyadic level
    (bounded cells — the only corpus-scale pass), collect them
    (metadata-scale: ≤ 22k cells), drill down on the driver from the
    root prefix, expanding only children whose subtree ESTIMATE reaches
    ``threshold`` (CMS is one-sided, estimate ≥ truth, so no true heavy
    key is ever pruned), then verify the ≤ `HH_MAX_CANDIDATES` surviving
    level-0 candidates EXACTLY with a semi-filtered groupBy (false
    positives die there).  Result == the true heavy-hitter set, always —
    the sketch bounds the WORK, not the answer.

    At 100 TB the win is that the exact groupBy runs over
    ``key IN (candidates)`` — a scan-pushable membership filter over a
    few hundred keys — instead of shuffling every distinct key.

    Returns (``key_col``, cnt:long), exact counts, cnt ≥ threshold."""
    if threshold <= 0:
        raise ValueError(f"threshold must be > 0, got {threshold}")
    cells = {(r["l"], r["i"], r["bucket"]): r["cnt"]
             for r in dyadic_cms_cells(df, key_col, levels=levels,
                                       depth=depth, width=width).collect()}

    wbits = width.bit_length() - 1

    def est(l: int, prefix: int) -> int:
        h = _xxh64_long(prefix, _xxh64_long(l, 42))
        return min(cells.get((l, i, (h >> (i * wbits)) & (width - 1)), 0)
                   for i in range(depth))

    frontier = [0]                          # the level-`levels` root
    for l in range(levels - 1, -1, -1):
        frontier = [c for p in frontier for c in (2 * p, 2 * p + 1)
                    if est(l, c) >= threshold]
        if len(frontier) > HH_MAX_CANDIDATES:
            raise ValueError(
                f"heavy_hitters_dyadic: frontier {len(frontier)} > "
                f"{HH_MAX_CANDIDATES} at level {l} — threshold too low "
                f"for this domain/width")
        if not frontier:
            break
    key = F.col(key_col)
    if not frontier:
        return (df.select(key).where(F.lit(False))
                .groupBy(key_col).agg(F.count(F.lit(1)).cast("long")
                                      .alias("cnt")))
    return (df.where(key.isin(frontier))
            .groupBy(key_col)
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .where(F.col("cnt") >= threshold))


def cms_estimate(cells, keys, depth: int = CMS_DEPTH,
                 width: int = CMS_WIDTH) -> dict:
    """Point estimates for ``keys`` from collected sketch cells
    (driver-side helper for tests/inspection).  ``cells`` is an iterable
    of (i, bucket, cnt) rows."""
    import hashlib
    table: dict = {}
    for i, bucket, cnt in cells:
        table[(i, bucket)] = cnt

    def h(i: int, key) -> int:
        s = f"{i}{_SEP}{key}"
        v = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        return v % width

    return {k: min(table.get((i, h(i, k)), 0) for i in range(depth))
            for k in keys}


# ---------------------------------------------------------------------------
# HDR-style mergeable quantile histogram
# ---------------------------------------------------------------------------
#
# The fourth classic sketch next to CMS/HLL/Bloom: quantiles with BOUNDED
# state.  Exact distributed quantiles (events_quantiles) sort-shuffle every
# row per group — at 100 TB that is the scale killer; the standard answer
# is a mergeable quantile sketch (t-digest / DDSketch / HdrHistogram).
# Float-centric sketches (t-digest centroids, DDSketch's log-gamma index)
# are NOT engine-portable: a ulp of difference in log() moves a value
# across a bucket boundary and the oracle diverges.  This is the
# integer-exact variant (HdrHistogram's exponent+mantissa bucketing;
# DDSketch, Masson et al. VLDB'19 — PAPERS.md): values map to a bucket
# via msb position + the top ``sub_bits`` mantissa bits, ALL in integer
# arithmetic (the same base-2 string-length idiom as the HLL rank), so
# ANY SQL engine rebuilds the identical cell table.
#
#   v < 2^k   ->  bucket = v                                (exact region)
#   v >= 2^k  ->  s = bits(v)-1-k,  sub = v >> s  (in [2^k, 2^(k+1)))
#                 bucket = (bits(v)-k)*2^k + sub - 2^k
#
# Buckets are contiguous integers, monotone in v; the bucket containing v
# spans [sub<<s, ((sub+1)<<s)-1], width 2^s <= v * 2^-k, so any quantile
# read off the histogram carries relative error <= 2^-k.  Merge =
# cell-wise cnt sum (the CMS property); state is O(sub_bits * 64) cells
# per group regardless of row count.

HDR_SUB_BITS = 5           # relative error <= 2^-5 ~ 3.1%
HDR_SCALE = 100            # double -> integer basis: floor(value * scale)


def hdr_histogram(df: DataFrame, value_col: str,
                  group_cols: list[str] | None = None,
                  scale: int = HDR_SCALE,
                  sub_bits: int = HDR_SUB_BITS) -> DataFrame:
    """(group..., bucket, lo, hi, cnt) — HDR quantile histogram of
    ``value_col`` per group.

    ``v = floor(value * scale)`` is the integer basis: floor of an IEEE
    double product is bit-identical across engines (the repo-wide float
    discipline — CLAUDE.md), unlike round().  NULL and negative values
    are excluded (a quantile of "no value" is meaningless; negatives
    would need a mirrored bucket space — not needed by any current
    caller and cheaper to forbid than to silently misplace).  ``lo``/
    ``hi`` are the bucket's value bounds in the SCALED integer basis.

    One shuffle: groupBy(group, bucket) with map-side partial combine;
    output is bounded at ~(64-k)*2^k buckets per group at any row count.
    """
    k = sub_bits
    if not (1 <= k <= 16):
        raise ValueError(f"sub_bits must be in [1,16], got {k}")
    gcols = list(group_cols or [])
    rows = (df.where(F.col(value_col).isNotNull())
            .select(*gcols,
                    F.floor(F.col(value_col) * scale)
                    .cast("long").alias("_v"))
            .where(F.col("_v") >= 0)
            .withColumn("_bits", F.length(F.conv(F.col("_v"), 10, 2)))
            .withColumn(
                "bucket",
                F.when(F.col("_bits") <= k, F.col("_v")).otherwise(
                    (F.col("_bits") - k) * (1 << k)
                    + F.expr(f"shiftright(_v, cast(_bits - 1 - {k} as int))")
                    - (1 << k))))
    hist = (rows.groupBy(*gcols, "bucket")
            .agg(F.count(F.lit(1)).alias("cnt")))
    lo, hi = hdr_bucket_bounds("bucket", k)
    return hist.select(*gcols, "bucket", lo.alias("lo"), hi.alias("hi"),
                       "cnt")


def hdr_bucket_bounds(bucket_col: str = "bucket",
                      sub_bits: int = HDR_SUB_BITS):
    """(lo, hi) value bounds of the bucket-index column named
    ``bucket_col``, in the scaled integer basis — a pure integer function
    of the index, so both the histogram and any SQL mirror derive bounds
    without a lookup join.  Takes a NAME (not a Column): the shift amount
    is itself a column, which the Python shiftleft API can't express, so
    the bound is built as a SQL expression referencing the column."""
    k = sub_bits
    two_k = 1 << k
    b = F.col(bucket_col)
    lo = F.when(b < two_k, b).otherwise(
        F.expr(f"shiftleft(cast({two_k} + pmod({bucket_col}, {two_k}) "
               f"as bigint), cast({bucket_col} div {two_k} - 1 as int))"))
    hi = F.when(b < two_k, b).otherwise(
        F.expr(f"shiftleft(cast({two_k} + pmod({bucket_col}, {two_k}) + 1 "
               f"as bigint), cast({bucket_col} div {two_k} - 1 as int)) - 1"))
    return lo, hi


def hdr_quantiles(hist: DataFrame, percents: list[int],
                  group_cols: list[str] | None = None,
                  sub_bits: int = HDR_SUB_BITS) -> DataFrame:
    """(group..., p, q_lo, q_hi) — per-group quantile bounds read off an
    ``hdr_histogram`` frame, one row per requested integer percent.

    Rank rule, all-integer: the p-th percentile is the r-th smallest
    value with r = ceil(p * total / 100); its bucket is the first whose
    cumulative count reaches r, i.e. the min bucket with
    ``100 * cum >= p * total`` (equivalent by integer division, no
    float).  The true r-th value lies in [q_lo, q_hi] by bucketing
    monotonicity, so q_lo underestimates by at most a 2^-sub_bits
    relative factor (property-tested vs exact sort).

    Plan: ONE window over the (tiny, bounded) histogram — partitioned by
    group, so no single-reducer exchange — then a per-group aggregate;
    no join back (bounds derive from the index arithmetically)."""
    from pyspark.sql import Window
    for p in percents:
        if not (isinstance(p, int) and 1 <= p <= 100):
            raise ValueError(f"percents must be integers in [1,100]: {p}")
    gcols = list(group_cols or [])
    w = (Window.partitionBy(*gcols) if gcols
         else Window.partitionBy(F.lit(0)))
    cum = (hist
           .withColumn("_cum", F.sum("cnt").over(
               w.orderBy("bucket")
               .rowsBetween(Window.unboundedPreceding, 0)))
           .withColumn("_total", F.sum("cnt").over(w)))
    agg = cum.groupBy(*gcols).agg(*[
        F.min(F.when(F.col("_cum") * 100 >= F.col("_total") * p,
                     F.col("bucket"))).alias(f"_b{p}")
        for p in percents])
    pieces = F.array(*[
        F.struct(F.lit(p).alias("p"), F.col(f"_b{p}").alias("_b"))
        for p in percents])
    out = (agg.select(*gcols, F.explode(pieces).alias("_q"))
           .select(*gcols, F.col("_q.p").alias("p"),
                   F.col("_q._b").alias("bucket")))
    lo, hi = hdr_bucket_bounds("bucket", sub_bits)
    return out.select(*gcols, "p", lo.alias("q_lo"), hi.alias("q_hi"))
