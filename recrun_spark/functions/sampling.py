"""Deterministic content-keyed sampling and dataset splitting.

Training-data pipelines need samples and train/val/test splits that are
REPRODUCIBLE (the same document always lands in the same split, across
runs, engines, repartitioning, and corpus growth) — `rand()` gives none
of that.  Both operators here key on the portable md5-derived 60-bit
hash (``dedup._hash60``) of a row key:

* ``hash_sample`` — keep rows whose hash falls in the lowest
  ``fraction`` of the hash space.  Pure filter: no shuffle, pushes into
  the scan's row-group filtering where possible, composes with any plan.
* ``hash_split`` — assign each row a split label by consecutive hash
  ranges (e.g. train/val/test at 0.8/0.1/0.1).  A row's label never
  changes when the corpus grows — the property rand-based splits lack —
  and any engine with md5 reproduces the assignment exactly (the driver
  value-oracle checks every row's label against DuckDB).

Because the hash is content-keyed, sampling is per-key CONSISTENT: all
rows of one key sample together (join-safe — sample both sides of a join
by the join key and the join is a uniform sample of the joined relation,
the classic correlated-sampling trick).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _hash60

HASH_SPACE = 1 << 60


def _thresholds(weights: dict) -> list:
    """Cumulative integer thresholds over the 60-bit hash space, in
    insertion order; the final edge is clamped to the full space so float
    rounding can never leave rows unlabeled."""
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    edges, acc = [], 0.0
    items = list(weights.items())
    for name, w in items:
        if w < 0:
            raise ValueError(f"negative weight for {name!r}")
        acc += w / total
        edges.append((name, min(int(acc * HASH_SPACE), HASH_SPACE)))
    edges[-1] = (edges[-1][0], HASH_SPACE)
    return edges


def hash_sample(df: DataFrame, fraction: float,
                key_col: str = "doc_id") -> DataFrame:
    """Deterministic ``fraction`` sample: rows whose md5-derived hash of
    ``key_col`` falls in the lowest ``fraction`` of the hash space.
    Rows with a NULL key are dropped (no hash, no position in the
    sample space).  The threshold integer comes from the same
    ``stratum_threshold`` the SQL mirrors embed."""
    thresh = stratum_threshold(fraction)
    return df.where(
        _hash60(F.col(key_col).cast("string")) < F.lit(thresh))


def split_label(key: Column, weights: dict) -> Column:
    """Split label expression for ``key`` under ``weights`` (see
    hash_split)."""
    h = _hash60(key.cast("string"))
    # WHEN chain lowest-edge-first: each row takes the FIRST range
    # containing its hash.  A NULL key hashes to NULL (every comparison
    # NULL) — the otherwise() assigns it the LAST split, matching the SQL
    # mirrors' ELSE branch, so every row gets a label in both engines.
    edges = _thresholds(weights)
    expr = None
    for name, edge in edges[:-1]:
        cond = h < F.lit(edge)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    last = F.lit(edges[-1][0])
    return last if expr is None else expr.otherwise(last)


def hash_split(df: DataFrame, weights: dict,
               key_col: str = "doc_id",
               label_col: str = "split") -> DataFrame:
    """Assign every row a deterministic split label by consecutive hash
    ranges sized by ``weights`` (insertion order; normalized to sum 1).
    Adds ``label_col``; no shuffle."""
    return df.withColumn(label_col,
                         split_label(F.col(key_col), weights))


def stratum_threshold(fraction: float) -> int:
    """Integer hash-space threshold for one stratum's fraction — computed
    ONCE here and shared with SQL mirrors so float rounding cannot
    diverge between engines."""
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return min(int(fraction * HASH_SPACE), HASH_SPACE)


def cap_per_group(df: DataFrame, cap: int, group_col: str = "source",
                  key_col: str = "doc_id",
                  prefilter_slack: int | None = None) -> DataFrame:
    """Keep at most ``cap`` rows per group (domain caps — the standard
    defense against one crawler-friendly site dominating a pretraining
    corpus).  Which rows survive is DETERMINISTIC and corpus-growth-
    stable-ish: the ``cap`` rows with the smallest (md5(key), key) within
    each group — the same content-keyed order every other sampler here
    uses, so re-runs and other engines agree row-for-row.  NULL group or
    key rows are excluded (no defined position).

    Default path: one shuffle on ``group_col`` + an in-partition sort
    (row_number window) — EXACT for any input.  ``prefilter_slack=s``
    opts into the mega-domain escape hatch: join per-group counts and
    pre-drop rows whose uniform 60-bit hash is above ``s·cap/n`` of the
    hash space BEFORE the sort, so a domain with 10⁹ rows sorts only
    ~s·cap survivors instead of 10⁹ (P[fewer than cap survive] <
    e^{-(s-1)²·cap/(s+1)} by Chernoff — already ~1e-98 at s=8, cap=50 —
    but nonzero, which is why it is opt-in and the exact window stays
    the default)."""
    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")
    from pyspark.sql import Window
    d = df.where(F.col(group_col).isNotNull() & F.col(key_col).isNotNull())
    h = _hash60(F.col(key_col).cast("string"))
    if prefilter_slack is not None:
        if prefilter_slack < 2:
            raise ValueError("prefilter_slack must be >= 2")
        cnt = d.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
        d = (d.join(cnt, group_col)
             .where(h < F.least(
                 F.lit(HASH_SPACE).cast("double"),
                 F.lit(float(prefilter_slack * cap) * HASH_SPACE)
                 / F.col("_n")).cast("long"))
             .drop("_n"))
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(key_col).cast("string")).asc(), F.col(key_col).asc())
    return (d.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= cap).drop("_rn"))


def hash_sample_stratified(df: DataFrame, fractions: dict,
                           strata_col: str, key_col: str = "doc_id",
                           default: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling — the language/source
    REBALANCING step of a corpus pipeline (keep 100% of a rare language,
    10% of a dominant one).  Each stratum keeps the rows whose
    content-keyed hash falls in the lowest ``fractions[stratum]`` of the
    hash space; strata not listed use ``default``.  Same stability
    properties as hash_sample (a kept row stays kept as the corpus
    grows), and a row kept at fraction f is also kept at every f' > f —
    nested samples for free.  Pure filter, zero shuffle."""
    h = _hash60(F.col(key_col).cast("string"))
    thresh = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == F.lit(stratum)
        t = F.lit(stratum_threshold(frac))
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    dflt = F.lit(stratum_threshold(default))
    thresh = dflt if thresh is None else thresh.otherwise(dflt)
    return df.where(h < thresh)


def _isqrt_col(col: str) -> Column:
    """Exact integer sqrt of a non-negative bigint column: float sqrt is
    correctly rounded (IEEE 754) so floor() is within ±1 of the true
    isqrt; one integer correction step each way makes it EXACT in any
    engine — the SQL mirrors apply the identical correction."""
    c = F.col(col)
    s = F.floor(F.sqrt(c.cast("double"))).cast("long")
    s = F.when(s * s > c, s - 1).otherwise(s)
    return F.when((s + 1) * (s + 1) <= c, s + 1).otherwise(s)


def temperature_rebalance(df: DataFrame, target_total: int,
                          group_col: str = "lang",
                          key_col: str = "doc_id") -> DataFrame:
    """Temperature-based corpus mixture rebalancing at alpha = 1/2 — the
    multinomial alpha-sampling of mT5 / XLM-R (PAPERS.md): group g gets a
    share of the ``target_total`` budget proportional to c_g^alpha, so
    head domains are downsampled and tail domains keep (up to) all their
    rows; alpha=1/2 is the integer-exact point of the family (isqrt),
    whereas fractional powers would need float pow and break cross-engine
    value parity.

    All-integer derivation, so a self-contained SQL oracle reproduces
    the SAME sample row-for-row with no driver-computed constants:
    targets n_g = min(c_g, (target_total * isqrt(c_g)) div S) with
    S = sum of isqrt over groups, and a row is kept iff its 30-bit hash
    bucket hb satisfies  hb * c_g < n_g * 2^30  — an exact rational
    comparison (no division rounding; products stay under 2^63 for any
    c_g < 2^33).  Like all hash sampling here the realized size is
    binomially close to n_g, deterministic, and stable under
    repartitioning; rows with NULL key or group are excluded.

    Scale shape: one small group-count aggregate (map-side combinable),
    the budget S as a broadcast 1-row frame (no driver collect), a
    broadcast join of per-group targets (group cardinality is domain
    vocabulary, metadata-scale), then a pure filter over one scan.

    Returns (key_col, group_col, n_group:long, n_target:long) for the
    kept rows."""
    if target_total < 0:
        raise ValueError(f"target_total must be >= 0, got {target_total}")
    d = df.where(F.col(key_col).isNotNull()
                 & F.col(group_col).isNotNull()) \
          .select(key_col, group_col)
    stats = (d.groupBy(group_col)
             .agg(F.count(F.lit(1)).cast("long").alias("n_group"))
             .withColumn("_s", _isqrt_col("n_group")))
    # the budget S rides in via a GLOBAL window over the stats frame —
    # group cardinality is domain-vocabulary scale, so the single
    # partition holds dozens-to-thousands of rows, never corpus rows
    # (a crossJoin with a 1-row agg of the same lineage trips Spark 4's
    # hidden-output ambiguity check; and the name must differ from _s by
    # more than case — the analyzer is case-insensitive by default)
    from pyspark.sql import Window
    tgt = (stats.withColumn("_ssum",
                            F.sum("_s").over(Window.partitionBy())
                            .cast("long"))
           .withColumn("n_target",
                       F.least(F.col("n_group"),
                               F.expr(f"({target_total} * _s) div _ssum")
                               .cast("long")))
           .select(group_col, "n_group", "n_target"))
    hb = F.expr(f"_h div {1 << 30}")
    return (d.withColumn("_h", _hash60(F.col(key_col).cast("string")))
            .join(F.broadcast(tgt), group_col)
            .where(hb * F.col("n_group")
                   < F.col("n_target") * F.lit(1 << 30))
            .select(key_col, group_col, "n_group", "n_target"))


def pps_sample(df: DataFrame, weight_col: str, target_total: int,
               key_col: str = "doc_id") -> DataFrame:
    """Poisson sampling with probability proportional to size (PPS —
    Hájek 1964; Ohlsson's sequential Poisson sampling is the ordered
    variant): row i is kept with probability min(1, T·w_i/Σw), so the
    expected sample size is ≤ T = ``target_total`` and heavy rows are
    preferentially retained — importance-weighted corpus subsampling
    (sample long/high-quality documents at higher rate) with unbiased
    Horvitz-Thompson reweighting available downstream as 1/p_i.

    Deterministic and engine-exact: keep iff  h60(key)·Σw  <  w_i·T·2^60
    compared in decimal(38,0) (DuckDB mirrors with HUGEINT — products
    stay under 10^38 for Σw < 10^18), so the kept set value-hashes
    row-for-row.  Rows with w_i ≥ Σw/T are certainty units: every hash
    passes, they are always kept (the standard PPS boundary case — the
    realized expectation dips slightly below T, exactly as in the
    textbook scheme).  Like all hash sampling here the sample is stable
    under repartitioning and corpus reordering.

    Scale shape: ONE weight-sum aggregate (map-side combinable, 1-row
    driver exchange — the literal then rides into the plan), then a pure
    filter over one scan: zero shuffle, scan-pushable.  NULL keys,
    NULL/non-positive weights are excluded."""
    if target_total < 0:
        raise ValueError(f"target_total must be >= 0, got {target_total}")
    d = df.where(F.col(key_col).isNotNull() & F.col(weight_col).isNotNull()
                 & (F.col(weight_col) > 0))
    tot = d.agg(F.sum(F.col(weight_col).cast("long")).alias("_tw")) \
           .collect()[0]["_tw"]
    if not tot or not target_total:
        return d.where(F.lit(False))
    dec = "decimal(38,0)"
    h = _hash60(F.col(key_col).cast("string"))
    return d.where(
        h.cast(dec) * F.lit(int(tot)).cast(dec)
        < F.col(weight_col).cast("long").cast(dec)
        * F.lit(int(target_total)).cast(dec)
        * F.lit(HASH_SPACE).cast(dec))


def interleave_mix(df: DataFrame, group_col: str, weights: dict,
                   key_col: str = "doc_id") -> DataFrame:
    """Deterministic corpus interleaving at integer mixture ratios — the
    data-mixing schedule a training run consumes.  Item r (0-based, in
    md5-hash order within its group) of group g with weight a_g out of
    A = Σa is assigned slot  k = (2r+1)·A div (2·a_g)  (smooth weighted
    round-robin — Bresenham's midpoint spacing); ordering by (k, g, r)
    realizes the target mixture within ±|groups| items over EVERY
    prefix of the stream (no long single-source runs), and a group's
    slots depend only on ITS r and the weights — growing one corpus
    never reorders another's items (the property a reshuffled random
    mix lacks).

    Scale shape: groups are NEVER single-partition windows — both the
    within-group rank r and the final position come from
    `operators.global_rank` (two-phase prefix counts, bounded driver
    exchange), plus one broadcast join of per-group offsets (group
    cardinality = domain vocabulary).  All integer (slot products stay
    under 2^63 for n·A < 4·10^18), so the full schedule value-hashes
    row-for-row cross-engine.

    Groups absent from ``weights`` (and NULL groups/keys) are excluded.
    Returns (key_col, group_col, r:long, slot:long, mix_pos:long)."""
    from ..operators import global_rank
    if not weights or any(a <= 0 for a in weights.values()):
        raise ValueError("weights must be a non-empty dict of positive "
                         f"integers, got {weights}")
    total = int(sum(weights.values()))
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(g, int(a)) for g, a in sorted(weights.items())],
        [group_col, "_a"])
    d = (df.where(F.col(key_col).isNotNull()
                  & F.col(group_col).isNotNull())
         .select(F.col(key_col).cast("string").alias(key_col), group_col)
         .join(F.broadcast(wdf), group_col))
    h = _hash60(F.col(key_col))
    keyed = d.withColumn(
        "_gk", F.format_string("%s|%019d|%s", F.col(group_col), h,
                               F.col(key_col)))
    ranked = global_rank(keyed, "_gk", bucket_prefix_len=2)
    offs = (ranked.groupBy(group_col)
            .agg(F.min("rank").alias("_g0")))
    base = (ranked.join(F.broadcast(offs), group_col)
            .withColumn("r", (F.col("rank") - F.col("_g0")).cast("long"))
            .withColumn("slot",
                        F.expr(f"((2 * r + 1) * {total}) div (2 * _a)")
                        .cast("long"))
            .drop("rank", "_g0", "_gk"))
    skey = base.withColumn(
        "_mk", F.format_string("%012d|%s|%010d", F.col("slot"),
                               F.col(group_col), F.col("r")))
    out = global_rank(skey, "_mk", bucket_prefix_len=10)
    return (out.select(key_col, group_col, "r", "slot",
                       F.col("rank").cast("long").alias("mix_pos")))
