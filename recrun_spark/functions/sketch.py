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
