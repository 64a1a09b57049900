"""Data-layout operators: Z-ORDER (Morton) space-filling-curve keys.

At 100 TB the scan cost of a query is decided by LAYOUT, not compute: a
table range-partitioned and sorted on ONE column prunes row groups on
that column only, and a predicate on any other column reads everything.
The lakehouse answer (Delta/Iceberg ``OPTIMIZE ZORDER BY``) is to cluster
on a space-filling curve: interleave the bits of several columns into one
integer key, sort by it, and every clustered column gets tight per-file
min/max ranges — multidimensional pruning from a one-dimensional sort.

``zorder_key`` builds the Morton key in PURE INTEGER expressions (one
``aggregate`` over a bit-index sequence per column — JVM-side, no UDF),
so any SQL engine reproduces it bit-for-bit and the driver value-oracle
checks it row-exactly; ``zorder_decode`` inverts it (bijectivity is
property-tested).  ``zorder_layout`` applies the layout: range-partition
by key, sort within partitions — the shape a writer feeds to parquet.

Columns must be NONNEGATIVE integers that fit ``bits`` bits; values are
masked to ``bits`` (documented, tested) so a stray outlier degrades
locality for itself only instead of corrupting the whole key space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 21          # 3 columns x 21 bits = 63 bits, sign-safe


def zorder_key(cols: list[str], bits: int = ZORDER_BITS) -> Column:
    """Morton key column interleaving the low ``bits`` bits of each named
    column: bit ``i`` of column ``j`` lands at position ``i*N + j``.
    Monotone in every coordinate when the others are fixed (each column's
    bits occupy fixed positions in significance order), which is what
    makes per-column min/max pruning work after a z-sort."""
    n = len(cols)
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed bigint")
    parts = []
    for j, c in enumerate(cols):
        # sum_i ((c >> i) & 1) << (i*N + j) — disjoint bit positions, so
        # sum == bitwise-or; aggregate() keeps it one JVM expression
        parts.append(F.expr(
            f"aggregate(sequence(0, {bits - 1}), cast(0 as bigint), "
            f"(acc, i) -> acc + shiftleft(shiftright(cast({c} as bigint), i)"
            f" & 1, i * {n} + {j}))"))
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


def zorder_decode(key: str, n_cols: int, bits: int = ZORDER_BITS
                  ) -> list[Column]:
    """Inverse of ``zorder_key`` for a key column named ``key``: returns
    the ``n_cols`` original (masked) values."""
    return [F.expr(
        f"aggregate(sequence(0, {bits - 1}), cast(0 as bigint), "
        f"(acc, i) -> acc + shiftleft(shiftright(cast({key} as bigint), "
        f"i * {n_cols} + {j}) & 1, i))")
        for j in range(n_cols)]


def zorder_layout(df: DataFrame, cols: list[str],
                  bits: int = ZORDER_BITS,
                  num_partitions: int | None = None) -> DataFrame:
    """The layout op: range-partition on the Morton key and sort within
    partitions — every partition (and the row groups inside it) gets a
    contiguous z-range, i.e. a tight min/max box on EVERY clustered
    column.  One range-exchange (sampled boundaries), no global sort
    node; masking keeps outliers local."""
    mask = (1 << bits) - 1
    keyed = df.withColumn(
        "_zkey", zorder_key(
            [f"(cast({c} as bigint) & {mask})" for c in cols], bits))
    parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32")
    return (keyed.repartitionByRange(int(parts), "_zkey")
            .sortWithinPartitions("_zkey"))


def grid_distance_join(df: DataFrame, id_col: str, x_col: str, y_col: str,
                       radius: int) -> DataFrame:
    """All point pairs within L2 distance ≤ ``radius`` — the grid-
    bucketed distance self-join (the spatial-join standard: fixed-grid
    blocking, Bentley's cell method; the 2-D analog of the LSH candidate
    pattern).  Coordinates must be non-negative integers.

    Cells are radius-sized squares (cx = x div r, cy = y div r), so any
    pair within r differs by ≤1 cell per axis.  One side keys by its own
    cell; the other EXPLODES into its 3×3 neighborhood; the equi-join on
    the cell key yields each qualifying pair EXACTLY once (the exploded
    rows of b carry 9 distinct cells, and only one equals a's cell), so
    no dedup pass is needed.  Candidates verify against the exact
    integer squared distance.

    100 TB shape: one 9× row-local explode + ONE cell-keyed equi-join +
    a pure filter — no windows, no cartesian; candidate volume is
    bounded by local point density per cell (the operator's tuning knob
    is the radius/grid ratio, exactly as in production spatial joins).

    Returns (id_a, id_b, d2) with id_a < id_b and d2 ≤ radius²."""
    if radius <= 0:
        raise ValueError(f"radius must be positive, got {radius}")
    p = df.select(F.col(id_col).alias("_id"),
                  F.col(x_col).cast("long").alias("_x"),
                  F.col(y_col).cast("long").alias("_y"))
    r = F.lit(radius)
    a = p.select(F.col("_id").alias("id_a"), F.col("_x").alias("xa"),
                 F.col("_y").alias("ya"),
                 F.expr(f"_x div {radius}").alias("cx"),
                 F.expr(f"_y div {radius}").alias("cy"))
    # the 9-cell neighborhood, built explicitly
    cells = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                      for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    b = (p.select(F.col("_id").alias("id_b"), F.col("_x").alias("xb"),
                  F.col("_y").alias("yb"),
                  F.expr(f"_x div {radius}").alias("bcx"),
                  F.expr(f"_y div {radius}").alias("bcy"),
                  F.explode(cells).alias("o"))
         .select("id_b", "xb", "yb",
                 (F.col("bcx") + F.col("o.dx")).alias("cx"),
                 (F.col("bcy") + F.col("o.dy")).alias("cy")))
    d2 = ((F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
          + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb")))
    return (a.join(b, ["cx", "cy"])
            .where(F.col("id_a") < F.col("id_b"))
            .where(d2 <= r * r)
            .select("id_a", "id_b", d2.alias("d2")))
