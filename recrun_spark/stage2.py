"""Stage 2 — batched mention detection + entity-link scoring.

Inputs: stage-1 extractions (doc_id, retained_spans) + the alias dictionary
(alias, entity_id, prior).

Scale design:

* **Mention detection stays a pure map** over extractions (Arrow
  ``mapInPandas``): the compiled longest-match alias automaton is built once
  per executor from a Spark *broadcast* of the alias surfaces (not shipped
  per-batch, not a join against exploded token n-grams — at 10^12 docs an
  n-gram explode would shuffle orders of magnitude more rows than it keeps).
* **Entity-link scoring is a broadcast hash join** against the alias
  dictionary (``F.broadcast``), then a ``max_by``-style argmax per mention
  (max prior, ties → min entity_id) — all JVM-side.
* **Skew**: the head alias (>30% of mentions) is harmless under a broadcast
  join (no shuffle by alias).  If the dictionary outgrows the broadcast
  threshold, ``salted_join`` (operators.py) provides the repartition-join
  path with key salting; stage2 switches when ``broadcast_limit`` is hit.
"""

from __future__ import annotations

import hashlib
import os
from collections import OrderedDict
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, IntegerType, StringType,
                               StructField, StructType)

from .linking import TrieMatcher, build_alias_pattern, find_mentions
from .operators import salted_join

# worker-local matcher cache: Python workers are reused across tasks
# (spark.python.worker.reuse), so a large-dictionary TrieMatcher is built
# once per worker process instead of once per task.  Keyed by a DIGEST of
# the surface set (the key must not pin the full surface tuple of evicted
# entries) and bounded by estimated FOOTPRINT, not entry count — a
# 100k-surface trie is tens of MB, and N tries x many workers per node is
# real memory at cluster scale.
_PATTERN_CACHE: OrderedDict = OrderedDict()  # digest -> (pattern, est_bytes)
_PATTERN_CACHE_MAX_BYTES = int(os.environ.get(
    "RECRUN_MATCHER_CACHE_BYTES", str(256 << 20)))


def _estimate_matcher_bytes(surfaces_tuple: tuple, pattern) -> int:
    """Footprint estimate: a dict-of-dicts trie costs ~200 bytes per stored
    character (node dict + entry + key str, CPython 3.11 measurements); a
    compiled regex alternation stores the program compactly (~10 B/char)."""
    chars = sum(len(s) for s in surfaces_tuple)
    per_char = 200 if isinstance(pattern, TrieMatcher) else 10
    return 4096 + chars * per_char


def _surface_digest(surfaces_tuple: tuple) -> bytes:
    """Injective digest of a surface tuple: each component is length-
    prefixed before hashing, so no choice of surface contents (embedded
    NULs, separator look-alikes) can make two distinct dictionaries
    collide to one cache key — a collision would silently return the
    WRONG matcher."""
    h = hashlib.sha1()
    for s in surfaces_tuple:
        b = s.encode("utf-8")
        h.update(len(b).to_bytes(4, "big"))
        h.update(b)
    return h.digest()


def _cached_pattern(surfaces_tuple: tuple):
    key = _surface_digest(surfaces_tuple)
    hit = _PATTERN_CACHE.pop(key, None)
    if hit is None:
        pattern = build_alias_pattern(surfaces_tuple)
        hit = (pattern, _estimate_matcher_bytes(surfaces_tuple, pattern))
        # evict least-recently-used (front = oldest insertion = LRU, since
        # hits re-insert at the back) until the newcomer fits the budget;
        # an oversized single matcher still caches alone (budget of one)
        total = sum(sz for _, sz in _PATTERN_CACHE.values())
        while _PATTERN_CACHE and total + hit[1] > _PATTERN_CACHE_MAX_BYTES:
            _, (_, sz) = _PATTERN_CACHE.popitem(last=False)
            total -= sz
    _PATTERN_CACHE[key] = hit
    return hit[0]


MENTION_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("surface", StringType()),
    StructField("span_offset", IntegerType()),
    StructField("start", IntegerType()),
])

ALIAS_SCHEMA = StructType([
    StructField("alias", StringType()),
    StructField("entity_id", StringType()),
    StructField("prior", DoubleType()),
])


def detect_mentions(extractions: DataFrame, surfaces: list) -> DataFrame:
    """extractions(doc_id, retained_spans) -> mentions(MENTION_SCHEMA).

    Arrow-native map (``mapInArrow``): spans are read from the Arrow
    buffers; the alias automaton is compiled once per task from the Spark
    broadcast."""
    spark = extractions.sparkSession
    bc = spark.sparkContext.broadcast(sorted(set(surfaces)))

    def fn(batches):
        import pyarrow as pa

        from .stage1 import _unpack_spans_batch
        out_schema = pa.schema([
            ("doc_id", pa.string()), ("surface", pa.string()),
            ("span_offset", pa.int32()), ("start", pa.int32())])
        pattern = _cached_pattern(tuple(bc.value))  # built once per worker
        for batch in batches:
            doc_ids, kinds, texts, _refs, offs, bounds = \
                _unpack_spans_batch(batch, "retained_spans")
            o_doc, o_surf, o_off, o_start = [], [], [], []
            for i in range(len(doc_ids)):
                for j in range(bounds[i], bounds[i + 1]):
                    if kinds[j] != "text" or not texts[j]:
                        continue
                    for surface, start in find_mentions(texts[j], pattern):
                        o_doc.append(doc_ids[i])
                        o_surf.append(surface)
                        o_off.append(int(offs[j]))
                        o_start.append(start)
            yield pa.RecordBatch.from_arrays(
                [pa.array(o_doc, pa.string()), pa.array(o_surf, pa.string()),
                 pa.array(o_off, pa.int32()), pa.array(o_start, pa.int32())],
                schema=out_schema)

    # ship only the spans the automaton consumes: the Python loop skips
    # every non-text/empty span anyway, so filtering the array JVM-side
    # is semantics-identical and cuts the Arrow transport (img/link/
    # header spans never cross the boundary); span_offset rides in the
    # struct, unaffected by the filter
    src = extractions.select(
        "doc_id",
        F.filter("retained_spans",
                 lambda s: (s["kind"] == "text") & (s["text"] != ""))
        .alias("retained_spans"))
    # parallelism floor for the Python fold: a narrow upstream (a limit()
    # collapses to one partition, a single unsplittable input file, a
    # 1-partition cache) would run the per-doc automaton nearly serially
    # on an idle cluster.  Only rebalance when the input has FEWER
    # partitions than the default parallelism — at production scale scans
    # carry many splits and this is a no-op, so the operator stays a pure
    # map there (guide §2.5: fix input skew right after the read).
    try:
        n_parts = src.rdd.getNumPartitions()
        target = spark.sparkContext.defaultParallelism
        if n_parts < target:
            src = src.repartition(target)
    except Exception:
        pass
    return src.mapInArrow(fn, schema=MENTION_SCHEMA)


def link_mentions(mentions: DataFrame, aliases: DataFrame,
                  broadcast_max_rows: int = 1_000_000,
                  salt_buckets: int = 16) -> DataFrame:
    """Join mentions to the alias dictionary and pick the best candidate
    per mention: max prior, ties -> min entity_id (linking.build_link_map).

    Returns (doc_id, surface, span_offset, start, entity_id, prior).
    """
    # argmax per alias is doc-independent: reduce the dictionary FIRST
    # (|aliases| rows), not per-mention (|mentions| rows) — at 10^12 docs the
    # dictionary-side reduction is free, the mention-side one is a shuffle.
    # Window argmax (not max_by) for the deterministic tiebreak that matches
    # linking.build_link_map: max prior, ties -> min entity_id.
    from pyspark.sql import Window
    w = (Window.partitionBy("alias")
         .orderBy(F.col("prior").desc(), F.col("entity_id").asc()))
    best = (aliases
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("alias", "entity_id", "prior"))

    if _estimate_small(aliases, broadcast_max_rows):
        joined = mentions.join(F.broadcast(best),
                               mentions["surface"] == best["alias"], "inner")
    else:
        joined = salted_join(mentions, best, "surface", "alias",
                             buckets=salt_buckets)
    return joined.select("doc_id", "surface", "span_offset", "start",
                         "entity_id", "prior")


def _estimate_small(df: DataFrame, max_rows: int) -> bool:
    # alias dictionaries are metadata-scale; a cheap bounded count suffices
    try:
        return df.limit(max_rows + 1).count() <= max_rows
    except Exception:
        return False


def load_aliases(spark: SparkSession, rows=None, seed: int = 42) -> DataFrame:
    from .fixtures.aliases import make_aliases
    rows = rows if rows is not None else make_aliases(seed)
    return spark.createDataFrame(
        [(a, e, float(p)) for a, e, p in rows], schema=ALIAS_SCHEMA)
