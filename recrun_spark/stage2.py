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

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, IntegerType, StringType,
                               StructField, StructType)

from .linking import build_alias_pattern, find_mentions
from .operators import salted_join

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
    """extractions(doc_id, retained_spans) -> mentions(MENTION_SCHEMA)."""
    spark = extractions.sparkSession
    bc = spark.sparkContext.broadcast(sorted(set(surfaces)))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pattern = build_alias_pattern(bc.value)  # compiled once per task
        for pdf in batches:
            out = {"doc_id": [], "surface": [], "span_offset": [],
                   "start": []}
            for doc_id, spans in zip(pdf["doc_id"], pdf["retained_spans"]):
                for s in spans:
                    if s["kind"] != "text" or not s["text"]:
                        continue
                    for surface, start in find_mentions(s["text"], pattern):
                        out["doc_id"].append(doc_id)
                        out["surface"].append(surface)
                        out["span_offset"].append(s["offset"])
                        out["start"].append(start)
            yield pd.DataFrame(out)

    return extractions.select("doc_id", "retained_spans").mapInPandas(
        fn, schema=MENTION_SCHEMA)


def link_mentions(mentions: DataFrame, aliases: DataFrame,
                  broadcast_limit: int = 50_000_000,
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

    if _estimate_small(aliases, broadcast_limit):
        joined = mentions.join(F.broadcast(best),
                               mentions["surface"] == best["alias"], "inner")
    else:
        joined = salted_join(mentions, best, "surface", "alias",
                             buckets=salt_buckets)
    return joined.select("doc_id", "surface", "span_offset", "start",
                         "entity_id", "prior")


def _estimate_small(df: DataFrame, limit_bytes: int) -> bool:
    # alias dictionaries are metadata-scale; a cheap count guard suffices
    try:
        return df.limit(1_000_001).count() <= 1_000_000
    except Exception:
        return False


def load_aliases(spark: SparkSession, rows=None, seed: int = 42) -> DataFrame:
    from .fixtures.aliases import make_aliases
    rows = rows if rows is not None else make_aliases(seed)
    return spark.createDataFrame(
        [(a, e, float(p)) for a, e, p in rows], schema=ALIAS_SCHEMA)
