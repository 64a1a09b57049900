"""Stage 4 — triple assembly, dedup, and partitioned materialization.

Implements the fixed triple rules of ``recrun_spark.linking`` as whole-
DataFrame operations (no Python in the hot path):

* ``mentioned_in``    (canonical entity, doc)
* ``co_mentioned_with`` (min, max) per distinct canonical pair per doc
* ``illustrated_by``  (canonical entity × retained img src) per doc
* ``next_page_of``    (next_page url, doc)

Scale notes:
* the canonical map is broadcast (|entities| rows);
* the co-mention self-join keys on ``doc_id`` — bounded fan-out per doc
  (distinct canonical entities per doc is small), so no skew salting needed;
  AQE skew-join covers pathological docs;
* dedup is ``dropDuplicates`` on the natural key — a single shuffle that the
  partitioned write then reuses;
* the sink partitions by ``pred`` (TableIO: Iceberg when configured,
  partitioned parquet + manifest otherwise) with per-partition lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRIPLE_COLS = ("subj", "pred", "obj", "doc_id")


def doc_entities(linked_mentions: DataFrame, canonical: DataFrame
                 ) -> DataFrame:
    """(doc_id, entity) — distinct canonical entities mentioned per doc."""
    return (linked_mentions
            .join(F.broadcast(canonical), "entity_id")
            .select("doc_id", F.col("canonical_id").alias("entity"))
            .distinct())


def assemble_triples(extractions: DataFrame, linked_mentions: DataFrame,
                     canonical: DataFrame) -> DataFrame:
    # ents feeds three branches (mentioned_in / co-mention self-join /
    # illustrated_by) — persist so the join+distinct runs once
    ents = doc_entities(linked_mentions, canonical).persist()

    mentioned_in = ents.select(
        F.col("entity").alias("subj"),
        F.lit("mentioned_in").alias("pred"),
        F.col("doc_id").alias("obj"),
        "doc_id")

    a, b = ents.alias("a"), ents.alias("b")
    co_mentioned = (a.join(b, "doc_id")
                    .where(F.col("a.entity") < F.col("b.entity"))
                    .select(F.col("a.entity").alias("subj"),
                            F.lit("co_mentioned_with").alias("pred"),
                            F.col("b.entity").alias("obj"),
                            "doc_id"))

    imgs = (extractions
            .select("doc_id", F.explode("retained_spans").alias("s"))
            .where((F.col("s.kind") == "img") & (F.col("s.media_ref") != ""))
            .select("doc_id", F.col("s.media_ref").alias("media_ref"))
            .distinct())
    illustrated = (ents.join(imgs, "doc_id")
                   .select(F.col("entity").alias("subj"),
                           F.lit("illustrated_by").alias("pred"),
                           F.col("media_ref").alias("obj"),
                           "doc_id"))

    next_page = (extractions
                 .where(F.col("next_page") != "")
                 .select(F.col("next_page").alias("subj"),
                         F.lit("next_page_of").alias("pred"),
                         F.col("doc_id").alias("obj"),
                         "doc_id"))

    out = (mentioned_in
           .unionByName(co_mentioned)
           .unionByName(illustrated)
           .unionByName(next_page)
           .dropDuplicates(list(TRIPLE_COLS)))
    # expose the persisted intermediate so long-lived sessions can release
    # it after materializing (pipeline.py and bench.py do)
    out._recrun_ents = ents
    return out
