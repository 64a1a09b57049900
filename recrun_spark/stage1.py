"""Stage 1 — distributed content-retention extraction.

Runs the per-document readability fold (``recrun_spark.readability``) as an
Arrow-vectorized ``mapInPandas`` over the interleaved documents table
(``doc_id, spans array<struct<kind,text,media_ref,offset>>`` —
BASELINE.json input_hint).

Scale design (SURVEY.md §3/§4):

* **Zero shuffle.** Each document's fold is self-contained, so stage 1 is a
  pure map: no ``groupBy``/``posexplode``-then-regroup.  On a 1000-executor
  cluster this scales linearly with input splits; parallelism is governed by
  ``spark.sql.files.maxPartitionBytes`` on the scan, not by shuffle
  partitions.
* **Arrow batching, no per-row Python.**  ``mapInPandas`` moves docs
  executor→Python in Arrow record batches; the only Python work is the fold
  itself (the reference's algorithm is inherently per-document, exactly like
  the reference's own single-pass SAX handler, R:733-765).
* **Column pruning.** The UDF declares only (doc_id, spans); Catalyst's
  nested-schema pruning keeps the parquet scan minimal.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (ArrayType, IntegerType, StringType, StructField,
                               StructType)

from .readability import Settings, extract

SPAN_TYPE = StructType([
    StructField("kind", StringType()),
    StructField("text", StringType()),
    StructField("media_ref", StringType()),
    StructField("offset", IntegerType()),
])

DOCUMENTS_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("spans", ArrayType(SPAN_TYPE)),
])

EXTRACTION_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("title", StringType()),
    StructField("next_page", StringType()),
    StructField("text_length", IntegerType()),
    StructField("score", IntegerType()),
    StructField("retained_spans", ArrayType(SPAN_TYPE)),
])


def _spans_to_tuples(spans) -> list:
    # Arrow hands array<struct> to pandas as a numpy array of dicts
    return [(s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in spans]


def _extract_batches(batches: Iterator[pd.DataFrame], settings: Settings
                     ) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {"doc_id": [], "title": [], "next_page": [], "text_length": [],
               "score": [], "retained_spans": []}
        for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
            rec = extract(_spans_to_tuples(spans), settings)
            out["doc_id"].append(doc_id)
            out["title"].append(rec["title"])
            out["next_page"].append(rec["next_page"])
            out["text_length"].append(rec["text_length"])
            out["score"].append(rec["score"])
            out["retained_spans"].append(
                [{"kind": k, "text": t, "media_ref": m, "offset": o}
                 for k, t, m, o in rec["retained_spans"]])
        yield pd.DataFrame(out)


def extract_documents(documents: DataFrame,
                      settings: Optional[Settings] = None) -> DataFrame:
    """documents(doc_id, spans) -> extractions (EXTRACTION_SCHEMA)."""
    settings = settings or Settings.shipped()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return _extract_batches(batches, settings)

    return documents.select("doc_id", "spans").mapInPandas(
        fn, schema=EXTRACTION_SCHEMA)
