"""Document source adapters (SURVEY.md §2.1 S1/S4, §2.2 P12).

Any source that yields the input_hint shape
``(doc_id string, spans array<struct<kind,text,media_ref,offset>>)`` can
feed the pipeline (the reference's handler-as-interface extension point,
R:8).  Adapters here: parquet (primary), JSONL (interchange), plus the
P12 content-type guard (content.js:199-201 runs only on text/html).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..stage1 import DOCUMENTS_SCHEMA


def read_documents(spark: SparkSession, path: str, fmt: str = "parquet",
                   content_type: str | None = "text/html") -> DataFrame:
    """Load a documents table and apply the content-type guard.

    ``content_type``: if the source carries a ``content_type`` column, keep
    only matching rows (P12); pass None to disable.  The returned frame
    always has exactly the canonical (doc_id, spans) columns.
    """
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt in ("json", "jsonl"):
        # StructType.add mutates in place — build a fresh schema
        from pyspark.sql.types import StringType, StructField, StructType
        schema = StructType(list(DOCUMENTS_SCHEMA.fields)
                            + [StructField("content_type", StringType())])
        df = spark.read.schema(schema).json(path)
    else:
        raise ValueError(f"unsupported documents format: {fmt!r}")

    if content_type is not None and "content_type" in df.columns:
        # containment, not equality: the reference checks
        # document.contentType.indexOf('text/html') > -1, and real headers
        # carry parameters ("text/html; charset=utf-8")
        df = df.where(F.col("content_type").contains(content_type))
    return df.select("doc_id", "spans")
