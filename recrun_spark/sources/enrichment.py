"""External-enrichment connector — the Diffbot-article-API analog
(SURVEY.md §2.1 S3; reference: iframe.js:15-19 getApiUrl, iframe.js:404-452
XHR with 40s timeout, iframe.js:429-437 type=='article' filter + take-first).

Spark-first shape: an Arrow-batched ``mapInPandas`` stage that calls an
injectable ``fetch_fn(url) -> response_text`` per document with bounded
retries and a timeout budget.  The sandbox is offline, so the default
fetcher raises ``NotImplementedError`` — tests inject a deterministic fake.
At scale, per-partition connection reuse + bounded concurrency is exactly
what this stage shape gives you (one HTTP client per task, batch-sized
politeness).
"""

from __future__ import annotations

import json
import time
from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

API_BASE = "http://api.diffbot.com/v3/article"   # reference iframe.js:16
DEFAULT_TIMEOUT_S = 40.0                          # reference iframe.js:404

ARTICLE_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("url", StringType()),
    StructField("title", StringType()),
    StructField("author", StringType()),
    StructField("date", StringType()),
    StructField("html", StringType()),
    StructField("text", StringType()),
    StructField("error", StringType()),
])


def api_url(token: str, page_url: str) -> str:
    """getApiUrl (iframe.js:15-19): html mode + token + url."""
    from urllib.parse import quote
    return f"{API_BASE}?html&token={token}&url={quote(page_url, safe='')}"


def _default_fetch(url: str, timeout_s: float) -> str:
    raise NotImplementedError(
        "no network in this sandbox — inject fetch_fn (requests/httpx) on a "
        "connected cluster")


def parse_article_response(body: str) -> Optional[dict]:
    """Filter response objects to type=='article' and take the first
    (iframe.js:429-437)."""
    data = json.loads(body)
    objects = data.get("objects", [])
    articles = [o for o in objects if o.get("type") == "article"]
    if not articles:
        return None
    a = articles[0]
    return {"title": a.get("title"), "author": a.get("author"),
            "date": a.get("date"), "html": a.get("html"),
            "text": a.get("text")}


def enrich_articles(docs: DataFrame, token: str,
                    url_col: str = "url", id_col: str = "doc_id",
                    fetch_fn: Callable[[str, float], str] | None = None,
                    timeout_s: float = DEFAULT_TIMEOUT_S,
                    max_retries: int = 2,
                    backoff_s: float = 0.05) -> DataFrame:
    """docs(doc_id, url, ...) -> ARTICLE_SCHEMA rows (error column set on
    failure; the pipeline treats enrichment as best-effort)."""
    fetch = fetch_fn or _default_fetch

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in ARTICLE_SCHEMA.fields}
            for doc_id, page_url in zip(pdf[id_col], pdf[url_col]):
                rec = {"doc_id": doc_id, "url": page_url, "title": None,
                       "author": None, "date": None, "html": None,
                       "text": None, "error": None}
                attempt, last_err = 0, None
                while attempt <= max_retries:
                    try:
                        body = fetch(api_url(token, page_url), timeout_s)
                        art = parse_article_response(body)
                        if art is None:
                            rec["error"] = "no_article_objects"
                        else:
                            rec.update(art)
                        last_err = None
                        break
                    except Exception as e:  # noqa: BLE001 — connector edge
                        last_err = f"{type(e).__name__}: {e}"
                        attempt += 1
                        if attempt <= max_retries:
                            time.sleep(backoff_s * attempt)
                if last_err is not None:
                    rec["error"] = last_err
                for k, v in rec.items():
                    rows[k].append(v)
            yield pd.DataFrame(rows)

    return docs.select(id_col, url_col).mapInPandas(fn,
                                                    schema=ARTICLE_SCHEMA)
