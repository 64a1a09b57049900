"""Source adapters: content-type guard (P12), JSONL interchange, and the
enrichment connector's retry/timeout/filter semantics (S3)."""

import json
import os

from recrun_spark.fixtures.generator import make_corpus
from recrun_spark.sources import enrich_articles, read_documents
from recrun_spark.sources.enrichment import api_url, parse_article_response


def test_read_documents_jsonl_with_content_type_guard(spark, tmpdir_path):
    corpus = make_corpus(6)
    path = os.path.join(tmpdir_path, "docs.jsonl")
    with open(path, "w") as f:
        for i, (doc_id, spans) in enumerate(corpus):
            f.write(json.dumps({
                "doc_id": doc_id,
                "spans": [{"kind": k, "text": t, "media_ref": m, "offset": o}
                          for k, t, m, o in spans],
                "content_type": "text/html" if i % 2 == 0 else "application/pdf",
            }) + "\n")
    df = read_documents(spark, path, fmt="jsonl")
    assert df.columns == ["doc_id", "spans"]
    assert df.count() == 3  # pdf rows filtered (P12, content.js:199-201)
    # guard disabled -> all rows
    assert read_documents(spark, path, fmt="jsonl",
                          content_type=None).count() == 6


def test_api_url_matches_reference_shape():
    u = api_url("tok123", "http://ex.com/a?b=1")
    assert u.startswith("http://api.diffbot.com/v3/article?html&token=tok123"
                        "&url=http%3A%2F%2Fex.com%2Fa%3Fb%3D1")


def test_parse_article_filters_type():
    body = json.dumps({"objects": [
        {"type": "image", "title": "nope"},
        {"type": "article", "title": "Yes", "text": "body text"},
        {"type": "article", "title": "second"},
    ]})
    art = parse_article_response(body)
    assert art["title"] == "Yes" and art["text"] == "body text"
    assert parse_article_response(json.dumps({"objects": []})) is None


def test_enrichment_retry_and_error_paths(spark):
    docs = spark.createDataFrame(
        [("d1", "http://ex.com/ok"), ("d2", "http://ex.com/flaky"),
         ("d3", "http://ex.com/dead"), ("d4", "http://ex.com/notart")],
        ["doc_id", "url"])

    calls = {}

    def fake_fetch(url, timeout_s):
        assert timeout_s == 40.0  # reference's 40s budget (iframe.js:404)
        key = url.split("url=")[1]
        calls[key] = calls.get(key, 0) + 1
        if "flaky" in key and calls[key] < 2:
            raise TimeoutError("simulated timeout")
        if "dead" in key:
            raise ConnectionError("simulated refusal")
        if "notart" in key:
            return json.dumps({"objects": [{"type": "image"}]})
        return json.dumps({"objects": [
            {"type": "article", "title": "T", "text": "X", "html": "<p>X</p>",
             "author": "A", "date": "2024-01-01"}]})

    out = {r["doc_id"]: r for r in
           enrich_articles(docs.repartition(1), "tok",
                           fetch_fn=fake_fetch).collect()}
    assert out["d1"]["title"] == "T" and out["d1"]["error"] is None
    assert out["d2"]["title"] == "T"          # succeeded on retry
    assert "ConnectionError" in out["d3"]["error"]
    assert out["d4"]["error"] == "no_article_objects"
