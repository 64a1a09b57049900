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


def test_enrichment_live_local_http_timeout_and_retry(spark):
    """Drive the connector against a REAL socket server (no external
    network): urllib transport in the executor workers, the reference's
    timeout budget enforced at the socket (iframe.js:404-452), a 500-then-OK
    endpoint proving the bounded retry loop re-issues the request, and a
    sleeping endpoint proving the timeout fires and surfaces in `error`."""
    import threading
    import time as _time
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    attempts = {}
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # keep pytest output clean
            pass

        def do_GET(self):
            with lock:
                attempts[self.path] = attempts.get(self.path, 0) + 1
                n = attempts[self.path]
            if self.path == "/slow":
                _time.sleep(1.5)  # > client timeout: socket timeout fires
            if self.path == "/flaky" and n < 3:
                self.send_response(500)
                self.end_headers()
                return
            body = json.dumps({"objects": [
                {"type": "article", "title": f"T{self.path}", "text": "X",
                 "html": "<p>X</p>", "author": "A", "date": "2024-01-01"},
            ]}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        docs = spark.createDataFrame(
            [("ok", f"http://127.0.0.1:{port}/ok"),
             ("flaky", f"http://127.0.0.1:{port}/flaky"),
             ("slow", f"http://127.0.0.1:{port}/slow")],
            ["doc_id", "url"])

        def live_fetch(api: str, timeout_s: float) -> str:
            # the connector hands us the Diffbot-shaped API URL; extract the
            # page URL (api_url percent-encodes it) and fetch it directly
            from urllib.parse import unquote
            from urllib.request import urlopen
            page = unquote(api.split("url=")[1])
            with urlopen(page, timeout=timeout_s) as r:
                return r.read().decode()

        out = {r["doc_id"]: r for r in
               enrich_articles(docs.repartition(1), "tok",
                               fetch_fn=live_fetch, timeout_s=0.4,
                               max_retries=2, backoff_s=0.01).collect()}
    finally:
        srv.shutdown()
        srv.server_close()

    assert out["ok"]["title"] == "T/ok" and out["ok"]["error"] is None
    # two 500s then success: the retry loop re-issued the request twice
    assert out["flaky"]["title"] == "T/flaky" and out["flaky"]["error"] is None
    assert attempts["/flaky"] == 3
    # the sleeping endpoint exhausted timeout x (1 + max_retries) attempts
    assert out["slow"]["title"] is None
    assert "timed out" in out["slow"]["error"].lower()
    assert attempts["/slow"] == 3
