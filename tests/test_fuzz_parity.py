"""Differential fuzz parity: random span documents (wide tag vocabulary,
quirk triggers) run through BOTH the reference (Node oracle, verbatim) and
the Python port, asserting exact equality.  This is the suite that caught
the accidental-global toString corruption (R:123) and the saxParser
tag-lowercasing behavior (R:739)."""

import pytest

from recrun_spark.fixtures.fuzz import fuzz_corpus
from recrun_spark.readability import Settings, extract
from tools.oracle.run_oracle import run_oracle

N_FUZZ = 150


@pytest.fixture(scope="module")
def fuzz_records():
    corpus = fuzz_corpus(N_FUZZ)
    return corpus, run_oracle(corpus)


def test_fuzz_parity_with_page_url():
    """F1/F2/P11 coverage: _convertLinks, _getBaseURL, and the link-scan
    domain checks only activate when settings.pageURL is provided."""
    import json
    import subprocess

    from tools.oracle.run_oracle import ORACLE_JS
    page_urls = ["http://ex.com/story/part-1", "http://ex.com/a/b/c.html?x=1",
                 "https://news.site.org/2024/05/article_p2", "http://ex.com/",
                 "http://ex.com/index", "http://ex.com/p/3/"]
    corpus = fuzz_corpus(60)
    in_path, out_path = "/tmp/fz_url_in.jsonl", "/tmp/fz_url_out.jsonl"
    with open(in_path, "w") as f:
        for i, (doc_id, spans) in enumerate(corpus):
            f.write(json.dumps({
                "doc_id": doc_id, "config": "shipped", "spans": spans,
                "page_url": page_urls[i % len(page_urls)]}) + "\n")
    subprocess.run(["node", ORACLE_JS, in_path, out_path], check=True)
    gold = {}
    with open(out_path) as f:
        for line in f:
            r = json.loads(line)
            gold[r["doc_id"]] = r
    bad = []
    for i, (doc_id, spans) in enumerate(corpus):
        st = Settings(clean_attributes=False, skip_level=3,
                      page_url=page_urls[i % len(page_urls)])
        mine = extract(spans, st)
        ref = gold[doc_id]
        if ([list(s) for s in mine["retained_spans"]]
                != ref["retained_spans"]
                or mine["next_page"] != ref["next_page"]
                or mine["score"] != ref["score"]):
            bad.append(doc_id)
    assert not bad, bad[:5]


@pytest.mark.parametrize("config", ["shipped", "full"])
def test_fuzz_differential_parity(fuzz_records, config):
    corpus, records = fuzz_records
    settings = Settings.shipped() if config == "shipped" else Settings.full()
    bad = []
    for doc_id, spans in corpus:
        ref = records[(doc_id, config)]
        mine = extract(spans, settings)
        if ([list(s) for s in mine["retained_spans"]]
                != ref["retained_spans"]
                or mine["title"] != ref["title"]
                or mine["next_page"] != ref["next_page"]
                or mine["text_length"] != ref["text_length"]
                or mine["score"] != ref["score"]
                or mine["text"] != ref["text"]
                or mine["html"] != ref["html"]):
            bad.append(doc_id)
    assert not bad, f"{len(bad)} fuzz mismatches: {bad[:5]}"


def test_unicode_bmp_parity():
    """Non-ASCII BMP text (umlauts, CJK, NBSP, unicode titles) must match
    the reference exactly — UTF-16 lengths and JS whitespace classes are
    emulated; only astral (non-BMP) chars are out of scope (documented)."""
    long_u = ("Längere Absätze über die Einführung, mit Umlauten, çédilles, "
              "中文字符 und geschützten Leerzeichen, genug Text um die "
              "Schwelle zu überschreiten.")
    docs = []
    for i, title in enumerate(["Überschrift mit Wörtern - Seite",
                               "日本語 | サイト",
                               "Ünïcode: Tëst Tïtle Hère Wörds"]):
        spans = []

        def emit(k, t="", m=""):
            spans.append((k, t, m, len(spans)))

        emit("open:html"); emit("open:head"); emit("open:title")
        emit("text", title); emit("close:title"); emit("close:head")
        emit("open:body"); emit("open:div"); emit("attr:class", "content")
        for _ in range(3):
            emit("open:p"); emit("text", long_u); emit("close:p")
        emit("open:h2"); emit("text", "中文标题"); emit("close:h2")
        emit("close:div"); emit("close:body"); emit("close:html")
        docs.append((f"u{i}", spans))
    records = run_oracle(docs)
    for doc_id, spans in docs:
        for cfg in ("shipped", "full"):
            ref = records[(doc_id, cfg)]
            mine = extract(spans, Settings.shipped() if cfg == "shipped"
                           else Settings.full())
            assert [list(s) for s in mine["retained_spans"]] == \
                ref["retained_spans"], (doc_id, cfg)
            for k in ("title", "next_page", "text_length", "score",
                      "text", "html"):
                assert mine[k] == ref[k], (doc_id, cfg, k)
