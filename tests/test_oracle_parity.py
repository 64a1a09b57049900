"""Span-equality suite (BASELINE.json input_hint): the pure-Python fold must
match the Node oracle's golden extractions exactly on
(kind, text, media_ref, order) per document, plus title/next_page/
text_length/score — under BOTH the shipped config (cleanAttributes=false,
skipLevel=3; content.js:151-153) and the full-heuristic config (skipLevel=0).
"""

import json
import os

import pytest

from recrun_spark.fixtures.generator import make_corpus
from recrun_spark.readability import Settings, extract

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "data", "golden",
                      "extractions.jsonl")
N_DOCS = 200


def load_golden():
    recs = {}
    with open(GOLDEN) as f:
        for line in f:
            r = json.loads(line)
            recs[(r["doc_id"], r["config"])] = r
    return recs


@pytest.fixture(scope="module")
def golden():
    return load_golden()


@pytest.fixture(scope="module")
def corpus():
    return dict(make_corpus(N_DOCS))


@pytest.mark.parametrize("config", ["shipped", "full"])
def test_span_equality(golden, corpus, config):
    settings = Settings.shipped() if config == "shipped" else Settings.full()
    assert len(corpus) == N_DOCS
    failures = []
    for doc_id, spans in corpus.items():
        ref = golden[(doc_id, config)]
        mine = extract(spans, settings)
        if [list(s) for s in mine["retained_spans"]] != ref["retained_spans"]:
            failures.append((doc_id, "spans"))
        for k in ("title", "next_page", "text_length", "score", "text",
                  "html"):
            if mine[k] != ref[k]:
                failures.append((doc_id, k))
    assert not failures, f"{len(failures)} mismatches: {failures[:10]}"


def test_output_is_subsequence_of_input(golden, corpus):
    """Property: retained spans are a subsequence of input spans (order-
    preserving; kinds map open:<tag> → <tag> for media)."""
    for doc_id, spans in corpus.items():
        ref = golden[(doc_id, "shipped")]
        offsets = [s[3] for s in ref["retained_spans"]]
        assert offsets == sorted(offsets), doc_id
        by_offset = {s[3]: s for s in spans}
        for kind, text, media_ref, off in ref["retained_spans"]:
            src = by_offset[off]
            if kind == "text":
                assert src[0] == "text" and src[1] == text, doc_id
            else:
                assert src[0] == f"open:{kind}", doc_id


def test_idempotence(corpus):
    """Property: extract() is deterministic / repeatable."""
    doc_id, spans = next(iter(corpus.items()))
    a = extract(spans, Settings.shipped())
    b = extract(spans, Settings.shipped())
    assert a == b
