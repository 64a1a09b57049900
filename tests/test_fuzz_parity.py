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
                or mine["score"] != ref["score"]):
            bad.append(doc_id)
    assert not bad, f"{len(bad)} fuzz mismatches: {bad[:5]}"
