"""Generate the fixture corpus, run the Node oracle over it, and write the
golden extractions (FIXTURES.md §3) + golden triples (FIXTURES.md §4).

Usage: python tools/oracle/run_oracle.py [n_docs] [out_dir]
Defaults: 200 docs → data/golden/.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from recrun_spark.fixtures.aliases import make_aliases  # noqa: E402
from recrun_spark.fixtures.generator import make_corpus  # noqa: E402
from recrun_spark.linking import (build_alias_pattern, build_link_map,  # noqa: E402
                                  canonical_map, triples_for_doc)

ORACLE_JS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "oracle.js")


def run_oracle(corpus, configs=("shipped", "full"), tmpdir="/tmp"):
    """Returns {(doc_id, config): oracle_record}."""
    in_path = os.path.join(tmpdir, "oracle_in.jsonl")
    out_path = os.path.join(tmpdir, "oracle_out.jsonl")
    with open(in_path, "w") as f:
        for doc_id, spans in corpus:
            for cfg in configs:
                f.write(json.dumps({"doc_id": doc_id, "config": cfg,
                                    "spans": spans}) + "\n")
    subprocess.run(["node", ORACLE_JS, in_path, out_path], check=True)
    out = {}
    with open(out_path) as f:
        for line in f:
            rec = json.loads(line)
            out[(rec["doc_id"], rec["config"])] = rec
    return out


def golden_triples(oracle_records, seed=42):
    """Reference-derived triples from shipped-config extractions."""
    rows = make_aliases(seed)
    pattern = build_alias_pattern([r[0] for r in rows])
    link_map = build_link_map(rows)
    canon = canonical_map(rows)
    triples = set()
    for (doc_id, cfg), rec in sorted(oracle_records.items()):
        if cfg != "shipped":
            continue
        triples |= triples_for_doc(doc_id, rec["retained_spans"],
                                   rec["next_page"], pattern, link_map, canon)
    return sorted(triples)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    out_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(ORACLE_JS), "..", "..", "data", "golden")
    os.makedirs(out_dir, exist_ok=True)
    corpus = make_corpus(n_docs)
    records = run_oracle(corpus)
    with open(os.path.join(out_dir, "extractions.jsonl"), "w") as f:
        for key in sorted(records):
            f.write(json.dumps(records[key]) + "\n")
    trips = golden_triples(records)
    with open(os.path.join(out_dir, "triples.jsonl"), "w") as f:
        for t in trips:
            f.write(json.dumps(list(t)) + "\n")
    print(f"wrote {len(records)} extractions, {len(trips)} triples to {out_dir}")


if __name__ == "__main__":
    main()
