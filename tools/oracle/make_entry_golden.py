"""Generate the driver-contract golden parquets in data/golden/:

* ``entry_triples_60.parquet`` — the reference-derived triples for the
  60-doc entry corpus used by ``__spark_entry__.kg_triples_interleaved``.
  Produced by running the Node reference oracle (tools/oracle/oracle.js)
  over the exact corpus the entry query reads, then applying the SAME fixed
  linking rules (recrun_spark.linking) single-node — the identical machinery
  behind data/golden/triples.jsonl.  The driver's DuckDB oracle is then a
  plain read_parquet() of this file, which turns the end-to-end distributed
  KG pipeline into a hard value-level CORRECTNESS row.

* ``media_features_64.parquet`` — single-node evaluation of the multimodal
  feature kernel (functions/multimodal._fake_decode) over the deterministic
  synthetic media table (synth_media_rows, n=64, seed=42), exploded to one
  row per feature element.  This verifies the distributed mapInPandas
  plumbing reproduces local evaluation bit-for-bit (float32 features are
  widened to float64, an exact conversion).

Regenerate ONLY when the fixture generator, linking rules, or the media
kernel change:  python3 tools/oracle/make_entry_golden.py
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from recrun_spark.fixtures.generator import make_corpus  # noqa: E402
from recrun_spark.functions.multimodal import (_fake_decode,  # noqa: E402
                                               synth_media_rows)
from tools.oracle.run_oracle import golden_triples, run_oracle  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "..", "..", "data", "golden")

ENTRY_CORPUS_DOCS = 60   # must match __spark_entry__.kg_triples_interleaved
MEDIA_N = 64             # must match __spark_entry__.media_features
OVERLAY_BASE_URI = "http://news.example/a/b?x=1"  # __spark_entry__.render_overlay


def make_entry_triples(out_path: str) -> int:
    corpus = make_corpus(ENTRY_CORPUS_DOCS)
    records = run_oracle(corpus)
    trips = golden_triples(records)
    table = pa.table({
        "subj": pa.array([t[0] for t in trips], pa.string()),
        "pred": pa.array([t[1] for t in trips], pa.string()),
        "obj": pa.array([t[2] for t in trips], pa.string()),
        "doc_id": pa.array([t[3] for t in trips], pa.string()),
    })
    pq.write_table(table, out_path)
    return len(trips)


def make_media_features(out_path: str) -> int:
    rows = synth_media_rows(MEDIA_N, seed=42)
    media_ids, doc_ids, modalities = [], [], []
    n_bytes, shas, idxs, vals = [], [], [], []
    for media_id, doc_id, modality, _mime, _w, _h, _dur, payload in rows:
        raw = bytes(payload)
        feat = _fake_decode(raw, modality)
        sha = hashlib.sha1(raw).hexdigest()
        for i, v in enumerate(feat):
            media_ids.append(media_id)
            doc_ids.append(doc_id)
            modalities.append(modality)
            n_bytes.append(len(raw))
            shas.append(sha)
            idxs.append(i)
            # float32 -> float64 widening is exact; the Spark side does the
            # identical cast, so values compare bit-for-bit
            vals.append(float(v))
    table = pa.table({
        "media_id": pa.array(media_ids, pa.string()),
        "doc_id": pa.array(doc_ids, pa.string()),
        "modality": pa.array(modalities, pa.string()),
        "n_bytes": pa.array(n_bytes, pa.int32()),
        "sha1": pa.array(shas, pa.string()),
        "idx": pa.array(idxs, pa.int32()),
        "val": pa.array(vals, pa.float64()),
    })
    pq.write_table(table, out_path)
    return len(media_ids)


def make_entry_overlays(out_path: str) -> int:
    """Single-node render-egress: extract (pure Python) + sanitize_html over
    the entry corpus — the independent evaluation the distributed
    stage1+render_overlays chain must reproduce exactly."""
    from recrun_spark.readability import Settings, extract
    from recrun_spark.render import sanitize_html
    corpus = make_corpus(ENTRY_CORPUS_DOCS)
    doc_ids, overlays = [], []
    for doc_id, spans in corpus:
        html = extract(spans, Settings.shipped())["html"]
        doc_ids.append(doc_id)
        overlays.append(sanitize_html(html, OVERLAY_BASE_URI))
    pq.write_table(pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "overlay_html": pa.array(overlays, pa.string()),
    }), out_path)
    return len(doc_ids)


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    n_t = make_entry_triples(
        os.path.join(GOLDEN_DIR, "entry_triples_60.parquet"))
    n_m = make_media_features(
        os.path.join(GOLDEN_DIR, "media_features_64.parquet"))
    n_o = make_entry_overlays(
        os.path.join(GOLDEN_DIR, "entry_overlays_60.parquet"))
    print(f"wrote {n_t} entry triples, {n_m} media feature rows, "
          f"{n_o} overlays to {os.path.normpath(GOLDEN_DIR)}")


if __name__ == "__main__":
    main()
