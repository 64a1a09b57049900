"""Mention detection + entity linking + canonicalization rules.

These deterministic rules define the "reference-derived triples"
(FIXTURES.md §4): the golden generator applies them single-node to the Node
oracle's retained spans, and the Spark stages 2-4 implement the same rules
distributed.  Keeping the core functions here — imported by BOTH sides —
makes the rules a fixed function of the stage-1 output, so triple parity
measures the distributed implementation, not rule drift.

Rules:
* mention = longest-match alias hit, left-to-right non-overlapping, on the
  lowercased text of each retained ``text`` span, at word boundaries;
* link = alias → candidate entity with max prior (ties → min entity_id);
* same-as edge = two entities sharing an alias where both priors >= 0.8
  (``aliases.STRONG_PRIOR``); canonical id = min entity_id in the connected
  component;
* triples per document (with doc_id provenance):
  (entity, mentioned_in, doc_id); (min, co_mentioned_with, max) per distinct
  canonical pair; (entity, illustrated_by, src) per retained img with a src;
  (next_page, next_page_of, doc_id) when next_page != ''.
"""

from __future__ import annotations

import re
from collections import defaultdict

from .fixtures.aliases import STRONG_PRIOR


def build_alias_pattern(surfaces) -> "re.Pattern":
    """Longest-match alternation with word boundaries over lowercased text."""
    ordered = sorted(set(surfaces), key=lambda s: (-len(s), s))
    return re.compile(r"\b(?:" + "|".join(re.escape(s) for s in ordered)
                      + r")\b")


def find_mentions(text: str, pattern: "re.Pattern"):
    """[(surface, start)] — non-overlapping, left-to-right, longest-first."""
    low = text.lower()
    return [(m.group(0), m.start()) for m in pattern.finditer(low)]


def build_link_map(alias_rows) -> dict:
    """alias -> linked entity_id (max prior, ties -> min entity_id)."""
    best: dict = {}
    for alias, eid, prior in alias_rows:
        cur = best.get(alias)
        if (cur is None or prior > cur[1]
                or (prior == cur[1] and eid < cur[0])):
            best[alias] = (eid, prior)
    return {a: e for a, (e, _) in best.items()}


def same_as_edges(alias_rows):
    """Entity pairs sharing a strong alias (both priors >= STRONG_PRIOR)."""
    by_alias = defaultdict(list)
    for alias, eid, prior in alias_rows:
        if prior >= STRONG_PRIOR:
            by_alias[alias].append(eid)
    edges = set()
    for _, eids in by_alias.items():
        eids = sorted(set(eids))
        for i in range(1, len(eids)):
            edges.add((eids[0], eids[i]))  # star to min suffices for CC
    return sorted(edges)


def canonical_map(alias_rows) -> dict:
    """entity_id -> canonical_id via union-find (single-node golden path).

    The Spark pipeline computes the same map with iterative
    large-star/small-star joins (stage3); results must be identical.
    """
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    entities = sorted({eid for _, eid, _ in alias_rows})
    for e in entities:
        find(e)
    for a, b in same_as_edges(alias_rows):
        union(a, b)
    return {e: find(e) for e in entities}


def triples_for_doc(doc_id: str, retained_spans, next_page: str,
                    pattern, link_map: dict, canon: dict):
    """Apply the fixed triple rules to one document's stage-1 output.

    retained_spans: iterable of (kind, text, media_ref, offset).
    Returns a set of (subj, pred, obj, doc_id).
    """
    entities = set()
    for kind, text, media_ref, _ in retained_spans:
        if kind == "text" and text:
            for surface, _start in find_mentions(text, pattern):
                eid = link_map.get(surface)
                if eid is not None:
                    entities.add(canon.get(eid, eid))
    out = set()
    for e in entities:
        out.add((e, "mentioned_in", doc_id, doc_id))
    ents = sorted(entities)
    for i in range(len(ents)):
        for j in range(i + 1, len(ents)):
            out.add((ents[i], "co_mentioned_with", ents[j], doc_id))
    imgs = {media_ref for kind, _t, media_ref, _o in retained_spans
            if kind == "img" and media_ref}
    for e in ents:
        for ref in sorted(imgs):
            out.add((e, "illustrated_by", ref, doc_id))
    if next_page:
        out.add((next_page, "next_page_of", doc_id, doc_id))
    return out
