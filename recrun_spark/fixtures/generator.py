"""Deterministic interleaved text+media document generator (FIXTURES.md §1).

Produces documents in the exact ``input_hint`` shape:
``(doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)``.

Span encoding (documented in FIXTURES.md; consumed by both the Node oracle
harness in ``tools/oracle/`` and the Spark stage-1 UDF):

* ``open:<tag>`` / ``close:<tag>`` — element boundaries.  For media tags
  (img/embed/iframe/object/video/audio) the ``open`` span's ``media_ref``
  carries ``url`` + optional ``#w=<int>&h=<int>``; it is expanded to
  ``src``/``width``/``height`` attribute events in that order.
* ``attr:<name>`` — attribute event; value in ``text``; must immediately
  follow its element's ``open`` span (before children).  The ``title``
  attribute name is RESERVED for the oracle's offset bookkeeping and never
  generated here.
* ``text`` — text node; payload in ``text``.

Every fixture family maps to reference behaviors (cites = readabilitySAX.js).
"""

from __future__ import annotations

import random

from .aliases import make_aliases, head_alias

# ---------------------------------------------------------------------------
# tiny node DSL: ("el", tag, attrs_list, children) | ("text", s)
#               | ("media", tag, url, w, h)
# attrs_list = [(name, value)] in emission order
# ---------------------------------------------------------------------------


def E(tag, attrs=None, children=None):
    return ("el", tag, list(attrs or []), list(children or []))


def T(s):
    return ("text", s)


def M(tag, url, w=None, h=None):
    return ("media", tag, url, w, h)


def flatten(doc_nodes):
    """node tree -> list of (kind, text, media_ref, offset) spans."""
    spans = []

    def emit(kind, text="", media_ref=""):
        spans.append((kind, text, media_ref, len(spans)))

    def walk(node):
        if node[0] == "text":
            emit("text", node[1])
        elif node[0] == "media":
            _, tag, url, w, h = node
            ref = url or ""
            frag = []
            if w is not None:
                frag.append(f"w={w}")
            if h is not None:
                frag.append(f"h={h}")
            if frag:
                ref = ref + "#" + "&".join(frag)
            emit(f"open:{tag}", "", ref)
            emit(f"close:{tag}")
        else:
            _, tag, attrs, children = node
            emit(f"open:{tag}")
            for name, value in attrs:
                emit(f"attr:{name}", value)
            for ch in children:
                walk(ch)
            emit(f"close:{tag}")

    for n in doc_nodes:
        walk(n)
    return spans


# ---------------------------------------------------------------------------
# filler text (vocabulary disjoint from alias surfaces)
# ---------------------------------------------------------------------------

_WORDS = ("the quarterly report outlined steady progress across several "
          "divisions with margins improving and costs declining while "
          "analysts noted cautious optimism about regional demand supply "
          "chains stabilizing after months of disruption and freight rates "
          "returning to seasonal norms despite lingering uncertainty in "
          "energy markets").split()


def _sentence(rng, n_words, commas=True):
    ws = [rng.choice(_WORDS) for _ in range(n_words)]
    if commas and n_words > 6:
        k = rng.randint(1, max(1, n_words // 6))
        for _ in range(k):
            i = rng.randint(2, n_words - 2)
            ws[i] = ws[i] + ","
    s = " ".join(ws)
    return s[0].upper() + s[1:] + "."


def _paragraph(rng, n_sents=None, mention=None):
    n_sents = n_sents or rng.randint(2, 5)
    sents = [_sentence(rng, rng.randint(8, 18)) for _ in range(n_sents)]
    if mention:
        i = rng.randrange(len(sents))
        verb = rng.choice(["announced a partnership with", "filed suit against",
                           "completed its acquisition of", "met with"])
        if len(mention) == 2:
            sents[i] = (f"{mention[0].title()} {verb} {mention[1].title()}, "
                        f"according to people familiar with the matter.")
        else:
            sents[i] = (f"{mention[0].title()} {rng.choice(['expanded', 'reported', 'confirmed'])} "
                        f"its plans, citing demand.")
    return " ".join(sents)


_IMG = "http://img.example.com/media/{}.jpg"
_PNG = "http://img.example.com/media/{}.png"


# ---------------------------------------------------------------------------
# document families — each exercises cited reference behaviors
# ---------------------------------------------------------------------------

def _boilerplate(rng, surfaces):
    """nav/aside/footer with decoy mentions + decoy links (P4, R:164)."""
    decoy = rng.choice(surfaces)
    return [
        E("nav", [("class", "site-nav")], [
            E("a", [("href", "/section/1")], [T("Home 1")]),
            E("a", [("href", "/about2")], [T("prev")]),  # −200 prevLink
            T(f"Read about {decoy.title()} here"),
        ]),
        E("aside", [("class", "promo")], [
            T(f"{decoy.title()} sponsors this site, subscribe now.")]),
    ]


def _footer(rng, surfaces):
    decoy = rng.choice(surfaces)
    return E("footer", [("class", "footer")], [
        T(f"Copyright, all rights reserved. {decoy.title()} press room."),
    ])


def _title_nodes(rng, doc_ix, mention=None):
    """F3/F4 coverage: ' - ', ' | ', ': ', short titles (R:651-675)."""
    style = doc_ix % 5
    core = _sentence(rng, rng.randint(5, 8), commas=False)[:-1]
    if mention:
        core = f"{mention.title()} {core.split(' ', 1)[1]}"
    if style == 0:
        t = f"{core} - Example Site News"
    elif style == 1:
        t = f"Example Site | {core}"
    elif style == 2:
        t = f"Briefing: {core}"
    elif style == 3:
        t = core
    else:
        t = "Short Note"  # <5 words → falls back to original (R:673)
    return t, E("title", [], [T(t)])


def _pagination(rng, with_next=True):
    """P11/F7/W2/W3 coverage: numbered pages, next/prev, decoys (R:335-403)."""
    kids = [E("a", [("href", f"/story/part?page={n}")], [T(str(n))])
            for n in (1, 2, 3)]
    if with_next:
        kids.append(E("a", [("class", "next")],  # re_pages in href +25
                      [T("next »")],) )
        kids[-1] = E("a", [("href", "/story/part?page=2"), ("class", "pager-next")],
                     [T("next »")])
    kids.append(E("a", [("href", "/story/print2")], [T("print")]))  # extraneous
    kids.append(E("a", [("href", "http://offsite.example.org/2")], [T("2 ext")]))
    return E("div", [("class", "pagination")], kids)


def _article_paragraphs(rng, mentions, n_paras=None):
    n_paras = n_paras or rng.randint(3, 8)
    paras = []
    ms = list(mentions)
    for i in range(n_paras):
        mention = None
        if ms:
            if len(ms) >= 2 and rng.random() < 0.4:
                mention = (ms.pop(), ms.pop())
            else:
                mention = (ms.pop(),)
        paras.append(E("p", [], [T(_paragraph(rng, mention=mention))]))
    while ms:  # ensure every chosen mention lands in the article body
        paras.append(E("p", [], [T(_paragraph(rng, mention=(ms.pop(),)))]))
    return paras


GEN_VERSION = 2  # bump when generated content changes (invalidates caches)


def _pick_mentions(rng, surfaces, head, k=None, skew: bool = False):
    k = k if k is not None else rng.randint(1, 4)
    picks = []
    # deliberately skewed head alias: present in most docs, often twice,
    # so it carries >30% of all mentions (FIXTURES.md §2 skew invariant).
    # skew=True is the STRESS profile (>50% head share): nearly every doc
    # carries the head, usually several times.
    p_head, p_two, p_three = (0.97, 0.85, 0.6) if skew else (0.85, 0.55, 0.0)
    if rng.random() < p_head:
        picks.append(head)
        if rng.random() < p_two:
            picks.append(head)
            # guarded draw: skew=False must consume the EXACT same rng
            # sequence as before the skew knob existed, or every golden
            # fixture would silently shift while GEN_VERSION stays put
            if skew and rng.random() < p_three:
                picks.append(head)
    while len(picks) < k:
        s = rng.choice(surfaces)
        if s not in picks:
            picks.append(s)
    return picks


def make_doc(doc_ix: int, seed: int, surfaces, head, skew: bool = False):
    rng = random.Random((seed << 20) ^ doc_ix)
    family = doc_ix % 10
    mentions = _pick_mentions(rng, surfaces, head, skew=skew)
    title_mention = mentions[0] if rng.random() < 0.3 else None
    title_text, title_el = _title_nodes(rng, doc_ix, title_mention)

    body_kids = list(_boilerplate(rng, surfaces))
    # skew stress: power-law document lengths (Pareto alpha~1.3, capped) —
    # a few giant documents next to many small ones, the shape that breaks
    # naive per-doc partitioning assumptions at corpus scale
    n_paras = None
    if skew:
        n_paras = min(120, max(3, int(3 * (rng.random() ** -0.77))))
        # long documents mention the head entity throughout (news-wire
        # shape): pushes the single hot key past 50% of ALL mentions
        mentions = list(mentions) + [head] * (n_paras // 3)
    paras = _article_paragraphs(rng, mentions, n_paras=n_paras)
    content_attr = [("class", rng.choice(
        ["content", "article-body", "post entry", "main-story"]))]
    content_kids = []

    # h1 matching the title (F4, R:477-494)
    if rng.random() < 0.5:
        content_kids.append(E("h1", [], [T(title_text.split(" - ")[0]
                                           .split(" | ")[-1])]))
    content_kids.extend(paras)

    if family == 0:
        pass  # plain article
    elif family == 1:  # media: big/medium/tiny/linked images (P9/P10/A4/T3)
        content_kids.insert(1, M("img", _IMG.format(doc_ix), 640, 480))
        content_kids.insert(3, M("img", _IMG.format(doc_ix + 1000), 250, 180))
        content_kids.append(M("img", _IMG.format(doc_ix + 2000), 24, 24))
        content_kids.append(E("a", [("href", _PNG.format(doc_ix))],
                              [M("img", _IMG.format(doc_ix + 3000))]))
        content_kids.append(E("p", [], []))  # empty p (kept: 0 children)
        content_kids.append(E("td", [], [T("  ")]))  # removed if empty
        content_kids.append(E("div", [], [M("img", _IMG.format(doc_ix + 4000),
                                            500, 400)]))  # unpack div (T1)
    elif family == 2:  # div soup: div→p conversion, nested wrappers (T1/T2)
        wrapped = [E("div", [], [T(_paragraph(rng))]) for _ in range(3)]
        content_kids.extend(wrapped)
        content_kids.append(E("div", [], [E("div", [],
                             [T(_paragraph(rng, mention=(mentions[0],)))])]))
    elif family == 3:  # link farm + list (A1 density, P8 at skip0)
        links = [E("li", [], [E("a", [("href", f"/tag/{i}x{doc_ix}")],
                                [T(f"tag {i}")])]) for i in range(8)]
        content_kids.append(E("ul", [("class", "tags")], links))
        content_kids.append(E("ul", [], []))  # li-less list (R:531 NaN probe)
    elif family == 4:  # pagination (W2 nextPage)
        body_kids.append(_pagination(rng))
    elif family == 5:  # sibling adoption (J1, R:582-607)
        cls = "story-part"
        sib1 = E("div", [("class", cls)],
                 [E("p", [], [T(_paragraph(rng, mention=(mentions[0],)))])])
        sib2 = E("p", [], [T(_paragraph(rng, n_sents=3))])  # long p sibling
        sib3 = E("p", [], [T("Short closer. ")])  # sentence-final short p
        content_attr = [("class", cls)]
        body_kids.extend([sib1])
        # candidate shares class with sib1 at the same level
        body_kids.append(E("div", content_attr, content_kids))
        body_kids.extend([sib2, sib3, _footer(rng, surfaces)])
        spans = flatten([E("html", [], [E("head", [], [title_el]),
                                        E("body", [], body_kids)])])
        return spans
    elif family == 6:  # embeds: youtube vs other (P6, R:515-518)
        content_kids.append(M("iframe", f"http://www.youtube.com/embed/v{doc_ix}"))
        content_kids.append(M("iframe", f"http://ads.example.com/frame{doc_ix}"))
        content_kids.append(M("embed", f"http://vimeo.com/clip/{doc_ix}"))
    elif family == 7:  # quirk probes: br/hr (P3), span/font wrappers, h2/h3
        content_kids.append(E("br", [], []))
        content_kids.append(E("hr", [], []))
        content_kids.append(E("span", [("class", "sidebar")],
                              [T("Inline span text stays with parent.")]))
        content_kids.append(E("font", [], [T("Font text hoists too.")]))
        content_kids.append(E("h2", [("class", "related")],  # neg score → drop
                              [T("Related stories")]))
        content_kids.append(E("h2", [], [T("A fine subheading")]))
        content_kids.append(E("h3", [], [E("a", [("href", "/x9")], [T("linky")]),
                                         T("x")]))  # density > 1/3 → drop
    elif family == 8:  # unlikely candidates / class priors (P5/A3 at skip0)
        content_kids.append(E("div", [("class", "comment")],
                              [T(_paragraph(rng))]))
        content_kids.append(E("div", [("class", "sidebar widget")],
                              [T("widget text, ignore me")]))
        content_attr = [("class", "hentry")]  # re_safe +300 at skip0
    else:  # family == 9: table-based content (td scoring, R:562)
        rows = [E("tr", [], [E("td", [], [T(_paragraph(rng))])])
                for _ in range(3)]
        content_kids.append(E("table", [("class", "layout")],
                              [E("tbody", [], rows)]))

    if family != 5:
        body_kids.append(E("div", content_attr, content_kids))
        body_kids.append(_footer(rng, surfaces))

    html = E("html", [], [E("head", [], [title_el]),
                          E("body", [], body_kids)])
    return flatten([html])


def make_corpus(n_docs: int, seed: int = 42, skew: bool = False):
    """[(doc_id, spans)] — deterministic.  ``skew=True`` is the stress
    profile: >50% head-alias mention share + power-law doc lengths."""
    rows = make_aliases(seed)
    surfaces = sorted({r[0] for r in rows})
    head = head_alias()
    return [(f"doc{ix:06d}", make_doc(ix, seed, surfaces, head, skew=skew))
            for ix in range(n_docs)]


def corpus_to_arrow(corpus):
    """pyarrow Table in the input_hint schema (no Spark needed)."""
    import pyarrow as pa
    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()), ("offset", pa.int32())])
    doc_ids = [d for d, _ in corpus]
    spans = [[{"kind": k, "text": t, "media_ref": m, "offset": o}
              for k, t, m, o in s] for _, s in corpus]
    return pa.table({"doc_id": pa.array(doc_ids, pa.string()),
                     "spans": pa.array(spans, pa.list_(span_t))})


def write_corpus_parquet(path: str, n_docs: int, seed: int = 42,
                         skew: bool = False):
    import pyarrow.parquet as pq
    pq.write_table(corpus_to_arrow(make_corpus(n_docs, seed, skew=skew)),
                   path)
    return path
