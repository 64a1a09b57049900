"""Random span-document generator for differential (fuzz) parity testing
against the Node oracle.  Deterministic per (seed, index).

Covers the full tag vocabulary including quirk triggers (br/hr, noContent
tags whose attrs/text leak to the parent, JS Object.prototype tag names,
linked images, tiny/huge dimensions, scoring class names, pagination-ish
anchors, nested title/header capture).  ASCII payloads only: JS string
indices are UTF-16 and the port matches them for BMP text; astral chars are
excluded by design (documented limitation).
"""

from __future__ import annotations

import random

TAGS = ["div", "p", "span", "a", "ul", "ol", "li", "table", "tr", "td",
        "th", "tbody", "thead", "blockquote", "pre", "section", "article",
        "h1", "h2", "h3", "h4", "h5", "h6", "font", "br", "hr", "form",
        "aside", "footer", "nav", "figure", "dl", "dd", "dt", "label",
        "address", "body", "toString", "valueOf", "hasOwnProperty"]
MEDIA = ["img", "embed", "iframe", "object", "video", "audio"]
CLASS_WORDS = ["comment", "sidebar", "article", "content", "main", "nav",
               "page", "pagination", "next", "footer", "hentry",
               "article-body", "widget", "story", "body", "promo", "media",
               "related", "share", "x1", "zz", "and", "shadow", "tweet"]
TEXT_WORDS = ("alpha bravo, charlie delta. echo foxtrot golf, hotel india "
              "juliet kilo lima. mike november oscar").split()
URLS = ["/story?page=2", "/a/b/3", "http://ex.com/p/4", "/tag/5x",
        "http://www.youtube.com/embed/x", "http://vimeo.com/9",
        "/img/pic.png", "/img/photo.jpeg", "relative/path2", "//cdn.ex/6",
        "?page=7", "/print2", "/next/8", "#frag", ""]
LINK_TEXTS = ["next »", "2", "3", "prev", "continue", "first", "last",
              "page 2", "print", "1", "more stuff here", "x"]


def random_doc(ix: int, seed: int = 99, max_depth: int = 5):
    rng = random.Random((seed << 24) ^ ix)
    spans = []

    def emit(kind, text="", ref=""):
        spans.append((kind, text, ref, len(spans)))

    def text(rng, lo=1, hi=18):
        n = rng.randint(lo, hi)
        return " ".join(rng.choice(TEXT_WORDS) for _ in range(n))

    def attrs(rng, tag):
        out = []
        if rng.random() < 0.5:
            k = rng.choice(["class", "id"])
            v = " ".join(rng.choice(CLASS_WORDS)
                         for _ in range(rng.randint(1, 2)))
            out.append((f"attr:{k}", v))
        if tag == "a" and rng.random() < 0.9:
            out.append(("attr:href", rng.choice(URLS)))
        if rng.random() < 0.1:
            out.append(("attr:alt", "some alt"))
        if tag in MEDIA and rng.random() < 0.4:
            # exercises js_parse_int paths incl. NaN ("x") and "400px"
            out.append(("attr:width", rng.choice(["x", "20", "300", "400px",
                                                  " 33 "])))
            if rng.random() < 0.5:
                out.append(("attr:height", rng.choice(["10", "200", "nope"])))
        return out

    def element(depth):
        r = rng.random()
        if r < 0.12 and depth > 0:
            tag = rng.choice(MEDIA)
            url = rng.choice(URLS)
            w = rng.choice([None, 16, 24, 32, 33, 200, 250, 390, 640, "x"])
            h = rng.choice([None, 16, 150, 290, 480])
            ref = url
            frag = []
            if w is not None:
                frag.append(f"w={w}")
            if h is not None:
                frag.append(f"h={h}")
            if frag and url:
                ref = url + "#" + "&".join(frag)
            emit(f"open:{tag}", "", ref)
            for k, v in attrs(rng, tag):
                emit(k, v)
            emit(f"close:{tag}")
            return
        tag = rng.choice(TAGS)
        emit(f"open:{tag}")
        for k, v in attrs(rng, tag):
            emit(k, v)
        if tag == "a" and rng.random() < 0.8:
            emit("text", rng.choice(LINK_TEXTS))
        n_children = rng.randint(0, 4 if depth < max_depth else 0)
        for _ in range(n_children):
            if rng.random() < 0.45:
                emit("text", text(rng))
            else:
                element(depth + 1)
        emit(f"close:{tag}")

    emit("open:html")
    emit("open:head")
    if rng.random() < 0.8:
        emit("open:title")
        emit("text", text(rng, 2, 9) + rng.choice(
            ["", " - Site", " | Site", ": Subtitle Here", " -Site"]))
        emit("close:title")
    emit("close:head")
    emit("open:body")
    for _ in range(rng.randint(1, 6)):
        element(0)
    emit("close:body")
    emit("close:html")
    return spans


def fuzz_corpus(n_docs: int, seed: int = 99):
    # NOTE on w="x": non-numeric width exercises the parseInt NaN path
    return [(f"fuzz{ix:05d}", random_doc(ix, seed)) for ix in range(n_docs)]
