"""Render-egress operators — the overlay-side HTML post-processing the
reference applies before showing an article (SURVEY.md §2.6 T6/T7, §2.7
F11/F12; previously declared out of scope, implemented here for coverage):

* ``sanitize_html`` — whitelist-based recursive rebuild of an HTML string
  (reference iframe.js:91-206 ``sanitize``): allowed tags are re-created
  (all others are unwrapped — their children hoisted into the parent),
  only per-tag whitelisted attributes survive, ``src``/``href`` values are
  resolved against the base URI with the reference's exact branch rules
  (iframe.js:153-177 — note the reference CODE does not normalize ``..``
  segments, it concatenates; we are bug-for-bug faithful to the code, not
  the RFC table in its comment), ``a`` gains ``target="_blank"`` and
  ``video``/``audio`` gain ``controls`` (iframe.js:185-192).
* figure wrapping — every ``img`` not already inside a ``figure`` or ``a``
  within 10 ancestor levels is wrapped in ``<figure>`` (iframe.js:304-315
  with descendantOfTag iframe.js:208-227).
* ``dpp_match`` — same domain/protocol/port for two URLs (iframe.js:462-468
  ``dppMatch``), with JS ``URL`` semantics (default ports elide).

The reference parses with the browser's ``DOMParser``; this module parses
with the stdlib ``HTMLParser`` — identical on well-formed input (our
stage-1 ``html`` renders are produced by our own serializer), without the
browser's tag-soup error correction on adversarial input.  Parity is
verified by a DIFFERENTIAL FUZZ that executes the reference ``sanitize``
verbatim under Node on a minimal DOM shim (tools/oracle/sanitize_shim.js;
tests/test_render.py) — 1000 seeded fragments, byte-identical output,
including browser attribute semantics (duplicate names: FIRST wins).

``render_overlays`` is the Spark-side operator: an Arrow-batched zero-
shuffle map over stage-1 extractions, same execution shape as stage 1.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator
from urllib.parse import urlsplit

from pyspark.sql import DataFrame

# Diffbot-derived whitelist (reference iframe.js:266-292)
BLOCK_TAGS = ["p", "h1", "h2", "h3", "h4", "h5", "blockquote", "code",
              "pre", "ul", "ol", "li", "table", "tbody", "tr", "td",
              "dl", "dt", "dd"]
INLINE_TAGS = ["br", "b", "strong", "i", "em", "u", "a"]
MEDIA_TAGS = ["figure", "img", "video", "audio", "source", "figcaption",
              "iframe", "embed", "object"]
ALLOWED_ATTRS = {
    "td": {"valign", "colspan"},
    "a": {"href"},
    "img": {"src", "alt"},
    "video": {"src"},
    "audio": {"src"},
    "source": {"src", "type"},
    "iframe": {"src", "frameborder"},
    "embed": {"src", "type"},
    "object": {"src", "type"},
}

VOID_TAGS = {"area", "base", "br", "col", "embed", "hr", "img", "input",
             "link", "meta", "param", "source", "track", "wbr"}

_DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21, "ws": 80, "wss": 443}


def allowed_tags(media: bool = True, diffbot: bool = False) -> set:
    """Tag whitelist per iframe.js:266-280 + :302 (non-diffbot adds div)."""
    tags = set(BLOCK_TAGS) | set(INLINE_TAGS)
    if media:
        tags |= set(MEDIA_TAGS)
    if not diffbot:
        tags.add("div")
    return tags


def _js_url_parts(base_uri: str):
    """(protocol, origin, pathname, search) with JS ``URL`` semantics:
    protocol keeps the colon, origin elides default ports, empty path
    reads as '/'."""
    sp = urlsplit(base_uri)
    scheme = sp.scheme.lower()
    port = sp.port
    if port is not None and _DEFAULT_PORTS.get(scheme) == port:
        port = None
    host = (sp.hostname or "") + (f":{port}" if port is not None else "")
    return (scheme + ":", f"{scheme}://{host}", sp.path or "/",
            ("?" + sp.query) if sp.query else "")


def resolve_url(val: str, base_uri: str) -> str:
    """src/href resolution, branch-for-branch the reference's
    iframe.js:153-177 (NO dot-segment normalization — the code
    concatenates)."""
    if "://" in val:
        return val
    protocol, origin, pathname, search = _js_url_parts(base_uri)
    if val.startswith("//"):
        return protocol + val
    if val.startswith("/"):
        return origin + val
    if val.startswith("?"):
        return origin + pathname + val
    if val.startswith("#"):
        return origin + pathname + search + val
    if ":" in val:
        return val
    base_path = origin + pathname[: pathname.rfind("/") + 1]
    return base_path + val


def dpp_match(u1: str, u2: str) -> bool:
    """Same domain, protocol, and port (iframe.js:462-468)."""
    a, b = urlsplit(u1), urlsplit(u2)

    def parts(sp):
        scheme = sp.scheme.lower()
        port = sp.port
        if port is not None and _DEFAULT_PORTS.get(scheme) == port:
            port = None  # JS URL: default port reads as ''
        host = (sp.hostname or "") + (f":{port}" if port is not None else "")
        return (port, scheme + ":", host)

    return parts(a) == parts(b)


# --------------------------------------------------------------------------
# parsing / sanitizing / serializing
# --------------------------------------------------------------------------

class _TreeBuilder(HTMLParser):
    """HTML string -> ('el', tag, [(name, val)], [children]) tree.
    HTMLParser lowercases tag and attribute names (matching the reference's
    tagLower/attrNameLower)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = ("el", "#fragment", [], [])
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = ("el", tag, attrs, [])
        self._stack[-1][3].append(node)
        if tag not in VOID_TAGS:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._stack[-1][3].append(("el", tag, attrs, []))

    def handle_endtag(self, tag):
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i][1] == tag:
                del self._stack[i:]
                return

    def handle_data(self, data):
        self._stack[-1][3].append(("text", data, None, None))


def _parse(html_string: str):
    tb = _TreeBuilder()
    tb.feed(html_string or "")
    tb.close()
    return tb.root


def _sanitize_children(children, tags: set, base_uri: str, out: list):
    """iframe.js:96-200 ``rec``: allowed elements are re-created with
    whitelisted attrs; disallowed elements are unwrapped (children hoisted);
    text passes through."""
    for n in children:
        if n[0] == "text":
            out.append(n)
            continue
        tag = n[1]
        target = out
        if tag in tags:
            attrs = {}
            allowed = ALLOWED_ATTRS.get(tag)
            if allowed:
                for name, val in n[2]:
                    name = name.lower()
                    # FIRST occurrence wins: the browser parser drops later
                    # duplicate attribute names before sanitize ever sees
                    # them (found by the Node differential fuzz — the
                    # original 'last wins' diverged from the reference)
                    if name in allowed and name not in attrs:
                        v = val if val is not None else ""
                        if name in ("src", "href"):
                            v = resolve_url(v, base_uri)
                        attrs[name] = v
            if tag == "a":
                attrs["target"] = "_blank"
            if tag in ("video", "audio"):
                attrs["controls"] = ""
            el = ("el", tag, list(attrs.items()), [])
            out.append(el)
            target = el[3]
        _sanitize_children(n[3], tags, base_uri, target)


def _wrap_figures(node, ancestors):
    """iframe.js:304-315: wrap img in <figure> unless a figure or a is
    within 10 ancestor levels (descendantOfTag depth=10 checks the node
    itself plus 10 ancestors; img can't be figure/a, so: 10 ancestors)."""
    kids = node[3]
    chain = ancestors + [node[1]]
    for i, ch in enumerate(kids):
        if ch[0] != "el":
            continue
        if ch[1] == "img":
            near = chain[-10:]
            if "figure" not in near and "a" not in near:
                kids[i] = ("el", "figure", [], [ch])
        else:
            _wrap_figures(ch, chain)


def _esc_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _esc_attr(s: str) -> str:
    return s.replace("&", "&amp;").replace('"', "&quot;")


def _serialize(children, out: list):
    for n in children:
        if n[0] == "text":
            out.append(_esc_text(n[1]))
            continue
        tag = n[1]
        out.append("<" + tag)
        for name, val in n[2]:
            out.append(f' {name}="{_esc_attr(val)}"')
        out.append(">")
        if tag not in VOID_TAGS:
            _serialize(n[3], out)
            out.append(f"</{tag}>")


def sanitize_html(html_string: str, base_uri: str, media: bool = True,
                  diffbot: bool = False, wrap_figures: bool | None = None
                  ) -> str:
    """The fillOverlay content path (iframe.js:295-315): sanitize against
    the whitelist; in the non-diffbot branch additionally allow div and
    wrap bare imgs in <figure>."""
    frag = ("el", "#fragment", [], [])
    _sanitize_children(_parse(html_string)[3],
                       allowed_tags(media=media, diffbot=diffbot),
                       base_uri, frag[3])
    if wrap_figures if wrap_figures is not None else not diffbot:
        _wrap_figures(frag, [])
    out: list = []
    _serialize(frag[3], out)
    return "".join(out)


# --------------------------------------------------------------------------
# Spark operator
# --------------------------------------------------------------------------

def render_overlays(extractions: DataFrame, base_uri: str,
                    media: bool = True, diffbot: bool = False,
                    html_col: str = "html") -> DataFrame:
    """extractions(doc_id, html, ...) -> (doc_id, overlay_html): the
    render-egress sanitize+figure-wrap as an Arrow-batched zero-shuffle map
    (same execution shape as stage 1 — no Exchange in the plan)."""

    def fn(batches) -> Iterator:
        import pyarrow as pa
        schema = pa.schema([("doc_id", pa.string()),
                            ("overlay_html", pa.string())])
        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            htmls = batch.column(html_col).to_pylist()
            out = [sanitize_html(h or "", base_uri, media=media,
                                 diffbot=diffbot) for h in htmls]
            yield pa.RecordBatch.from_arrays(
                [pa.array(doc_ids, pa.string()), pa.array(out, pa.string())],
                schema=schema)

    return extractions.select("doc_id", html_col).mapInArrow(
        fn, schema="doc_id string, overlay_html string")
