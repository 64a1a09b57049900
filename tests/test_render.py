"""Render-egress parity tests (reference iframe.js sanitize/figure-wrap/
dppMatch — SURVEY.md T6/T7/F11/F12).  Two layers: unit cases pin the
documented branch behavior (text hoisted out of disallowed elements, NO ../
normalization in URL resolution, figure wrapping), and a DIFFERENTIAL FUZZ
runs the reference sanitize() VERBATIM under Node on a minimal DOM shim
(tools/oracle/sanitize_shim.js) against 1000 seeded fragments — the same
methodology as readability.py's Node oracle.  The fuzz already earned its
keep: it caught duplicate-attribute handling (browser keeps the FIRST
occurrence; the initial implementation kept the last)."""

from recrun_spark.render import (dpp_match, render_overlays, resolve_url,
                                 sanitize_html)

BASE = "http://a/b/c/d;p?q"


def test_resolve_url_reference_branches():
    # iframe.js:153-177 — branch for branch
    assert resolve_url("g:h", BASE) == "g:h"
    assert resolve_url("http://x/y", BASE) == "http://x/y"
    assert resolve_url("g", BASE) == "http://a/b/c/g"
    assert resolve_url("./g", BASE) == "http://a/b/c/./g"  # code: concat only
    assert resolve_url("/g", BASE) == "http://a/g"
    assert resolve_url("//g", BASE) == "http://g"
    assert resolve_url("?y", BASE) == "http://a/b/c/d;p?y"
    assert resolve_url("#s", BASE) == "http://a/b/c/d;p?q#s"
    assert resolve_url("g?y#s", BASE) == "http://a/b/c/g?y#s"
    # the reference CODE does not collapse dot segments (comment's RFC
    # table notwithstanding) — bug-for-bug
    assert resolve_url("../g", BASE) == "http://a/b/c/../g"
    # ports: kept when explicit+non-default, elided when default (JS URL)
    assert resolve_url("/g", "http://h:8080/p/x?z") == "http://h:8080/g"
    assert resolve_url("/g", "http://h:80/p/x") == "http://h/g"
    assert resolve_url("//cdn/x", "https://h/p") == "https://cdn/x"


def test_sanitize_whitelist_and_attr_filtering():
    # disallowed element -> unwrapped, its text hoisted (iframe.js rec
    # recurses into children of non-whitelisted nodes)
    assert sanitize_html("<script>alert(1)</script><p>hi</p>", BASE) \
        == "alert(1)<p>hi</p>"
    # span unwrapped, children kept in place
    assert sanitize_html("<p>a <span>b</span> c</p>", BASE) == "<p>a b c</p>"
    # non-whitelisted attributes dropped (p allows none)
    assert sanitize_html('<p class="x" onclick="evil()">t</p>', BASE) \
        == "<p>t</p>"
    assert sanitize_html(
        '<table><tbody><tr><td valign="top" colspan="2" bgcolor="r">x'
        "</td></tr></tbody></table>", BASE) \
        == '<table><tbody><tr><td valign="top" colspan="2">x' \
           "</td></tr></tbody></table>"
    # div allowed only in the non-diffbot branch (iframe.js:302)
    assert sanitize_html("<div><p>t</p></div>", BASE) == "<div><p>t</p></div>"
    assert sanitize_html("<div><p>t</p></div>", BASE, diffbot=True) \
        == "<p>t</p>"
    # media=False drops media tags entirely (img is void: no children)
    assert sanitize_html('<p><img src="i.png"></p>', BASE, media=False) \
        == "<p></p>"


def test_sanitize_forced_attributes_and_url_resolution():
    # a -> target=_blank (iframe.js:185-187), href resolved
    assert sanitize_html('<a href="/g" rel="nofollow">x</a>', BASE) \
        == '<a href="http://a/g" target="_blank">x</a>'
    # video/audio -> controls (iframe.js:190-192), src resolved
    assert sanitize_html('<video src="v.mp4"></video>', BASE) \
        == '<video src="http://a/b/c/v.mp4" controls=""></video>'
    assert sanitize_html('<audio src="//cdn/a.wav"></audio>', BASE) \
        == '<audio src="http://cdn/a.wav" controls=""></audio>'


def test_figure_wrapping_rules():
    # bare img -> wrapped (iframe.js:304-315)
    assert sanitize_html('<img src="i.png" alt="A">', BASE) \
        == '<figure><img src="http://a/b/c/i.png" alt="A"></figure>'
    # img inside <a> or <figure> -> NOT wrapped
    assert sanitize_html('<a href="/x"><img src="i.png"></a>', BASE) \
        == ('<a href="http://a/x" target="_blank">'
            '<img src="http://a/b/c/i.png"></a>')
    assert sanitize_html('<figure><img src="i.png"></figure>', BASE) \
        == '<figure><img src="http://a/b/c/i.png"></figure>'
    # the ancestor scan is capped at 10 levels (descendantOfTag depth=10):
    # figure 9 levels up -> seen; 10 levels of divs between -> not seen
    nine = "<figure>" + "<div>" * 9 + '<img src="i.png">' + "</div>" * 9 \
        + "</figure>"
    out9 = sanitize_html(nine, BASE)
    assert "<figure><img" not in out9          # no extra wrap
    ten = "<figure>" + "<div>" * 10 + '<img src="i.png">' + "</div>" * 10 \
        + "</figure>"
    out10 = sanitize_html(ten, BASE)
    assert "<figure><img" in out10             # wrapped despite outer figure
    # diffbot branch: no figure wrapping (iframe.js:295-316 else-path)
    assert sanitize_html('<img src="i.png">', BASE, diffbot=True) \
        == '<img src="http://a/b/c/i.png">'


def test_serialization_escaping():
    assert sanitize_html('<p>a &amp; b &lt;c&gt;</p>', BASE) \
        == "<p>a &amp; b &lt;c&gt;</p>"
    assert sanitize_html('<img src="/x?a=1&b=2" alt=\'say "hi"\'>', BASE) \
        == ('<figure><img src="http://a/x?a=1&amp;b=2" '
            'alt="say &quot;hi&quot;"></figure>')


def test_dpp_match_reference_semantics():
    # iframe.js:462-468: same port, protocol, host
    assert dpp_match("http://x.com/a", "http://x.com/b?q#f")
    assert dpp_match("http://x.com:80/a", "http://x.com/b")   # default port
    assert not dpp_match("http://x.com/a", "https://x.com/a")
    assert not dpp_match("http://x.com/a", "http://y.com/a")
    assert not dpp_match("http://x.com:8080/a", "http://x.com/a")
    assert dpp_match("https://x.com:443/a", "https://x.com/a")


def test_render_overlays_matches_single_node(spark, corpus_parquet):
    """The distributed Arrow map must reproduce single-node evaluation of
    the same kernel over real stage-1 html renders, with a zero-shuffle
    plan."""
    import io
    from contextlib import redirect_stdout

    from recrun_spark.readability import Settings, extract
    from recrun_spark.fixtures.generator import make_corpus
    from recrun_spark.stage1 import extract_documents

    docs = spark.read.parquet(corpus_parquet).limit(40)
    ex = extract_documents(docs)
    df = render_overlays(ex, base_uri="http://news.example/a/b?x=1")
    got = {r["doc_id"]: r["overlay_html"] for r in df.collect()}

    corpus = dict(make_corpus(200)[:40])
    for doc_id, html in got.items():
        local = sanitize_html(extract(corpus[doc_id], Settings.shipped())
                              ["html"], "http://news.example/a/b?x=1")
        assert html == local, doc_id
    assert len(got) == 40 and any(got.values())

    # plan check on the un-limited frame (limit itself inserts an Exchange)
    full = render_overlays(
        extract_documents(spark.read.parquet(corpus_parquet)),
        base_uri="http://news.example/a/b?x=1")
    buf = io.StringIO()
    with redirect_stdout(buf):
        full.explain("formatted")
    assert "Exchange" not in buf.getvalue()  # pure map, no shuffle


# ---------------------------------------------------------------------------
# differential fuzz vs the REFERENCE sanitize() run verbatim under Node
# (tools/oracle/sanitize_shim.js — ADVICE r03: the render_overlay golden is
# generated by these same Python kernels, so only THIS test measures
# reference parity rather than plumbing parity)
# ---------------------------------------------------------------------------

_FUZZ_URLS = ["g:h", "g", "./g", "g/", "/g", "//g", "?y", "g?y", "#s",
              "g#s", "g?y#s", ";x", "g;x", "", ".", "..", "../g", "../../g",
              "http://other.example/z", "mailto:a@b.example",
              "data:text/plain,x", "G/H?q=1#f", "//cdn.example/i.png"]
_FUZZ_BASES = ["http://a.example/b/c/d;p?q", "https://h.example:8443/p/",
               "http://h.example:80/", "https://h.example/",
               "ftp://f.example/dir/file", "http://a.example/b/c/?q=2"]
_FUZZ_TEXTS = ["plain words", "a & b", "x > y", 'quo "ted"',
               "ent &amp; &lt; &#65; &nbsp; tail", "unicode ✓ é",
               ""]
_FUZZ_ALLOWED = ["p", "h2", "blockquote", "ul", "li", "td", "a", "b", "em",
                 "img", "video", "audio", "source", "iframe", "code", "pre",
                 "figure", "div"]
_FUZZ_DISALLOWED = ["span", "section", "font", "script", "style", "article",
                    "x-custom", "h6"]
_FUZZ_ATTRS = ["href", "src", "alt", "valign", "colspan", "type",
               "frameborder", "onclick", "style", "data-x", "HREF", "SRC"]
_VOID_FUZZ = {"img", "source", "br"}


def _fuzz_el(rng, depth):
    tag = rng.choice(_FUZZ_ALLOWED + _FUZZ_DISALLOWED)
    if rng.random() < 0.2:
        tag = tag.upper()
    parts = ["<", tag]
    n_attrs = rng.randrange(0, 3)
    names = [rng.choice(_FUZZ_ATTRS) for _ in range(n_attrs)]
    if rng.random() < 0.15 and names:
        names.append(names[0])          # duplicate attribute name
    for name in names:
        val = rng.choice(_FUZZ_URLS) if name.lower() in ("href", "src") \
            else rng.choice(["1", "top", "text/css", "a&amp;b", 'it&#39;s'])
        q = "'" if rng.random() < 0.2 else '"'
        parts.append(f" {name}={q}{val}{q}")
    if rng.random() < 0.1:
        parts.append(" controls")       # bare attribute
    parts.append(">")
    low = tag.lower()
    if low in _VOID_FUZZ:
        return "".join(parts)
    if low in ("script", "style"):
        parts.append(rng.choice(["var x = 1 && 2;", "a > b { color: red }",
                                 "raw &amp; stays"]))
    else:
        for _ in range(rng.randrange(0, 3 if depth > 1 else 2)):
            parts.append(_fuzz_node(rng, depth - 1))
    parts.append(f"</{tag}>")
    return "".join(parts)


def _fuzz_node(rng, depth):
    if depth <= 0 or rng.random() < 0.4:
        return rng.choice(_FUZZ_TEXTS)
    return _fuzz_el(rng, depth)


def test_sanitize_differential_fuzz_vs_reference():
    """render.sanitize_html vs the reference iframe.js sanitize() executed
    VERBATIM under Node on a minimal DOM shim: 1000 seeded random fragments
    (nested allowed/disallowed tags, rawtext script/style, every RFC-3986
    relative-URL shape from the reference's own comment table, duplicate
    and bare attributes, entities, mixed case, single/double quotes) must
    serialize byte-identically.  Figure wrapping is outside the extracted
    function and stays pinned by the unit tests above."""
    import json
    import os
    import random
    import subprocess

    from recrun_spark.render import ALLOWED_ATTRS, allowed_tags, sanitize_html

    cases = []
    rng = random.Random(31337)
    for i in range(1000):
        html = "".join(_fuzz_node(rng, 3) for _ in range(rng.randrange(1, 4)))
        media = rng.random() < 0.7
        diffbot = rng.random() < 0.3
        cases.append({
            "html": html,
            "baseURI": rng.choice(_FUZZ_BASES),
            "tags": sorted(allowed_tags(media=media, diffbot=diffbot)),
            "attrs": {t: sorted(a) for t, a in ALLOWED_ATTRS.items()},
            "media": media, "diffbot": diffbot,
        })
    payload = "\n".join(json.dumps(c) for c in cases) + "\n"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        ["node", os.path.join(repo, "tools", "oracle", "sanitize_shim.js")],
        input=payload.encode(), capture_output=True, check=True)
    ref_out = [json.loads(l)["out"]
               for l in proc.stdout.decode().splitlines()]
    assert len(ref_out) == len(cases)
    n_mismatch = 0
    for c, expect in zip(cases, ref_out):
        got = sanitize_html(c["html"], c["baseURI"], media=c["media"],
                            diffbot=c["diffbot"], wrap_figures=False)
        if got != expect:
            n_mismatch += 1
            if n_mismatch <= 3:
                print("MISMATCH html=", repr(c["html"]))
                print("  base=", c["baseURI"])
                print("  py  =", repr(got))
                print("  ref =", repr(expect))
    assert n_mismatch == 0, f"{n_mismatch}/1000 fragments diverge"
