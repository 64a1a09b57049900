"""Operator-level unit tests (SURVEY.md §5.4) — table-in/table-out cases for
individual reference behaviors, including the documented quirks."""

from recrun_spark.readability import (Settings, extract, js_len,
                                      js_parse_int, js_trim)


def _doc(body_spans):
    """Wrap body spans in html/head(title)/body with dense offsets."""
    pre = [("open:html",), ("open:head",), ("open:title",),
           ("text", "A Plain Test Title Here"), ("close:title",),
           ("close:head",), ("open:body",)]
    post = [("close:body",), ("close:html",)]
    spans = []
    for s in pre + body_spans + post:
        kind = s[0]
        text = s[1] if len(s) > 1 else ""
        ref = s[2] if len(s) > 2 else ""
        spans.append((kind, text, ref, len(spans)))
    return spans


LONG = ("This is a long paragraph, with some commas, and enough text to "
        "pass the twenty-four character scoring threshold easily. "
        "It keeps going for a while to build up textLength nicely.")


def test_js_helpers():
    assert js_parse_int("3 pages") == 3
    assert js_parse_int("abc") != js_parse_int("abc")  # NaN
    assert js_parse_int("  -7x") == -7
    assert js_len("abc") == 3
    assert js_len("a\U0001F600b") == 4  # astral char = 2 UTF-16 units
    assert js_trim("﻿ x ") == "x"


def test_plain_paragraphs_retained():
    spans = _doc([
        ("open:div",), ("attr:class", "content"),
        ("open:p",), ("text", LONG), ("close:p",),
        ("open:p",), ("text", LONG), ("close:p",),
        ("close:div",),
    ])
    out = extract(spans, Settings.shipped())
    texts = [s[1] for s in out["retained_spans"] if s[0] == "text"]
    assert texts == [LONG, LONG]
    assert out["score"] > 0


def test_boilerplate_skipped():
    """P4: aside/footer/nav/script subtrees dropped (R:164, R:496)."""
    spans = _doc([
        ("open:nav",), ("text", "navigation junk"), ("close:nav",),
        ("open:div",),
        ("open:p",), ("text", LONG), ("close:p",),
        ("open:p",), ("text", LONG), ("close:p",),
        ("close:div",),
        ("open:footer",), ("text", "footer junk"), ("close:footer",),
    ])
    out = extract(spans, Settings.shipped())
    all_text = " ".join(s[1] for s in out["retained_spans"])
    assert "junk" not in all_text
    assert LONG in all_text


def test_br_hr_proto_quirk():
    """P3 quirk: br/hr are NOT noContent (R:171) — they become ordinary
    empty elements and do not disturb extraction."""
    spans = _doc([
        ("open:div",),
        ("open:p",), ("text", LONG), ("open:br",), ("close:br",),
        ("text", LONG), ("close:p",),
        ("open:hr",), ("close:hr",),
        ("open:p",), ("text", LONG), ("close:p",),
        ("close:div",),
    ])
    out = extract(spans, Settings.shipped())
    texts = [s[1] for s in out["retained_spans"] if s[0] == "text"]
    assert texts == [LONG, LONG, LONG]


def test_nocontent_span_attrs_leak_to_parent():
    """noContent tags (span/font) contribute no element: their text AND
    attributes apply to the parent (R:406-411, R:413)."""
    spans = _doc([
        ("open:div",),
        ("open:p",), ("text", LONG),
        ("open:span",), ("attr:class", "sidebar"),  # leaks onto <p>!
        ("text", " inline"), ("close:span",),
        ("close:p",),
        ("open:p",), ("text", LONG), ("close:p",),
        ("close:div",),
    ])
    out = extract(spans, Settings.full())
    # under skipLevel 0 the <p> carrying class=sidebar (re_negative) loses
    # 25 attributeScore but "sidebar" is also re_unlikelyCandidates → <p>
    # subtree stripped entirely
    texts = [s[1] for s in out["retained_spans"] if s[0] == "text"]
    assert " inline" not in " ".join(texts)


def test_tiny_image_demoted_big_image_bonus():
    """P10/A4 (R:436-451): tiny img renamed (no output, no media rescue);
    big img bumps parent score and is retained."""
    spans = _doc([
        ("open:div",),
        ("open:p",), ("text", LONG), ("close:p",),
        ("open:img", "", "http://x/big.jpg#w=640&h=480"), ("close:img",),
        ("open:img", "", "http://x/tiny.jpg#w=24&h=24"), ("close:img",),
        ("open:p",), ("text", LONG), ("close:p",),
        ("close:div",),
    ])
    out = extract(spans, Settings.shipped())
    media = [(s[0], s[2]) for s in out["retained_spans"] if s[0] != "text"]
    assert ("img", "http://x/big.jpg") in media
    assert all("tiny" not in m[1] for m in media)


def test_media_rescues_empty_container():
    """P9 media rescue (R:538-547): empty <td> removed; <td> with img kept."""
    spans = _doc([
        ("open:div",),
        ("open:p",), ("text", LONG), ("close:p",),
        ("open:td",), ("text", "   "), ("close:td",),  # whitespace only → drop
        ("open:td",),
        ("open:img", "", "http://x/keep.png#w=300&h=200"), ("close:img",),
        ("close:td",),
        ("open:p",), ("text", LONG), ("close:p",),
        ("close:div",),
    ])
    out = extract(spans, Settings.shipped())
    media_refs = [s[2] for s in out["retained_spans"] if s[0] == "img"]
    assert media_refs == ["http://x/keep.png"]
    texts = [s[1] for s in out["retained_spans"] if s[0] == "text"]
    assert "   " not in texts


def test_linked_image_vanishes():
    """T3 orphaning quirk (R:549-559): <a href=...png><img/></a> disappears
    entirely (img re-attached to the never-attached anchor)."""
    spans = _doc([
        ("open:div",),
        ("open:p",), ("text", LONG), ("close:p",),
        ("open:a",), ("attr:href", "http://x/full.png"),
        ("open:img", "", "http://x/thumb.jpg"), ("close:img",),
        ("close:a",),
        ("open:p",), ("text", LONG), ("close:p",),
        ("close:div",),
    ])
    out = extract(spans, Settings.shipped())
    assert all(s[0] == "text" for s in out["retained_spans"])


def test_unpack_div_single_img():
    """T1 (R:502-510): div with single img child replaced by the img."""
    spans = _doc([
        ("open:div",),
        ("open:p",), ("text", LONG), ("close:p",),
        ("open:div",),
        ("open:img", "", "http://x/unpacked.jpg#w=500&h=400"), ("close:img",),
        ("close:div",),
        ("open:p",), ("text", LONG), ("close:p",),
        ("close:div",),
    ])
    out = extract(spans, Settings.shipped())
    media_refs = [s[2] for s in out["retained_spans"] if s[0] == "img"]
    assert media_refs == ["http://x/unpacked.jpg"]


def test_div_to_p_conversion():
    """T2 (R:562-569): textual div with no block children is scored like p."""
    spans = _doc([
        ("open:div",), ("attr:class", "wrapper"),
        ("open:div",), ("text", LONG), ("close:div",),
        ("open:div",), ("text", LONG), ("close:div",),
        ("open:div",), ("text", LONG), ("close:div",),
        ("close:div",),
    ])
    out = extract(spans, Settings.shipped())
    texts = [s[1] for s in out["retained_spans"] if s[0] == "text"]
    assert texts.count(LONG) == 3
    assert out["score"] > 0


def test_embed_whitelist():
    """P6 (R:515-518): only http youtube/vimeo embeds survive."""
    spans = _doc([
        ("open:div",),
        ("open:p",), ("text", LONG), ("close:p",),
        ("open:iframe", "", "http://www.youtube.com/embed/abc"), ("close:iframe",),
        ("open:iframe", "", "http://ads.example.com/frame"), ("close:iframe",),
        ("open:embed", "", "https://www.youtube.com/embed/tls"), ("close:embed",),
        ("open:p",), ("text", LONG), ("close:p",),
        ("close:div",),
    ])
    out = extract(spans, Settings.shipped())
    media = [s[2] for s in out["retained_spans"] if s[0] != "text"]
    # https youtube fails re_videos (http-only regex, R:179)
    assert media == ["http://www.youtube.com/embed/abc"]


def test_next_page_detection():
    """P11/F7/W2 (R:335-403, R:677-687): 'next »' + page href wins."""
    spans = _doc([
        ("open:div",),
        ("open:p",), ("text", LONG), ("close:p",),
        ("close:div",),
        ("open:div",), ("attr:class", "pagination"),
        ("open:a",), ("attr:href", "/story?page=2"), ("text", "next »"), ("close:a",),
        ("open:a",), ("attr:href", "/story?page=1"), ("text", "prev"), ("close:a",),
        ("close:div",),
    ])
    out = extract(spans, Settings.shipped())
    assert out["next_page"] == "/story?page=2"


def test_title_rules():
    """F3 (R:651-675): ' - ' keeps lhs when >=3 words; short → original."""
    def with_title(t):
        spans = [("open:html", "", "", 0), ("open:head", "", "", 1),
                 ("open:title", "", "", 2), ("text", t, "", 3),
                 ("close:title", "", "", 4), ("close:head", "", "", 5),
                 ("open:body", "", "", 6),
                 ("open:div", "", "", 7),
                 ("open:p", "", "", 8), ("text", LONG, "", 9),
                 ("close:p", "", "", 10), ("close:div", "", "", 11),
                 ("close:body", "", "", 12), ("close:html", "", "", 13)]
        return extract(spans, Settings.shipped())["title"]

    assert with_title("Five Word Headline For Story - Site") == \
        "Five Word Headline For Story"
    assert with_title("Too Short - Site") == "Too Short - Site"
    assert with_title("Briefing: A Nice Long Subtitle Here") == \
        "A Nice Long Subtitle Here"


def test_ul_without_li_nan_probe():
    """R:531 NaN quirk at skipLevel 0: (undefined-100) > p is false, the
    li-less <ul> falls through to the other conditional-clean rules."""
    spans = _doc([
        ("open:div",), ("attr:class", "content"),
        ("open:p",), ("text", LONG), ("close:p",),
        ("open:ul",), ("text", "bare list text, quite long enough to pass "
                               "the twenty five char rule"), ("close:ul",),
        ("close:div",),
    ])
    out = extract(spans, Settings.full())
    texts = " ".join(s[1] for s in out["retained_spans"])
    assert "bare list text" in texts
