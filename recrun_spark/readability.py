"""Pure-Python re-implementation of the recrun content-retention scorer.

This is the per-document fold that runs *inside* the Arrow-vectorized Spark
UDF (see ``recrun_spark.stage1``).  It reproduces, bug-for-bug, the behavior
of the reference's readabilitySAX handler
(``/root/reference/src/lib/readabilitySAX/readabilitySAX.js``, cited below as
``R:<line>``) under the shipped extension config
(``/root/reference/src/content.js:151-153``: ``{cleanAttributes: false}``,
``skipLevel=3``) as well as the full-heuristic config (``skipLevel=0``).

Faithfully reproduced quirks (each verified against the Node oracle in
``tools/oracle/``):

* ``noContent`` proto quirk (R:171): ``{__proto__: formatTags, ...}`` is
  evaluated while ``formatTags`` is still ``undefined`` (hoisted var), and an
  object-literal ``__proto__:`` with a non-object value is *ignored*, so
  ``noContent``'s prototype is ``Object.prototype`` — meaning ``br``/``hr``
  are NOT noContent (they become ordinary elements) while JS
  ``Object.prototype`` property names *are* treated as noContent tags.
* Stateful global comma regex (R:44, R:213): ``re_commas`` has the ``/g``
  flag and is used with ``.test()``, so its ``lastIndex`` persists across
  text nodes within a document — commas can be silently missed.  We emulate
  ``lastIndex`` per extraction (the oracle reloads the module per document so
  the state starts at 0 for each doc on both sides).
* Linked-image orphaning (R:549-559): the replaceImgs rewrite assigns
  ``elem = elem.children[0]`` (the img) and then pushes it onto
  ``elem.parent.children`` — but the img's parent is the *anchor*, so the img
  is appended to the (never-attached) anchor and the whole construct vanishes
  from the tree.
* Tiny-image rename (R:436-443): ``<img>`` with width/height <= 32 has its
  ``name`` mutated to ``"script"`` but ``onclosetag`` receives the original
  tag name, so the element is still attached — it just stops counting as an
  ``img`` (no media rescue, not media output).
* ``(tagCount.li - 100) > p`` NaN compare when no ``<li>`` (R:531).
* ``getTopCandidate`` adds the tag-name prior to ``tagScore`` in-place
  (R:144) and only assigns ``totalScore`` to running-top nodes (R:150).
* ``getTitle`` keeps the ``": "`` prefix in its fallback (R:667).
* JS ``parseInt`` semantics (leading-digit parse) for link text and img
  dimensions (R:389, R:437).
* JS string semantics: UTF-16 ``.length``, JS ``trim()``/``\\s`` whitespace
  classes, JS object key iteration order (integer-like keys first) for the
  scanned-links map (R:679).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from typing import Optional

# ---------------------------------------------------------------------------
# JS semantics helpers
# ---------------------------------------------------------------------------

# JS WhiteSpace ∪ LineTerminator (what `trim()` strips and `\s` matches).
_JS_WS = (
    "\t\n\x0b\x0c\r \u00a0\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a"
    "\u2028\u2029\u202f\u205f\u3000\ufeff"
)
_JS_WS_CLASS = "[" + _JS_WS + "]"


def js_trim(s: str) -> str:
    return s.strip(_JS_WS)


def js_len(s: str) -> int:
    """JS String.length = UTF-16 code units (ASCII fast path)."""
    if s.isascii():
        return len(s)
    return len(s.encode("utf-16-le")) // 2


_PARSEINT_RE = re.compile("^" + _JS_WS_CLASS + r"*([+-]?[0-9]+)")
_NAN = float("nan")


def js_parse_int(s) -> float:
    """JS parseInt(s, 10): skip whitespace, optional sign, leading digits."""
    if s is None:
        return _NAN
    m = _PARSEINT_RE.match(str(s))
    return float(int(m.group(1))) if m else _NAN


_ARRAY_INDEX_RE = re.compile(r"^(?:0|[1-9][0-9]*)$")


def js_object_keys(d: dict) -> list:
    """JS object key iteration order: canonical array indices ascending,
    then string keys in insertion order (relevant for getNextPage R:679)."""
    nums = [k for k in d if _ARRAY_INDEX_RE.match(k) and int(k) < 2**32 - 1]
    nums.sort(key=int)
    numset = set(nums)
    return nums + [k for k in d if k not in numset]


class _GlobalRegex:
    """Emulates a JS RegExp with the /g flag used via .test(): the lastIndex
    survives between calls (R:213 ``re_commas`` — the only such regex)."""

    def __init__(self, pattern: str):
        self._re = re.compile(pattern)
        self.last_index = 0

    def test(self, s: str) -> bool:
        if self.last_index > len(s):
            self.last_index = 0
            return False
        m = self._re.search(s, self.last_index)
        if m:
            self.last_index = m.end()
            return True
        self.last_index = 0
        return False


# ---------------------------------------------------------------------------
# Reference lookup tables (R:163-213)
# ---------------------------------------------------------------------------

TAGS_TO_SKIP = {"aside", "footer", "head", "label", "nav", "noscript",
                "script", "select", "style", "textarea"}
TAG_COUNTS = {"address": -3, "article": 30, "blockquote": 3, "body": -5,
              "dd": -3, "div": 5, "dl": -3, "dt": -3, "form": -3, "h2": -5,
              "h3": -5, "h4": -5, "h5": -5, "h6": -5, "li": -3, "ol": -3,
              "pre": 3, "section": 15, "td": 3, "th": -5, "ul": -3}
REMOVE_IF_EMPTY = {"blockquote", "li", "p", "pre", "tbody", "td", "th",
                   "thead", "tr"}
EMBEDS = {"embed", "object", "iframe"}
GOOD_ATTRIBUTES = {"alt", "href", "src", "title"}
CLEAN_CONDITIONALLY = {"div", "form", "ol", "table", "ul"}
UNPACK_DIVS = EMBEDS | {"div", "img"}
# noContent proto quirk (R:171): own keys + JS Object.prototype members;
# br/hr are NOT included (formatTags was undefined at evaluation time).
_JS_OBJECT_PROTO_PROPS = {
    "constructor", "hasOwnProperty", "isPrototypeOf", "propertyIsEnumerable",
    "toLocaleString", "toString", "valueOf", "__defineGetter__",
    "__defineSetter__", "__lookupGetter__", "__lookupSetter__", "__proto__",
}
NO_CONTENT = {"font", "input", "link", "meta", "span"} | _JS_OBJECT_PROTO_PROPS
HEADER_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}
FORMAT_TAGS = {"br", "hr"}                      # void-serialized <br/> (R:78)
NEW_LINES_AFTER = HEADER_TAGS | {"br", "li", "p"}   # R:174
DIV_TO_P_ELEMENTS = ["a", "blockquote", "dl", "img", "ol", "p", "pre",
                     "table", "ul"]
OKAY_IF_EMPTY = ["audio", "embed", "iframe", "img", "object", "video"]

RE_VIDEOS = re.compile(r"http://(?:www\.)?(?:youtube|vimeo)\.com")
RE_NEXT_LINK = re.compile(r"[>»]|continue|next|weiter(?:[^|]|$)", re.I)
RE_PREV_LINK = re.compile(r"[<«]|earl|new|old|prev", re.I)
RE_EXTRANEOUS = re.compile(
    r"all|archive|comment|discuss|e-?mail|login|print|reply|share|sign|single",
    re.I)
RE_PAGES = re.compile(r"pag(?:e|ing|inat)", re.I)
RE_PAGENUM = re.compile(r"p[ag]{0,2}(?:e|ing|ination)?[=/][0-9]{1,2}", re.I)
RE_SAFE = re.compile(r"article-body|hentry|instapaper_body")
RE_FINAL = re.compile(r"first|last", re.I)
RE_POSITIVE = re.compile(
    r"article|blog|body|content|entry|main|news|pag(?:e|ination)|post|story|text")
RE_NEGATIVE = re.compile(
    r"com(?:bx|ment|-)|contact|foot(?:er|note)?|masthead|media|meta|outbrain"
    r"|promo|related|scroll|shoutbox|sidebar|sponsor|shopping|tags|tool|widget")
RE_UNLIKELY_CANDIDATES = re.compile(
    r"ad-break|agegate|auth?or|bookmark|cat|com(?:bx|ment|munity)|date|disqus"
    r"|extra|foot|header|ignore|links|menu|nav|pag(?:er|ination)|popup|related"
    r"|remark|rss|share|shoutbox|sidebar|similar|social|sponsor|teaserlist"
    r"|time|tweet|twitter")
RE_OK_MAYBE_CANDIDATE = re.compile(r"and|article|body|column|main|shadow")
RE_SENTENCE = re.compile(r"\. |\.$")
RE_WHITESPACE = re.compile(_JS_WS_CLASS + "+")
RE_PAGE_IN_URL = re.compile(r"[_\-]?p[a-zA-Z]*[_\-]?[0-9]{1,2}$")
RE_BAD_FIRST = re.compile(r"^(?:[^a-z]{0,3}|index|[0-9]+)$", re.I)
RE_NO_LETTERS = re.compile(r"[^a-zA-Z]")
RE_PARAMS = re.compile(r"\?.*")
RE_EXTENSION = re.compile(r"00,|\.[a-zA-Z]+$")
RE_DIGITS = re.compile(r"[0-9]")
RE_JUST_DIGITS = re.compile(r"^[0-9]{1,2}$")
RE_SLASHES = re.compile(r"/+")
RE_DOMAIN = re.compile(r"/([^/]+)")
RE_PROTOCOL = re.compile(r"^\w+:", re.A)
RE_CLEAN_PATHS = re.compile(r"/\.(?!\.)|/[^/]*/\.\.")
RE_CLOSING = re.compile(r"/?(?:#.*)?$")
RE_IMG_URL = re.compile(r"\.(gif|jpe?g|png|webp)$", re.I)
_COMMAS_PATTERN = ",[" + _JS_WS + ",]*"
RE_COMMAS_SPLIT = re.compile(_COMMAS_PATTERN)

# getHTML cleanup regexes (R:693-697); \s = the JS class
RE_BR_BEFORE_P = re.compile(
    r"(?:<br/>(?:" + _JS_WS_CLASS + r"|&nbsp;?)*)+(?=</?p)")
RE_WS_BEFORE_BR = re.compile(r"(?:" + _JS_WS_CLASS + r"|&nbsp;?)+(?=<br/>)")
RE_BR_RUN = re.compile(r"(?:<br/>){2,}")
RE_NEWLINE_RUNS = re.compile(r"\n+(?=\n{2})")   # R:704

RE_TITLE_SEP = re.compile(r" [|\-] ")
RE_TITLE_KEEP_LHS = re.compile(r"(.*) [|\-] .*")
RE_TITLE_DROP_TO_SEP = re.compile(r".*?[|\-] ")


def _ws_norm(t: str) -> str:
    """``RE_WHITESPACE.sub(" ", t)`` with a C-speed identity fast path:
    when the only whitespace is single ASCII spaces, every match is a
    lone space replaced by a space, so the sub is an exact identity —
    skip the per-character regex rebuild.  The non-space members of the
    JS class are \\t\\n\\x0b\\x0c\\r plus non-ASCII codepoints, all
    excluded by the containment checks."""
    if ("  " not in t and "\t" not in t and "\n" not in t
            and "\r" not in t and "\x0b" not in t and "\x0c" not in t
            and t.isascii()):
        return t
    return RE_WHITESPACE.sub(" ", t)

TEXT_NODE = 3

# the reference's accidental global `text` (R:123) — single-threaded per
# worker process, reset at each to_string entry, exactly like the JS module
_TOSTRING_GLOBAL: dict = {"text": None}


# ---------------------------------------------------------------------------
# Tree model (R:14-31)
# ---------------------------------------------------------------------------

class TextNode:
    __slots__ = ("text", "offset")
    node_type = TEXT_NODE

    def __init__(self, text: str, offset: int = -1):
        self.text = text
        self.offset = offset


class Element:
    __slots__ = ("name", "parent", "attributes", "children", "tag_score",
                 "attribute_score", "total_score", "element_data", "info",
                 "is_candidate", "offset")
    node_type = None

    def __init__(self, name: str, parent: Optional["Element"] = None,
                 offset: int = -1):
        self.name = name
        self.parent = parent
        self.attributes: dict = {}
        self.children: list = []
        self.tag_score = 0.0
        self.attribute_score = 0.0
        self.total_score = 0.0
        self.element_data = ""
        self.info = {"textLength": 0, "linkLength": 0, "commas": 0,
                     "density": 0.0, "tagCount": {}}
        self.is_candidate = False
        self.offset = offset

    # R:34-69 — bottom-up rollup over direct children
    def add_info(self, re_commas: _GlobalRegex) -> None:
        info = self.info
        tag_count = info["tagCount"]
        for elem in self.children:
            if elem.node_type == TEXT_NODE:
                txt = elem.text
                info["textLength"] += js_len(js_trim(txt))
                if re_commas.test(txt):
                    info["commas"] += len(RE_COMMAS_SPLIT.split(txt)) - 1
            else:
                if elem.name == "a":
                    info["linkLength"] += (elem.info["textLength"]
                                           + elem.info["linkLength"])
                else:
                    info["textLength"] += elem.info["textLength"]
                    info["linkLength"] += elem.info["linkLength"]
                info["commas"] += elem.info["commas"]
                for j, v in elem.info["tagCount"].items():
                    tag_count[j] = tag_count.get(j, 0) + v
                tag_count[elem.name] = tag_count.get(elem.name, 0) + 1
        if info["linkLength"] != 0:
            info["density"] = info["linkLength"] / (
                info["textLength"] + info["linkLength"])

    # R:122-132 — toString with the ACCIDENTAL-GLOBAL `text` quirk (R:123):
    # `text = []` assigns a module global, so recursing into an element child
    # re-points it at the child's array; subsequent pushes in the outer call
    # land on the inner array, and the final join reads whatever array the
    # deepest-last recursion left behind.  JS evaluation order detail: the
    # receiver of `text.push(child.toString())` is bound BEFORE the argument
    # runs, so the child's result is appended to the outer array even though
    # later reads see the inner one.  Verified against the Node oracle
    # (differential fuzz: a header whose last child is an element yields "").
    def to_string(self) -> str:
        _TOSTRING_GLOBAL["text"] = []
        for ch in self.children:
            if ch.node_type == TEXT_NODE:
                _TOSTRING_GLOBAL["text"].append(ch.text)
            else:
                receiver = _TOSTRING_GLOBAL["text"]
                receiver.append(ch.to_string())
        return "".join(_TOSTRING_GLOBAL["text"])

    # R:70-83 — outer HTML; attribute insertion order; void form for br/hr
    def get_outer_html(self) -> str:
        ret = "<" + self.name
        for k, v in self.attributes.items():
            ret += f' {k}="{v}"'
        if not self.children:
            if self.name in FORMAT_TAGS:
                return ret + "/>"
            return ret + "></" + self.name + ">"
        return ret + ">" + self.get_inner_html() + "</" + self.name + ">"

    # R:84-92
    def get_inner_html(self) -> str:
        return "".join(ch.text if ch.node_type == TEXT_NODE
                       else ch.get_outer_html() for ch in self.children)

    # R:93-105 — whitespace-normalized text with newlines around p/headers
    def get_formatted_text(self) -> str:
        ret = []
        for ch in self.children:
            if ch.node_type == TEXT_NODE:
                ret.append(_ws_norm(ch.text))
            else:
                if ch.name == "p" or ch.name in HEADER_TAGS:
                    ret.append("\n")
                ret.append(ch.get_formatted_text())
                if ch.name in NEW_LINES_AFTER:
                    ret.append("\n")
        return "".join(ret)

    # R:133-160 — recursive argmax with in-place tag prior mutation
    def get_top_candidate(self):
        top_score = -math.inf
        top_candidate = None
        for child in self.children:
            if child.node_type == TEXT_NODE:
                continue
            if child.is_candidate:
                elem = child
                if elem.name in TAG_COUNTS:
                    elem.tag_score += TAG_COUNTS[elem.name]
                score = math.floor(
                    (elem.tag_score + elem.attribute_score)
                    * (1 - elem.info["density"]))
                if top_score < score:
                    elem.total_score = score
                    top_score = score
                    top_candidate = elem
            sub = child.get_top_candidate()
            if sub is not None and top_score < sub.total_score:
                top_score = sub.total_score
                top_candidate = sub
        return top_candidate


# R:582-607
def get_candidate_siblings(candidate: Element) -> list:
    ret = []
    sibling_score_threshold = max(10.0, candidate.total_score * 0.2)
    for child in candidate.parent.children:
        if child.node_type == TEXT_NODE:
            continue
        if child is candidate:
            pass
        elif candidate.element_data == child.element_data:
            if (child.total_score + candidate.total_score * 0.2
                    ) >= sibling_score_threshold:
                if child.name != "p":
                    child.name = "div"
            else:
                continue
        elif child.name == "p":
            if (child.info["textLength"] >= 80
                    and child.info["density"] < 0.25):
                pass
            elif (child.info["textLength"] < 80
                    and child.info["density"] == 0
                    and RE_SENTENCE.search(child.to_string())):
                pass
            else:
                continue
        else:
            continue
        ret.append(child)
    return ret


# ---------------------------------------------------------------------------
# Settings (R:230-242, R:637-649); shipped config = content.js:151-153
# ---------------------------------------------------------------------------

@dataclass
class Settings:
    strip_unlikely_candidates: bool = True
    weight_classes: bool = True
    clean_conditionally: bool = True
    clean_attributes: bool = True
    replace_imgs: bool = True
    search_further_pages: bool = True
    links_to_skip: dict = field(default_factory=dict)
    resolve_paths: bool = False
    page_url: Optional[str] = None
    skip_level: int = 3

    def __post_init__(self):
        # R:637-649 setSkipLevel
        if self.skip_level > 0:
            self.strip_unlikely_candidates = False
        if self.skip_level > 1:
            self.weight_classes = False
        if self.skip_level > 2:
            self.clean_conditionally = False

    @classmethod
    def shipped(cls) -> "Settings":
        """content.js:151-153 — {cleanAttributes: false}, skipLevel 3."""
        return cls(clean_attributes=False, skip_level=3)

    @classmethod
    def full(cls) -> "Settings":
        """All heuristics on (skipLevel 0, library defaults R:230-242)."""
        return cls(skip_level=0)


# ---------------------------------------------------------------------------
# The Readability fold (R:216-808)
# ---------------------------------------------------------------------------

class Readability:
    def __init__(self, settings: Optional[Settings] = None):
        self.settings = settings or Settings.shipped()
        self._url = None
        self._base_url = None
        if self.settings.page_url:
            # R:321-331 _processSettings URL parse
            parts = RE_SLASHES.split(self.settings.page_url)
            self._url = {
                "protocol": parts[0],
                "domain": parts[1] if len(parts) > 1 else "",
                "path": parts[2:-1],
                "full": RE_CLOSING.sub("", self.settings.page_url, count=1),
            }
            self._base_url = self._get_base_url()
        self.reset()

    def reset(self):
        # R:770-773
        self.root = Element("document")
        self.current = self.root
        self.top_candidate: Optional[Element] = None
        self.orig_title = ""
        self.header_title = ""
        self.scanned_links: dict = {}
        # fresh per-document regex state (oracle reloads module per doc)
        self._re_commas = _GlobalRegex(_COMMAS_PATTERN)

    # R:244-273
    def _convert_links(self, path: str) -> str:
        if not self._url:
            return path
        if not path:
            return self._url["full"]
        path_split = path.split("/")
        if len(path_split) > 1 and path_split[1] == "":
            if path_split[0] == "":
                return self._url["protocol"] + path
            if path_split[0].endswith(":"):
                return path
        if path_split[0] == "":
            path_split = path_split[1:]
        else:
            path_split = list(self._url["path"]) + path_split
        path = "/".join(path_split)
        if self.settings.resolve_paths:
            while True:
                new = RE_CLEAN_PATHS.sub("", path, count=1)
                if new == path:
                    break
                path = new
        return (self._url["protocol"] + "//" + self._url["domain"]
                + "/" + path)

    # R:275-308
    def _get_base_url(self) -> str:
        url = self._url
        if len(url["path"]) == 0:
            return RE_PARAMS.sub("", url["full"], count=1)
        cleaned = ""
        element_num = len(url["path"]) - 1
        for i in range(element_num):
            cleaned += "/" + RE_EXTENSION.sub("", url["path"][i])
        first = re.sub(r".*/", "",
                       RE_PARAMS.sub("", url["full"], count=1), count=1)
        second = url["path"][element_num]
        if (not (js_len(second) < 3 and RE_NO_LETTERS.search(first))
                and not RE_JUST_DIGITS.match(second)):
            if RE_PAGE_IN_URL.search(second):
                second = RE_PAGE_IN_URL.sub("", second, count=1)
            cleaned += "/" + second
        if not RE_BAD_FIRST.match(first):
            if RE_PAGE_IN_URL.search(first):
                first = RE_PAGE_IN_URL.sub("", first, count=1)
            cleaned += "/" + first
        return url["protocol"] + "//" + url["domain"] + cleaned

    # R:335-403
    def _scan_link(self, elem: Element) -> None:
        href = elem.attributes.get("href")
        if not href:
            return
        href = RE_CLOSING.sub("", href, count=1)
        if href in self.settings.links_to_skip:
            return
        if href == self._base_url or (self._url
                                      and href == self._url["full"]):
            return
        match = RE_DOMAIN.search(href)
        if not match:
            return
        if self._url and match.group(1) != self._url["domain"]:
            return
        text = elem.to_string()
        if js_len(text) > 25 or RE_EXTRANEOUS.search(text):
            return
        # JS: href.replace(this._baseURL, "") with undefined baseURL coerces
        # the pattern to the literal string "undefined" (R:351)
        base = self._base_url if self._base_url is not None else "undefined"
        if not RE_DIGITS.search(href.replace(base, "", 1)):
            return

        score = 0.0
        link_data = text + elem.element_data
        if RE_NEXT_LINK.search(link_data):
            score += 50
        if RE_PAGES.search(link_data):
            score += 25
        if RE_FINAL.search(link_data):
            if not RE_NEXT_LINK.search(text):
                prev = self.scanned_links.get(href)
                if not (prev and RE_NEXT_LINK.search(prev["text"])):
                    score -= 65
        if RE_NEGATIVE.search(link_data) or RE_EXTRANEOUS.search(link_data):
            score -= 50
        if RE_PREV_LINK.search(link_data):
            score -= 200
        if RE_PAGENUM.search(href) or RE_PAGES.search(href):
            score += 25
        if RE_EXTRANEOUS.search(href):
            score -= 15

        current = elem
        pos_match = True
        neg_match = True
        while True:
            current = current.parent
            if current is None:
                break
            if current.element_data == "":
                continue
            if pos_match and RE_PAGES.search(current.element_data):
                score += 25
                if not neg_match:
                    break
                pos_match = False
            if (neg_match and RE_NEGATIVE.search(current.element_data)
                    and not RE_POSITIVE.search(current.element_data)):
                score -= 25
                if not pos_match:
                    break
                neg_match = False

        parsed = js_parse_int(text)
        if parsed < 10:  # NaN compares False
            if parsed == 1:
                score -= 10
            else:
                score += 10 - parsed

        if href in self.scanned_links:
            self.scanned_links[href]["score"] += score
            self.scanned_links[href]["text"] += " " + text
        else:
            self.scanned_links[href] = {"score": score, "text": text}

    # ------------------------------------------------------------------
    # parser handlers (R:406-578)
    # ------------------------------------------------------------------

    def onopentagname(self, name: str, offset: int = -1) -> None:
        if name in NO_CONTENT:
            # formatTags push at R:408 is dead code (br/hr not in noContent)
            return
        self.current = Element(name, self.current, offset)

    def onattribute(self, name: str, value) -> None:
        if not value:
            return
        name = name.lower()
        elem = self.current
        if name in ("href", "src"):
            if RE_PROTOCOL.match(value):
                elem.attributes[name] = value
            else:
                elem.attributes[name] = self._convert_links(value)
        elif name in ("id", "class"):
            value = value.lower()
            if not self.settings.weight_classes:
                pass
            elif RE_SAFE.search(value):
                elem.attribute_score += 300
                elem.is_candidate = True
            elif RE_NEGATIVE.search(value):
                elem.attribute_score -= 25
            elif RE_POSITIVE.search(value):
                elem.attribute_score += 25
            elem.element_data += " " + value
        elif elem.name == "img" and name in ("width", "height"):
            num = js_parse_int(value)
            if num != num:  # NaN
                pass
            elif num <= 32:
                elem.name = "script"  # R:442 tiny-image demotion
            elif num >= (390 if name == "width" else 290):
                elem.parent.attribute_score += 20
            elif num >= (200 if name == "width" else 150):
                elem.parent.attribute_score += 5
        elif self.settings.clean_attributes:
            if name in GOOD_ATTRIBUTES:
                elem.attributes[name] = value
        else:
            elem.attributes[name] = value

    def ontext(self, text: str, offset: int = -1) -> None:
        self.current.children.append(TextNode(text, offset))

    def onclosetag(self, tag_name: str) -> None:
        if tag_name in NO_CONTENT:
            return
        elem = self.current
        self.current = elem.parent

        # R:470-494 — link scan / title capture / header handling
        if self.settings.search_further_pages and tag_name == "a":
            self._scan_link(elem)
        elif tag_name == "title":
            self.orig_title = RE_WHITESPACE.sub(" ", js_trim(elem.to_string()))
            return
        elif tag_name in HEADER_TAGS:
            title = RE_WHITESPACE.sub(" ", js_trim(elem.to_string()))
            if self.orig_title:
                if title in self.orig_title:
                    if len(title.split(" ")[:4]) == 4:
                        self.header_title = title
                    return
                if tag_name == "h1":
                    return
            elif tag_name == "h1":
                self.header_title = title
                return

        if tag_name in TAGS_TO_SKIP:
            return
        if (self.settings.strip_unlikely_candidates
                and RE_UNLIKELY_CANDIDATES.search(elem.element_data)
                and not RE_OK_MAYBE_CANDIDATE.search(elem.element_data)):
            return
        if (tag_name == "div" and len(elem.children) == 1
                and elem.children[0].node_type != TEXT_NODE
                and elem.children[0].name in UNPACK_DIVS):
            # R:502-510 unpack divs
            elem.parent.children.append(elem.children[0])
            return

        elem.add_info(self._re_commas)

        if tag_name in EMBEDS:
            src = elem.attributes.get("src")
            if not (src is not None and RE_VIDEOS.search(src)):
                return
        elif tag_name in ("h2", "h3"):
            if elem.attribute_score < 0 or elem.info["density"] > 0.33:
                return
        elif (self.settings.clean_conditionally
                and tag_name in CLEAN_CONDITIONALLY):
            p = elem.info["tagCount"].get("p", 0)
            content_length = elem.info["textLength"] + elem.info["linkLength"]
            if content_length == 0:
                if len(elem.children) == 0:
                    return
                if (len(elem.children) == 1
                        and elem.children[0].node_type == TEXT_NODE):
                    return
            li = elem.info["tagCount"].get("li", _NAN)
            if (li - 100) > p and tag_name != "ul" and tag_name != "ol":
                return
            if content_length < 25 and (
                    "img" not in elem.info["tagCount"]
                    or elem.info["tagCount"]["img"] > 2):
                return
            if elem.info["density"] > 0.5:
                return
            if elem.attribute_score < 25 and elem.info["density"] > 0.2:
                return
            embed = elem.info["tagCount"].get("embed", 0)
            if (embed == 1 and content_length < 75) or embed > 1:
                return

        # R:538-547 filterEmpty (media rescue via okayIfEmpty)
        if ((tag_name in REMOVE_IF_EMPTY
                or (not self.settings.clean_conditionally
                    and tag_name in CLEAN_CONDITIONALLY))
                and (elem.info["linkLength"] + elem.info["textLength"] == 0)
                and len(elem.children) != 0):
            if not any(t in elem.info["tagCount"] for t in OKAY_IF_EMPTY):
                return

        # R:549-557 replaceImgs — reproduces the orphaning bug (see module
        # docstring): elem becomes the img, push target is the *anchor*.
        if (self.settings.replace_imgs and tag_name == "a"
                and len(elem.children) == 1
                and getattr(elem.children[0], "name", None) == "img"
                and RE_IMG_URL.search(str(elem.attributes.get("href")))):
            elem = elem.children[0]
            elem.attributes["src"] = elem.parent.attributes.get("href")

        elem.parent.children.append(elem)

        # R:562-577 — scoring
        if tag_name in ("p", "pre", "td"):
            pass
        elif tag_name == "div":
            for t in DIV_TO_P_ELEMENTS:
                if t in elem.info["tagCount"]:
                    return
            elem.name = "p"
        else:
            return

        total_len = elem.info["textLength"] + elem.info["linkLength"]
        if total_len > 24 and elem.parent and elem.parent.parent:
            elem.parent.is_candidate = True
            elem.parent.parent.is_candidate = True
            add_score = (1 + elem.info["commas"]
                         + min(math.floor(total_len / 100), 3))
            elem.parent.tag_score += add_score
            elem.parent.parent.tag_score += add_score / 2

    # ------------------------------------------------------------------
    # candidate selection / outputs (R:611-808)
    # ------------------------------------------------------------------

    def _get_candidate_node(self) -> Element:
        elem = self.top_candidate
        if elem is None:
            elem = self.top_candidate = self.current.get_top_candidate()
        if elem is None:
            elem = self.current
        elif len(elem.parent.children) > 1:
            elems = get_candidate_siblings(elem)
            new = Element("div")
            new.children = elems
            new.add_info(self._re_commas)
            elem = new
        while len(elem.children) == 1:
            child = elem.children[0]
            if child.node_type != TEXT_NODE:
                elem = child
            else:
                break
        return elem

    def get_title(self) -> str:
        # R:651-675
        if self.header_title:
            return self.header_title
        if not self.orig_title:
            return ""
        cur = self.orig_title
        if RE_TITLE_SEP.search(cur):
            cur = RE_TITLE_KEEP_LHS.sub(r"\1", cur)
            if len(cur.split(" ")[:3]) != 3:
                cur = RE_TITLE_DROP_TO_SEP.sub("", self.orig_title, count=1)
        elif ": " in cur:
            cur = cur[cur.rindex(": ") + 2:]
            if len(cur.split(" ")[:3]) != 3:
                # R:667 — keeps the ": " prefix (substr from indexOf)
                cur = self.orig_title[self.orig_title.index(": "):]
        cur = js_trim(cur)
        if len(cur.split(" ")[:5]) != 5:
            return self.orig_title
        return cur

    # R:689-700 — HTML output with <br>-run → paragraph rewrite (T5)
    def get_html(self, node: Element) -> str:
        html = node.get_inner_html()
        # all three rewrite regexes require a literal "<br/>" somewhere
        # (RE_WS_BEFORE_BR via lookahead); one C-speed containment check
        # skips three full-document regex scans on br-less documents —
        # byte-identical output (a no-match sub returns its input)
        if "<br/>" in html:
            html = RE_BR_BEFORE_P.sub("", html)
            html = RE_WS_BEFORE_BR.sub("", html)
            html = RE_BR_RUN.sub("</p><p>", html)
        return js_trim(html)

    # R:702-705 — formatted text, trimmed, 3+ newline runs collapsed to 2
    def get_text(self, node: Element) -> str:
        text = js_trim(node.get_formatted_text())
        # RE_NEWLINE_RUNS only matches a \n\n\n run — same guard rationale
        if "\n\n\n" in text:
            text = RE_NEWLINE_RUNS.sub("", text)
        return text

    def get_next_page(self) -> str:
        top_score, top_link = 49.0, ""
        for link in js_object_keys(self.scanned_links):
            if self.scanned_links[link]["score"] > top_score:
                top_link = link
                top_score = self.scanned_links[link]["score"]
        return top_link


# ---------------------------------------------------------------------------
# Span-stream driver + retained-span walk (our conventions; see FIXTURES.md)
# ---------------------------------------------------------------------------

MEDIA_TAGS = {"img", "embed", "iframe", "object", "video", "audio"}


def parse_media_ref(media_ref: str):
    """media_ref = url + optional '#w=<int>&h=<int>' (FIXTURES.md §1)."""
    if "#" not in media_ref:
        return media_ref, None, None
    url, frag = media_ref.split("#", 1)
    w = h = None
    mw = re.search(r"w=([0-9]+)", frag)
    mh = re.search(r"h=([0-9]+)", frag)
    if mw:
        w = mw.group(1)
    if mh:
        h = mh.group(1)
    return url, w, h


def collect_retained(elem: Element, out: list) -> None:
    """Ordered retained-span walk over the candidate subtree.

    text nodes with non-empty text → ('text', text, '', offset)  (mirrors
    getNodes R:106-121); media elements → (tag, '', src, offset).
    """
    for ch in elem.children:
        if ch.node_type == TEXT_NODE:
            if len(ch.text) > 0:
                out.append(("text", ch.text, "", ch.offset))
        elif ch.name in MEDIA_TAGS:
            out.append((ch.name, "", ch.attributes.get("src", "") or "",
                        ch.offset))
        else:
            collect_retained(ch, out)


def extract(spans, settings: Optional[Settings] = None,
            renders: bool = True) -> dict:
    """Run the full fold over one document's span sequence.

    ``spans``: iterable of (kind, text, media_ref, offset) tuples (document
    order).  Returns the Article record (SURVEY.md §1.1c) plus the ordered
    retained spans.  ``renders=False`` skips the text/html renderings
    (~50%% of per-doc cost — the reference computes them lazily, R:779-804;
    use when only the span/KG outputs are consumed).
    """
    rd = Readability(settings)
    for kind, text, media_ref, offset in spans:
        if kind == "text":
            rd.ontext(text or "", offset)
        elif kind.startswith("open:"):
            # saxParser lowercases tag names (R:739) — so e.g. a "toString"
            # tag becomes "tostring", an ordinary element, NOT a noContent
            # hit; only all-lowercase Object.prototype names ("constructor",
            # "__proto__") can trigger the proto quirk through a real DOM.
            tag = kind[5:].lower()
            rd.onopentagname(tag, offset)
            if tag in MEDIA_TAGS and media_ref:
                url, w, h = parse_media_ref(media_ref)
                if url:
                    rd.onattribute("src", url)
                if w is not None:
                    rd.onattribute("width", w)
                if h is not None:
                    rd.onattribute("height", h)
        elif kind.startswith("attr:"):
            rd.onattribute(kind[5:], text)
        elif kind.startswith("close:"):
            rd.onclosetag(kind[6:].lower())
        else:
            raise ValueError(f"unknown span kind: {kind!r}")

    elem = rd._get_candidate_node()
    retained: list = []
    collect_retained(elem, retained)
    return {
        "title": rd.header_title or rd.get_title(),
        "next_page": rd.get_next_page(),
        "text_length": int(elem.info["textLength"]),
        "score": int(rd.top_candidate.total_score) if rd.top_candidate else 0,
        "retained_spans": retained,
        "text": rd.get_text(elem) if renders else "",   # getText R:789-793
        "html": rd.get_html(elem) if renders else "",   # getHTML R:799-803
    }
