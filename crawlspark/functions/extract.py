"""HTML link + text extraction.

Link extraction reproduces the reference's behavior (worker.go:385-412):
all ``a[href]`` in document order, the **first** ``base[href]`` applied
via the base-tag algorithm, fragment-only hrefs skipped, every link
resolved against the page URL.

Text extraction has no reference analog (the reference hands the parsed
document to user code, worker.go:348); per SURVEY §2.9 the engine
defines the spec and this pure-Python function IS the pinned oracle —
the byte-identity invariant is engine output ≡ this function's output.

THE PINNED TEXT SPEC (v1, frozen): parse the HTML; collect the
character data of every text node in document order, excluding nodes
inside <script>, <style>, <template> and <noscript>; strip ASCII
whitespace from each chunk; drop empty chunks; join with a single
newline.  Input bytes are decoded as UTF-8 with errors='replace'.

Pure Python (stdlib html.parser) — usable both as the test oracle and
inside Arrow-vectorized pandas UDFs.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from crawlspark.functions.urlnorm import resolve_link

__all__ = [
    "parse_page",
    "extract_links",
    "extract_text",
    "resolve_links",
    "TEXT_SPEC_VERSION",
]

TEXT_SPEC_VERSION = 1

_SKIP_TEXT_IN = {"script", "style", "template", "noscript"}
# HTML void elements never get end tags; don't track nesting for them.
_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class _PageParser(HTMLParser):
    """Single pass: first base[href], a[href] list in order, text chunks."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.base_href: str | None = None
        self.hrefs: list[str] = []
        self.text_chunks: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TEXT_IN:
            self._skip_depth += 1
        self._capture(tag, attrs)

    def handle_startendtag(self, tag, attrs):
        self._capture(tag, attrs)

    def _capture(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.hrefs.append(v)
                    break
        elif tag == "base" and self.base_href is None:
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.base_href = v
                    break

    def handle_endtag(self, tag):
        if tag in _SKIP_TEXT_IN and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data):
        if self._skip_depth == 0:
            chunk = data.strip()
            if chunk:
                self.text_chunks.append(chunk)


# ---------------------------------------------------------------------------
# Fast path: a restricted HTML profile parseable with C-speed regexes.
#
# A document qualifies when it is a plain sequence of text nodes and
# lowercase tags with double-quoted attributes — no entities ("&"), no
# comments/doctype/PIs ("<!", "<?"), no <script>/<style>/<template>/
# <noscript>/<base>, no "<" or quotes inside attribute values.  On this
# profile the regex pipeline below is PROVABLY equivalent to the
# html.parser path (every "<" opens a tag that ends at the first ">",
# so tag removal and href capture are exact); equivalence is also
# property-tested (fast vs slow on fixtures + random docs).  Well-formed
# machine-generated pages — the overwhelming majority of a crawl corpus
# — hit this path at ~10x the stdlib parser's speed; anything else
# falls back to html.parser.
# ---------------------------------------------------------------------------

# possessive quantifiers (Python 3.11+) throughout: the profile gate
# must be LINEAR on rejecting inputs — with ordinary greedy quantifiers
# the (text|tag)* loop backtracks exponentially on long non-matching
# documents (hypothesis found this immediately)
_TAG_BODY = r"/?+[a-z][a-z0-9]*+(?:\s++[a-z-]++=\"[^\"<>&]*+\")*+\s*+/?"
# unroll-the-loop form of (?:[^<&]++|<TAG>)*+\Z — same language, no
# per-position alternation retry (text runs and tags start with
# disjoint characters)
_SIMPLE_RX = re.compile(r"[^<&]*+(?:<" + _TAG_BODY + r">[^<&]*+)*+\Z")
_FORBIDDEN_RX = re.compile(r"<(?:script|style|template|noscript|base)\b")
_ANY_TAG_RX = re.compile(r"<[^>]*>")
_A_TAG_RX = re.compile(r"<a(?=[\s/>])([^>]*)>")
# \s anchor: in the validated grammar every attribute is preceded by
# whitespace, and it keeps data-href-style names from matching
_HREF_RX = re.compile(r"\shref=\"([^\"]*)\"")
# fused a-tag+href capture: on a validated document "<" never occurs
# inside a tag body, so the lazy [^>]*? cannot cross tags and this
# finds exactly the FIRST href of every <a ...> start tag in one C
# pass (a-tags without an href simply don't match)
_A_HREF_RX = re.compile(r"<a(?=[\s/>])[^>]*?\shref=\"([^\"]*)\"")


class _FastPage:
    __slots__ = ("base_href", "hrefs", "text_chunks")

    def __init__(self, hrefs: list[str], text_chunks: list[str]):
        self.base_href = None
        self.hrefs = hrefs
        self.text_chunks = text_chunks


def _parse_simple(html: str) -> _FastPage | None:
    """Regex parse for the restricted profile; None → caller falls back."""
    if "\x00" in html or _FORBIDDEN_RX.search(html) or not _SIMPLE_RX.match(html):
        return None
    # both extraction passes run at C speed on the validated profile:
    # hrefs in one fused findall, text chunks via split on the tags
    # (split pieces ARE the inter-tag texts — no sentinel round-trip)
    hrefs = _A_HREF_RX.findall(html)
    chunks = [c for c in map(str.strip, _ANY_TAG_RX.split(html)) if c]
    return _FastPage(hrefs, chunks)


def _parse_page_slow(html: str) -> _PageParser:
    p = _PageParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # parse failure → behave like the reference's nil-doc path
        # (worker.go:336-341): no links, no text.
        p.hrefs = []
        p.text_chunks = []
        p.base_href = None
    return p


def parse_page(html: bytes | str):
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    fast = _parse_simple(html)
    if fast is not None:
        return fast
    return _parse_page_slow(html)


# page-URL prefix for trivial resolution: scheme://host with a root
# path.  C0 controls and space are excluded from the authority: urllib
# strips \t\r\n anywhere and leading/trailing controls/space, so any
# such page URL must take the slow (urljoin-identical) path.
_PAGE_PREFIX_RX = re.compile(r"\A(https?://[^/?#\x00-\x20]+)(?:/|\Z)")
# absolute-path href whose resolution is prefix+href verbatim: no
# protocol-relative "//", no dot segments, no fragment, no embedded
# controls/whitespace (urljoin strips \t\r\n anywhere), and not ending
# in a bare "?" (urlunsplit drops an empty trailing query)
_PLAIN_PATH_RX = re.compile(r"\A/(?!/)[^#\x00-\x20]*(?<!\?)\Z")
# absolute http(s) href that urljoin returns unchanged (same caveats)
_PLAIN_ABS_RX = re.compile(
    r"\Ahttps?://[^/?#\x00-\x20]+/[^#\x00-\x20]*(?<!\?)\Z"
)
_DOT_SEG_RX = re.compile(r"/\.{1,2}(?:/|\Z)")


def resolve_links(
    page_url: str, hrefs: list[str], base_href: str | None
) -> list[str]:
    """Batched ``resolve_link``: same outputs, one page-prefix parse.

    The two trivial cases — absolute-path hrefs and clean absolute
    http(s) hrefs, both without dot segments or fragments — skip
    ``urljoin`` entirely (string concat); everything else falls back to
    ``resolve_link`` per href.  Property-tested equal to the per-href
    path (tests/test_extract.py)."""
    out: list[str] = []
    if base_href is not None:
        for href in hrefs:
            r = resolve_link(page_url, href, base_href)
            if r is not None:
                out.append(r)
        return out
    pm = _PAGE_PREFIX_RX.match(page_url) if page_url else None
    prefix = pm.group(1) if pm else None
    for href in hrefs:
        if not href or href.startswith("#"):
            continue
        if prefix is not None and not _DOT_SEG_RX.search(href):
            if _PLAIN_PATH_RX.match(href):
                out.append(prefix + href)
                continue
            if _PLAIN_ABS_RX.match(href):
                out.append(href)
                continue
        r = resolve_link(page_url, href, None)
        if r is not None:
            out.append(r)
    return out


def extract_links(html: bytes | str, page_url: str) -> list[str]:
    """Resolved outlinks of a page in document order (may contain dups —
    the admission pipeline, not extraction, dedups; crawler.go:199-273)."""
    p = parse_page(html)
    return resolve_links(page_url, p.hrefs, p.base_href)


def extract_text(html: bytes | str) -> str:
    """The pinned text-extraction oracle (spec v1, module docstring)."""
    p = parse_page(html)
    return "\n".join(p.text_chunks)
