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

from html.parser import HTMLParser

from crawlspark.functions.urlnorm import resolve_link

__all__ = ["parse_page", "extract_links", "extract_text", "TEXT_SPEC_VERSION"]

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


def parse_page(html: bytes | str) -> _PageParser:
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
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


def extract_links(html: bytes | str, page_url: str) -> list[str]:
    """Resolved outlinks of a page in document order (may contain dups —
    the admission pipeline, not extraction, dedups; crawler.go:199-273)."""
    p = parse_page(html)
    out: list[str] = []
    for href in p.hrefs:
        resolved = resolve_link(page_url, href, p.base_href)
        if resolved is not None:
            out.append(resolved)
    return out


def extract_text(html: bytes | str) -> str:
    """The pinned text-extraction oracle (spec v1, module docstring)."""
    p = parse_page(html)
    return "\n".join(p.text_chunks)
