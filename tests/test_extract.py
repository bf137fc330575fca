"""Link/text extraction tests against the golden site graphs
(FIXTURES.md §3, sourced from the reference's testdata/)."""

from crawlspark.functions.extract import extract_links, extract_text

PAGE1 = b"""<html>
  <head></head>
  <body>
    <h1>Page 1 Title</h1>
    <p><a href="page2.html"></a>
      <a href="page3.html"></a></p>
    <p><a href="http://hostb/page1.html"></a></p>
  </body>
</html>"""


def test_extract_links_doc_order():
    assert extract_links(PAGE1, "http://hosta/page1.html") == [
        "http://hosta/page2.html",
        "http://hosta/page3.html",
        "http://hostb/page1.html",
    ]


def test_self_link_and_fragment_skip():
    html = b'<a href="#top"></a><a href="page1.html"></a><a href=""></a>'
    assert extract_links(html, "http://hostb/page1.html") == [
        "http://hostb/page1.html",
    ]


def test_first_base_tag_wins():
    # hostd/subdir/page2.html shape: base '/' first, then base '/subdir'
    html = (
        b"<html><head><base href=\"/\"/><base href=\"/subdir\"/></head>"
        b"<body><a href=\"page3.html\"></a></body></html>"
    )
    assert extract_links(html, "http://hostd/subdir/page2.html") == [
        "http://hostd/page3.html",
    ]


def test_base_tag_with_file_path():
    html = (
        b"<html><head><base href=\"/index.html\"/></head>"
        b"<body><a href=\"/subdir/pageb.html\"></a></body></html>"
    )
    assert extract_links(html, "http://hostd/subdir/pagea.html") == [
        "http://hostd/subdir/pageb.html",
    ]


def test_network_path_reference():
    html = b'<a href="//localhost:8080/subdir/page1.html"></a>'
    assert extract_links(html, "http://hostd/page3.html") == [
        "http://localhost:8080/subdir/page1.html",
    ]


def test_extract_text_spec_v1():
    assert extract_text(PAGE1) == "Page 1 Title"
    html = b"""<html><head><title>T</title><style>p{}</style>
    <script>var x=1;</script></head>
    <body><p>Hello <b>world</b></p>\n<div>  spaced  </div></body></html>"""
    assert extract_text(html) == "T\nHello\nworld\nspaced"


def test_extract_text_malformed_is_stable():
    html = b"<p>unclosed <a href='x.html'>link"
    assert extract_text(html) == "unclosed\nlink"
    assert extract_links(html, "http://h/p.html") == ["http://h/x.html"]


def test_duplicate_links_preserved():
    html = b'<a href="a.html"></a><a href="a.html"></a>'
    assert extract_links(html, "http://h/") == ["http://h/a.html", "http://h/a.html"]


# ---------------------------------------------------------------------------
# fast-path ≡ slow-path property tests (the regex profile parser must be
# indistinguishable from the html.parser oracle on every input)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

from crawlspark.functions import extract as _ex


def _slow(html: bytes):
    return _ex._parse_page_slow(bytes(html).decode("utf-8", errors="replace"))


def _assert_paths_agree(html: bytes):
    fast = _ex._parse_simple(bytes(html).decode("utf-8", errors="replace"))
    if fast is None:
        return  # profile rejected → single (slow) path, nothing to compare
    slow = _slow(html)
    assert fast.hrefs == slow.hrefs
    assert fast.text_chunks == slow.text_chunks
    assert fast.base_href == slow.base_href is None


def test_fast_path_on_fixture_pages():
    from crawlspark.fixtures import fixture_pages_rows, _render_page

    for row in fixture_pages_rows():
        _assert_paths_agree(row["html"])
    html = _render_page("h.example", "/p1.html", None, ["/p2.html", "http://x.example/p.html"])
    hb = html if isinstance(html, bytes) else html.encode()
    assert isinstance(_ex.parse_page(hb), _ex._FastPage)  # synthetic shape hits fast path
    _assert_paths_agree(hb)


_tagish = st.sampled_from(
    ["<a href=\"x.html\">", "</a>", "<p>", "<br/>", "<div class=\"c\">",
     "<a href=\"/a/b.html\">", "<a>", "<A HREF=\"y\">", "<base href=\"/b/\">",
     "<script>var x;</script>", "<!-- c -->", "&amp;", "<a href='sq.html'>",
     "<a data-href=\"no.html\">", "<a href=\"\">", "<a href=\"#f\">",
     # shapes that stress the fused one-pass href findall: non-first
     # href attrs, duplicate hrefs in one tag, self-closing a, adjacent
     # a-tags, end tags carrying attrs, near-miss tag names
     "<a class=\"c\" href=\"late\">", "<a  href=\"two\" href=\"second\">",
     "<a href=\"v\"/>", "<a href=\"a\"><a href=\"b\">",
     "</div class=\"x\">", "<aa href=\"notanchor\">", "<a1 href=\"x\">"]
)
_textish = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=12
)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.one_of(_tagish, _textish), max_size=12))
def test_fast_path_random_docs(parts):
    _assert_paths_agree("".join(parts).encode("utf-8"))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.sampled_from(
                ["/a/b.html", "/a//b", "/../x", "/a/./b", "page.html", "#f", "",
                 "http://h2.example/p.html", "https://h2/x?q=1", "//h3/p",
                 "http://h/p#frag", "HTTP://H/p", "/p?a=1&b=2", "?q=2",
                 "http://h", "mailto:x@y", "ftp://h/f",
                 # urljoin strips \t\r\n anywhere, drops a trailing bare
                 # "?", and strips leading/trailing controls/space — the
                 # fast regexes must bail on all of these
                 "/p?", "/a\tb", "/a\nb", "https://h/p?", "http://h/a\tb",
                 " /x", "/x ", "/x\x01", "\thttp://h/p"]
            ),
            st.text(max_size=10),
        ),
        max_size=8,
    ),
    st.sampled_from(
        ["http://host.example/dir/page.html", "http://h", "https://h:81/p",
         "not-a-url", "", "http://h\to st/p", "http://h/p ", " http://h/p",
         "http://h\nx/p"]
    ),
)
def test_resolve_links_equals_per_href(hrefs, page_url):
    batched = _ex.resolve_links(page_url, hrefs, None)
    single = [
        r for r in (_ex.resolve_link(page_url, h, None) for h in hrefs)
        if r is not None
    ]
    assert batched == single
