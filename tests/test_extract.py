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
