"""URL canonicalization + base-tag resolution parity tests.

Golden expectations come from the reference's observable behavior:
the 58-case base-tag table (basetag_test.go:70-148) and the normalized
URLs asserted in gocrawl's table-driven tests.
"""

from crawlspark.config import (
    FLAGS_ALL_GREEDY,
    FLAGS_SAFE,
    FLAGS_USUALLY_SAFE_NON_GREEDY,
    NormalizationFlags as NF,
)
from crawlspark.functions.urlnorm import (
    go_path_clean,
    go_path_join,
    handle_base_tag,
    is_absolute_http,
    is_robots_url,
    normalize_url,
    resolve_link,
    split_host,
)

# (base[href], a[href], expected) — golden table from basetag_test.go:70-148
BASE_TAG_CASES = [
    ("http://other.com", "http://host.com/a", "http://host.com/a"),
    ("http://other.com", "//host.com", "http://host.com"),
    ("http://other.com", "//host.com/", "http://host.com/"),
    ("http://other.com", "//host.com/b", "http://host.com/b"),
    ("http://other.com", "/", "http://other.com/"),
    ("http://other.com", "/sub", "http://other.com/sub"),
    ("http://other.com", "/sub/", "http://other.com/sub/"),
    ("http://other.com/", "http://host.com/a", "http://host.com/a"),
    ("http://other.com/", "//host.com", "http://host.com"),
    ("http://other.com/", "//host.com/", "http://host.com/"),
    ("http://other.com/", "//host.com/b", "http://host.com/b"),
    ("http://other.com/", "/", "http://other.com/"),
    ("http://other.com/", "/sub", "http://other.com/sub"),
    ("http://other.com/", "/sub/", "http://other.com/sub/"),
    ("//other.com", "http://host.com/a", "http://host.com/a"),
    ("//other.com", "//host.com", "http://host.com"),
    ("//other.com", "//host.com/", "http://host.com/"),
    ("//other.com", "//host.com/b", "http://host.com/b"),
    ("//other.com", "/", "http://other.com/"),
    ("//other.com", "/sub", "http://other.com/sub"),
    ("//other.com", "/sub/", "http://other.com/sub/"),
    ("//other.com/", "http://host.com/a", "http://host.com/a"),
    ("//other.com/", "//host.com", "http://host.com"),
    ("//other.com/", "//host.com/", "http://host.com/"),
    ("//other.com/", "//host.com/b", "http://host.com/b"),
    ("//other.com/", "/", "http://other.com/"),
    ("//other.com/", "/sub", "http://other.com/sub"),
    ("//other.com/", "/sub/", "http://other.com/sub/"),
    ("/", "http://host.com/a", "http://host.com/a"),
    ("/", "//host.com", "http://host.com"),
    ("/", "//host.com/", "http://host.com/"),
    ("/", "//host.com/b", "http://host.com/b"),
    ("/", "/", "http://example.com/"),
    ("/", "/sub", "http://example.com/sub"),
    ("/", "/sub/", "http://example.com/sub/"),
    ("/sub", "http://host.com/a", "http://host.com/a"),
    ("/sub", "//host.com", "http://host.com"),
    ("/sub", "//host.com/", "http://host.com/"),
    ("/sub", "//host.com/b", "http://host.com/b"),
    ("/sub", "/", "http://example.com/"),
    ("/sub", "/sub", "http://example.com/sub"),
    ("/sub", "/sub/", "http://example.com/sub/"),
    ("/sub/", "http://host.com/a", "http://host.com/a"),
    ("/sub/", "//host.com", "http://host.com"),
    ("/sub/", "//host.com/", "http://host.com/"),
    ("/sub/", "//host.com/b", "http://host.com/b"),
    ("/sub/", "/", "http://example.com/"),
    ("/sub/", "/sub", "http://example.com/sub"),
    ("/sub/", "/sub/", "http://example.com/sub/"),
    ("/sub/index.html", "http://host.com/a", "http://host.com/a"),
    ("/sub/index.html", "//host.com", "http://host.com"),
    ("/sub/index.html", "//host.com/", "http://host.com/"),
    ("/sub/index.html", "//host.com/b", "http://host.com/b"),
    ("/sub/index.html", "/", "http://example.com/"),
    ("/sub/index.html", "/sub", "http://example.com/sub"),
    ("/sub/index.html", "/sub/", "http://example.com/sub/"),
    ("/sub/", "#top-of-page", "http://example.com/sub/#top-of-page"),
    ("/sub/", "?print=1", "http://example.com/sub/?print=1"),
]


def test_handle_base_tag_golden_table():
    root = "http://example.com"
    for i, (base, href, want) in enumerate(BASE_TAG_CASES):
        got = handle_base_tag(root, base, href)
        assert got == want, f"case {i}: base={base!r} href={href!r}: {got!r} != {want!r}"


def test_base_tag_relative_href_joins_base_path():
    # hostd/subdir/page2.html: first base '/' wins; 'page3.html' → /page3.html
    assert (
        handle_base_tag("http://hostd/subdir/page2.html", "/", "page3.html")
        == "http://hostd/page3.html"
    )
    # base pointing at a file: path.Join uses its full path as directory
    assert (
        handle_base_tag("http://hostd/subdir/pagea.html", "/index.html", "/subdir/pageb.html")
        == "http://hostd/subdir/pageb.html"
    )


def test_go_path_clean():
    assert go_path_clean("/sub/") == "/sub"
    assert go_path_clean("//sub") == "/sub"
    assert go_path_clean("/a/b/../c") == "/a/c"
    assert go_path_clean("/..") == "/"
    assert go_path_clean("") == "."
    assert go_path_join("/sub/", "x.html") == "/sub/x.html"
    assert go_path_join("/sub", "x.html") == "/sub/x.html"
    assert go_path_join("/sub/", "#top") == "/sub/#top"


class TestAllGreedy:
    F = FLAGS_ALL_GREEDY

    def test_fixture_urls_are_fixed_points(self):
        for u in [
            "http://hosta/page1.html",
            "http://hostb/pageunlinked.html",
            "http://robota/robots.txt",
            "http://hostc/page3.html",
        ]:
            assert normalize_url(u, self.F) == u

    def test_lowercase_and_force_http(self):
        assert normalize_url("HTTPS://HostA/Page1.html", self.F) == "http://hosta/Page1.html"

    def test_remove_www(self):
        assert normalize_url("http://www.hosta/page1.html", self.F) == "http://hosta/page1.html"

    def test_remove_default_port(self):
        assert normalize_url("http://hosta:80/a", self.F) == "http://hosta/a"
        assert normalize_url("https://hosta:443/a", self.F) == "http://hosta/a"

    def test_remove_trailing_slash_and_fragment(self):
        assert normalize_url("http://hosta/dir/", self.F) == "http://hosta/dir"
        assert normalize_url("http://hosta/", self.F) == "http://hosta"
        assert normalize_url("http://hosta/a#frag", self.F) == "http://hosta/a"

    def test_directory_index(self):
        assert normalize_url("http://hosta/dir/index.html", self.F) == "http://hosta/dir"
        assert normalize_url("http://hosta/index.html", self.F) == "http://hosta"
        # not a directory index
        assert normalize_url("http://hosta/indexes.html", self.F) == "http://hosta/indexes.html"

    def test_dot_segments_and_duplicate_slashes(self):
        assert normalize_url("http://hosta/a/../b/./c", self.F) == "http://hosta/b/c"
        assert normalize_url("http://hosta//a///b", self.F) == "http://hosta/a/b"

    def test_sort_query(self):
        assert (
            normalize_url("http://hosta/p?b=2&a=1&a=0", self.F)
            == "http://hosta/p?a=0&a=1&b=2"
        )

    def test_escapes(self):
        assert normalize_url("http://hosta/%7euser", self.F) == "http://hosta/~user"
        assert normalize_url("http://hosta/a%2fb", self.F) == "http://hosta/a%2Fb"

    def test_numeric_hosts(self):
        assert normalize_url("http://3221226219/p", self.F) == "http://192.0.2.235/p"
        assert normalize_url("http://0xc00002eb/p", self.F) == "http://192.0.2.235/p"
        assert (
            normalize_url("http://0300.0000.0002.0353/p", self.F)
            == "http://192.0.2.235/p"
        )

    def test_host_dots_and_empty_port(self):
        assert normalize_url("http://.hosta../p", self.F) == "http://hosta/p"
        assert normalize_url("http://hosta:/p", self.F) == "http://hosta/p"


class TestNonGreedy:
    def test_query_string_survives(self):
        # tbldef_test.go:1042-1094: FlagsUsuallySafeNonGreedy keeps ?start=60
        got = normalize_url(
            "http://www.example.com/new/?start=60", FLAGS_USUALLY_SAFE_NON_GREEDY
        )
        assert got == "http://www.example.com/new/?start=60"

    def test_add_trailing_slash(self):
        f = FLAGS_SAFE | NF.ADD_TRAILING_SLASH
        assert normalize_url("http://h/a", f) == "http://h/a/"
        assert normalize_url("http://h", f) == "http://h/"


def test_split_host_and_predicates():
    assert split_host("http://hosta:8080/x") == "hosta:8080"
    assert split_host("http://user:pw@hosta/x") == "hosta"
    assert is_robots_url("http://hosta/ROBOTS.TXT")
    assert not is_robots_url("http://hosta/robots.txt/x")
    assert is_absolute_http("https://a/b")
    assert not is_absolute_http("ftp://a/b")
    assert not is_absolute_http("page2.html")


def test_resolve_link():
    assert resolve_link("http://hosta/page1.html", "page2.html", None) == "http://hosta/page2.html"
    assert resolve_link("http://hosta/page1.html", "#x", None) is None
    assert resolve_link("http://hosta/page1.html", "", None) is None
    assert (
        resolve_link("http://hostd/page3.html", "//localhost:8080/subdir/page1.html", None)
        == "http://localhost:8080/subdir/page1.html"
    )


class TestCanonicalizeSeriesParity:
    """The vectorized canonicalize kernel (fast path + fallback) must be
    byte-identical to the per-row normalize_url oracle for every URL."""

    def _check(self, urls, flags=None):
        import pandas as pd
        from urllib.parse import urlsplit

        from crawlspark.functions.udfs import canonicalize_series
        from crawlspark.functions.urlnorm import is_absolute_http

        flags = flags or NF.all_greedy()
        res = canonicalize_series(pd.Series(urls, dtype="object"), flags)
        for i, u in enumerate(urls):
            n = normalize_url(u, flags) if u is not None else None
            got = res.iloc[i]
            assert got["url_norm"] == n, (u, got["url_norm"], n)
            if n is None:
                continue
            try:
                rp = urlsplit(u).path if u else ""
            except ValueError:
                rp = ""
            assert got["host"] == split_host(n), u
            assert got["path"] == urlsplit(n).path, u
            assert bool(got["is_robots"]) == (rp.lower() == "/robots.txt"), u
            assert bool(got["is_abs_http"]) == is_absolute_http(n), u

    def test_edge_corpus(self):
        self._check(
            [
                "http://host1.example/p3.html", "http://h.ex/", "http://h.ex",
                "http://h.ex/a/b/c", "http://HOST.ex/x", "https://s.ex/y",
                "http://www.strip.ex/z", "http://h.ex/index.html",
                "http://h.ex/a/index.html/", "http://h.ex/p?b=2&a=1",
                "http://h.ex/a//b", "http://h.ex/a/./b", "http://h.ex/a/../b",
                "http://h.ex/%7Euser", "http://h.ex:80/p", "http://h.ex:8080/p",
                "http://0x7f000001/p", "http://016.0.0.1/p", "ftp://h.ex/p",
                "not a url", "http://h.ex/robots.txt", "http://h.ex/Robots.txt",
                "http://h.ex/robots.txt/", "/relative", "", None,
                "http://u:p@h.ex/q", "http://h.ex./p", "http://h..ex/p",
                "http://h.ex/a%2Fb", "http://h.ex/p#frag", "http://a.ex/'q",
                "http://a.ex/~x!y$z", "http://a.ex/-", "http://www2.ex/ok",
                "http://wwww.ex/ok", "http://h.ex/Default.asp",
                "http://h.ex/sub/INDEX.HTM", "http://localhost/p",
                "http://h.ex/a/.hidden", "http://h.ex/a/..b/c",
            ]
        )

    def test_generated_property(self):
        # cartesian-ish generator over URL components, incl. the fast-path
        # boundary shapes
        schemes = ["http://", "https://", "HTTP://"]
        hosts = ["h.ex", "www.h.ex", "a-b.c1.ex", "0x11.ex", "h.ex:80", "H.EX"]
        paths = ["", "/", "/a", "/a/", "/a/b.html", "/index.html", "/a//b",
                 "/a/../", "/%41", "/a?x=1", "/a#f", "/~u", "/a'b", "/.d"]
        urls = [s + h + p for s in schemes for h in hosts for p in paths]
        self._check(urls)

    def test_generated_property_fast2_shapes(self):
        # the mixed-case fast path (#2) boundary: any-case scheme/host,
        # default and non-default ports, www, dot segments, sortable
        # queries with duplicate keys, fragments
        schemes = ["HTTPS://", "HtTp://", "https://", "http://"]
        hosts = ["WWW.Host7.Example", "Host7.Example", "www.h.ex",
                 "aB-c.De.Fg", "h.ex"]
        ports = ["", ":443", ":80", ":8080", ":0443"]
        paths = ["", "/", "/a/../p5.html", "/A/B.c", "/x/./y/",
                 "/a/../..", "/seg/..", "/..", "/index.html",
                 "/x/index.html/..", "/p;v=1", "/p:q@r"]
        queries = ["", "?b=2&a=1", "?a=1&a=0&b=", "?k", "?x=a+b&x=a",
                   "?=v&k=", "?A=1&a=2"]
        frags = ["", "#f", "#a/b?c"]
        urls = [
            s + h + p + pa + q + f
            for s in schemes for h in hosts[:3] for p in ports
            for pa in paths for q in queries[:4] for f in frags[:2]
        ] + [
            "http://" + h + pa + q + f
            for h in hosts for pa in paths[:6] for q in queries for f in frags
        ]
        self._check(urls)

    def test_non_greedy_flags_take_slow_path(self):
        self._check(
            ["http://h.ex/a", "http://h.ex/a/", "http://www.h.ex/p"],
            flags=FLAGS_USUALLY_SAFE_NON_GREEDY,
        )


def test_sort_query_fast_paths_match_generic():
    # the 1/2-part compare-and-swap fast paths inside _sort_query must
    # agree with the generic dict-sort on every part shape, including
    # empty keys/values, missing '=', duplicate keys, and empty parts
    from crawlspark.functions.udfs import _sort_query

    def gold(query):
        pairs = {}
        for part in query.split("&"):
            if not part:
                continue
            k, _, v = part.partition("=")
            pairs.setdefault(k, []).append(v)
        return "&".join(
            f"{k}={v}" for k in sorted(pairs) for v in sorted(pairs[k])
        )

    cases = [
        "", "a=1", "b=2&a=1", "a=1&a=0", "k=&k2=v", "=1&=0", "a&b",
        "a=1&b", "b&a=1", "x=3&x=1&x=2", "a==b&c=1", "k=v&k=v", "z=1&a",
        "=&=", "a=2&a=10", "B=1&a=2", "q=a/b&p=c:d", "a", "&", "&&",
        "a=1&", "&a=1", "==", "a==1&b=2", "k=v", "a=&a", "a1=x&a=y",
    ]
    parts = ["a=1", "b=2", "a=0", "a", "b", "", "=", "k=", "=v", "a==b", "B=0"]
    for i in range(len(parts)):
        for j in range(len(parts)):
            cases.append(parts[i] + "&" + parts[j])
    for q in cases:
        assert _sort_query(q) == gold(q), q


def test_rds_fast_matches_rfc_oracle():
    # the single-'/seg/../' substitution fast path must agree with the
    # untouched RFC 3986 oracle on every dot-segment arrangement
    from itertools import product

    from crawlspark.functions.udfs import _rds_fast
    from crawlspark.functions.urlnorm import _remove_dot_segments

    segs = ["a", "b", ".", "..", "...", "a.b", ".x", ""]
    paths = set()
    for k in range(4):
        for combo in product(segs, repeat=k):
            p = "".join("/" + s for s in combo)
            paths.add(p)
            paths.add(p + "/")
    for p in sorted(paths):
        assert _rds_fast(p) == _remove_dot_segments(p), repr(p)
