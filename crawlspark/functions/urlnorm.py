"""URL parsing, normalization, and link resolution.

The normalization re-implements (from public documentation and
observable behavior only) the purell flag semantics that the reference
uses for every URL it touches (reference: urlcontext.go:229-248 with
default flags ``FlagsAllGreedy``, options.go:17).  The base-tag and
link-resolution logic reproduces the reference's documented behavior
(reference: worker.go:363-412 ``handleBaseTag``/``processLinks``,
golden table basetag_test.go:70-148).

Everything here is pure Python (no Spark imports) so it can run both
as the pinned test oracle and inside Arrow-vectorized pandas UDFs
(see :mod:`crawlspark.functions.udfs`).
"""

from __future__ import annotations

import posixpath
import re
from urllib.parse import quote, unquote, urljoin, urlsplit, urlunsplit

from crawlspark.config import NormalizationFlags as NF

__all__ = [
    "normalize_url",
    "split_host",
    "is_robots_url",
    "is_absolute_http",
    "handle_base_tag",
    "resolve_link",
    "go_path_clean",
    "go_path_join",
]

_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
# characters that may appear raw in a path per RFC 3986 (pchar + "/")
_PATH_SAFE = "/:@!$&'()*+,;=-._~"
_QUERY_SAFE = "/:@!$&'()*+,;=-._~?"

_ESCAPE_RX = re.compile(r"%[0-9A-Fa-f]{2}")
_DIRECTORY_INDEX_RX = re.compile(r"(^|/)((?i:index|default)\.\w{1,4})$")
_DUP_SLASH_RX = re.compile(r"/{2,}")


def _fix_escapes(s: str, flags: NF) -> str:
    """Uppercase %XX escapes, decode unnecessary ones, encode necessary."""
    if not s:
        return s

    def _one(m: re.Match) -> str:
        esc = m.group(0)
        ch = chr(int(esc[1:], 16))
        if flags & NF.DECODE_UNNECESSARY_ESCAPES and ch in _UNRESERVED:
            return ch
        if flags & NF.UPPERCASE_ESCAPES:
            return esc.upper()
        return esc

    s = _ESCAPE_RX.sub(_one, s)
    if flags & NF.ENCODE_NECESSARY_ESCAPES:
        # re-encode characters that cannot appear raw; keep existing
        # %XX intact (quote treats '%' as safe so escapes survive).
        s = quote(s, safe=_PATH_SAFE + "%")
    return s


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments (trailing-slash preserving)."""
    if not path:
        return path
    output: list[str] = []
    inp = path
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if output:
                output.pop()
        elif inp == "/..":
            inp = "/"
            if output:
                output.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            i = inp.find("/", 1) if inp.startswith("/") else inp.find("/")
            if i == -1:
                output.append(inp)
                inp = ""
            else:
                output.append(inp[:i])
                inp = inp[i:]
    return "".join(output)


def _decode_numeric_host(host: str, flags: NF) -> str:
    """DWORD / octal / hex host decoding to dotted-quad."""
    bare, sep, port = host.partition(":")
    decoded = None
    if flags & NF.DECODE_DWORD_HOST and re.fullmatch(r"\d{5,20}", bare):
        try:
            n = int(bare)
            if n < 2**32:
                decoded = ".".join(str((n >> s) & 0xFF) for s in (24, 16, 8, 0))
        except ValueError:
            pass
    elif flags & NF.DECODE_HEX_HOST and re.fullmatch(r"0x[0-9A-Fa-f]+", bare):
        n = int(bare, 16)
        if n < 2**32:
            decoded = ".".join(str((n >> s) & 0xFF) for s in (24, 16, 8, 0))
    elif flags & NF.DECODE_OCTAL_HOST and re.fullmatch(
        r"0[0-7]+(\.0[0-7]+){3}", bare
    ):
        decoded = ".".join(str(int(p, 8)) for p in bare.split("."))
    if decoded is not None:
        return decoded + (sep + port if sep else "")
    return host


def normalize_url(url: str, flags: NF = NF.all_greedy()) -> str | None:
    """Normalize ``url`` per the given flag set; ``None`` on parse failure.

    Pinned against the reference's observable normalizations (every URL
    appearing in gocrawl's test asserts/logs — see tests/test_urlnorm.py).
    """
    if url is None:
        return None
    url = url.strip()
    try:
        parts = urlsplit(url)
    except ValueError:
        return None

    scheme, netloc, path, query, fragment = (
        parts.scheme,
        parts.netloc,
        parts.path,
        parts.query,
        parts.fragment,
    )

    # split netloc into userinfo + hostport
    userinfo = ""
    hostport = netloc
    if "@" in netloc:
        userinfo, hostport = netloc.rsplit("@", 1)

    if flags & NF.LOWERCASE_SCHEME:
        scheme = scheme.lower()
    if flags & NF.LOWERCASE_HOST:
        hostport = hostport.lower()

    if flags & NF.REMOVE_EMPTY_PORT_SEPARATOR and hostport.endswith(":"):
        hostport = hostport[:-1]
    if flags & NF.REMOVE_DEFAULT_PORT:
        # evaluated against the original scheme, before FORCE_HTTP
        if scheme == "http" and hostport.endswith(":80"):
            hostport = hostport[:-3]
        elif scheme == "https" and hostport.endswith(":443"):
            hostport = hostport[:-4]
    if flags & NF.FORCE_HTTP and scheme == "https":
        scheme = "http"

    hostport = _decode_numeric_host(hostport, flags)
    if flags & NF.REMOVE_UNNECESSARY_HOST_DOTS and hostport:
        bare, sep, port = hostport.partition(":")
        bare = re.sub(r"\.{2,}", ".", bare).strip(".")
        hostport = bare + (sep + port if sep else "")

    if flags & NF.REMOVE_WWW:
        bare, sep, port = hostport.partition(":")
        if bare.startswith("www.") and len(bare) > 4:
            bare = bare[4:]
        hostport = bare + (sep + port if sep else "")
    elif flags & NF.ADD_WWW:
        bare, sep, port = hostport.partition(":")
        if bare and not bare.startswith("www."):
            bare = "www." + bare
        hostport = bare + (sep + port if sep else "")

    path = _fix_escapes(path, flags)
    if flags & NF.REMOVE_DOT_SEGMENTS and hostport:
        path = _remove_dot_segments(path)
    if flags & NF.REMOVE_DUPLICATE_SLASHES:
        path = _DUP_SLASH_RX.sub("/", path)
    if flags & NF.REMOVE_DIRECTORY_INDEX:
        path = _DIRECTORY_INDEX_RX.sub(r"\1", path)

    if flags & NF.REMOVE_FRAGMENT:
        fragment = ""

    if flags & NF.SORT_QUERY and query:
        # purell rebuilds from decoded key/value pairs, keys sorted,
        # values sorted within a key, '&'-joined (public behavior).
        pairs: dict[str, list[str]] = {}
        for part in query.split("&"):
            if not part:
                continue
            k, _, v = part.partition("=")
            pairs.setdefault(unquote(k), []).append(unquote(v))
        out = []
        for k in sorted(pairs):
            for v in sorted(pairs[k]):
                out.append(f"{k}={v}")
        query = "&".join(out)

    # trailing-slash ops run last (so /dir/index.html → /dir/ → /dir)
    if flags & NF.REMOVE_TRAILING_SLASH:
        if path.endswith("/"):
            path = path[:-1]
    elif flags & NF.ADD_TRAILING_SLASH:
        if not path.endswith("/"):
            path = path + "/"

    netloc = (userinfo + "@" if userinfo else "") + hostport
    if netloc and path and not path.startswith("/"):
        path = "/" + path
    return urlunsplit((scheme, netloc, path, query, fragment))


def split_host(url: str) -> str:
    """Host (including port, excluding userinfo) of a URL; '' on failure.

    Matches the reference's use of ``url.URL.Host`` for worker routing
    and the same-host policy (crawler.go:186-195).
    """
    if not url:
        return ""
    try:
        netloc = urlsplit(url).netloc
    except ValueError:
        return ""
    if "@" in netloc:
        netloc = netloc.rsplit("@", 1)[1]
    return netloc


def is_robots_url(url: str) -> bool:
    """lower(path) == '/robots.txt' (reference: urlcontext.go:102-107)."""
    if not url:
        return False
    try:
        return urlsplit(url).path.lower() == "/robots.txt"
    except ValueError:
        return False


def is_absolute_http(url: str) -> bool:
    """Absolute URL with an http(s) scheme — the two enqueue policies of
    crawler.go:220-226 combined."""
    try:
        p = urlsplit(url)
    except ValueError:
        return False
    return bool(p.scheme) and p.scheme.startswith("http")


def go_path_clean(p: str) -> str:
    """Lexical path cleaning matching Go ``path.Clean`` semantics."""
    if not p:
        return "."
    out = posixpath.normpath(p)
    # POSIX normpath preserves a leading '//'; Go collapses it.
    if out.startswith("//"):
        out = "/" + out.lstrip("/")
    return out


def go_path_join(*elem: str) -> str:
    """Go ``path.Join``: join non-empty elements with '/', then clean."""
    parts = [e for e in elem if e]
    if not parts:
        return ""
    return go_path_clean("/".join(parts))


def handle_base_tag(root_url: str, base_href: str, a_href: str) -> str:
    """Resolve an ``a[href]`` against a page's ``base[href]``.

    Reproduces the reference's documented algorithm (worker.go:363-383):
    resolve base against the page URL; if the href is host-less and does
    not start with '/', path-join it onto the base path; then resolve
    against the resolved base.  Golden-tested against the 58-case table
    of basetag_test.go:70-148.
    """
    try:
        resolved_base = urljoin(root_url, base_href)
        parsed = urlsplit(a_href)
        if parsed.netloc == "" and not a_href.startswith("/"):
            base_path = urlsplit(resolved_base).path
            a_href = go_path_join(base_path, a_href)
        return urljoin(resolved_base, a_href)
    except ValueError:
        return ""


def resolve_link(page_url: str, href: str, base_href: str | None) -> str | None:
    """Full link resolution as done per harvested anchor
    (worker.go:391-412): apply base-tag handling when the page declares a
    base href, skip fragments-only and empty hrefs, resolve against the
    page URL."""
    if not href or href.startswith("#"):
        return None
    if base_href:
        href = handle_base_tag(page_url, base_href, href)
        if not href:
            return None
    try:
        return urljoin(page_url, href)
    except ValueError:
        return None
