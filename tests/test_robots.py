"""Robots semantics parity (fixtures testdata/robot{a,b,c}/robots.txt,
expectations tbldef_test.go:569-667)."""

from crawlspark.config import DEFAULT_ROBOT_USER_AGENT
from crawlspark.functions.robots import (
    match_rows,
    parse_robots,
    robots_from_status_and_body,
    rules_to_rows,
)

ROBOTA = "User-agent: *\nDisallow: /\n"
ROBOTB = "User-agent: Googlebot\nDisallow: /page2.html\n"
ROBOTC = (
    "User-agent: *\nDisallow: /\n\n"
    "User-agent: Googlebot\nAllow: /\ncrawl-delay: 0.2\n"
)


def test_robota_deny_all():
    r = parse_robots(ROBOTA)
    assert not r.allowed(DEFAULT_ROBOT_USER_AGENT, "/page1.html")
    assert not r.allowed("anybot", "/")


def test_robotb_partial_deny_googlebot():
    r = parse_robots(ROBOTB)
    # default agent 'Googlebot (gocrawl v0.4)' matches group 'Googlebot'
    assert r.allowed(DEFAULT_ROBOT_USER_AGENT, "/page1.html")
    assert not r.allowed(DEFAULT_ROBOT_USER_AGENT, "/page2.html")
    # 'NotGoogleBot' must NOT match (prefix, not substring) → no group → allow
    assert r.allowed("NotGoogleBot", "/page2.html")


def test_robotc_explicit_allow_and_crawl_delay():
    r = parse_robots(ROBOTC)
    assert r.allowed(DEFAULT_ROBOT_USER_AGENT, "/page2.html")
    assert r.crawl_delay_ms(DEFAULT_ROBOT_USER_AGENT) == 200
    assert not r.allowed("otherbot", "/page1.html")


def test_status_handling():
    assert robots_from_status_and_body(404, None).allowed("x", "/a")
    assert not robots_from_status_and_body(401, None).allowed("x", "/a")
    assert not robots_from_status_and_body(403, None).allowed("x", "/a")
    assert not robots_from_status_and_body(500, None).allowed("x", "/a")
    assert robots_from_status_and_body(200, "garbage ::: lines").allowed("x", "/a")


def test_longest_match_allow_wins_ties():
    body = "User-agent: *\nDisallow: /dir/\nAllow: /dir/open\n"
    r = parse_robots(body)
    assert not r.allowed("bot", "/dir/x")
    assert r.allowed("bot", "/dir/open/x")
    assert r.allowed("bot", "/other")


def test_wildcards_and_anchor():
    body = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*\n"
    r = parse_robots(body)
    assert not r.allowed("bot", "/a/b.pdf")
    assert r.allowed("bot", "/a/b.pdfx")
    assert not r.allowed("bot", "/tmp/x")


def test_empty_disallow_allows_all():
    r = parse_robots("User-agent: *\nDisallow:\n")
    assert r.allowed("bot", "/anything")


def test_cached_robots_bytes():
    # CachedRobot case (tbldef_test.go:647-667): body 'Disallow:/page2.html'
    # with no User-agent line → implicit '*' group
    r = parse_robots("Disallow:/page2.html")
    assert r.allowed(DEFAULT_ROBOT_USER_AGENT, "/page1.html")
    assert not r.allowed(DEFAULT_ROBOT_USER_AGENT, "/page2.html")


def test_rows_roundtrip():
    for body, path, want in [
        (ROBOTA, "/page1.html", False),
        (ROBOTB, "/page2.html", False),
        (ROBOTB, "/page1.html", True),
        (ROBOTC, "/page2.html", True),
    ]:
        rows = rules_to_rows(parse_robots(body), DEFAULT_ROBOT_USER_AGENT)
        assert match_rows(rows, path) == want, (body, path)
    rows = rules_to_rows(robots_from_status_and_body(404, None), "x")
    assert match_rows(rows, "/a") is True
    rows = rules_to_rows(robots_from_status_and_body(403, None), "x")
    assert match_rows(rows, "/a") is False
