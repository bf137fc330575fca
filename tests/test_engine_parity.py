"""End-to-end crawl parity vs the reference's table-driven expectations
(FIXTURES.md §4 / tbldef_test.go).  Counter semantics: Filter counts
every candidate evaluation including duplicates; Enqueued includes
robots.txt enqueues; Visit counts 2xx visits only."""

import pytest
from pyspark.sql import functions as F

from crawlspark.config import Options
from crawlspark.plans.engine import CrawlEngine
from crawlspark.plans.extender import Extender

DELAY = 100  # DefaultTestCrawlDelay (assert_test.go:10-12)


def run_crawl(spark, fixture_pages, seeds, opts=None, ext=None):
    opts = opts or Options(crawl_delay_ms=DELAY)
    eng = CrawlEngine(spark, fixture_pages, opts, ext)
    return eng.run(seeds)


def visit_order(res, host):
    rows = (
        res.visit_log.filter(F.col("host") == host)
        .orderBy("seq")
        .select("url_norm")
        .collect()
    )
    return [r[0] for r in rows]


class TestFlagship:
    """SURVEY §7 step 5 — the ONE real query: crawl hosta from page1."""

    @pytest.fixture(scope="class")
    def res(self, spark, fixture_pages):
        return run_crawl(spark, fixture_pages, ["http://hosta/page1.html"])

    def test_no_visitor_func_counts(self, res):
        # NoVisitorFunc (tbldef_test.go:541-554): Visit=3, Filter=10
        assert res.counters.visit == 3
        assert res.counters.filter == 10

    def test_visited_count_and_order(self, res):
        # VisitedCount (tbldef_test.go:139-152): 3 visits in FIFO order
        assert res.counters.visited == 3
        assert visit_order(res, "hosta") == [
            "http://hosta/page1.html",
            "http://hosta/page2.html",
            "http://hosta/page3.html",
        ]

    def test_seen_set(self, res):
        # page1..3 admitted+marked; hostb/page1 is cross-host → never stacked
        seen = {r[0] for r in res.seen.select("url_norm").collect()}
        assert seen == {
            "http://hosta/page1.html",
            "http://hosta/page2.html",
            "http://hosta/page3.html",
        }

    def test_end_no_error(self, res):
        assert res.err is None
        assert res.counters.end == 1


class TestSameHostMatrix:
    def test_all_same_host(self, spark, fixture_pages):
        # AllSameHost (tbldef_test.go:44-59): Visit=5, Filter=13
        res = run_crawl(
            spark,
            fixture_pages,
            ["http://hosta/page1.html", "http://hosta/page4.html"],
        )
        assert res.counters.visit == 5
        assert res.counters.filter == 13

    def test_all_not_same_host(self, spark, fixture_pages):
        # AllNotSameHost (tbldef_test.go:61-76): Visit=10, Filter=24
        res = run_crawl(
            spark,
            fixture_pages,
            ["http://hosta/page1.html", "http://hosta/page4.html"],
            Options(crawl_delay_ms=DELAY, same_host_only=False),
        )
        assert res.counters.visit == 10
        assert res.counters.filter == 24

    def test_select_only_page1s(self, spark, fixture_pages):
        # SelectOnlyPage1s (tbldef_test.go:78-102): Visit=3, Filter=11
        ext = Extender(
            filter_factory=lambda df, visited: (~visited)
            & (F.col("path") == "/page1.html")
        )
        res = run_crawl(
            spark,
            fixture_pages,
            [
                "http://hosta/page1.html",
                "http://hosta/page4.html",
                "http://hostb/pageunlinked.html",
            ],
            Options(crawl_delay_ms=DELAY, same_host_only=False),
            ext,
        )
        assert res.counters.visit == 3
        assert res.counters.filter == 11
