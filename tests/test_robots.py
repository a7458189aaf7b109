"""robots.txt parser (J-2 upstream): REP-subset semantics + integration
with the politeness join."""

from pyspark.sql import functions as F

from cdx_toolkit_spark.frontier import politeness
from cdx_toolkit_spark.frontier.robots import parse_robots
from cdx_toolkit_spark.frontier.scheduler import prepare

BODY = """# global notes
User-agent: fancybot
Disallow: /secret
Crawl-delay: 9

User-agent: *
Crawl-delay: 2.5
Disallow: /private   # trailing comment
Disallow:
Disallow: /tmp

User-agent: *
Disallow: /also
Crawl-delay: 7
"""


def test_parse_robots_semantics(spark):
    bodies = spark.createDataFrame(
        [
            ("a.com", BODY),
            ("b.com", "User-agent: onlybot\nDisallow: /x\n"),
            ("c.com", ""),
        ],
        "host string, body string",
    )
    out = {r["host"]: r for r in parse_robots(bodies).collect()}
    a = out["a.com"]
    # both * groups merge; min crawl-delay wins; fancybot rules don't leak;
    # empty Disallow ignored; comments stripped; prefixes sorted
    assert a["crawl_delay_s"] == 2.5
    assert a["disallow_prefixes"] == ["/also", "/private", "/tmp"]
    # no * group / empty body -> defaults
    assert out["b.com"]["crawl_delay_s"] == 3.0
    assert out["b.com"]["disallow_prefixes"] == []
    assert out["c.com"]["crawl_delay_s"] == 3.0


def test_parsed_rules_drive_politeness(spark):
    bodies = spark.createDataFrame(
        [("slow.com", "User-agent: *\nCrawl-delay: 10\nDisallow: /blocked\n")],
        "host string, body string",
    )
    rules = parse_robots(bodies)
    cands = spark.createDataFrame(
        [("http://slow.com/ok", 0, 1), ("http://slow.com/blocked/x", 0, 2),
         ("http://other.org/y", 0, 3)],
        "url string, priority int, discovered_ts long",
    )
    polite = politeness.attach_robots(prepare(cands), rules)
    rows = {r["url"]: r for r in polite.collect()}
    assert "http://slow.com/blocked/x" not in rows  # disallowed url dropped
    assert rows["http://slow.com/ok"]["crawl_delay_s"] == 10.0
    assert rows["http://other.org/y"]["crawl_delay_s"] == 3.0  # default
