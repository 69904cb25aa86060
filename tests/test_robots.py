"""Robots Exclusion Protocol ops (ops/robots.py): RFC 9309 grammar
cases on the pure parser, verdict semantics (longest match, allow
ties, agent-group selection, wildcards/$), and the page-side plan
shape (no Python, no page re-shuffle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gojsonschema_spark.ops.robots import (
    crawl_allowed, parse_robots, parse_robots_text)


def test_parse_robots_text_grammar():
    body = (
        "# top comment\n"
        "User-Agent: A\n"
        "user-agent: B\n"          # same group, two agents
        "Disallow: /x  # trailing comment\n"
        "Allow: /x/ok\n"
        "Crawl-delay: 10\n"        # unknown field ignored
        "User-agent: C\n"          # rules seen -> NEW group
        "Disallow:\n"              # empty pattern -> no rule
        "Sitemap: https://s/map.xml\n"
        "not a field line\n"
        "User-agent: D\n"
        "DISALLOW: /d$\n")
    got = parse_robots_text(body)
    assert got == [
        ("a", False, "/x"), ("b", False, "/x"),
        ("a", True, "/x/ok"), ("b", True, "/x/ok"),
        ("d", False, "/d$"),
    ]
    assert parse_robots_text("") == []


_BODIES = {
    "a.com": "User-agent: *\nDisallow: /private/\nAllow: /private/ok/\n",
    "b.com": "User-agent: spark-bot\nDisallow: /\n\n"
             "User-agent: *\nDisallow:\n",
    "c.com": "User-agent: *\nDisallow: /*.json$\nDisallow: /tmp*trash\n",
    "t.com": "User-agent: *\nAllow: /p\nDisallow: /p\n",   # tie -> allow
}


def _verdicts(spark, agent):
    robots = spark.createDataFrame(list(_BODIES.items()),
                                   ["host", "robots_txt"])
    urls = [
        "https://a.com/public/x", "https://a.com/private/x",
        "https://a.com/private/ok/y",
        "https://b.com/anything",
        "https://c.com/d/f.json", "https://c.com/d/f.jsonx",
        "https://c.com/tmp/deep/trash-can",
        "https://t.com/p", "https://d.com/norules",
        "https://c.com/d/q.json?x=1#frag",
    ]
    pages = spark.createDataFrame([(u,) for u in urls], ["url"])
    out = crawl_allowed(pages, parse_robots(robots), agent=agent)
    return {r.url: r.allowed for r in out.collect()}

def test_crawl_allowed_semantics(spark):
    got = _verdicts(spark, "Spark-Bot")
    assert got["https://a.com/public/x"]
    assert not got["https://a.com/private/x"]
    assert got["https://a.com/private/ok/y"]      # longer allow wins
    assert not got["https://b.com/anything"]      # specific group
    assert not got["https://c.com/d/f.json"]      # $ anchor
    assert got["https://c.com/d/f.jsonx"]         # past the anchor
    assert not got["https://c.com/tmp/deep/trash-can"]  # mid-pattern *
    assert got["https://t.com/p"]                 # length tie -> allow
    assert got["https://d.com/norules"]           # no robots -> allowed
    # the query participates in matching (so the $-anchored pattern no
    # longer matches), the fragment does not
    assert got["https://c.com/d/q.json?x=1#frag"]
    # other agents use b.com's * group (empty disallow = allow all)
    other = _verdicts(spark, "other-bot")
    assert other["https://b.com/anything"]
    assert not other["https://a.com/private/x"]   # * group still applies


def test_crawl_allowed_query_matching(spark):
    robots = spark.createDataFrame(
        [("q.com", "User-agent: *\nDisallow: /s?bad=1\n")],
        ["host", "robots_txt"])
    pages = spark.createDataFrame(
        [("https://q.com/s?bad=1&x=2",), ("https://q.com/s?good=1",),
         ("https://q.com",)],          # authority-only -> path "/"
        ["url"])
    out = {r.url: r.allowed
           for r in crawl_allowed(pages, parse_robots(robots),
                                  agent="x").collect()}
    assert not out["https://q.com/s?bad=1&x=2"]
    assert out["https://q.com/s?good=1"]
    assert out["https://q.com"]


def test_crawl_allowed_plan_shape(spark):
    """Pages never meet Python and are shuffled at most once (the host
    join); the verdict is a map-side aggregate over the rule array."""
    rules = spark.createDataFrame(
        [("a.com", "*", False, "/p")],
        "host string, agent string, allow boolean, pattern string")
    pages = spark.createDataFrame([("https://a.com/p",)], ["url"])
    plan = crawl_allowed(pages, rules, agent="x")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in plan
    # no aggregation on the page side: the only groupBy is the rules'
    # per-host collect_list
    assert plan.count("HashAggregate") <= 4   # rules-side partial+final x2
