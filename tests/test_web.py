"""URL canonicalization and per-domain frequency-cap semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from instagram_data_pipeline_spark.extensions.web import (
    canonicalize_url,
    domain_frequency_cap,
    registrable_domain,
)


def _canon(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [
        r.c for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]


CASES = [
    # scheme + host case, www, fragment
    ("HTTPS://WWW.Example.COM/Path#frag", "https://example.com/Path"),
    # default ports stripped per scheme; explicit ports kept
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:443/a", "http://example.com:443/a"),
    ("https://example.com:8080/a", "https://example.com:8080/a"),
    # trailing slash
    ("https://example.com/a/", "https://example.com/a"),
    # tracking params stripped, survivors sorted; empty query dropped
    (
        "https://example.com/a?utm_source=x&b=2&a=1&fbclid=zz",
        "https://example.com/a?a=1&b=2",
    ),
    ("https://example.com/a?utm_campaign=only", "https://example.com/a"),
    # path case preserved (deliberately conservative)
    ("https://example.com/CaseSensitive", "https://example.com/CaseSensitive"),
    # www stripped only as a host prefix, not inside the host
    ("https://notwww.example.com/x", "https://notwww.example.com/x"),
]


def test_canonicalize_url_cases(spark):
    got = _canon(spark, [u for u, _ in CASES])
    for (url, want), g in zip(CASES, got):
        assert g == want, url


def test_canonicalize_idempotent(spark):
    once = _canon(spark, [u for u, _ in CASES])
    twice = _canon(spark, once)
    assert once == twice


def test_registrable_domain_strips_subdomains_and_port(spark):
    df = spark.createDataFrame(
        [
            ("https://a.b.example.com/x", "example.com"),
            ("https://example.org:8080/x", "example.org"),
            ("https://example.net", "example.net"),
        ],
        ["url", "want"],
    )
    rows = df.select(
        registrable_domain(canonicalize_url(F.col("url"))).alias("got"),
        "want",
    ).collect()
    assert all(r.got == r.want for r in rows)


@pytest.fixture()
def url_corpus(spark):
    rows = [
        (i, f"https://www.big.example.com/page/{i}") for i in range(10)
    ] + [
        (100 + i, f"https://small{i}.example.org/only") for i in range(2)
    ]
    return spark.createDataFrame(rows, ["doc_id", "url"])


def test_domain_cap_keeps_lowest_ids(spark, url_corpus):
    kept = domain_frequency_cap(url_corpus, max_per_domain=3).collect()
    by_domain = {}
    for r in kept:
        by_domain.setdefault(r.domain, []).append(r)
    com = sorted(by_domain["example.com"], key=lambda r: r.rank)
    assert [r.doc_id for r in com] == [0, 1, 2]
    assert all(r.domain_total == 10 for r in com)
    org = by_domain["example.org"]
    assert {r.doc_id for r in org} == {100, 101}
    assert all(r.domain_total == 2 for r in org)


def test_domain_cap_mark_only_flags_all_rows(spark, url_corpus):
    marked = domain_frequency_cap(
        url_corpus, max_per_domain=3, mark_only=True
    ).collect()
    assert len(marked) == 12
    assert sum(r.kept for r in marked) == 5
    filtered = {
        r.doc_id
        for r in domain_frequency_cap(url_corpus, max_per_domain=3).collect()
    }
    assert {r.doc_id for r in marked if r.kept} == filtered


def test_domain_cap_rank_pushdown_plan(spark, url_corpus):
    """Production mode (filtered rank) must compile to WindowGroupLimit
    so hot domains are bounded before the exchange."""
    df = domain_frequency_cap(url_corpus, max_per_domain=3)
    explained = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in explained


# ---------------------------------------------------------------------------
# robots_exclusion / extract_links / ngram_novelty (round 5)
# ---------------------------------------------------------------------------
def _robots(spark, urls, rules):
    from instagram_data_pipeline_spark.extensions.web import robots_exclusion

    udf = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    rdf = spark.createDataFrame(
        rules, "domain string, prefix string, allow boolean"
    )
    out = robots_exclusion(udf, rdf)
    return {r.doc_id: r for r in out.collect()}


def test_robots_longest_prefix_wins(spark):
    rules = [("ex.com", "/", False), ("ex.com", "/pub", True)]
    got = _robots(
        spark,
        ["http://ex.com/pub/x", "http://ex.com/private"],
        rules,
    )
    assert got[0].allowed and got[0].matched_prefix == "/pub"
    assert not got[1].allowed and got[1].matched_prefix == "/"


def test_robots_allow_beats_disallow_on_equal_length(spark):
    rules = [("ex.com", "/a", False), ("ex.com", "/a", True)]
    got = _robots(spark, ["http://ex.com/a/x"], rules)
    assert got[0].allowed


def test_robots_unmatched_defaults_to_allowed(spark):
    got = _robots(
        spark, ["http://other.org/x"], [("ex.com", "/", False)]
    )
    assert got[0].allowed and got[0].matched_prefix is None


def test_robots_matches_canonical_path_not_raw(spark):
    # trailing slash + fragment are canonicalized away before matching
    rules = [("ex.com", "/a/b", False)]
    got = _robots(spark, ["HTTP://EX.com:80/a/b/#frag"], rules)
    assert not got[0].allowed and got[0].path == "/a/b"


def test_extract_links_order_and_contract(spark):
    from pyspark.sql import functions as F

    from instagram_data_pipeline_spark.extensions.web import extract_links

    df = spark.createDataFrame(
        [('<p><a href="/a">x</a><b></b><a href="/b">y</a></p>',)],
        "html string",
    )
    got = df.select(extract_links(F.col("html")).alias("l")).first().l
    assert list(got) == ["/a", "/b"]


def test_ngram_novelty_first_owner_and_copy(spark):
    from instagram_data_pipeline_spark.extensions.dedup import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),     # introduces everything
            (2, "alpha beta gamma delta"),     # exact copy: 0 novel
            (3, "alpha beta gamma epsilon"),   # 1 of 2 shingles novel
            (4, "xy"),                         # < 3 tokens: drops out
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_shingles, r.novelty_ppm)
        for r in ngram_novelty(docs, "doc_id", "text", n=3).collect()
    }
    assert got[1] == (2, 1000000)
    assert got[2] == (2, 0)
    assert got[3] == (2, 500000)
    assert 4 not in got
