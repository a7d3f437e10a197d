"""Web-corpus URL operators: canonicalization, registrable-domain
extraction, per-domain frequency capping (SURVEY §2.12 extension
family — the URL hygiene stage every Common-Crawl-style pipeline runs
before text dedup).

Everything here is pure built-in column expressions (whole-stage
codegen, zero Python on executors): URL surgery is regex/string work,
exactly what Catalyst's string intrinsics are for. The reference repo
stores raw ``profile_pic_url`` strings with no normalization
(instagram_pipeline/scraper/instagram_scraper.py keeps URLs verbatim);
a 100 TB web corpus cannot — near-identical URLs (scheme case, www,
default ports, tracking params, fragments) fragment dedup keys and
domain statistics unless canonicalized first.

Scale notes: canonicalization and domain extraction are map-only.
``domain_frequency_cap`` shuffles once on the domain; the per-domain
rank uses ``row_number`` with a rank predicate, which Spark executes
as WindowGroupLimit (partial top-N before the exchange), so a
celebrity domain with 10^8 pages ships only ``max_per_domain`` rows
per map task — the skew is bounded at the source. Domain totals are a
map-side-combined count joined back by broadcast (distinct domains are
the small side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tracking parameters stripped during canonicalization. RE2-portable
# (no lookarounds) and shared VERBATIM with the SQL oracles.
TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="
_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an http(s) URL, all built-in expressions:

    * scheme and host lowercased; ``www.`` prefix dropped
    * default ports stripped (``:80`` for http, ``:443`` for https)
    * fragment dropped
    * trailing slash of the path dropped
    * tracking query params (``TRACKING_PARAM_RE``) dropped; surviving
      params sorted byte-lexicographically and re-joined

    Deliberately conservative: path case, param repeats, and percent
    encoding are preserved (normalizing those can change semantics).
    """
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(F.regexp_replace(url, _SCHEME_RE, ""), r"#.*$", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    hostport = F.regexp_replace(hostport, r"^www\.", "")
    hostport = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    pathq = F.regexp_replace(rest, r"^[^/?#]*", "")
    path = F.regexp_replace(F.regexp_extract(pathq, r"^([^?]*)", 1), r"/$", "")
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = F.array_join(kept, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        hostport,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def registrable_domain(canonical_url: Column) -> Column:
    """Last two dot-labels of the host (``a.b.example.com`` ->
    ``example.com``), port stripped. A public-suffix list would treat
    multi-label TLDs (``.co.uk``) correctly; this engine-side default
    is PSL-free and documented as such — swap in a broadcast PSL join
    for corpora where it matters."""
    host = F.regexp_replace(
        F.regexp_extract(
            canonical_url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1
        ),
        r":[0-9]+$",
        "",
    )
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def domain_frequency_cap(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    max_per_domain: int = 3,
    mark_only: bool = False,
) -> DataFrame:
    """Keep at most ``max_per_domain`` documents per registrable domain
    (deterministically: lowest ``id_col`` first) — the standard guard
    against a single template-heavy domain dominating a training mix.

    Returns kept rows as ``(id_col, canonical_url, domain, rank,
    domain_total)``; ``domain_total`` (the pre-cap count) is what a
    sampling stage needs to reweight capped domains. With
    ``mark_only=True`` every row is returned with a ``kept`` boolean
    instead of being filtered (audit mode — also disables the
    WindowGroupLimit pushdown the rank predicate otherwise enables, so
    production capping should use the default)."""
    canon = df.select(
        F.col(id_col),
        canonicalize_url(F.col(url_col)).alias("canonical_url"),
    ).withColumn("domain", registrable_domain(F.col("canonical_url")))
    totals = canon.groupBy("domain").agg(
        F.count("*").alias("domain_total")
    )
    w = Window.partitionBy("domain").orderBy(id_col)
    ranked = canon.withColumn("rank", F.row_number().over(w))
    if mark_only:
        return ranked.withColumn(
            "kept", F.col("rank") <= max_per_domain
        ).join(F.broadcast(totals), "domain").select(
            id_col, "canonical_url", "domain", "rank", "domain_total",
            "kept",
        )
    kept = ranked.filter(F.col("rank") <= max_per_domain)
    return kept.join(F.broadcast(totals), "domain").select(
        id_col, "canonical_url", "domain", "rank", "domain_total"
    )


def extract_links(html: Column) -> Column:
    """All ``<a href="...">`` targets of an HTML page, in document
    order, as ``array<string>`` — the edge emitter for the crawl link
    graph (pure codegen; no parser on the executor). Double-quoted
    hrefs only: the corpus synthesizer's contract here; a production
    extractor extends the same regexp alternation with single-quote /
    unquoted forms."""
    return F.regexp_extract_all(html, F.lit('<a href="([^"]+)"'), 1)


def url_path(canonical_url: Column) -> Column:
    """Path component of a canonical URL (``/`` for the empty root) —
    the match key for robots prefix rules."""
    p = F.regexp_extract(
        canonical_url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    return F.when(p == "", F.lit("/")).otherwise(p)


def robots_exclusion(
    df: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Longest-prefix robots-rule matching: the crawl-compliance filter.

    ``rules`` is ``(domain, prefix, allow)`` — the parsed Allow/
    Disallow lines of each domain's robots.txt. Per URL, every rule of
    its registrable domain whose ``prefix`` starts the canonical path
    competes; the MOST SPECIFIC (longest prefix) wins and on equal
    length Allow beats Disallow — the Google/RFC 9309 precedence. URLs
    with no matching rule are allowed.

    Scale shape: the rule table is robots.txt-sized (small) and rides
    as a broadcast LEFT join (map-side — unmatched URLs survive with a
    null rule), so the whole pipeline is map work plus ONE shuffle:
    the per-URL argmax ``max(struct(len, allow, prefix))`` groupBy.
    Candidate fan-out is bounded by rules-per-domain, never by corpus
    size; no window, no join back against the corpus."""
    canon = (
        df.select(
            F.col(id_col),
            canonicalize_url(F.col(url_col)).alias("canonical_url"),
        )
        .withColumn("domain", registrable_domain(F.col("canonical_url")))
        .withColumn("path", url_path(F.col("canonical_url")))
    )
    cand = canon.join(
        F.broadcast(rules),
        (canon["domain"] == rules["domain"])
        & canon["path"].startswith(rules["prefix"]),
        "left",
    ).select(
        canon[id_col],
        canon["domain"],
        canon["path"],
        rules["prefix"],
        rules["allow"],
    )
    # max ignores the all-null struct of unmatched URLs -> null winner
    return cand.groupBy(id_col).agg(
        F.first("domain").alias("domain"),
        F.first("path").alias("path"),
        F.max(
            F.when(
                F.col("prefix").isNotNull(),
                F.struct(
                    F.length("prefix").alias("l"),
                    F.col("allow").alias("allow"),
                    F.col("prefix").alias("prefix"),
                ),
            )
        ).alias("w"),
    ).select(
        id_col,
        "domain",
        "path",
        F.col("w.prefix").alias("matched_prefix"),
        F.coalesce(F.col("w.allow"), F.lit(True)).alias("allowed"),
    )
