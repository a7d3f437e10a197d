"""Web-corpus queries (SURVEY §2.12 extension family): URL
canonicalization, per-domain frequency capping, robots exclusion,
link-graph extraction, per-site quality rollups, crawl-frontier
politeness, training-shard export — all over deterministic messy URLs
and pages synthesized from the documents table.

The synthesis deliberately scatters every kind of URL mess the
canonicalizer must fix — scheme case, ``www.``, default vs explicit
ports, trailing slashes, tracking params in both orders, fragments —
keyed off md5 channels so Spark and the DuckDB oracle build the SAME
messy strings (hosts like ``www.Blog.p12.Site-src5.com``: per-doc
variety lives in the subdomain so every canonical URL is distinct,
while the registrable domain ``site-src5.{tld}`` spans only
source x tld combos — small enough that the cap genuinely bites).
Both engines then run their own full canonicalize -> domain ->
consumer pipeline (the shared ``_CANON_CTES`` chain on the SQL side),
and the cap query runs in mark_only audit mode so EVERY row is
returned with its kept flag. A hash-green row therefore proves the
entire regex chain behaves identically, not just the happy path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_testdata
from . import register

_CAP = 3


def _chan(i: int):
    """md5 hex pair i (0-based) of the doc text as int, Spark side."""
    return F.conv(F.substring("x", 1 + 2 * i, 2), 16, 10).cast("int")


def _duck_chan(i: int) -> str:
    # hex-pair -> int, engine-portable (strpos arithmetic; no 0x casts)
    a, b = 1 + 2 * i, 2 + 2 * i
    return (
        f"((strpos('0123456789abcdef', substr(x, {a}, 1)) - 1) * 16"
        f" + strpos('0123456789abcdef', substr(x, {b}, 1)) - 1)"
    )


def synthesize_messy_urls(docs: DataFrame, keep: tuple = ()) -> DataFrame:
    """documents -> (doc_id, url): deterministic messy URL per doc.
    ``keep`` carries extra document columns through, so a consumer that
    needs them (e.g. the per-domain quality rollup) stays map-only
    instead of joining back on doc_id."""
    hexed = docs.select(
        "doc_id",
        "source",
        *keep,
        F.md5(F.coalesce(F.col("text"), F.lit("")).cast("binary")).alias("x"),
    ).select(
        "doc_id",
        "source",
        *keep,
        *[_chan(i).alias(f"c{i}") for i in range(8)],
    )
    scheme = F.when(F.col("c0") % 2 == 0, F.lit("http")).otherwise(
        F.lit("HTTPS")
    )
    www = F.when(F.col("c1") % 2 == 0, F.lit("www.")).otherwise(F.lit(""))
    tld = (
        F.when(F.col("c2") % 3 == 0, F.lit("com"))
        .when(F.col("c2") % 3 == 1, F.lit("org"))
        .otherwise(F.lit("net"))
    )
    sub = (
        F.when(F.col("c7") % 3 == 0, F.lit("Blog."))
        .when(F.col("c7") % 3 == 1, F.lit("news."))
        .otherwise(F.lit(""))
    )
    host = F.concat(
        sub, F.lit("p"), F.col("doc_id") % 37, F.lit(".Site-"),
        F.col("source"), F.lit("."), tld,
    )
    port = (
        F.when(
            F.col("c3") % 4 == 0,
            F.when(F.col("c0") % 2 == 0, F.lit(":80")).otherwise(
                F.lit(":443")
            ),
        )
        .when(F.col("c3") % 4 == 1, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    path = F.concat(
        F.lit("/post/"), F.col("doc_id"),
        F.when(F.col("c4") % 2 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    query = (
        F.when(
            F.col("c5") % 3 == 0,
            F.concat(F.lit("?utm_source=feed&id="), F.col("doc_id")),
        )
        .when(
            F.col("c5") % 3 == 1,
            F.concat(
                F.lit("?id="), F.col("doc_id"), F.lit("&utm_campaign=x&b=2")
            ),
        )
        .otherwise(F.lit(""))
    )
    frag = F.when(F.col("c6") % 2 == 0, F.lit("#frag")).otherwise(F.lit(""))
    return hexed.select(
        "doc_id",
        *keep,
        F.concat(
            scheme, F.lit("://"), www, host, port, path, query, frag
        ).alias("url"),
    )


# The oracle rebuilds the same messy URL, then mirrors
# extensions.web.canonicalize_url / registrable_domain /
# domain_frequency_cap expression-for-expression. All regexes are
# anchored, so Spark's replace-all and DuckDB's replace-first agree.
# The chain up to `canon` (messy synthesis -> canonical_url + domain)
# is shared by url_frequency_cap / robots_exclusion /
# domain_quality_rollup below.
_CANON_CTES = f"""h AS (
  SELECT doc_id, source, md5(COALESCE(text, '')) AS x FROM documents
), c AS (
  SELECT doc_id, source,
         {_duck_chan(0)} AS c0, {_duck_chan(1)} AS c1,
         {_duck_chan(2)} AS c2, {_duck_chan(3)} AS c3,
         {_duck_chan(4)} AS c4, {_duck_chan(5)} AS c5,
         {_duck_chan(6)} AS c6, {_duck_chan(7)} AS c7
  FROM h
), u AS (
  SELECT doc_id,
    (CASE WHEN c0 % 2 = 0 THEN 'http' ELSE 'HTTPS' END) || '://'
    || (CASE WHEN c1 % 2 = 0 THEN 'www.' ELSE '' END)
    || (CASE WHEN c7 % 3 = 0 THEN 'Blog.'
             WHEN c7 % 3 = 1 THEN 'news.' ELSE '' END)
    || 'p' || (doc_id % 37) || '.Site-' || source || '.'
    || (CASE WHEN c2 % 3 = 0 THEN 'com'
             WHEN c2 % 3 = 1 THEN 'org' ELSE 'net' END)
    || (CASE WHEN c3 % 4 = 0
             THEN (CASE WHEN c0 % 2 = 0 THEN ':80' ELSE ':443' END)
             WHEN c3 % 4 = 1 THEN ':8080' ELSE '' END)
    || '/post/' || doc_id
    || (CASE WHEN c4 % 2 = 0 THEN '/' ELSE '' END)
    || (CASE WHEN c5 % 3 = 0 THEN '?utm_source=feed&id=' || doc_id
             WHEN c5 % 3 = 1 THEN '?id=' || doc_id || '&utm_campaign=x&b=2'
             ELSE '' END)
    || (CASE WHEN c6 % 2 = 0 THEN '#frag' ELSE '' END) AS url
  FROM c
), split1 AS (
  SELECT doc_id,
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    regexp_replace(
      regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
      '#.*$', '') AS rest
  FROM u
), split2 AS (
  SELECT doc_id, scheme,
    regexp_replace(lower(regexp_extract(rest, '^([^/?#]*)', 1)),
                   '^www\\.', '') AS hp0,
    regexp_replace(rest, '^[^/?#]*', '') AS pathq
  FROM split1
), split3 AS (
  SELECT doc_id, scheme,
    CASE WHEN scheme = 'http' THEN regexp_replace(hp0, ':80$', '')
         WHEN scheme = 'https' THEN regexp_replace(hp0, ':443$', '')
         ELSE hp0 END AS hostport,
    regexp_replace(regexp_extract(pathq, '^([^?]*)', 1), '/$', '') AS path,
    COALESCE(regexp_extract(pathq, '\\?(.*)$', 1), '') AS q
  FROM split2
), split4 AS (
  SELECT doc_id, scheme, hostport, path,
    COALESCE(array_to_string(list_sort(list_filter(
      string_split(q, '&'),
      p -> p <> '' AND NOT regexp_matches(
        p, '^(utm_[a-z]+|fbclid|gclid|msclkid|ref)='))), '&'), '') AS qs
  FROM split3
), canon AS (
  SELECT doc_id,
    scheme || '://' || hostport || path
      || (CASE WHEN qs <> '' THEN '?' || qs ELSE '' END) AS canonical_url,
    regexp_extract(regexp_replace(hostport, ':[0-9]+$', ''),
                   '([^.]+\\.[^.]+)$', 1) AS domain
  FROM split4
)"""

_URL_ORACLE = f"""
WITH {_CANON_CTES}, ranked AS (
  SELECT doc_id, canonical_url, domain,
    ROW_NUMBER() OVER (PARTITION BY domain ORDER BY doc_id) AS rank,
    COUNT(*) OVER (PARTITION BY domain) AS domain_total
  FROM canon
)
SELECT doc_id, canonical_url, domain, CAST(rank AS INT) AS rank,
       domain_total, rank <= {_CAP} AS kept
FROM ranked
"""


@register(
    "url_frequency_cap",
    _URL_ORACLE,
    doc="URL hygiene for a web corpus: canonicalize (scheme/host case, "
        "www, default ports, fragments, trailing slash, tracking-param "
        "strip + sort) then keep at most "
        f"{_CAP} docs per registrable domain with pre-cap totals for "
        "reweighting — pure codegen map work plus one domain shuffle "
        "with WindowGroupLimit bounding hot domains at the source",
    tags=("web", "url", "dedup"),
)
def q_url_frequency_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.web import domain_frequency_cap

    docs = load_testdata(spark, sf_dir, "documents")
    urls = synthesize_messy_urls(docs)
    marked = domain_frequency_cap(
        urls, url_col="url", id_col="doc_id", max_per_domain=_CAP,
        mark_only=True,
    )
    return marked.select(
        "doc_id", "canonical_url", "domain",
        F.col("rank").cast("int").alias("rank"), "domain_total", "kept",
    )


# ---------------------------------------------------------------------------
# Training-shard export layout (extensions.export): the deterministic
# global shuffle + shard assignment every training run consumes. The
# query materializes the per-shard MANIFEST (counts + order-insensitive
# content checksum + order-SENSITIVE layout checksum): a hash-green row
# proves shard membership AND the within-shard shuffle order are
# engine-reproducible — the property that makes the export replayable.
# ---------------------------------------------------------------------------

_N_SHARDS = 8
_HASH_MOD = 1 << 52


def _duck_hex13(expr: str) -> str:
    """First 13 md5 hex digits as a bigint via strpos arithmetic
    (mirrors extensions.export.shuffle_hash; no 0x casts in DuckDB)."""
    parts = [
        f"(strpos('0123456789abcdef', substr({expr}, {i + 1}, 1)) - 1)"
        f" * {16 ** (12 - i)}"
        for i in range(13)
    ]
    return "(" + " + ".join(parts) + ")"


_SHARDS_ORACLE = f"""
WITH hs AS (
  SELECT doc_id, n_chars,
         md5('0:' || CAST(doc_id AS VARCHAR)) AS m
  FROM documents
), k AS (
  SELECT doc_id, n_chars, {_duck_hex13('m')} AS h FROM hs
), p AS (
  SELECT CAST(h % {_N_SHARDS} AS INT) AS shard, n_chars, h,
         ROW_NUMBER() OVER (
           PARTITION BY h % {_N_SHARDS} ORDER BY h, doc_id
         ) - 1 AS pos
  FROM k
)
SELECT shard,
       COUNT(*) AS n_rows,
       CAST(SUM(h % {_HASH_MOD}) % {_HASH_MOD} AS BIGINT) AS content_sum,
       CAST(SUM(((pos + 1) * (h % {1 << 20})) % {_HASH_MOD})
            % {_HASH_MOD} AS BIGINT) AS layout_sum,
       CAST(SUM(n_chars) AS BIGINT) AS n_tokens
FROM p GROUP BY shard
"""


@register(
    "training_shards",
    _SHARDS_ORACLE,
    doc="deterministic training-export layout: md5 shuffle hash assigns "
        f"every doc a shard (of {_N_SHARDS}) and a within-shard shuffled "
        "position, both pure functions of (id, seed); the manifest's "
        "order-sensitive layout checksum hash-matches the SQL replay, "
        "proving the full shuffle layout is engine-reproducible — "
        "map-only assignment plus one shard exchange",
    tags=("export", "sampling", "shards"),
)
def q_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.export import assign_shards, shard_manifest

    docs = load_testdata(spark, sf_dir, "documents")
    sharded = assign_shards(
        docs, id_col="doc_id", n_shards=_N_SHARDS, seed=0
    )
    return shard_manifest(sharded, id_col="doc_id", token_col="n_chars")


# ---------------------------------------------------------------------------
# WARC archive round trip (sources/warc.py): documents serialize into
# spec-shaped WARC/1.0 response records (CRLF framing, Content-Length
# payloads), the archives parse back through the binaryFile +
# mapInPandas reader, and every record's (url, byte length, payload
# md5) must hash-match what SQL derives straight from the table — the
# whole framing/parsing path proves itself byte-exact.
# ---------------------------------------------------------------------------


@register(
    "warc_roundtrip",
    """
SELECT 'https://example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5,
       CAST(0 AS BIGINT) AS n_errors
FROM documents
""",
    doc="web-archive ingestion: write documents as WARC/1.0 response "
        "records (one archive per hash partition, byte-stable layout), "
        "re-parse via binaryFile + Arrow-batched framing, and recover "
        "every payload byte-exactly with zero quarantined records — "
        "the Common-Crawl source path, self-proving",
    tags=("source", "warc", "multimodal"),
)
def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..sources.warc import read_warc, write_warc

    docs = load_testdata(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="warc_rt_")
    payloads = docs.select(
        F.concat(F.lit("https://example.com/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.lit("2024-01-01T00:00:00Z").alias("warc_date"),
        F.col("text").cast("binary").alias("payload"),
    )
    write_warc(payloads, out, files=4)
    parsed = read_warc(spark, out).localCheckpoint()
    shutil.rmtree(out, ignore_errors=True)
    errs = F.sum((F.col("error").isNotNull()).cast("long"))
    return parsed.groupBy("url").agg(
        F.max(F.length("payload")).cast("long").alias("n_bytes"),
        F.max(F.md5("payload")).alias("payload_md5"),
        errs.alias("n_errors"),
    )


# ---------------------------------------------------------------------------
# HTML -> text extraction (functions.text.html_to_text): each document
# is wrapped in a deterministic page shell (title/style/script/list
# boilerplate + entities), stripped back to content text, and every
# byte of the result hash-checks against the SQL mirror of the same
# RE2-portable regex chain.
# ---------------------------------------------------------------------------
_HTML_PAGE_SQL = (
    "'<html><head><title>T</title><style>p{color:red}</style></head>"
    "<body><h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>' || text || "
    "'</p><ul><li>alpha &amp; beta</li><li>x &lt; y</li></ul>"
    "<script>var a=1;</script></body></html>'"
)

def _html_strip_sql(page_sql: str) -> str:
    """SQL mirror of functions.text.html_to_text applied to
    ``page_sql`` — the identical regex chain, with newline replacements
    passed as chr(10) expressions (DuckDB replacement strings don't
    interpret escape sequences)."""
    out = page_sql
    for pat, rep in (
        (r"(?is)<script[^>]*>.*?</script>", " "),
        (r"(?is)<style[^>]*>.*?</style>", " "),
        (r"(?s)<!--.*?-->", " "),
        (r"(?i)</(p|div|li|h1|h2|h3|h4|h5|h6|tr|table|ul|ol)>|<br[^>]*>",
         "\\n"),
        (r"(?s)<[^>]+>", " "),
    ):
        esc = pat.replace("'", "''")
        replit = "chr(10)" if rep == "\\n" else f"'{rep}'"
        out = f"regexp_replace({out}, '{esc}', {replit}, 'g')"
    for ent, ch in (
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "''"), ("&amp;", "&"),
    ):
        out = f"replace({out}, '{ent}', '{ch}')"
    for pat, rep in (
        (r"[ \t\r]+", " "),
        (r" ?\n ?", "\\n"),
        (r"\n+", "\\n"),
        (r"^[ \n]+|[ \n]+$", ""),
    ):
        replit = "chr(10)" if rep == "\\n" else f"'{rep}'"
        out = f"regexp_replace({out}, '{pat}', {replit}, 'g')"
    return out


_HTML_EXTRACT_SQL = _html_strip_sql(_HTML_PAGE_SQL)


@register(
    "html_extract",
    f"""
SELECT doc_id, {_HTML_EXTRACT_SQL} AS clean_text,
       CAST(len(string_split({_HTML_EXTRACT_SQL}, chr(10))) AS INT)
         AS n_lines
FROM documents
""",
    doc="HTML boilerplate stripping: script/style/comment subtrees "
        "dropped, block-closing tags become newlines (line structure "
        "survives for the C4 filter), tags stripped, entities decoded, "
        "whitespace normalized — the WARC-payload -> clean-text step, "
        "pure codegen regex chain hash-checked byte-for-byte",
    tags=("text", "web", "source"),
)
def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import html_to_text

    docs = load_testdata(spark, sf_dir, "documents")
    page = F.concat(
        F.lit("<html><head><title>T</title><style>p{color:red}</style>"
              "</head><body><h1>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("</p><ul><li>alpha &amp; beta</li><li>x &lt; y</li></ul>"
              "<script>var a=1;</script></body></html>"),
    )
    clean = html_to_text(page)
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        F.size(F.split(clean, "\n")).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# The END-TO-END web ingest pipeline in one query: synthesize a page
# shell -> html_to_text -> C4 line filter -> lang-ID + quality score +
# exact-dedup decision, every stage the REAL operator, the whole chain
# hash-checked against one composed SQL replay. This is the "a user
# runs the entire ingest path in one call" proof.
# ---------------------------------------------------------------------------
_PIPE_PAGE_SQL = (
    "'<html><head><title>T</title><style>p{color:red}</style></head>"
    "<body><h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>' || text || "
    "'.</p><ul><li>alpha &amp; beta</li><li>x &lt; y</li></ul>"
    "<script>var a=1;</script></body></html>'"
)


def _web_pipeline_oracle() -> str:
    from .text import _NORM, _QUALITY_SQL, _marker_sql

    # the text-referencing macros run against scored_src(doc_id, text)
    return f"""
WITH raw AS (
  SELECT doc_id, {_html_strip_sql(_PIPE_PAGE_SQL)} AS clean FROM documents
), lines AS (
  SELECT doc_id, string_split(clean, chr(10)) AS ls FROM raw
), kept AS (
  SELECT doc_id, ls,
         list_filter(ls, x ->
           substr(x, -1, 1) IN ('.', '!', '?')
           AND len(list_filter(string_split(x, ' '), w -> w <> '')) >= 3
           AND NOT contains(lower(x), 'javascript')
           AND NOT contains(lower(x), 'cookie')) AS kl
  FROM lines
), scored_src AS (
  SELECT doc_id,
         CAST(len(ls) AS INT) AS n_lines,
         CAST(len(kl) AS INT) AS n_kept,
         COALESCE(array_to_string(kl, chr(10)), '') AS text
  FROM kept
), feat AS (
  SELECT doc_id, n_lines, n_kept,
         {_marker_sql('en')} AS s_en,
         {_marker_sql('de')} AS s_de,
         {_marker_sql('es')} AS s_es,
         {_marker_sql('fr')} AS s_fr,
         ROUND({_QUALITY_SQL}, 6) AS quality,
         md5({_NORM}) AS fp
  FROM scored_src
)
SELECT doc_id, n_lines, n_kept,
       CASE WHEN s_en + s_de + s_es + s_fr = 0 THEN 'und'
            WHEN s_en >= GREATEST(s_de, s_es, s_fr) THEN 'en'
            WHEN s_de >= GREATEST(s_es, s_fr) THEN 'de'
            WHEN s_es >= s_fr THEN 'es'
            ELSE 'fr' END AS lang,
       quality,
       doc_id = MIN(doc_id) OVER (PARTITION BY fp) AS is_canonical
FROM feat
"""


@register(
    "web_pipeline",
    _web_pipeline_oracle(),
    doc="the composed web ingest path — HTML strip -> C4 line filter "
        "-> lang-ID -> quality score -> exact-dedup canonical decision "
        "— every stage the real operator, chained in one DataFrame "
        "plan (map-only until the single dedup-window shuffle) and "
        "hash-checked end-to-end against one composed SQL replay",
    tags=("text", "web", "pipeline"),
)
def q_web_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions import text as X
    from ..functions.text import c4_line_filter, html_to_text

    docs = load_testdata(spark, sf_dir, "documents")
    page = F.concat(
        F.lit("<html><head><title>T</title><style>p{color:red}</style>"
              "</head><body><h1>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit(".</p><ul><li>alpha &amp; beta</li><li>x &lt; y</li></ul>"
              "<script>var a=1;</script></body></html>"),
    )
    clean = html_to_text(page)
    ls = F.split(clean, "\n")
    kl = c4_line_filter(ls)
    staged = docs.select(
        "doc_id",
        F.size(ls).alias("n_lines"),
        F.size(kl).alias("n_kept"),
        F.array_join(kl, "\n").alias("_text"),
    )
    w = Window.partitionBy("_fp")
    return (
        staged.withColumn("_fp", F.md5(X.normalized(F.col("_text"))))
        .select(
            "doc_id",
            "n_lines",
            "n_kept",
            X.lang_id(F.col("_text")).alias("lang"),
            F.round(X.quality_score(F.col("_text")), 6).alias("quality"),
            (F.col("doc_id") == F.min("doc_id").over(w)).alias(
                "is_canonical"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Shard provenance: the per-(shard, source) mix manifest recorded next
# to the layout checksums — catches unbalanced/filtered exports before
# a training job reads them. Same portable shuffle-hash recipe.
# ---------------------------------------------------------------------------
_MIX_ORACLE = f"""
WITH hs AS (
  SELECT doc_id, source, n_chars,
         md5('0:' || CAST(doc_id AS VARCHAR)) AS m
  FROM documents
), k AS (
  SELECT doc_id, source, n_chars,
         CAST({_duck_hex13('m')} % {_N_SHARDS} AS INT) AS shard
  FROM hs
), per AS (
  SELECT shard, source, COUNT(*) AS n_rows,
         CAST(SUM(n_chars) AS BIGINT) AS n_tokens
  FROM k GROUP BY shard, source
)
SELECT shard, source, n_rows, n_tokens,
       CAST(FLOOR(n_rows * 1000000.0
                  / SUM(n_rows) OVER (PARTITION BY shard)) AS BIGINT)
         AS share_ppm
FROM per
"""


@register(
    "shard_source_mix",
    _MIX_ORACLE,
    doc="per-(shard, source) provenance manifest for the training "
        "export: doc/token counts and the source's integer-exact ppm "
        "share of its shard — a skewed row flags a filtered or "
        "unbalanced export before training reads it; one map-side-"
        "combined aggregation over the assignment",
    tags=("export", "shards", "provenance"),
)
def q_shard_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.export import assign_shards, shard_source_mix

    docs = load_testdata(spark, sf_dir, "documents")
    sharded = assign_shards(docs, id_col="doc_id", n_shards=_N_SHARDS,
                            seed=0)
    return shard_source_mix(sharded, source_col="source",
                            token_col="n_chars")


# ---------------------------------------------------------------------------
# Crawl link graph (extensions.web.extract_links): anchors synthesized
# into each page by doc_id arithmetic, extracted by the same codegen
# regexp both engines run, aggregated into per-target in-degrees — the
# signal PageRank / crawl prioritization consume. Map-only extraction
# + one target-keyed aggregation; targets live in a bounded id space so
# the result frame is dimension-sized.
# ---------------------------------------------------------------------------
_LG_MOD = 997


def _link_page():
    def t(m: int, a: int):
        return ((F.col("doc_id") * m + a) % _LG_MOD).cast("string")

    return F.concat(
        F.lit('<html><body><p>d</p><a href="/d/'), t(7, 13), F.lit('">x</a>'),
        F.lit('<a href="/d/'), t(31, 5), F.lit('">x</a>'),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit('<a href="/d/'), t(53, 1), F.lit('">x</a>')),
        ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )


_LINK_GRAPH_ORACLE = f"""
WITH p AS (
  SELECT doc_id,
    '<html><body><p>d</p><a href="/d/'
      || CAST((doc_id * 7 + 13) % {_LG_MOD} AS VARCHAR) || '">x</a>'
    || '<a href="/d/'
      || CAST((doc_id * 31 + 5) % {_LG_MOD} AS VARCHAR) || '">x</a>'
    || (CASE WHEN doc_id % 3 = 0
             THEN '<a href="/d/'
                  || CAST((doc_id * 53 + 1) % {_LG_MOD} AS VARCHAR)
                  || '">x</a>'
             ELSE '' END)
    || '</body></html>' AS page
  FROM documents
), l AS (
  SELECT doc_id,
         unnest(regexp_extract_all(page, '<a href="([^"]+)"', 1)) AS target
  FROM p
)
SELECT target, COUNT(*) AS in_degree,
       COUNT(DISTINCT doc_id) AS n_sources
FROM l GROUP BY target
"""


@register(
    "link_graph",
    _LINK_GRAPH_ORACLE,
    doc="crawl link graph: <a href> targets extracted from every page "
        "by a codegen regexp (no parser, no Python), exploded and "
        "aggregated into per-target in-degree + distinct-source counts "
        "— the edge list PageRank and frontier prioritization consume; "
        "map-only extraction plus one target-keyed shuffle",
    tags=("web", "graph"),
)
def q_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.web import extract_links

    docs = load_testdata(spark, sf_dir, "documents")
    pages = docs.select("doc_id", _link_page().alias("page"))
    links = pages.select(
        "doc_id", F.explode(extract_links(F.col("page"))).alias("target")
    )
    return links.groupBy("target").agg(
        F.count(F.lit(1)).alias("in_degree"),
        F.countDistinct("doc_id").alias("n_sources"),
    )


# ---------------------------------------------------------------------------
# Robots exclusion (extensions.web.robots_exclusion): RFC 9309
# longest-prefix precedence over parsed Allow/Disallow rules. The rule
# table is a literal here (a real deployment parses robots.txt bodies
# into exactly this shape); unmatched URLs default to allowed.
# ---------------------------------------------------------------------------
_ROBOTS_RULES = [
    ("site-src0.com", "/", False),
    ("site-src0.com", "/post/1", True),
    ("site-src1.org", "/post/", False),
    ("site-src1.org", "/post/12", True),
    ("site-src2.net", "/post/3", False),
    ("site-src3.com", "/", False),
]

_ROBOTS_VALUES = ", ".join(
    f"('{d}', '{p}', {str(a).upper()})" for d, p, a in _ROBOTS_RULES
)

_PATH_EXTRACT = (
    "regexp_extract(canonical_url,"
    " '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)"
)

_ROBOTS_ORACLE = f"""
WITH {_CANON_CTES}, pth AS (
  SELECT doc_id, domain,
         CASE WHEN {_PATH_EXTRACT} = '' THEN '/'
              ELSE {_PATH_EXTRACT} END AS path
  FROM canon
), rules(domain, prefix, allow) AS (
  VALUES {_ROBOTS_VALUES}
), m AS (
  SELECT p.doc_id, r.prefix, r.allow,
         ROW_NUMBER() OVER (
           PARTITION BY p.doc_id
           ORDER BY length(r.prefix) DESC, r.allow DESC, r.prefix DESC
         ) AS rn
  FROM pth p JOIN rules r ON p.domain = r.domain
  WHERE starts_with(p.path, r.prefix)
)
SELECT p.doc_id, p.domain, p.path,
       m.prefix AS matched_prefix,
       COALESCE(m.allow, TRUE) AS allowed
FROM pth p LEFT JOIN m ON p.doc_id = m.doc_id AND m.rn = 1
"""


@register(
    "robots_exclusion",
    _ROBOTS_ORACLE,
    doc="RFC 9309 robots compliance: per-URL longest-prefix rule match "
        "(ties: Allow wins) against each domain's Allow/Disallow table; "
        "rules ride as a broadcast so matching is map-only, winner "
        "selection is a groupBy argmax over struct(len, allow, prefix) "
        "— no window, candidate fan-out bounded by rules-per-domain",
    tags=("web", "url", "compliance"),
)
def q_robots_exclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.web import robots_exclusion

    docs = load_testdata(spark, sf_dir, "documents")
    urls = synthesize_messy_urls(docs)
    rules = spark.createDataFrame(
        _ROBOTS_RULES, "domain string, prefix string, allow boolean"
    )
    return robots_exclusion(urls, rules, url_col="url", id_col="doc_id")


# ---------------------------------------------------------------------------
# Per-site quality report: the domain-level rollup (quality, low-quality
# share, within-domain exact-dup rate) a web pipeline consults before
# deciding per-site sampling weights. Integer-exact ppm arithmetic.
# ---------------------------------------------------------------------------
def _dqr_oracle() -> str:
    from .text import _NORM, _QUALITY_SQL

    return f"""
WITH {_CANON_CTES}, q AS (
  SELECT d.doc_id, c.domain,
         CAST(FLOOR({_QUALITY_SQL} * 1000000) AS BIGINT) AS qp,
         md5({_NORM}) AS fp
  FROM documents d JOIN canon c ON d.doc_id = c.doc_id
)
SELECT domain, COUNT(*) AS n_docs,
       CAST(SUM(qp) AS BIGINT) // COUNT(*) AS mean_q_ppm,
       CAST(FLOOR(SUM(CASE WHEN qp < 300000 THEN 1 ELSE 0 END) * 1000000.0
                  / COUNT(*)) AS BIGINT) AS low_q_ppm,
       CAST(FLOOR((COUNT(*) - COUNT(DISTINCT fp)) * 1000000.0
                  / COUNT(*)) AS BIGINT) AS dup_ppm
FROM q GROUP BY domain
"""


@register(
    "domain_quality_rollup",
    _dqr_oracle(),
    doc="per-registrable-domain corpus report: doc count, integer-exact "
        "mean quality (ppm), low-quality share, and within-domain "
        "exact-duplicate rate — the per-site signals that drive "
        "domain sampling weights; one id-keyed join plus one "
        "map-side-combined aggregation on the domain key",
    tags=("web", "quality", "diagnostics"),
)
def q_domain_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.web import canonicalize_url, registrable_domain
    from ..functions import text as X

    docs = load_testdata(spark, sf_dir, "documents")
    # text rides through the synthesis (keep=), so the whole pre-agg
    # stage is map-only — no doc_id join back against the corpus
    urls = synthesize_messy_urls(docs, keep=("text",))
    enriched = urls.select(
        registrable_domain(canonicalize_url(F.col("url"))).alias("domain"),
        F.floor(X.quality_score(F.col("text")) * 1000000)
        .cast("long")
        .alias("qp"),
        X.fingerprint(F.col("text")).alias("fp"),
    )
    n = F.count(F.lit(1))
    return enriched.groupBy("domain").agg(
        n.alias("n_docs"),
        F.expr("sum(qp) div count(1)").alias("mean_q_ppm"),
        F.floor(
            F.sum(F.when(F.col("qp") < 300000, 1).otherwise(0))
            * 1000000.0 / n
        ).cast("long").alias("low_q_ppm"),
        F.floor((n - F.countDistinct("fp")) * 1000000.0 / n)
        .cast("long").alias("dup_ppm"),
    )


# ---------------------------------------------------------------------------
# Crawl-frontier politeness planner: canonical registrable domain keys a
# per-domain token bucket (burst 2, refill 1/tick) over discovery-time
# ordered fetch requests — admitted fetches now, rejected ones get a
# deterministic jittered retry tick. Composes two proven operators
# (extensions.web canonicalization + operators.ratelimit bucket fold);
# the oracle replays the bucket as a GLOBAL per-domain recursive walk,
# so a hash match also re-proves the reset-gap segmentation of the fold
# is semantics-invisible.
# ---------------------------------------------------------------------------
_FRONTIER = dict(rate=1, capacity=2, cost=1, backoff=2, jitter_max=3)

_FRONTIER_ORACLE = f"""
WITH RECURSIVE {_CANON_CTES}, req AS (
  SELECT doc_id, domain, doc_id // 20 AS ts_s FROM canon
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY domain
                               ORDER BY ts_s, doc_id) AS r
  FROM req
), walk(domain, r, prev_ts, tokens, doc_id, ts_s, tokens_after,
        admitted) AS (
  SELECT domain, 0, ts_s, CAST({_FRONTIER["capacity"]} AS BIGINT),
         NULL::BIGINT, NULL::BIGINT, NULL::BIGINT, NULL::BOOLEAN
  FROM ranked WHERE r = 1
  UNION ALL
  SELECT w.domain, w.r + 1, d.ts_s,
         CASE WHEN f.filled >= {_FRONTIER["cost"]}
              THEN f.filled - {_FRONTIER["cost"]} ELSE f.filled END,
         d.doc_id, d.ts_s,
         CASE WHEN f.filled >= {_FRONTIER["cost"]}
              THEN f.filled - {_FRONTIER["cost"]} ELSE f.filled END,
         f.filled >= {_FRONTIER["cost"]}
  FROM walk w
  JOIN ranked d ON d.domain = w.domain AND d.r = w.r + 1
  CROSS JOIN LATERAL (
    SELECT LEAST({_FRONTIER["capacity"]},
                 w.tokens + GREATEST((d.ts_s - w.prev_ts)
                                     * {_FRONTIER["rate"]}, 0)) AS filled
  ) f
)
SELECT domain, doc_id, ts_s, tokens_after, admitted,
       CASE WHEN NOT admitted
            THEN ts_s + {_FRONTIER["backoff"]}
                 + CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 8)) AS BIGINT)
                   % {_FRONTIER["jitter_max"]}
       END AS retry_at
FROM walk WHERE r >= 1
"""


@register(
    "crawl_frontier",
    _FRONTIER_ORACLE,
    doc="crawl politeness planner: per-registrable-domain token bucket "
        "(burst 2, refill 1 per discovery tick) admits fetches and "
        "jitters retries for the rest — canonicalization feeding the "
        "segmented bucket fold; the oracle's GLOBAL recursive walk "
        "hash-matching the gap-segmented fold re-proves segmentation "
        "is semantics-invisible",
    tags=("web", "ratelimit", "control"),
)
def q_crawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.web import canonicalize_url, registrable_domain
    from ..operators.ratelimit import token_bucket_admission

    docs = load_testdata(spark, sf_dir, "documents")
    urls = synthesize_messy_urls(docs)
    reqs = urls.select(
        "doc_id",
        registrable_domain(canonicalize_url(F.col("url"))).alias("domain"),
        F.expr("doc_id div 20").alias("tick"),
    )
    return token_bucket_admission(
        reqs, key_col="domain", ts_col="tick", id_col="doc_id",
        **_FRONTIER,
    )


# ---------------------------------------------------------------------------
# Anchor-text index: what the web SAYS a page is about. Each synthetic
# page links to two targets with its own first word as the anchor text;
# extraction parses whole <a> tags (href + text) in codegen, and the
# rollup keeps per-target link counts plus the dominant anchor term —
# the link-based relevance signal retrieval systems index next to BM25.
# ---------------------------------------------------------------------------
_AT_MOD = 997

_ANCHOR_ORACLE = f"""
WITH w AS (
  SELECT doc_id,
         COALESCE(string_split({{norm}}, ' ')[1], 'x') AS a
  FROM documents
), p AS (
  SELECT doc_id,
    '<p>d</p><a href="/d/' || CAST((doc_id * 11 + 3) % {_AT_MOD} AS VARCHAR)
      || '">' || a || '</a>'
    || '<a href="/d/' || CAST((doc_id * 29 + 17) % {_AT_MOD} AS VARCHAR)
      || '">' || a || '</a>' AS page
  FROM w
), tags AS (
  SELECT doc_id,
         unnest(regexp_extract_all(page,
                '<a href="[^"]+">[^<]*</a>', 0)) AS tag
  FROM p
), pairs AS (
  SELECT regexp_extract(tag, '"([^"]+)"', 1) AS target,
         regexp_extract(tag, '>([^<]*)<', 1) AS anchor
  FROM tags
), cnt AS (
  SELECT target, anchor, COUNT(*) AS c FROM pairs GROUP BY target, anchor
), ranked AS (
  SELECT target, anchor, c,
         SUM(c) OVER (PARTITION BY target) AS n_links,
         ROW_NUMBER() OVER (PARTITION BY target
                            ORDER BY c DESC, anchor DESC) AS rn
  FROM cnt
)
SELECT target, CAST(n_links AS BIGINT) AS n_links,
       anchor AS top_anchor, CAST(c AS BIGINT) AS top_anchor_links
FROM ranked WHERE rn = 1
"""


@register(
    "anchor_text_index",
    None,  # filled below — needs _NORM from queries.text
    doc="anchor-text index: <a> tags parsed whole in codegen (href + "
        "anchor text), rolled up per target into link counts and the "
        "dominant anchor term — the link-based relevance signal a "
        "retrieval system indexes next to BM25; two map-side-combined "
        "aggregations on the target key",
    tags=("web", "graph", "ranking"),
)
def q_anchor_text_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions import text as X

    docs = load_testdata(spark, sf_dir, "documents")
    first_word = F.coalesce(
        F.element_at(F.split(X.normalized(F.col("text")), " "), 1),
        F.lit("x"),
    )
    page = F.concat(
        F.lit('<p>d</p><a href="/d/'),
        ((F.col("doc_id") * 11 + 3) % _AT_MOD).cast("string"),
        F.lit('">'), first_word, F.lit("</a>"),
        F.lit('<a href="/d/'),
        ((F.col("doc_id") * 29 + 17) % _AT_MOD).cast("string"),
        F.lit('">'), first_word, F.lit("</a>"),
    )
    tags = docs.select(
        F.explode(
            F.regexp_extract_all(
                page, F.lit('<a href="[^"]+">[^<]*</a>'), 0
            )
        ).alias("tag")
    )
    pairs = tags.select(
        F.regexp_extract("tag", '"([^"]+)"', 1).alias("target"),
        F.regexp_extract("tag", ">([^<]*)<", 1).alias("anchor"),
    )
    cnt = pairs.groupBy("target", "anchor").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_t = Window.partitionBy("target")
    ranked = cnt.select(
        "target", "anchor", "c",
        F.sum("c").over(per_t).alias("n_links"),
    ).withColumn(
        "_best",
        F.max(F.struct(F.col("c"), F.col("anchor"))).over(per_t),
    )
    return ranked.filter(
        (F.col("c") == F.col("_best.c"))
        & (F.col("anchor") == F.col("_best.anchor"))
    ).select(
        "target", "n_links",
        F.col("anchor").alias("top_anchor"),
        F.col("c").alias("top_anchor_links"),
    )


def _finish_anchor_oracle() -> None:
    from . import REGISTRY
    from .text import _NORM

    REGISTRY["anchor_text_index"].oracle = _ANCHOR_ORACLE.format(norm=_NORM)


_finish_anchor_oracle()


# ---------------------------------------------------------------------------
# JSONL ingest with corrupt-record quarantine: documents serialized to
# newline-delimited JSON (the corpus interchange format), lines for
# doc_id % 13 == 0 truncated mid-record, then read back through the
# native JSON source in PERMISSIVE mode with an explicit corrupt
# column. Good lines parse to the typed schema; bad lines quarantine
# with their raw bytes — nothing fails, nothing vanishes. The oracle
# computes the same parse outcomes directly from the table: green
# means the serialize -> corrupt -> permissive-parse loop loses and
# invents nothing.
# ---------------------------------------------------------------------------
_JSONL_ORACLE = """
SELECT doc_id, lang, n_chars, FALSE AS quarantined
FROM documents WHERE doc_id % 13 <> 0
UNION ALL
SELECT CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
       TRUE AS quarantined
FROM documents WHERE doc_id % 13 = 0
"""


@register(
    "jsonl_quarantine",
    _JSONL_ORACLE,
    doc="JSONL source with corrupt-record quarantine: native JSON "
        "DataSource, PERMISSIVE mode, explicit _corrupt_record column "
        "and a REQUIRED schema (inference = a second full scan, never "
        "at 100 TB) — truncated lines quarantine with raw bytes "
        "instead of failing the job or silently dropping; one "
        "splittable scan, zero Python",
    tags=("source", "jsonl", "quarantine"),
)
def q_jsonl_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import types as T

    from ..sources.jsonl import read_jsonl_quarantine

    docs = load_testdata(spark, sf_dir, "documents")
    line = F.to_json(F.struct("doc_id", "lang", "n_chars"))
    lines = docs.select(
        F.when(
            F.col("doc_id") % 13 == 0,
            # cut the closing brace and the last field: mid-record
            # truncation, the classic partial-flush corruption
            F.substring(line, 1, 20),
        ).otherwise(line).alias("value")
    )
    out = tempfile.mkdtemp(prefix="jsonl_q_")
    lines.coalesce(4).write.mode("overwrite").text(out)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    parsed = read_jsonl_quarantine(spark, out, schema)
    return parsed.select("doc_id", "lang", "n_chars", "quarantined")


# ---------------------------------------------------------------------------
# CSV ingest with malformed-row quarantine — the delimited twin of
# jsonl_quarantine (wrong-column-count / unparseable rows quarantine
# with raw bytes; typed rows parse under the REQUIRED schema). Note
# Spark CSV PERMISSIVE *partially fills* the fields it could parse on
# a malformed row; the planted damage here is a single junk token so
# quarantined rows are uniformly null and the oracle stays literal.
# ---------------------------------------------------------------------------
_CSV_ORACLE = """
SELECT doc_id, lang, n_chars, FALSE AS quarantined
FROM documents WHERE doc_id % 11 <> 0
UNION ALL
SELECT CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
       TRUE AS quarantined
FROM documents WHERE doc_id % 11 = 0
"""


@register(
    "csv_quarantine",
    _CSV_ORACLE,
    doc="CSV source with malformed-row quarantine: native CSV "
        "DataSource, PERMISSIVE + explicit _corrupt_record + REQUIRED "
        "schema — junk lines quarantine with raw bytes instead of "
        "failing the job or silently dropping; one splittable scan, "
        "zero Python (the delimited twin of jsonl_quarantine)",
    tags=("source", "csv", "quarantine"),
)
def q_csv_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import types as T

    from ..sources.csvq import read_csv_quarantine

    docs = load_testdata(spark, sf_dir, "documents")
    line = F.concat_ws(
        ",",
        F.col("doc_id").cast("string"),
        F.col("lang"),
        F.col("n_chars").cast("string"),
    )
    lines = docs.select(
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.lit("xx"), F.col("doc_id").cast("string")),
        ).otherwise(line).alias("value")
    )
    out = tempfile.mkdtemp(prefix="csv_q_")
    lines.coalesce(4).write.mode("overwrite").text(out)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    parsed = read_csv_quarantine(spark, out, schema)
    return parsed.select("doc_id", "lang", "n_chars", "quarantined")
