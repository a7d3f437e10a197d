"""Text-analysis queries over the documents table (SURVEY §2.12).

Each query exercises one training-data-pipeline text operator with an
exact DuckDB mirror. The shared normalization pipeline is pinned in
functions/text.py; the SQL `_NORM` fragment below is its ANSI mirror.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as X
from ..io import load_testdata
from . import register

# ANSI mirror of functions.text.normalized()
_NORM = (
    "TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text), '[^a-z0-9 ]', ' ', 'g'),"
    " ' +', ' ', 'g'))"
)

_EN_STOP_SQL = "('" + "', '".join(X.EN_STOPWORDS) + "')"


def _marker_sql(lang: str) -> str:
    quoted = "', '".join(X.LANG_MARKERS[lang])
    return (
        f"len(list_filter(string_split({_NORM}, ' '), t -> t IN ('{quoted}')))"
    )


# ---------------------------------------------------------------------------
@register(
    "doc_fingerprint",
    f"SELECT doc_id, md5({_NORM}) AS fp FROM documents",
    doc="document fingerprint: md5 over normalized text (portable hash)",
    tags=("text",),
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, "documents")
    return docs.select("doc_id", X.fingerprint(F.col("text")).alias("fp"))


# ---------------------------------------------------------------------------
@register(
    "dedup_exact",
    f"""
SELECT md5({_NORM}) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
FROM documents GROUP BY md5({_NORM})
""",
    doc="exact dedup: hash-groupBy on the fingerprint, keep lowest id",
    tags=("text", "dedup"),
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", X.fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


# ---------------------------------------------------------------------------
@register(
    "token_stats",
    f"""
SELECT doc_id,
       len(string_split({_NORM}, ' ')) AS n_tokens,
       len(list_distinct(string_split({_NORM}, ' '))) AS n_distinct,
       length({_NORM}) AS n_chars_norm
FROM documents
""",
    doc="token counting: whitespace tokens + type counts over normalized text",
    tags=("text",),
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        X.token_count(F.col("text")).alias("n_tokens"),
        X.distinct_token_count(F.col("text")).alias("n_distinct"),
        F.length(X.normalized(F.col("text"))).alias("n_chars_norm"),
    )


# ---------------------------------------------------------------------------
@register(
    "bpe_token_stats",
    rf"""
SELECT doc_id,
       len(regexp_extract_all(lower(text), '{X.BPE_PATTERN}')) AS n_bpe_tokens,
       len(list_distinct(regexp_extract_all(lower(text), '{X.BPE_PATTERN}'))) AS n_bpe_types
FROM documents
""",
    doc="BPE-ish regex tokenization counts (model-billing estimator)",
    tags=("text",),
)
def q_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        X.bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
        F.size(F.array_distinct(X.bpe_tokens(F.col("text")))).alias("n_bpe_types"),
    )


# ---------------------------------------------------------------------------
_PUNCT_SQL = (
    "(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) * 1.0"
    " / NULLIF(length(text), 0))"
)
_STOP_SQL = (
    f"(len(list_filter(string_split({_NORM}, ' '), t -> t IN {_EN_STOP_SQL}))"
    f" * 1.0 / len(string_split({_NORM}, ' ')))"
)
# composite mirror of functions.text.quality_score
_QUALITY_SQL = (
    f"(LEAST(length(text) / 500.0, 1.0) * 0.4"
    f" + (1.0 - LEAST({_PUNCT_SQL} * 5, 1.0)) * 0.3"
    f" + LEAST({_STOP_SQL} * 4, 1.0) * 0.3)"
)


@register(
    "text_quality",
    f"""
SELECT doc_id,
       ROUND({_PUNCT_SQL}, 6) AS punct_ratio,
       ROUND({_STOP_SQL}, 6) AS stop_ratio,
       ROUND({_QUALITY_SQL}, 6) AS quality
FROM documents
""",
    doc="quality scoring: punct/stopword ratios + composite score (pre-filter "
    "before expensive model scoring)",
    tags=("text", "quality"),
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(X.punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        F.round(X.stopword_ratio(F.col("text")), 6).alias("stop_ratio"),
        F.round(X.quality_score(F.col("text")), 6).alias("quality"),
    )


# ---------------------------------------------------------------------------
_LANG_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang,
         {_marker_sql('en')} AS s_en,
         {_marker_sql('de')} AS s_de,
         {_marker_sql('es')} AS s_es,
         {_marker_sql('fr')} AS s_fr
  FROM documents
)
SELECT doc_id, lang AS labeled_lang,
       CASE WHEN s_en + s_de + s_es + s_fr = 0 THEN 'und'
            WHEN s_en >= GREATEST(s_de, s_es, s_fr) THEN 'en'
            WHEN s_de >= GREATEST(s_es, s_fr) THEN 'de'
            WHEN s_es >= s_fr THEN 'es'
            ELSE 'fr' END AS predicted_lang
FROM scored
"""


@register(
    "lang_id",
    _LANG_ORACLE,
    doc="language ID: marker-word scoring heuristic with priority tie-break",
    tags=("text", "langid"),
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io import spread_small_scan

    docs = load_testdata(spark, sf_dir, "documents")
    # gated no-op on a real multi-split table; parallelizes the scoring
    # fold off the single-row-group testdata file (guide §2.5)
    return spread_small_scan(docs, key="doc_id").select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        X.lang_id(F.col("text")).alias("predicted_lang"),
    )


# ---------------------------------------------------------------------------
@register(
    "lang_source_rollup",
    """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang, source
""",
    doc="metadata rollup over corpus partitions (exact bigint sums)",
    tags=("text", "agg"),
)
def q_lang_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )


# ---------------------------------------------------------------------------
# ---------------------------------------------------------------------------
@register(
    "token_packing",
    f"""
WITH d AS (
  SELECT source, doc_id, len(string_split({_NORM}, ' ')) AS n_tok
  FROM documents
), s AS (
  SELECT source, doc_id, n_tok,
         CAST(SUM(n_tok) OVER w - n_tok AS BIGINT) AS start_off,
         CAST(SUM(n_tok) OVER w - 1 AS BIGINT) AS end_incl
  FROM d WINDOW w AS (PARTITION BY source ORDER BY doc_id
                      ROWS UNBOUNDED PRECEDING)
)
SELECT source, doc_id, n_tok, start_off,
       CAST(start_off // 512 AS BIGINT) AS pack_start,
       CAST(GREATEST(end_incl // 512, start_off // 512) AS BIGINT) AS pack_end
FROM s
""",
    doc="sequence packing (concat-and-chunk, budget 512): per-shard token "
        "stream offsets and the chunk range each doc spans — the "
        "pretraining batch layout, one window partition per shard",
    tags=("text", "packing", "window"),
)
def q_token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.sampling import pack_token_stream

    docs = load_testdata(spark, sf_dir, "documents")
    with_counts = docs.select(
        "source", "doc_id", X.token_count(F.col("text")).alias("n_tok")
    )
    return pack_token_stream(
        with_counts, "doc_id", "n_tok", budget=512, shard_col="source"
    )


# ---------------------------------------------------------------------------
@register(
    "stratified_sample",
    """
WITH b AS (
  SELECT doc_id, lang,
         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % 10000 AS bucket
  FROM documents
)
SELECT doc_id, lang FROM b
WHERE bucket < (CASE WHEN lang = 'en' THEN 2000
                     WHEN lang = 'de' THEN 5000
                     ELSE 1000 END)
""",
    doc="stratified deterministic sample: per-language hash-bucket cuts "
        "(downsample en to 20%, upweight de to 50%, default 10%) — "
        "reproducible corpus rebalancing, shuffle-free",
    tags=("sampling", "stratified"),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.sampling import stratified_sample

    docs = load_testdata(spark, sf_dir, "documents")
    return stratified_sample(
        docs, "doc_id", "lang", {"en": 0.2, "de": 0.5}, default_fraction=0.1
    ).select("doc_id", "lang")


# ---------------------------------------------------------------------------
@register(
    "mixture_sample",
    """
WITH totals AS (
  SELECT source, SUM(n_chars) AS tot FROM documents GROUP BY source
), cuts AS (
  SELECT source,
         CAST(FLOOR(LEAST(
           (CASE WHEN source = 'src0' THEN 0.5
                 WHEN source = 'src1' THEN 0.3
                 ELSE 0.01 END) * 20000.0 / tot, 1.0) * 10000) AS BIGINT)
           AS cut
  FROM totals
)
SELECT d.doc_id, d.source, d.n_chars
FROM documents d JOIN cuts c ON d.source = c.source
WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      % 10000 < c.cut
""",
    doc="data-mixture sampling to a 20k-token budget: per-source keep "
        "fraction min(w_s*budget/tokens_s, 1) applied as a hash-bucket "
        "cut (src0 50%, src1 30%, rest 1% of budget) — reproducible, "
        "shuffle-free source re-weighting",
    tags=("sampling", "mixture"),
)
def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.sampling import mixture_by_tokens

    docs = load_testdata(spark, sf_dir, "documents")
    return mixture_by_tokens(
        docs,
        key_col="doc_id",
        source_col="source",
        token_col="n_chars",
        weights={"src0": 0.5, "src1": 0.3},
        budget=20000,
        default_weight=0.01,
    ).select("doc_id", "source", "n_chars")


# ---------------------------------------------------------------------------
_WINNOW_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_NORM} AS txt FROM documents
), g AS (
  SELECT doc_id,
         unnest(CASE WHEN length(txt) < 16 THEN []
                     ELSE generate_series(1, length(txt) - 15) END) AS pos,
         txt
  FROM t
), h AS (
  SELECT doc_id, pos,
         CAST(concat('0x', substr(md5(substr(txt, pos, 16)), 1, 8)) AS BIGINT)
           AS hv
  FROM g WHERE pos <= 1048575
), sel AS (
  SELECT doc_id,
         MIN(hv * 1048576 + (1048575 - pos)) OVER win AS key,
         COUNT(*) OVER win AS cnt
  FROM h
  WINDOW win AS (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING)
), fp AS (
  SELECT DISTINCT doc_id,
         CAST(1048575 - (key % 1048576) AS BIGINT) AS pos,
         CAST(key // 1048576 AS BIGINT) AS fp_hash
  FROM sel WHERE cnt = 8
)
SELECT doc_id, COUNT(*) AS n_fp,
       CAST(SUM(fp_hash) AS BIGINT) AS fp_sum,
       MIN(fp_hash) AS fp_min, MAX(fp_hash) AS fp_max
FROM fp GROUP BY doc_id
"""


@register(
    "winnow_fingerprint",
    _WINNOW_ORACLE,
    doc="winnowing fingerprints (16-char grams, window 8, MOSS-style "
        "rightmost-min): per-doc digest of the selected fingerprint set. "
        "Docs sharing a >= 23-char run share a fingerprint.",
    tags=("text", "dedup", "fingerprint"),
)
def q_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, "documents")
    from ..extensions.dedup import winnow_fingerprints

    fp = winnow_fingerprints(docs, k=16, window=8)
    return fp.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fp"),
        F.sum("fp_hash").alias("fp_sum"),
        F.min("fp_hash").alias("fp_min"),
        F.max("fp_hash").alias("fp_max"),
    )


_JACCARD_CTES = f"""tok AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
), sh0 AS (
  SELECT DISTINCT doc_id, unnest(
    CASE WHEN len(w) < 3 THEN []
         ELSE list_transform(generate_series(1, len(w) - 2),
                             i -> array_to_string(w[i:i+2], ' '))
    END) AS shingle
  FROM tok
), df AS (
  SELECT shingle, COUNT(*) AS n_docs FROM sh0 GROUP BY shingle
), sh AS (
  -- stop-shingle cap mirrored from ngram_jaccard_pairs(max_df=100)
  SELECT sh0.doc_id, sh0.shingle FROM sh0
  JOIN df ON sh0.shingle = df.shingle
  WHERE df.n_docs <= 100
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), kept AS (
  SELECT doc_a, doc_b, shared,
         shared * 1.0 / (sa.n + sb.n - shared) AS jaccard
  FROM pairs
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE shared * 1.0 / (sa.n + sb.n - shared) >= 0.1
)"""

_JACCARD_ORACLE = f"""
WITH {_JACCARD_CTES}
SELECT doc_a, doc_b, shared, ROUND(jaccard, 6) AS jaccard FROM kept
"""

# dedup_clusters = jaccard pairs -> connected components -> canonical doc
# (min doc_id per cluster). Same pruned min-label recursive fixpoint as
# the connected_components oracle; near-dup clusters are small, so the
# walk state stays linear in practice.
_DEDUP_CLUSTERS_ORACLE = f"""
WITH RECURSIVE {_JACCARD_CTES}, sym AS (
  SELECT DISTINCT src, dst FROM (
    SELECT doc_a AS src, doc_b AS dst FROM kept
    UNION ALL SELECT doc_b, doc_a FROM kept
  ) t WHERE src <> dst
), walk(node, label) AS (
  SELECT src, src FROM sym
  UNION
  SELECT e.dst, w.label FROM walk w JOIN sym e ON e.src = w.node
  WHERE w.label < e.dst
)
SELECT node AS doc_id, MIN(label) AS canonical_id,
       node = MIN(label) AS is_canonical
FROM walk GROUP BY node
"""


@register(
    "ngram_jaccard_pairs",
    _JACCARD_ORACLE,
    doc="near-dup candidates: 3-word-shingle inverted index self-join + "
    "Jaccard >= 0.1 with a df>100 stop-shingle cap (the exact form "
    "MinHash/LSH approximates at scale)",
    tags=("text", "dedup"),
)
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, "documents")
    from ..extensions.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(docs, id_col="doc_id", text_col="text",
                               n=3, threshold=0.1, max_df=100)


# ---------------------------------------------------------------------------
@register(
    "dedup_clusters",
    _DEDUP_CLUSTERS_ORACLE,
    doc="the full near-dup dedup pipeline: shingle-Jaccard pairs (df-capped "
        "inverted index) -> connected components -> canonical doc per "
        "cluster (min doc_id). Per-doc assignment (doc_id, canonical_id, "
        "is_canonical); downstream dedup keeps is_canonical rows. Oracle "
        "composes the Jaccard SQL with a WITH RECURSIVE min-label fixpoint.",
    tags=("text", "dedup", "graph"),
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.dedup import ngram_jaccard_pairs
    from ..operators.graph import connected_components

    docs = load_testdata(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, id_col="doc_id", text_col="text",
                                n=3, threshold=0.1, max_df=100)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    cc = connected_components(edges)
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("canonical_id"),
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )


# ---------------------------------------------------------------------------
# Quality-aware dedup: same pair graph and components as dedup_clusters,
# but the cluster's canonical is its HIGHEST-quality member (composite
# quality score, doc_id tiebreak), singletons canonicalize to themselves.
# The oracle composes the Jaccard CTEs + recursive CC fixpoint with a
# first_value window over the rounded quality score — both engines rank
# on the identical 6-decimal value so the argmax is hash-stable.
# ---------------------------------------------------------------------------
_DEDUP_KEEP_BEST_ORACLE_TEMPLATE = """
WITH RECURSIVE {jaccard_ctes}, sym AS (
  SELECT DISTINCT src, dst FROM (
    SELECT doc_a AS src, doc_b AS dst FROM kept
    UNION ALL SELECT doc_b, doc_a FROM kept
  ) t WHERE src <> dst
), walk(node, label) AS (
  SELECT src, src FROM sym
  UNION
  SELECT e.dst, w.label FROM walk w JOIN sym e ON e.src = w.node
  WHERE w.label < e.dst
), comp AS (
  SELECT node AS doc_id, MIN(label) AS cluster FROM walk GROUP BY node
), allc AS (
  SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster
  FROM documents d LEFT JOIN comp c USING (doc_id)
), sc AS (
  SELECT doc_id, ROUND({quality_sql}, 6) AS q FROM documents
)
SELECT a.doc_id, a.cluster,
       FIRST_VALUE(a.doc_id) OVER (
         PARTITION BY a.cluster ORDER BY s.q DESC, a.doc_id
       ) AS canonical_id,
       a.doc_id = FIRST_VALUE(a.doc_id) OVER (
         PARTITION BY a.cluster ORDER BY s.q DESC, a.doc_id
       ) AS is_canonical
FROM allc a JOIN sc s ON s.doc_id = a.doc_id
"""


@register(
    "dedup_keep_best",
    _DEDUP_KEEP_BEST_ORACLE_TEMPLATE.format(
        jaccard_ctes=_JACCARD_CTES, quality_sql=_QUALITY_SQL
    ),
    doc="quality-aware near-dup dedup: Jaccard pairs -> connected "
        "components -> the HIGHEST-quality member of each cluster "
        "(composite quality score, doc_id tiebreak) is kept as "
        "canonical, singletons keep themselves — production dedup keeps "
        "the best copy, not an arbitrary one",
    tags=("text", "dedup", "quality"),
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.dedup import (
        cluster_canonicals_by_score,
        ngram_jaccard_pairs,
    )
    from ..operators.graph import connected_components

    docs = load_testdata(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, id_col="doc_id", text_col="text",
                                n=3, threshold=0.1, max_df=100)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    cc = connected_components(edges).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster")
    )
    assign = docs.select("doc_id").join(cc, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster", "doc_id").alias("cluster")
    )
    scores = docs.select(
        "doc_id", F.round(X.quality_score(F.col("text")), 6).alias("score")
    )
    return cluster_canonicals_by_score(assign, scores)


# ---------------------------------------------------------------------------
# Contrastive (anchor, positive, negative) triplets for embedding
# training: near-dup pairs supply the positives; negatives come from a
# deterministic md5-ranked candidate pool with the anchor's near-dup
# partners excluded. Fully derandomized, so the whole generation
# pipeline is hash-checked in SQL.
# ---------------------------------------------------------------------------
_TRIPLETS_ORACLE = f"""
WITH {_JACCARD_CTES}, pool AS (
  SELECT doc_id AS cand FROM documents
  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 64
), partners AS (
  SELECT doc_a AS pa, doc_b AS pp FROM kept
  UNION SELECT doc_b, doc_a FROM kept
), cand AS (
  SELECT k.doc_a AS anchor_id, k.doc_b AS positive_id, pl.cand
  FROM kept k CROSS JOIN pool pl
  WHERE pl.cand <> k.doc_a
    AND NOT EXISTS (SELECT 1 FROM partners pa
                    WHERE pa.pa = k.doc_a AND pa.pp = pl.cand)
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY anchor_id, positive_id
    ORDER BY md5(CAST(anchor_id AS VARCHAR) || '|'
                 || CAST(cand AS VARCHAR)), cand
  ) AS rn
  FROM cand
)
SELECT anchor_id, positive_id, cand AS negative_id
FROM ranked WHERE rn = 1
"""


@register(
    "contrastive_triplets",
    _TRIPLETS_ORACLE,
    doc="embedding-training data prep: near-dup Jaccard pairs become "
        "(anchor, positive); each pair's negative is the md5-argmin of "
        "a 64-doc deterministic pool, excluding the anchor and all its "
        "near-dup partners (no false negatives). Pool broadcasts, "
        "fan-out bounded at pool_size per pair, argmin compiles to "
        "WindowGroupLimit — no full cross join",
    tags=("text", "sampling", "training"),
)
def q_contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.dedup import ngram_jaccard_pairs
    from ..extensions.sampling import contrastive_triplets

    docs = load_testdata(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, id_col="doc_id", text_col="text",
                                n=3, threshold=0.1, max_df=100)
    return contrastive_triplets(pairs, docs, pool_size=64)


# ---------------------------------------------------------------------------
# First-Fit-Decreasing whole-document bin packing (the padding-aware
# twin of token_packing's concat-and-chunk). The per-shard FFD fold is
# sequential by nature; the oracle replays it as a recursive walk over
# the (tokens DESC, id)-ranked docs carrying the bin-capacity list.
# ---------------------------------------------------------------------------
_BINPACK_ORACLE = f"""
WITH RECURSIVE docs AS (
  SELECT doc_id,
         CAST(len(string_split({_NORM}, ' ')) AS INT) AS nt,
         CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) % 32 AS INT) AS shard
  FROM documents
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY shard
                               ORDER BY nt DESC, doc_id) AS r
  FROM docs
), walk(shard, r, caps, ids, bins) AS (
  SELECT shard, 0, []::INT[], []::BIGINT[], []::INT[]
  FROM (SELECT DISTINCT shard FROM docs)
  UNION ALL
  SELECT w.shard, w.r + 1,
         CASE WHEN f.fit IS NULL THEN list_append(w.caps, 128 - d.nt)
              ELSE list_transform(w.caps,
                     (c, i) -> CASE WHEN i = f.fit THEN c - d.nt
                                    ELSE c END)
         END,
         list_append(w.ids, d.doc_id),
         list_append(w.bins, COALESCE(f.fit, len(w.caps) + 1))
  FROM walk w
  JOIN ranked d ON d.shard = w.shard AND d.r = w.r + 1
  CROSS JOIN LATERAL (
    -- list_position returns 0 (not NULL) when nothing fits
    SELECT NULLIF(
      list_position(list_transform(w.caps, c -> c >= d.nt), true), 0
    ) AS fit
  ) f
)
SELECT w.shard, unnest(w.ids) AS doc_id, unnest(w.bins) AS bin_id
FROM walk w
WHERE w.r = (SELECT COUNT(*) FROM docs d WHERE d.shard = w.shard)
"""


@register(
    "bin_packing",
    _BINPACK_ORACLE,
    doc="whole-document First-Fit-Decreasing packing into 128-token "
        "bins, 32 md5 shards: docs shard portably, each shard packs in "
        "one per-row codegen fold over its sorted doc array (lowest-"
        "index fitting bin, else a new bin; overlong docs open their "
        "own bin) — padding-aware batch construction that never splits "
        "a document, vs token_packing's concat-and-chunk",
    tags=("text", "sampling", "training"),
)
def q_bin_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.sampling import bin_pack_documents

    docs = load_testdata(spark, sf_dir, "documents")
    with_counts = docs.select(
        "doc_id", X.token_count(F.col("text")).alias("n_tokens")
    )
    return bin_pack_documents(
        with_counts, max_len=128, num_shards=32
    ).select("doc_id", "shard", "bin_id")


# ---------------------------------------------------------------------------
_TFIDF_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok
  WHERE term <> '' GROUP BY doc_id, term
), idf AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(tf.tf * LN((n.n_docs + 1.0) / (idf.df + 1.0)), 6) AS tfidf
  FROM tf JOIN idf ON tf.term = idf.term CROSS JOIN n
), ranked AS (
  SELECT doc_id, term, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term) AS rnk
  FROM scored
)
SELECT doc_id, term, tfidf, rnk FROM ranked WHERE rnk <= 3
"""


@register(
    "tfidf_top_terms",
    _TFIDF_ORACLE,
    doc="TF-IDF keyword extraction: smoothed idf ln((N+1)/(df+1)), top-3 "
        "terms per doc with deterministic (score, term) ordering — "
        "tf/idf/score all map-side aggregable, idf side broadcastable",
    tags=("text", "tfidf", "window"),
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_testdata(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(X.tokens(F.col("text"))).alias("term")
    ).filter(F.col("term") != "")
    # hash-partition the token stream by term ONCE: tf's (doc_id, term)
    # grouping is satisfied by term-partitioning (subset key), idf's
    # term grouping and the tf-idf join reuse the same exchange — the
    # expensive tokenize runs once instead of once per consumer
    # (~25% faster at sf0.1; same ReusedExchange move as
    # ngram_jaccard_pairs)
    toks = toks.repartition("term")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    idf = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # corpus size as a 1-row broadcast, not a driver-side count():
    # keeps the whole plan declarative
    n = F.broadcast(docs.agg(F.count(F.lit(1)).alias("_n")))
    scored = tf.join(idf, "term").crossJoin(n).select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log((F.col("_n") + 1.0) / (F.col("df") + 1.0)), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tfidf", "rnk")
    )


# ---------------------------------------------------------------------------
# Passage-level dedup (C4-style repeated-span removal): cuts passages
# repeated across the corpus out of otherwise-unique documents — the
# case document-level dedup cannot touch. extensions/dedup.py:passage_dedup.
# ---------------------------------------------------------------------------
_PASSAGE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents
), words AS (
  SELECT doc_id, unnest(ws) AS word, generate_subscripts(ws, 1) AS pos
  FROM toks
), chunks AS (
  SELECT doc_id, CAST((pos - 1) // 10 AS INT) AS chunk_idx,
         string_agg(word, ' ' ORDER BY pos) AS chunk_text
  FROM words WHERE word <> ''
  GROUP BY doc_id, CAST((pos - 1) // 10 AS INT)
), kept AS (
  SELECT doc_id, chunk_idx, chunk_text,
         ROW_NUMBER() OVER (
           PARTITION BY chunk_text ORDER BY doc_id, chunk_idx
         ) AS rn
  FROM chunks
), rebuilt AS (
  SELECT doc_id,
         string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS clean_text,
         COUNT(*) AS n_chunks_kept
  FROM kept WHERE rn = 1 GROUP BY doc_id
), totals AS (
  SELECT doc_id, COUNT(*) AS n_chunks_total FROM chunks GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(r.clean_text, '') AS clean_text,
       COALESCE(t.n_chunks_total, 0) AS n_chunks_total,
       COALESCE(r.n_chunks_kept, 0) AS n_chunks_kept
FROM documents d
LEFT JOIN totals t ON d.doc_id = t.doc_id
LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
"""


@register(
    "passage_dedup",
    _PASSAGE_ORACLE,
    doc="passage-level dedup: 10-word windows of normalized text, first "
        "corpus occurrence wins, docs rebuilt without repeated spans. "
        "Chunking is per-row array exprs (no explode shuffle); the plan "
        "is two hash-partitioned passes (first-occurrence window on "
        "chunk_text, per-doc reassembly) at any corpus size",
    tags=("text", "dedup", "scale"),
)
def q_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.dedup import passage_dedup

    docs = load_testdata(spark, sf_dir, "documents")
    return passage_dedup(docs, chunk_size=10)


# ---------------------------------------------------------------------------
# Repetition statistics (Gopher/MassiveText quality signals): fraction of
# repeated within-doc n-grams + distinct-token ratio. Everything is
# per-row array exprs — the whole query is a single scan, zero shuffles.
# ---------------------------------------------------------------------------
_REP_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents
), grams AS (
  SELECT doc_id, ws,
         CASE WHEN len(ws) >= 2 THEN list_transform(
           generate_series(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i + 1]
         ) ELSE [] END AS g2,
         CASE WHEN len(ws) >= 3 THEN list_transform(
           generate_series(1, len(ws) - 2),
           i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]
         ) ELSE [] END AS g3
  FROM toks
)
SELECT doc_id,
       len(ws) AS n_tokens,
       ROUND(len(list_distinct(ws)) / len(ws), 6) AS uniq_token_ratio,
       CASE WHEN len(g2) > 0
            THEN ROUND(1.0 - len(list_distinct(g2)) / len(g2), 6)
            ELSE 0.0 END AS dup_bigram_frac,
       CASE WHEN len(g3) > 0
            THEN ROUND(1.0 - len(list_distinct(g3)) / len(g3), 6)
            ELSE 0.0 END AS dup_trigram_frac
FROM grams
"""


def _ngrams_of(ws: Column, n: int) -> Column:
    """word_ngrams_text's exact expression over an already-bound token
    ARRAY attribute. The text-taking form re-evaluates the tokenize
    chain inside its transform lambda PER ELEMENT in the interpreted
    path (an unbound subexpression in a HOF lambda is re-evaluated per
    element) — binding the array first is the r15 fix that took
    gopher_quality_filter 14.5 s -> 0.57 s and repetition_stats /
    quality_gate 38 s / 43 s -> well under 1 s at sf0.1."""
    return F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - n),
            lambda i: F.array_join(F.slice(ws, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


@register(
    "repetition_stats",
    _REP_ORACLE,
    doc="Gopher-style repetition signals: distinct-token ratio plus "
        "duplicate bigram/trigram fractions per doc — pure per-row "
        "array exprs (no explode), single scan, zero shuffles",
    tags=("text", "quality", "scale"),
)
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r15 restructure (same values, same oracle): token array and gram
    # counts bound as real columns behind Generate barriers — see
    # _ngrams_of. 38 s -> <1 s at sf0.1, equality asserted.
    from ..io import spread_small_scan

    docs = spread_small_scan(
        load_testdata(spark, sf_dir, "documents"), key="doc_id"
    )
    lined = docs.select(
        "doc_id", F.explode(F.array(X.tokens(F.col("text")))).alias("ws")
    )
    ws = F.col("ws")
    g2, g3 = _ngrams_of(ws, 2), _ngrams_of(ws, 3)
    feats = lined.select(
        "doc_id",
        F.inline(F.array(F.struct(
            F.size(ws).alias("n"),
            F.size(F.array_distinct(ws)).alias("d1"),
            F.size(F.array_distinct(g2)).alias("d2"),
            F.size(g2).alias("n2"),
            F.size(F.array_distinct(g3)).alias("d3"),
            F.size(g3).alias("n3"),
        ))),
    )

    def dup_frac(d: Column, n: Column) -> Column:
        # dup_ngram_fraction's exact expression over bound counts
        return F.when(
            n > 0, F.lit(1.0) - d / n
        ).otherwise(F.lit(0.0))

    return feats.select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        F.round(F.col("d1") / F.col("n"), 6).alias("uniq_token_ratio"),
        F.round(dup_frac(F.col("d2"), F.col("n2")), 6).alias(
            "dup_bigram_frac"
        ),
        F.round(dup_frac(F.col("d3"), F.col("n3")), 6).alias(
            "dup_trigram_frac"
        ),
    )


# ---------------------------------------------------------------------------
# PII redaction (pre-training scrub). The synthetic corpus carries no
# real PII, so the query PLANTS deterministic emails/phones derived from
# doc_id (both engines build the identical augmented text), then scrubs
# them — exercising the real redaction exprs with nonzero effect.
# ---------------------------------------------------------------------------
_PII_EMAIL_SQL = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_PII_PHONE_SQL = "555-[0-9]{4}"

_PII_ORACLE = f"""
WITH aug AS (
  SELECT doc_id,
         text ||
         CASE WHEN doc_id % 3 = 0
              THEN ' contact user' || doc_id || '@example.com for info'
              ELSE '' END ||
         CASE WHEN doc_id % 5 = 0
              THEN ' or call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE '' END AS t
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(t, '{_PII_EMAIL_SQL}', '<EMAIL>', 'g'),
                      '{_PII_PHONE_SQL}', '<PHONE>', 'g') AS redacted,
       len(regexp_extract_all(t, '{_PII_EMAIL_SQL}')) AS n_emails,
       len(regexp_extract_all(t, '{_PII_PHONE_SQL}')) AS n_phones
FROM aug
"""


@register(
    "pii_redaction",
    _PII_ORACLE,
    doc="PII scrub: plant deterministic emails/phones from doc_id, then "
        "redact with RE2-compatible patterns (functions.text.redact_pii) "
        "and count hits — chained regexp_replace in codegen, map-only, "
        "zero shuffles",
    tags=("text", "quality", "scale"),
)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com for info"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" or call 555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    n_emails, n_phones = X.pii_counts(aug)
    return docs.select(
        "doc_id",
        X.redact_pii(aug).alias("redacted"),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination (extensions/decontam.py): training docs that
# carry held-out eval 5-grams — the GPT-3/PaLM hygiene pass, as an
# inverted-index equi-join on the md5 shingle hash (no pairwise docs).
# ---------------------------------------------------------------------------
_DECONTAM_ORACLE = f"""
WITH lab AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w,
         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % 10000 AS bucket
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, bucket, md5(s) AS sh FROM (
    SELECT doc_id, bucket, unnest(
      CASE WHEN len(w) < 5 THEN []
           ELSE list_transform(generate_series(1, len(w) - 4),
                               i -> array_to_string(w[i:i+4], ' '))
      END) AS s
    FROM lab
  ) u
), train_sh AS (
  SELECT doc_id, sh FROM sh WHERE bucket < 9000
), eval_sh AS (
  SELECT doc_id AS eval_id, sh FROM sh WHERE bucket >= 9500
)
SELECT t.doc_id,
       COUNT(DISTINCT t.sh) AS n_shared_shingles,
       COUNT(DISTINCT e.eval_id) AS n_eval_docs
FROM train_sh t JOIN eval_sh e ON t.sh = e.sh
GROUP BY t.doc_id
"""


@register(
    "decontamination",
    _DECONTAM_ORACLE,
    doc="pre-training decontamination: train docs sharing 5-word shingles "
        "with the held-out test split (stable-hash split, distinct "
        "shingles per doc, md5 equi-join, per-doc rollup) — the eval "
        "side broadcasts at real scale so the only shuffle is the rollup",
    tags=("text", "dedup", "scale"),
)
def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.decontam import contamination_report
    from ..extensions.sampling import assign_split

    docs = assign_split(
        load_testdata(spark, sf_dir, "documents"), "doc_id"
    )
    train = docs.filter(F.col("split") == "train")
    eval_df = docs.filter(F.col("split") == "test")
    return contamination_report(train, eval_df, n=5)


# ---------------------------------------------------------------------------
# Corpus quality gate: the composed keep/drop filter pass a training
# pipeline actually runs (length cuts + repetition cut + lang-ID),
# with per-doc drop reasons for auditability. All per-row codegen
# exprs — single scan, zero shuffles; at 100 TB this fuses with the
# parquet scan and prunes the corpus before any expensive stage.
# ---------------------------------------------------------------------------
_GATE_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS ws,
         {_marker_sql('en')} + {_marker_sql('de')} +
         {_marker_sql('es')} + {_marker_sql('fr')} AS lang_hits
  FROM documents
), g AS (
  SELECT doc_id, len(ws) AS n_tokens, lang_hits,
         CASE WHEN len(ws) >= 2 THEN
           1.0 - len(list_distinct(list_transform(
             generate_series(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i + 1]
           ))) / (len(ws) - 1)
         ELSE 0.0 END AS dup2
  FROM t
)
SELECT doc_id, n_tokens, ROUND(dup2, 6) AS dup_bigram_frac,
       (n_tokens >= 25 AND n_tokens <= 90
        AND dup2 <= 0.05 AND lang_hits > 0) AS keep,
       concat_ws(',',
         CASE WHEN n_tokens < 25 THEN 'too_short' END,
         CASE WHEN n_tokens > 90 THEN 'too_long' END,
         CASE WHEN dup2 > 0.05 THEN 'repetitive' END,
         CASE WHEN lang_hits = 0 THEN 'lang_und' END) AS reasons
FROM g
"""


@register(
    "quality_gate",
    _GATE_ORACLE,
    doc="composed corpus filter: length window + duplicate-bigram cut + "
        "lang-ID, emitting keep plus audit reasons — single scan, zero "
        "shuffles, fuses with the parquet read at scale",
    tags=("text", "quality", "scale"),
)
def q_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r15 restructure (same values, same oracle): token array, dup2 and
    # marker hits bound as real columns behind Generate barriers — the
    # naive form re-referenced dup2 3x and the 4 marker filters 2x,
    # each reference re-running the tokenize chain (and, inside the
    # ngram lambda, PER ELEMENT); see _ngrams_of. 43 s -> <1 s at
    # sf0.1, equality asserted.
    from ..io import spread_small_scan

    docs = spread_small_scan(
        load_testdata(spark, sf_dir, "documents"), key="doc_id"
    )
    lined = docs.select(
        "doc_id", F.explode(F.array(X.tokens(F.col("text")))).alias("ws")
    )
    ws = F.col("ws")
    g2 = _ngrams_of(ws, 2)
    dup2_expr = F.when(
        F.size(g2) > 0,
        F.lit(1.0) - F.size(F.array_distinct(g2)) / F.size(g2),
    ).otherwise(F.lit(0.0))
    hits = [
        F.size(F.filter(ws, lambda t: t.isin(*X.LANG_MARKERS[k])))
        for k in ("en", "de", "es", "fr")
    ]
    feats = lined.select(
        "doc_id",
        F.inline(F.array(F.struct(
            F.size(ws).cast("long").alias("n_tokens"),
            dup2_expr.alias("dup2"),
            (hits[0] + hits[1] + hits[2] + hits[3]).alias("lang_hits"),
        ))),
    )
    n_tokens = F.col("n_tokens")
    dup2 = F.col("dup2")
    lang_hits = F.col("lang_hits")
    keep = (
        (n_tokens >= 25) & (n_tokens <= 90)
        & (dup2 <= 0.05) & (lang_hits > 0)
    )
    reasons = F.concat_ws(
        ",",
        F.when(n_tokens < 25, F.lit("too_short")),
        F.when(n_tokens > 90, F.lit("too_long")),
        F.when(dup2 > 0.05, F.lit("repetitive")),
        F.when(lang_hits == 0, F.lit("lang_und")),
    )
    return feats.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(dup2, 6).alias("dup_bigram_frac"),
        keep.alias("keep"),
        reasons.alias("reasons"),
    )


# ---------------------------------------------------------------------------
# Incremental dedup: admit only new-batch docs whose fingerprint is
# absent from the historical corpus — the operational form of exact
# dedup (you never re-dedup 100 TB; you anti-join the day's batch
# against the fingerprint index). Anti-join on the md5 fingerprint:
# the batch side is small, the index side is pruned to the fp column.
# ---------------------------------------------------------------------------
_INCR_DEDUP_ORACLE = f"""
WITH lab AS (
  SELECT doc_id, text,
         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % 10000 AS bucket
  FROM documents
), hist AS (
  SELECT md5({_NORM}) AS fp FROM lab WHERE bucket < 9000
), batch AS (
  SELECT doc_id, md5({_NORM}) AS fp FROM lab WHERE bucket >= 9000
)
SELECT b.doc_id, b.fp
FROM batch b
WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.fp = b.fp)
"""


@register(
    "incremental_dedup",
    _INCR_DEDUP_ORACLE,
    doc="admit-new-only dedup: anti-join the incoming batch's md5 "
        "fingerprints against the historical index (column-pruned scan "
        "of fp only) — the daily-ingest form of exact dedup at 100 TB",
    tags=("text", "dedup", "scale"),
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.sampling import assign_split

    docs = assign_split(
        load_testdata(spark, sf_dir, "documents"), "doc_id"
    )
    hist = docs.filter(F.col("split") == "train").select(
        X.fingerprint(F.col("text")).alias("fp")
    )
    batch = docs.filter(F.col("split") != "train").select(
        "doc_id", X.fingerprint(F.col("text")).alias("fp")
    )
    return batch.join(hist, "fp", "left_anti")


# ---------------------------------------------------------------------------
# Temperature-resampled mixture (extensions/sampling.temperature_mixture):
# sqrt-share renormalization (T=2) boosts low-resource sources without
# hand weights. sqrt is correctly rounded in IEEE — the one exponent
# whose cut thresholds are bit-identical across engines; the tiny
# per-source sums use an ORDERED unbounded frame on both sides so the
# double addition order is pinned.
# ---------------------------------------------------------------------------
_TEMP_MIX_ORACLE = """
WITH totals AS (
  SELECT source, SUM(n_chars) AS tot FROM documents GROUP BY source
), shares AS (
  SELECT source, tot,
         sqrt(tot * 1.0 / SUM(tot) OVER (ORDER BY source
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) AS q
  FROM totals
), norm AS (
  SELECT source, tot, q,
         q / SUM(q) OVER (ORDER BY source
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS qn
  FROM shares
), cuts AS (
  SELECT source,
         CAST(FLOOR(LEAST(20000.0 * qn / tot, 1.0) * 10000) AS BIGINT) AS cut
  FROM norm
)
SELECT d.doc_id, d.source, d.n_chars
FROM documents d JOIN cuts c ON d.source = c.source
WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      % 10000 < c.cut
"""


@register(
    "temperature_mixture",
    _TEMP_MIX_ORACLE,
    doc="temperature-resampled mixture to a 20k-token budget (T=2, "
        "sqrt-share renormalization): low-resource sources up-weighted "
        "without hand-set weights, applied as stable hash-bucket cuts — "
        "shuffle-free over the corpus, one tiny broadcast dim",
    tags=("sampling", "mixture", "scale"),
)
def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.sampling import temperature_mixture

    docs = load_testdata(spark, sf_dir, "documents")
    return temperature_mixture(
        docs, key_col="doc_id", source_col="source",
        token_col="n_chars", budget=20000,
    ).select("doc_id", "source", "n_chars")


# ---------------------------------------------------------------------------
# Context-window chunking (extensions/sampling.context_chunks): sliding
# 32-token windows, stride 24 (overlap 8) — the RAG/embedding prep op.
# Pure per-row exprs + one posexplode; fuses with the scan at scale.
# ---------------------------------------------------------------------------
_CHUNK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents
), s AS (
  SELECT doc_id, ws, len(ws) AS n FROM t
), st AS (
  SELECT doc_id, ws, n,
         unnest(generate_series(0,
           CASE WHEN n <= 32 THEN 0
                ELSE CAST(ceil((n - 32) / 24.0) * 24 AS INT) END,
           24)) AS start_off
  FROM s
)
SELECT doc_id,
       CAST(start_off // 24 AS BIGINT) AS chunk_idx,
       CAST(start_off AS BIGINT) AS start_off,
       CAST(LEAST(32, n - start_off) AS BIGINT) AS n_tokens,
       array_to_string(ws[start_off + 1 : start_off + 32], ' ') AS chunk_text
FROM st
"""


@register(
    "context_chunks",
    _CHUNK_ORACLE,
    doc="sliding context windows for RAG/embedding prep: 32-token chunks "
        "advancing by 24 (8-token overlap), short tail kept — per-row "
        "array exprs + one posexplode, no shuffle",
    tags=("text", "chunking", "scale"),
)
def q_context_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.sampling import context_chunks

    docs = load_testdata(spark, sf_dir, "documents")
    return context_chunks(docs, "doc_id", "text", size=32, overlap=8)


# ---------------------------------------------------------------------------
# Leakage-safe dataset split: hash-split by near-dup CLUSTER, not by doc.
# A per-doc split sends near-duplicates across the train/test boundary —
# the classic contamination path document-level dedup pipelines exist to
# prevent. Splitting on the cluster-canonical id keeps every member of a
# near-dup cluster in the same split; singleton docs are their own
# cluster. Composes the df-capped Jaccard pairs -> connected components
# -> canonical id pipeline with the portable md5-bucket cut.
# ---------------------------------------------------------------------------
_LEAKAGE_SPLIT_ORACLE = f"""
WITH RECURSIVE {_JACCARD_CTES}, sym AS (
  SELECT DISTINCT src, dst FROM (
    SELECT doc_a AS src, doc_b AS dst FROM kept
    UNION ALL SELECT doc_b, doc_a FROM kept
  ) t WHERE src <> dst
), walk(node, label) AS (
  SELECT src, src FROM sym
  UNION
  SELECT e.dst, w.label FROM walk w JOIN sym e ON e.src = w.node
  WHERE w.label < e.dst
), lbl AS (
  SELECT node AS doc_id, MIN(label) AS canonical_id FROM walk GROUP BY node
), canon AS (
  SELECT d.doc_id, COALESCE(l.canonical_id, d.doc_id) AS canonical_id
  FROM documents d LEFT JOIN lbl l ON l.doc_id = d.doc_id
), b AS (
  SELECT doc_id, canonical_id,
         CAST(concat('0x', substr(md5(CAST(canonical_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 10000 AS bucket
  FROM canon
)
SELECT doc_id, canonical_id,
       CASE WHEN bucket < 9000 THEN 'train'
            WHEN bucket < 9500 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


@register(
    "leakage_safe_split",
    _LEAKAGE_SPLIT_ORACLE,
    doc="train/val/test split hashed on the near-dup CLUSTER canonical id "
        "(Jaccard pairs -> connected components), so near-duplicates "
        "never straddle the train/test boundary — the leakage-safe form "
        "of dataset_split; singletons hash as their own cluster",
    tags=("text", "dedup", "sampling", "split"),
)
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.dedup import ngram_jaccard_pairs
    from ..extensions.sampling import assign_split
    from ..operators.graph import connected_components

    docs = load_testdata(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, id_col="doc_id", text_col="text",
                                n=3, threshold=0.1, max_df=100)
    cc = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    ).withColumnRenamed("node", "doc_id")
    canon = (
        docs.select("doc_id")
        .join(cc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("canonical_id"),
        )
    )
    return assign_split(canon, "canonical_id", train=0.9, val=0.05)


# ---------------------------------------------------------------------------
# C4-style boilerplate line filtering (round 4). The testdata documents
# are single-line word soup, so — exactly like the multimodal payload
# queries — the web-page SHAPE is synthesized deterministically from the
# data (5-word lines; every 7th line boilerplate, every 5th missing
# terminal punctuation, every 3rd too short) and the REAL operator
# (functions.text.c4_line_filter) runs over it. The oracle rebuilds the
# same synthetic page with DuckDB list lambdas and applies the same
# keep-rules; NB list_slice(l, a, b) is end-INCLUSIVE while Spark
# slice(l, a, n) takes a length, and DuckDB range(0, n) is
# end-EXCLUSIVE while Spark sequence(0, n-1) is inclusive.
# ---------------------------------------------------------------------------
_C4_BOILER = "please enable javascript to view."


def _c4_synth_lines():
    toks = X.tokens(F.col("text"))
    did = F.col("doc_id")
    n = (F.lit(4) + F.pmod(did, F.lit(4))).cast("int")

    def body(i, nwords):
        return F.array_join(F.slice(toks, i * 5 + 1, nwords), " ")

    def line(i):
        sel = F.pmod(did + i, F.lit(7)) == 0
        return (
            F.when(sel, F.lit(_C4_BOILER))
            .when(F.pmod(did + i, F.lit(5)) == 0, body(i, 5))
            .when(
                F.pmod(did + i, F.lit(3)) == 0,
                F.concat(body(i, 2), F.lit(".")),
            )
            .otherwise(F.concat(body(i, 5), F.lit(".")))
        )

    return F.transform(F.sequence(F.lit(0), n - 1), line)


@register(
    "c4_line_filter",
    f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split({_NORM}, ' '), w -> w <> '') AS tk
  FROM documents
), pages AS (
  SELECT doc_id,
         list_transform(range(0, 4 + doc_id % 4), i ->
           CASE
             WHEN (doc_id + i) % 7 = 0 THEN '{_C4_BOILER}'
             WHEN (doc_id + i) % 5 = 0
               THEN array_to_string(list_slice(tk, i*5 + 1, i*5 + 5), ' ')
             WHEN (doc_id + i) % 3 = 0
               THEN array_to_string(list_slice(tk, i*5 + 1, i*5 + 2), ' ')
                    || '.'
             ELSE array_to_string(list_slice(tk, i*5 + 1, i*5 + 5), ' ')
                  || '.'
           END) AS ls
  FROM toks
), kept AS (
  SELECT doc_id, ls,
         list_filter(ls, x ->
           substr(x, -1, 1) IN ('.', '!', '?')
           AND len(list_filter(string_split(x, ' '), w -> w <> '')) >= 3
           AND NOT contains(lower(x), 'javascript')
           AND NOT contains(lower(x), 'cookie')) AS kl
  FROM pages
)
SELECT doc_id, CAST(len(ls) AS INT) AS n_lines,
       CAST(len(kl) AS INT) AS n_kept,
       -- DuckDB array_to_string of an EMPTY list is NULL; Spark
       -- array_join is '' — coalesce to the Spark behavior
       COALESCE(array_to_string(kl, chr(10)), '') AS clean_text
FROM kept
""",
    doc="C4-style boilerplate removal (terminal-punctuation rule, "
        "min-3-words rule, javascript/cookie markers) over synthesized "
        "deterministic web pages: higher-order filter, whole-stage "
        "codegen, zero shuffles — the standard pre-quality line pass "
        "of a web-corpus pipeline",
    tags=("text", "quality"),
)
def q_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, "documents")
    lines = _c4_synth_lines()
    kept = X.c4_line_filter(lines)
    return docs.select(
        "doc_id",
        F.size(lines).cast("int").alias("n_lines"),
        F.size(kept).cast("int").alias("n_kept"),
        F.array_join(kept, "\n").alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# BPE ENCODE at scale (round 4): applying a trained merge table to a
# corpus — the tokenization pass every training run pays — as a pure
# map-only string expression (extensions.bpe.apply_merges_expr). The
# merge table here is a FIXED literal (training itself is the iterative
# bpe_merges query, rows-only by nature); with literals both engines
# apply the identical chained boundary-safe replaces, so the encode is
# hash-checkable end to end.
# ---------------------------------------------------------------------------
_BPE_ENC_MERGES = [
    ("s", "p"), ("sp", "a"), ("r", "k"), ("spa", "rk"),
    ("e", "</w>"), ("g", "e</w>"),
]


def _bpe_encode_oracle() -> str:
    repr_sql = "'(' || regexp_replace(w, '(.)', '\\1)(', 'g') || '</w>)'"
    for a, b in _BPE_ENC_MERGES:
        repr_sql = f"replace({repr_sql}, '({a})({b})', '({a}{b})')"
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split({_NORM}, ' '), w -> w <> '') AS tk
  FROM documents
), enc AS (
  SELECT doc_id, len(tk) AS n_words,
         array_to_string(
           list_transform(tk, w -> replace(trim({repr_sql}, '()'), ')(', ' ')),
           ' ') AS subword_text
  FROM toks
)
SELECT doc_id, CAST(n_words AS INT) AS n_words,
       CAST(len(list_filter(string_split(subword_text, ' '),
                            s -> s <> '')) AS INT) AS n_subwords,
       subword_text
FROM enc
"""


@register(
    "bpe_encode_tokens",
    _bpe_encode_oracle(),
    doc="BPE corpus tokenization (encode) with a fixed merge table: "
        "boundary-safe chained replaces apply merges in rank order, "
        "greedily, entirely inside whole-stage codegen — zero shuffles; "
        "training the table is bpe_merges' job, applying it at corpus "
        "scale is this one's",
    tags=("text", "tokenizer"),
)
def q_bpe_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.bpe import bpe_encode

    docs = load_testdata(spark, sf_dir, "documents")
    return bpe_encode(docs, _BPE_ENC_MERGES)


# ---------------------------------------------------------------------------
# Unigram-LM (SentencePiece-style) Viterbi encode with a FIXED literal
# vocabulary (training is the iterative unigram_vocab query, rows-only
# by nature — same split as bpe_merges vs bpe_encode_tokens). Integer
# piece costs make the DP engine-portable: the oracle unrolls the
# prefix-cost recurrence position-by-position (ROW_NUMBER argmin with
# the identical cost-then-shortest-piece tie-break) and reconstructs
# the segmentation with a recursive backtrace walk.
# ---------------------------------------------------------------------------
_UNI_VOCAB = {
    "window": 5, "stream": 5, "filter": 5, "spark": 5, "order": 6,
    "join": 6, "table": 6, "value": 6, "query": 6, "the": 7,
    "sc": 8, "an": 8, "cust": 9, "omer": 9, "col": 8, "umn": 9,
    "vec": 8, "tor": 8, "mer": 8, "ge": 8, "gr": 9, "oup": 9,
    "ha": 8, "sh": 8, "ro": 8, "li": 8, "ne": 8, "pa": 8, "rt": 8,
    "so": 8, "da": 8, "ta": 8, "ke": 9, "sl": 8, "ow": 8, "sm": 9,
    "all": 9, "fa": 8, "st": 8, "ba": 8, "tch": 9, "du": 8,
    "big": 9, "agg": 9, "a": 10, "w": 10, "y": 10, "p": 10,
}
_UNI_L = 6       # max piece length
_UNI_MAXW = 8    # longest corpus word ('customer')


def _unigram_encode_oracle() -> str:
    from ..extensions.unigram import UNK_COST4

    vocab_values = ", ".join(
        f"('{p}', {c})" for p, c in sorted(_UNI_VOCAB.items())
    )
    ctes = [
        f"""words AS (
  SELECT w AS word, COUNT(*) AS freq FROM (
    SELECT unnest(string_split({_NORM}, ' ')) AS w FROM documents
  ) WHERE w <> '' GROUP BY w
)""",
        f"vocab(piece, cost4) AS (SELECT * FROM (VALUES {vocab_values}))",
        "c0 AS (SELECT word, 0 AS cost, 0 AS j FROM words)",
    ]
    for p in range(1, _UNI_MAXW + 1):
        branches = []
        for j in range(1, min(_UNI_L, p) + 1):
            unk = UNK_COST4 if j == 1 else 1000000
            branches.append(f"""
    SELECT w.word,
           c.cost + COALESCE(v.cost4, {unk}) AS cost, {j} AS j
    FROM words w
    JOIN c{p - j} c ON c.word = w.word
    LEFT JOIN vocab v ON v.piece = substr(w.word, {p - j + 1}, {j})
    WHERE length(w.word) >= {p}""")
        ctes.append(f"""c{p} AS (
  SELECT word, cost, j FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY word ORDER BY cost, j) AS rn
    FROM ({" UNION ALL ".join(branches)})
  ) WHERE rn = 1
)""")
    dpall = " UNION ALL ".join(
        f"SELECT word, {p} AS pos, cost, j FROM c{p}"
        for p in range(1, _UNI_MAXW + 1)
    )
    ctes.append(f"dpall AS ({dpall})")
    ctes.append("""walk(word, pos, parts) AS (
  SELECT word, length(word), []::VARCHAR[] FROM words
  UNION ALL
  SELECT w.word, w.pos - d.j,
         list_prepend(substr(w.word, w.pos - d.j + 1, d.j), w.parts)
  FROM walk w JOIN dpall d ON d.word = w.word AND d.pos = w.pos
  WHERE w.pos > 0
)""")
    return f"""
WITH RECURSIVE {", ".join(ctes)}
SELECT w.word, w.freq,
       CAST(len(k.parts) AS INT) AS n_pieces,
       array_to_string(k.parts, ' ') AS segmentation,
       CAST(d.cost AS BIGINT) AS cost4
FROM words w
JOIN (SELECT word, parts FROM walk WHERE pos = 0) k USING (word)
JOIN (SELECT word, cost FROM dpall WHERE pos = length(word)) d USING (word)
"""


@register(
    "unigram_encode_tokens",
    _unigram_encode_oracle(),
    doc="unigram-LM (SentencePiece-style) Viterbi segmentation of the "
        "distinct-word table under a fixed integer-cost vocabulary: the "
        "DP and backtrace run as per-row higher-order folds in codegen "
        "(distinct words, not tokens — 10^7 DPs for a trillion-token "
        "corpus), argmin tie-break = lowest cost then shortest final "
        "piece, exactly mirrored by the oracle's unrolled recurrence + "
        "recursive backtrace",
    tags=("text", "tokenizer"),
)
def q_unigram_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.unigram import viterbi_segment, word_freqs

    docs = load_testdata(spark, sf_dir, "documents")
    words = word_freqs(docs)
    seg = viterbi_segment(words, _UNI_VOCAB, max_piece_len=_UNI_L)
    return seg.select(
        "word",
        "freq",
        F.size("pieces").alias("n_pieces"),
        F.concat_ws(" ", "pieces").alias("segmentation"),
        "cost4",
    )


# ---------------------------------------------------------------------------
# The unigram TRAINER (hard EM over the word table). Iterative argmin
# with data-dependent vocabulary pruning — not SQL-expressible, so the
# driver records a rows-only check (the bpe_merges precedent); the
# exact-convergence behavior is pytest-checked against a pure-Python
# reference in tests/test_unigram.py.
# ---------------------------------------------------------------------------


@register(
    "unigram_vocab",
    None,  # iterative hard-EM trainer: segment -> recount -> prune loop
    doc="unigram-LM tokenizer training by hard EM: seed with frequent "
        "substrings, then (Viterbi-segment distinct words -> recount "
        "pieces by corpus freq -> keep chars + top multi-char pieces -> "
        "renormalize) for a fixed number of rounds; returns the final "
        "(piece, count, cost4) vocabulary",
    tags=("text", "tokenizer", "iterative"),
)
def q_unigram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.unigram import unigram_train

    docs = load_testdata(spark, sf_dir, "documents")
    return unigram_train(docs, vocab_size=40, iters=3, max_piece_len=6)


# ---------------------------------------------------------------------------
# Cross-document duplicated spans (exact-substring dedup, Lee et al.
# 2022): positioned k-gram buckets + islands-and-gaps run merging —
# the suffix-array pass re-expressed as two keyed shuffles. See
# extensions.dedup.dup_span_detect for the scale analysis (no pair
# fan-out anywhere, so no frequency caps are needed).
# ---------------------------------------------------------------------------
_SPAN_K = 5
_SPAN_MIN = 6


@register(
    "dup_spans",
    f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents
), grams AS (
  SELECT doc_id, i - 1 AS pos,
         md5(array_to_string(list_slice(ws, i, i + {_SPAN_K - 1}), ' ')) AS g
  FROM toks, LATERAL unnest(generate_series(1, len(ws) - {_SPAN_K - 1}))
       AS u(i)
  WHERE len(ws) >= {_SPAN_K}
), shared AS (
  SELECT g, COUNT(DISTINCT doc_id) AS n_docs FROM grams GROUP BY g
  HAVING COUNT(DISTINCT doc_id) >= 2
), covered AS (
  SELECT grams.doc_id, grams.pos, shared.n_docs
  FROM grams JOIN shared USING (g)
), runs AS (
  SELECT doc_id, pos, n_docs,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM covered
)
SELECT doc_id, MIN(pos) AS span_start,
       MAX(pos) - MIN(pos) + {_SPAN_K} AS span_tokens,
       MAX(n_docs) AS max_share
FROM runs GROUP BY doc_id, grp
HAVING MAX(pos) - MIN(pos) + {_SPAN_K} >= {_SPAN_MIN}
""",
    doc="maximal cross-document duplicated token spans (>= "
        f"{_SPAN_MIN} tokens shared verbatim with another document) via "
        "positioned k-gram buckets and run merging — exact for spans "
        ">= k, no pair fan-out; the distributed form of the "
        "suffix-array substring-dedup pass",
    tags=("dedup", "spans", "text"),
)
def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.dedup import dup_span_detect

    docs = load_testdata(spark, sf_dir, "documents")
    return dup_span_detect(
        docs, "doc_id", "text", k=_SPAN_K, min_tokens=_SPAN_MIN
    ).select("doc_id", "span_start", "span_tokens", "max_share")


# ---------------------------------------------------------------------------
# The REMOVAL pass over the detected duplicated spans: group span
# occurrences by exact content, keep the lowest-(doc_id, span_start)
# canonical occurrence, cut every other one, rebuild the text. The
# oracle replays the full detect -> canonicalize -> cut -> rebuild
# pipeline: removed positions are expanded and anti-joined in SQL,
# while Spark cuts in-row with a higher-order filter — same result,
# hash-checked per document.
# ---------------------------------------------------------------------------


@register(
    "dup_span_removal",
    f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents
), grams AS (
  SELECT doc_id, i - 1 AS pos,
         md5(array_to_string(list_slice(ws, i, i + {_SPAN_K - 1}), ' ')) AS g
  FROM toks, LATERAL unnest(generate_series(1, len(ws) - {_SPAN_K - 1}))
       AS u(i)
  WHERE len(ws) >= {_SPAN_K}
), shared AS (
  SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
), runs AS (
  SELECT doc_id, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM grams JOIN shared USING (g)
), spans AS (
  SELECT doc_id, MIN(pos) AS s,
         MAX(pos) - MIN(pos) + {_SPAN_K} AS l
  FROM runs GROUP BY doc_id, grp
  HAVING MAX(pos) - MIN(pos) + {_SPAN_K} >= {_SPAN_MIN}
), occ AS (
  SELECT sp.doc_id, sp.s, sp.l,
         md5(array_to_string(list_slice(t.ws, sp.s + 1, sp.s + sp.l), ' '))
           AS h
  FROM spans sp JOIN toks t USING (doc_id)
), cut AS (
  SELECT doc_id, s, l FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY h
                                 ORDER BY doc_id, s) AS rn
    FROM occ
  ) WHERE rn > 1
), cutpos AS (
  SELECT DISTINCT doc_id, u.p
  FROM cut, LATERAL unnest(generate_series(s, s + l - 1)) AS u(p)
), positions AS (
  SELECT doc_id, i - 1 AS p, ws[i] AS w
  FROM toks, LATERAL unnest(generate_series(1, len(ws))) AS u(i)
), kept AS (
  SELECT doc_id, p, w FROM positions
  WHERE NOT EXISTS (SELECT 1 FROM cutpos c
                    WHERE c.doc_id = positions.doc_id AND c.p = positions.p)
), rebuilt AS (
  SELECT doc_id, string_agg(w, ' ' ORDER BY p) AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       COALESCE(r.clean_text, '') AS clean_text,
       CAST(len(t.ws) - COALESCE(r.n_kept, 0) AS INT) AS n_removed
FROM toks t LEFT JOIN rebuilt r USING (doc_id)
""",
    doc="exact-substring dedup REMOVAL: duplicated spans are grouped by "
        "content, the lowest-(doc_id, start) occurrence survives as the "
        "canonical copy, all others are cut in-row and the normalized "
        "text is rebuilt — the consuming half of dup_spans (Lee et al. "
        "2022 §4.1), no shared content lost from the corpus",
    tags=("dedup", "spans", "text"),
)
def q_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.dedup import dup_span_remove

    docs = load_testdata(spark, sf_dir, "documents")
    return dup_span_remove(
        docs, "doc_id", "text", k=_SPAN_K, min_tokens=_SPAN_MIN, keep="first"
    )


# ---------------------------------------------------------------------------
# Advanced quality signals: Flesch readability + character entropy
# (the Dolma-style gibberish detector). Entropy is computed WITHOUT an
# explode — 36 fixed per-char count terms summed in a pinned order, so
# the SQL mirror is literal; every numeric literal is cast ::DOUBLE
# (the DuckDB decimal-literal lesson from the JPEG oracle).
# ---------------------------------------------------------------------------
def _entropy_sql() -> str:
    terms = []
    for ch in X.SCORED_CHARS:
        cnt = f"CAST(length(s) - length(replace(s, '{ch}', '')) AS DOUBLE)"
        terms.append(
            f"(CASE WHEN {cnt} > 0 THEN -({cnt}/n)*log2({cnt}/n) "
            f"ELSE 0.0 END)"
        )
    return " + ".join(terms)


@register(
    "readability_stats",
    f"""
WITH base AS (
  SELECT doc_id, text,
         replace({_NORM}, ' ', '') AS s,
         GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
           AS n_sentences,
         len(string_split({_NORM}, ' ')) AS words
  FROM documents
), syl AS (
  SELECT *, GREATEST(len(regexp_extract_all({_NORM}, '[aeiouy]+')), words)
            AS n_syllables,
         CAST(NULLIF(length(s), 0) AS DOUBLE) AS n
  FROM base
)
SELECT doc_id,
       CAST(n_sentences AS INT) AS n_sentences,
       CAST(n_syllables AS INT) AS n_syllables,
       ROUND(206.835::DOUBLE - 1.015::DOUBLE*(CAST(words AS DOUBLE)/n_sentences)
             - 84.6::DOUBLE*(CAST(n_syllables AS DOUBLE)/words), 4) AS flesch,
       ROUND({_entropy_sql()}, 6) AS char_entropy
FROM syl
""",
    doc="advanced quality signals: Flesch reading ease (classic "
        "readability; word soup scores deeply negative) and Shannon "
        "entropy of the character distribution (gibberish/repetition "
        "detector) — both pure codegen, entropy via 36 fixed count "
        "terms with no explode, every literal IEEE-double on both "
        "engines",
    tags=("text", "quality"),
)
def q_readability_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r15 restructure (same values, same oracle): the naive form
    # re-evaluated normalized(text) per reference — flesch alone
    # references it 3x and char_entropy's 36 count terms reference its
    # stripped form ~100x — measured 3.7 s at sf0.1. The normalization
    # and the counts are bound as REAL columns behind Generate barriers
    # (inline — Projects cannot collapse through a Generate); the final
    # projection is arithmetic on attributes; the gated spread
    # parallelizes the single-split testdata scan (accepted: 2.60 ->
    # 1.56 s; no-op on a multi-split table). 3.7 s -> 1.56 s total,
    # equality asserted over the corpus.
    from ..io import spread_small_scan

    docs = spread_small_scan(
        load_testdata(spark, sf_dir, "documents"), key="doc_id"
    )
    base = docs.select(
        "doc_id",
        F.inline(F.array(F.struct(
            X.normalized(F.col("text")).alias("nrm"),
            X.sentence_count(F.col("text")).alias("n_sent"),
        ))),
    )
    nrm = F.col("nrm")
    syl = base.select(
        "doc_id",
        F.col("n_sent"),
        F.inline(F.array(F.struct(
            F.regexp_replace(nrm, " ", "").alias("s"),
            F.size(F.split(nrm, " ")).alias("words"),
            F.greatest(
                F.regexp_count(nrm, F.lit("[aeiouy]+")),
                F.size(F.split(nrm, " ")),
            ).alias("n_syl"),
        ))),
    )
    words_d = F.col("words").cast("double")
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (words_d / F.col("n_sent"))
        - F.lit(84.6) * (F.col("n_syl") / words_d)
    )
    return syl.select(
        "doc_id",
        F.col("n_sent").cast("int").alias("n_sentences"),
        F.col("n_syl").cast("int").alias("n_syllables"),
        F.round(flesch, 4).alias("flesch"),
        F.round(X.char_entropy_stripped(F.col("s")), 6).alias("char_entropy"),
    )


# ---------------------------------------------------------------------------
# Dataset card: the one-row datasheet a corpus release ships with —
# composition (docs/tokens/sources), language mix, exact-duplicate
# rate, and the quality distribution, all integer-exact or
# decimal-exact so the single row hash-checks. Every signal reuses the
# operator family that owns it.
# ---------------------------------------------------------------------------


@register(
    "dataset_card",
    f"""
WITH base AS (
  SELECT doc_id, source,
         len(string_split({_NORM}, ' ')) AS n_tok,
         md5({_NORM}) AS fp,
         {_QUALITY_SQL} AS q,
         CASE WHEN {_marker_sql('en')} >= GREATEST({_marker_sql('de')},
                   {_marker_sql('es')}, {_marker_sql('fr')})
               AND {_marker_sql('en')} + {_marker_sql('de')}
                   + {_marker_sql('es')} + {_marker_sql('fr')} > 0
              THEN 1 ELSE 0 END AS is_en
  FROM documents
), dup AS (
  SELECT fp, COUNT(*) AS n FROM base GROUP BY fp
)
SELECT
  (SELECT COUNT(*) FROM base) AS n_docs,
  (SELECT CAST(SUM(n_tok) AS BIGINT) FROM base) AS n_tokens,
  (SELECT COUNT(DISTINCT source) FROM base) AS n_sources,
  (SELECT CAST(FLOOR(SUM(is_en) * 1000000.0 / COUNT(*)) AS BIGINT)
   FROM base) AS en_ppm,
  (SELECT CAST(FLOOR(COALESCE(SUM(n - 1), 0) * 1000000.0
               / (SELECT COUNT(*) FROM base)) AS BIGINT)
   FROM dup WHERE n > 1) AS exact_dup_ppm,
  (SELECT ROUND(CAST(SUM(CAST(q AS DECIMAL(28,10))) AS DOUBLE)
                / COUNT(*), 6) FROM base) AS mean_quality,
  (SELECT CAST(FLOOR(SUM(CASE WHEN q < 0.3 THEN 1 ELSE 0 END)
               * 1000000.0 / COUNT(*)) AS BIGINT)
   FROM base) AS low_quality_ppm
""",
    doc="one-row dataset datasheet: composition (docs/tokens/sources), "
        "English share, exact-duplicate rate, and the quality "
        "distribution — integer-exact ppm rates and a decimal-exact "
        "quality mean, so the release-gate row itself hash-checks; "
        "two aggregation passes (corpus + fingerprint groups)",
    tags=("text", "quality", "provenance"),
)
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "source",
        X.token_count(F.col("text")).alias("n_tok"),
        F.md5(X.normalized(F.col("text"))).alias("fp"),
        X.quality_score(F.col("text")).alias("q"),
        (X.lang_id(F.col("text")) == "en").cast("int").alias("is_en"),
    )
    dup_extra = (
        base.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("extra"))
    )
    card = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.count_distinct("source").alias("n_sources"),
        F.floor(F.sum("is_en") * 1000000 / F.count(F.lit(1)))
        .cast("long")
        .alias("en_ppm"),
        F.round(
            F.sum(F.col("q").cast("decimal(28,10)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_quality"),
        F.floor(
            F.sum((F.col("q") < 0.3).cast("long")) * 1000000
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("low_quality_ppm"),
    )
    return card.crossJoin(F.broadcast(dup_extra)).select(
        "n_docs",
        "n_tokens",
        "n_sources",
        "en_ppm",
        F.floor(F.col("extra") * 1000000 / F.col("n_docs"))
        .cast("long")
        .alias("exact_dup_ppm"),
        "mean_quality",
        "low_quality_ppm",
    )


# ---------------------------------------------------------------------------
# Chunk-level dedup (the RAG-index prep step after chunking): identical
# chunk text across the corpus collapses to one canonical chunk —
# boilerplate windows repeated across thousands of pages would
# otherwise dominate a retrieval index. Composition of context_chunks
# + md5 fingerprint + first-occurrence window; the oracle composes the
# same two stages.
# ---------------------------------------------------------------------------


@register(
    "chunk_dedup",
    f"""
WITH t AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents
), s AS (
  SELECT doc_id, ws, len(ws) AS n FROM t
), st AS (
  SELECT doc_id, ws, n,
         unnest(generate_series(0,
           CASE WHEN n <= 32 THEN 0
                ELSE CAST(ceil((n - 32) / 24.0) * 24 AS INT) END,
           24)) AS start_off
  FROM s
), chunks AS (
  SELECT doc_id, CAST(start_off // 24 AS BIGINT) AS chunk_idx,
         md5(array_to_string(ws[start_off + 1 : start_off + 32], ' '))
           AS fp
  FROM st
)
SELECT doc_id, chunk_idx,
       (doc_id, chunk_idx) = MIN((doc_id, chunk_idx))
         OVER (PARTITION BY fp) AS is_canonical,
       CAST(COUNT(*) OVER (PARTITION BY fp) AS BIGINT) AS n_copies
FROM chunks
""",
    doc="chunk-level exact dedup for retrieval indexes: identical "
        "32-token context windows across the corpus collapse to the "
        "first-occurrence canonical (lowest doc, then chunk index), "
        "with the copy count exposed — chunking is per-row exprs, "
        "dedup is one fingerprint-window shuffle",
    tags=("text", "chunking", "dedup"),
)
def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..extensions.sampling import context_chunks

    docs = load_testdata(spark, sf_dir, "documents")
    chunks = context_chunks(docs, "doc_id", "text", size=32, overlap=8)
    w = Window.partitionBy("_fp")
    first = F.min(F.struct("doc_id", "chunk_idx")).over(w)
    return (
        chunks.withColumn("_fp", F.md5(F.col("chunk_text")))
        .select(
            "doc_id",
            "chunk_idx",
            (
                F.struct("doc_id", "chunk_idx") == first
            ).alias("is_canonical"),
            F.count(F.lit(1)).over(w).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# Dedup funnel report: per-tier impact of the dedup ladder, measured
# independently over the full corpus (exact fingerprints, near-dup
# clusters, duplicated spans) — the "what does each tier actually
# remove" row every dedup deployment reports. One hash-checked frame
# composing the three families' oracles.
# ---------------------------------------------------------------------------


@register(
    "dedup_funnel_report",
    f"""
WITH RECURSIVE {_JACCARD_CTES}, nstats AS (
  SELECT doc_id, md5({_NORM}) AS fp,
         len(string_split({_NORM}, ' ')) AS nt
  FROM documents
), exact_sub AS (
  SELECT COUNT(*) AS n_docs,
         CAST(COALESCE(SUM(nt), 0) AS BIGINT) AS n_tokens FROM (
    SELECT doc_id, nt,
           MIN(doc_id) OVER (PARTITION BY fp) AS canon
    FROM nstats
  ) WHERE doc_id <> canon
), sym AS (
  SELECT DISTINCT src, dst FROM (
    SELECT doc_a AS src, doc_b AS dst FROM kept
    UNION ALL SELECT doc_b, doc_a FROM kept
  ) t WHERE src <> dst
), walk(node, label) AS (
  SELECT src, src FROM sym
  UNION
  SELECT e.dst, w.label FROM walk w JOIN sym e ON e.src = w.node
  WHERE w.label < e.dst
), comp AS (
  SELECT node, MIN(label) AS component FROM walk GROUP BY node
), near_sub AS (
  SELECT COUNT(*) AS n_docs,
         CAST(COALESCE(SUM(n.nt), 0) AS BIGINT) AS n_tokens
  FROM comp c JOIN nstats n ON n.doc_id = c.node
  WHERE c.node <> c.component
), sgrams AS (
  SELECT doc_id, i - 1 AS pos,
         md5(array_to_string(list_slice(w, i, i + {_SPAN_K - 1}), ' '))
           AS g
  FROM tok, LATERAL unnest(generate_series(1, len(w) - {_SPAN_K - 1}))
       AS u(i)
  WHERE len(w) >= {_SPAN_K}
), sshared AS (
  SELECT g FROM sgrams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
), sruns AS (
  SELECT doc_id, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM sgrams JOIN sshared USING (g)
), sspans AS (
  SELECT doc_id, MIN(pos) AS s,
         MAX(pos) - MIN(pos) + {_SPAN_K} AS l
  FROM sruns GROUP BY doc_id, grp
  HAVING MAX(pos) - MIN(pos) + {_SPAN_K} >= {_SPAN_MIN}
), socc AS (
  SELECT sp.doc_id, sp.s, sp.l,
         md5(array_to_string(list_slice(t.w, sp.s + 1, sp.s + sp.l), ' '))
           AS h
  FROM sspans sp JOIN tok t USING (doc_id)
), scut AS (
  SELECT doc_id, s, l FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, s) AS rn
    FROM socc
  ) WHERE rn > 1
), scutpos AS (
  SELECT DISTINCT doc_id, u.p
  FROM scut, LATERAL unnest(generate_series(s, s + l - 1)) AS u(p)
), span_sub AS (
  SELECT COUNT(DISTINCT doc_id) AS n_docs,
         COALESCE(COUNT(*), 0) AS n_tokens
  FROM scutpos
)
SELECT 'exact' AS tier, n_docs, n_tokens FROM exact_sub
UNION ALL SELECT 'near_dup', n_docs, n_tokens FROM near_sub
UNION ALL SELECT 'span', n_docs, n_tokens FROM span_sub
""",
    doc="the dedup-ladder impact report: docs affected and tokens "
        "removable per tier — exact fingerprints (whole non-canonical "
        "docs), near-dup clusters (non-canonical members), duplicated "
        "spans (cut positions under keep-first) — each measured "
        "independently over the corpus; one hash-checked 3-row frame "
        "composing the three families' oracles",
    tags=("text", "dedup", "diagnostics"),
)
def q_dedup_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..extensions.dedup import (
        dup_span_remove,
        ngram_jaccard_pairs,
    )
    from ..operators.graph import connected_components

    docs = load_testdata(spark, sf_dir, "documents")
    nstats = docs.select(
        "doc_id",
        F.md5(X.normalized(F.col("text"))).alias("fp"),
        X.token_count(F.col("text")).alias("nt"),
    ).localCheckpoint()
    w = Window.partitionBy("fp")
    exact = (
        nstats.withColumn("canon", F.min("doc_id").over(w))
        .filter(F.col("doc_id") != F.col("canon"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("nt"), F.lit(0)).alias("n_tokens"),
        )
        .select(F.lit("exact").alias("tier"), "n_docs", "n_tokens")
    )
    pairs = ngram_jaccard_pairs(docs, id_col="doc_id", text_col="text",
                                n=3, threshold=0.1, max_df=100)
    cc = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    near = (
        cc.filter(F.col("node") != F.col("component"))
        .join(nstats.withColumnRenamed("doc_id", "node"), "node")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("nt"), F.lit(0)).alias("n_tokens"),
        )
        .select(F.lit("near_dup").alias("tier"), "n_docs", "n_tokens")
    )
    span = (
        dup_span_remove(docs, "doc_id", "text", k=_SPAN_K,
                        min_tokens=_SPAN_MIN, keep="first")
        .filter(F.col("n_removed") > 0)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("n_removed"), F.lit(0)).cast("long")
            .alias("n_tokens"),
        )
        .select(F.lit("span").alias("tier"), "n_docs", "n_tokens")
    )
    return exact.unionByName(near).unionByName(span)


# ---------------------------------------------------------------------------
# WordPiece ENCODE (extensions/wordpiece.py): greedy longest-match-first
# with a FIXED literal vocab — the BERT-family tokenizer next to the BPE
# merge-replay and unigram Viterbi encoders. The oracle replays the
# same greedy walk with a recursive CTE, so the hash check proves the
# longest-match precedence, the ## continuation convention, and the
# char fallback all behave identically.
# ---------------------------------------------------------------------------
_WP_VOCAB = (
    [chr(c) for c in range(97, 123)]
    + [str(d) for d in range(10)]
    + ["th", "the", "sc", "scan", "sp", "spark", "st", "stream",
       "wi", "win", "window", "ba", "batch", "jo", "join", "or",
       "order", "ke", "key", "ha", "hash", "me", "merge", "ta",
       "table", "so", "sort", "fa", "fast", "sm", "small", "pa",
       "part", "du", "dup"]
    + ["##" + chr(c) for c in range(97, 123)]
    + ["##" + str(d) for d in range(10)]
    + ["##ark", "##an", "##ream", "##dow", "##tch", "##der", "##ble",
       "##rge", "##all", "##art", "##ast", "##ey", "##in", "##rt",
       "##st", "##er", "##le", "##ge"]
)
_WP_VOCAB_SQL = "[" + ", ".join("'" + v + "'" for v in _WP_VOCAB) + "]"
_WP_L = 8

_WP_ORACLE = f"""
WITH RECURSIVE tok AS (
  SELECT string_split({_NORM}, ' ') AS ws FROM documents
), words AS (
  SELECT DISTINCT w AS word FROM (SELECT unnest(ws) AS w FROM tok) t
  WHERE w <> ''
), walk(word, pos, parts) AS (
  SELECT word, 0, CAST([] AS VARCHAR[]) FROM words
  UNION ALL
  SELECT word, pos + jj, list_append(parts, pc) FROM (
    SELECT word, pos, parts,
           COALESCE(fnd[1], 1) AS jj,
           CASE WHEN len(fnd) > 0 THEN
             CASE WHEN pos = 0 THEN substr(word, 1, fnd[1])
                  ELSE '##' || substr(word, pos + 1, fnd[1]) END
           ELSE '[UNK]' END AS pc
    FROM (
      SELECT word, pos, parts,
             list_filter(
               generate_series(LEAST({_WP_L}, length(word) - pos), 1, -1),
               j -> list_contains({_WP_VOCAB_SQL},
                 CASE WHEN pos = 0 THEN substr(word, 1, j)
                      ELSE '##' || substr(word, pos + 1, j) END)) AS fnd
      FROM walk WHERE pos < length(word)
    ) a
  ) b
)
SELECT word, array_to_string(parts, ' ') AS wp_tokens,
       CAST(len(parts) AS INT) AS n_pieces
FROM walk WHERE pos = length(word)
"""


@register(
    "wordpiece_encode_tokens",
    _WP_ORACLE,
    doc="WordPiece (BERT-style) greedy longest-match-first encode over "
        "the distinct-word table with a fixed literal vocab and ## "
        "continuations — a codegen fold (zero Python, zero shuffles "
        "past the distinct), max len(word) steps of O(max_piece_len) "
        "membership probes; char fallback to [UNK] documented and "
        "mirrored by the oracle's recursive walk",
    tags=("text", "tokenizer"),
)
def q_wordpiece_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.wordpiece import wordpiece_encode_expr

    docs = load_testdata(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(X.tokens(F.col("text"))).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )
    enc = words.select(
        "word",
        wordpiece_encode_expr(F.col("word"), _WP_VOCAB, _WP_L).alias("p"),
    )
    return enc.select(
        "word",
        F.array_join("p", " ").alias("wp_tokens"),
        F.size("p").cast("int").alias("n_pieces"),
    )


# ---------------------------------------------------------------------------
# N-gram novelty (extensions/dedup.ngram_novelty): share of each doc's
# distinct shingles FIRST introduced by it — the corpus-freshness
# signal; inverted index consumed as one argmin per shingle, no
# pairwise expansion.
# ---------------------------------------------------------------------------
_NOVELTY_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
), sh AS (
  SELECT DISTINCT doc_id, unnest(
    CASE WHEN len(w) < 3 THEN []
         ELSE list_transform(generate_series(1, len(w) - 2),
                             i -> array_to_string(w[i:i+2], ' '))
    END) AS shingle
  FROM tok
), own AS (
  SELECT shingle, MIN(doc_id) AS owner FROM sh GROUP BY shingle
)
SELECT sh.doc_id, CAST(COUNT(*) AS INT) AS n_shingles,
       CAST(FLOOR(SUM(CASE WHEN own.owner = sh.doc_id THEN 1 ELSE 0 END)
                  * 1000000.0 / COUNT(*)) AS BIGINT) AS novelty_ppm
FROM sh JOIN own USING (shingle)
GROUP BY sh.doc_id
"""


@register(
    "ngram_novelty",
    _NOVELTY_ORACLE,
    doc="per-doc novelty: ppm of its distinct 3-gram shingles first "
        "introduced by it (owner = lowest doc id) — boilerplate/remix "
        "detector that needs no pairwise match; the Jaccard family's "
        "inverted index consumed as one argmin per shingle + one join "
        "back, so zipfian shingles cost df, never df^2",
    tags=("text", "dedup", "quality"),
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.dedup import ngram_novelty

    docs = load_testdata(spark, sf_dir, "documents")
    return ngram_novelty(docs, id_col="doc_id", text_col="text", n=3)


# ---------------------------------------------------------------------------
# Tokenizer fertility: the corpus-level subwords-per-word rollup that
# decides whether a tokenizer suits a language slice (fertility near 1
# = vocabulary fits; >> 1 = the slice pays a token tax). Composes the
# BPE encode (fixed merge table) with a (lang, source) aggregation.
# ---------------------------------------------------------------------------
def _fertility_oracle() -> str:
    enc = _bpe_encode_oracle()
    return f"""
WITH enc AS ({enc})
SELECT d.lang, d.source,
       CAST(SUM(e.n_words) AS BIGINT) AS n_words,
       CAST(SUM(e.n_subwords) AS BIGINT) AS n_subwords,
       CAST(FLOOR(SUM(e.n_subwords) * 1000000.0 / SUM(e.n_words))
            AS BIGINT) AS fertility_ppm
FROM enc e JOIN documents d ON e.doc_id = d.doc_id
GROUP BY d.lang, d.source
"""


@register(
    "tokenizer_fertility",
    _fertility_oracle(),
    doc="corpus-level tokenizer fertility (subwords per word, ppm) per "
        "(lang, source) under the fixed BPE merge table — the signal "
        "that flags language slices paying a token tax; map-only "
        "encode + one id join + one map-side-combined rollup",
    tags=("text", "tokenizer", "diagnostics"),
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.bpe import bpe_encode

    docs = load_testdata(spark, sf_dir, "documents")
    enc = bpe_encode(docs, _BPE_ENC_MERGES).select(
        "doc_id", "n_words", "n_subwords"
    )
    j = enc.join(docs.select("doc_id", "lang", "source"), "doc_id")
    return j.groupBy("lang", "source").agg(
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_subwords").cast("long").alias("n_subwords"),
        F.floor(
            F.sum("n_subwords") * 1000000.0 / F.sum("n_words")
        ).cast("long").alias("fertility_ppm"),
    )


# ---------------------------------------------------------------------------
# Blocklist phrase filter: the banned-phrase curation pass every corpus
# release runs. Whole-word multi-word phrase matching on the normalized
# text — pure codegen (space-padded containment over a literal phrase
# array). At 10^5+ phrases the same semantics move to a token-keyed
# inverted join (phrase first-words as the probe key); the literal-array
# form is the right plan for release-sized blocklists (10^2..10^3).
# ---------------------------------------------------------------------------
_BLOCK_PHRASES = [
    "fast key order",
    "spark window",
    "batch stream",
    "hash scan join",
]
_BLOCK_SQL = "[" + ", ".join(f"'{p}'" for p in _BLOCK_PHRASES) + "]"

_BLOCKLIST_ORACLE = f"""
WITH n AS (
  SELECT doc_id, ' ' || {_NORM} || ' ' AS padded FROM documents
), h AS (
  SELECT doc_id,
         list_filter({_BLOCK_SQL},
                     p -> contains(padded, ' ' || p || ' ')) AS hits
  FROM n
)
SELECT doc_id, CAST(len(hits) AS INT) AS n_hits,
       COALESCE(array_to_string(hits, '|'), '') AS hit_phrases,
       len(hits) > 0 AS blocked
FROM h
"""


@register(
    "blocklist_filter",
    _BLOCKLIST_ORACLE,
    doc="banned-phrase curation filter: whole-word multi-word phrase "
        "matching over normalized text against a literal blocklist — "
        "map-only codegen, zero shuffles, zero Python; per-doc hit "
        "list + blocked flag (audit mode, like url_frequency_cap)",
    tags=("text", "quality", "compliance"),
)
def q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), X.normalized(F.col("text")), F.lit(" "))
    hits = F.filter(
        F.array(*[F.lit(p) for p in _BLOCK_PHRASES]),
        lambda p: padded.contains(F.concat(F.lit(" "), p, F.lit(" "))),
    )
    return docs.select(
        "doc_id",
        F.size(hits).cast("int").alias("n_hits"),
        F.array_join(hits, "|").alias("hit_phrases"),
        (F.size(hits) > 0).alias("blocked"),
    )


# ---------------------------------------------------------------------------
# The composed corpus-curation pipeline: quality gate -> lang-ID ->
# exact-dedup canonical -> blocklist -> perplexity tier -> shard
# assignment, every stage the REAL operator chained in ONE plan (the
# text-side sibling of web_pipeline). Audit-mode output: every doc with
# its per-stage decisions, the final keep verdict, and the training
# shard kept docs land in — one hash-green row proves the stages
# compose without interference.
# ---------------------------------------------------------------------------
_CUR_T1, _CUR_T2 = 3390000, 3416000  # perplexity_mixture's cutoffs


def _hex13_sql(expr: str) -> str:
    """First 13 md5 hex digits as a BIGINT (mirror of
    extensions.export.shuffle_hash), strpos arithmetic only."""
    parts = [
        f"(strpos('0123456789abcdef', substr({expr}, {i + 1}, 1)) - 1)"
        f" * {16 ** (12 - i)}"
        for i in range(13)
    ]
    return "(" + " + ".join(parts) + ")"


def _curation_oracle() -> str:
    from .ranking import _LM_ORACLE

    lang_pred = (
        f"CASE WHEN {_marker_sql('en')} + {_marker_sql('de')}"
        f" + {_marker_sql('es')} + {_marker_sql('fr')} = 0 THEN 'und'"
        f" WHEN {_marker_sql('en')} >= GREATEST({_marker_sql('de')},"
        f" {_marker_sql('es')}, {_marker_sql('fr')}) THEN 'en'"
        f" WHEN {_marker_sql('de')} >= GREATEST({_marker_sql('es')},"
        f" {_marker_sql('fr')}) THEN 'de'"
        f" WHEN {_marker_sql('es')} >= {_marker_sql('fr')} THEN 'es'"
        f" ELSE 'fr' END"
    )
    return f"""
WITH lmsc AS (
  SELECT doc_id, CAST(FLOOR(avg_nll * 1000000) AS BIGINT) AS nll_ppm
  FROM ({_LM_ORACLE}) t
), base AS (
  SELECT doc_id,
         CAST(FLOOR({_QUALITY_SQL} * 1000000) AS BIGINT) >= 300000
           AS quality_ok,
         ({lang_pred}) = 'en' AS is_en,
         md5({_NORM}) AS fp,
         len(list_filter({_BLOCK_SQL},
             p -> contains(' ' || {_NORM} || ' ', ' ' || p || ' '))) > 0
           AS blocked,
         md5('0:' || CAST(doc_id AS VARCHAR)) AS shash
  FROM documents
), canon AS (
  SELECT *, doc_id = MIN(doc_id) OVER (PARTITION BY fp) AS is_canonical
  FROM base
), tiers AS (
  SELECT c.*, CASE WHEN l.nll_ppm IS NULL THEN 'short'
                   WHEN l.nll_ppm < {_CUR_T1} THEN 'head'
                   WHEN l.nll_ppm < {_CUR_T2} THEN 'middle'
                   ELSE 'tail' END AS tier
  FROM canon c LEFT JOIN lmsc l ON c.doc_id = l.doc_id
), verdict AS (
  SELECT *, quality_ok AND is_en AND is_canonical AND NOT blocked
            AND tier IN ('head', 'middle') AS kept
  FROM tiers
)
SELECT doc_id, quality_ok, is_en, is_canonical, blocked, tier, kept,
       CASE WHEN kept
            THEN CAST({_hex13_sql('shash')} % 8 AS INT) END AS shard
FROM verdict
"""


@register(
    "curation_pipeline",
    _curation_oracle(),
    doc="the composed corpus-curation pipeline in ONE plan: quality "
        "gate, lang-ID, exact-dedup canonical selection, blocklist, "
        "perplexity tiering (fixed cutoffs), and training-shard "
        "assignment for survivors — audit-mode per-doc decisions "
        "hash-checked end-to-end; map-only except the fingerprint "
        "window and the LM score join",
    tags=("text", "quality", "dedup", "sampling", "pipeline"),
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..extensions.export import shuffle_hash
    from ..extensions.ranking import bigram_lm_scores
    from ..io import spread_small_scan

    docs = load_testdata(spark, sf_dir, "documents")
    scored = bigram_lm_scores(docs, add_k=0.5).select(
        "doc_id",
        F.floor(F.col("avg_nll") * 1000000).cast("long").alias("nll_ppm"),
    )
    padded = F.concat(F.lit(" "), X.normalized(F.col("text")), F.lit(" "))
    hits = F.filter(
        F.array(*[F.lit(p) for p in _BLOCK_PHRASES]),
        lambda p: padded.contains(F.concat(F.lit(" "), p, F.lit(" "))),
    )
    # gated spread (no-op on a multi-split table): the 4-signal base
    # projection is the pipeline's heaviest map stage and would
    # otherwise run on the testdata file's single scan task
    base = spread_small_scan(docs, key="doc_id").select(
        "doc_id",
        (F.floor(X.quality_score(F.col("text")) * 1000000) >= 300000)
        .alias("quality_ok"),
        (X.lang_id(F.col("text")) == "en").alias("is_en"),
        X.fingerprint(F.col("text")).alias("fp"),
        (F.size(hits) > 0).alias("blocked"),
    )
    w = Window.partitionBy("fp")
    canon = base.withColumn(
        "is_canonical", F.col("doc_id") == F.min("doc_id").over(w)
    )
    # shuffle_hash: scored leaves its groupBy already hash-partitioned
    # by doc_id (no exchange) and is the bounded per-doc score table —
    # SHJ builds from it and skips SortMergeJoin's two full sorts
    # (VERDICT r14 #4, guide §3.1)
    tiers = canon.join(scored.hint("shuffle_hash"), "doc_id", "left").withColumn(
        "tier",
        F.when(F.col("nll_ppm").isNull(), "short")
        .when(F.col("nll_ppm") < _CUR_T1, "head")
        .when(F.col("nll_ppm") < _CUR_T2, "middle")
        .otherwise("tail"),
    )
    verdict = tiers.withColumn(
        "kept",
        F.col("quality_ok") & F.col("is_en") & F.col("is_canonical")
        & ~F.col("blocked") & F.col("tier").isin("head", "middle"),
    )
    return verdict.select(
        "doc_id", "quality_ok", "is_en", "is_canonical", "blocked",
        "tier", "kept",
        F.when(
            F.col("kept"),
            F.pmod(shuffle_hash(F.col("doc_id"), 0), F.lit(8)).cast("int"),
        ).alias("shard"),
    )


# ---------------------------------------------------------------------------
# Temperature-balanced sampling WITHOUT replacement: exact per-source
# quotas from the T=2 sqrt-share mixture + derandomized E-S member
# selection — the balanced-subcorpus sampler (UNIMAX-flavored) where
# temperature_mixture's hash-rate cut gives only EXPECTED counts.
# ---------------------------------------------------------------------------
_TSW_BUDGET = 100

_TSW_ORACLE = f"""
WITH totals AS (
  SELECT source, SUM(n_chars) AS tot FROM documents GROUP BY source
), shares AS (
  SELECT source, tot,
         sqrt(tot * 1.0 / SUM(tot) OVER (ORDER BY source
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) AS q
  FROM totals
), exact AS (
  SELECT source,
         {float(_TSW_BUDGET)} * q / SUM(q) OVER (ORDER BY source
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS ex
  FROM shares
), quota AS (
  -- largest-remainder apportionment: floors, then +1 to the biggest
  -- fractional shares (tie-broken by source) until the budget is exact
  SELECT source,
         CAST(FLOOR(ex) AS BIGINT)
         + CASE WHEN ROW_NUMBER() OVER (ORDER BY ex - FLOOR(ex) DESC,
                                        source)
                  <= {_TSW_BUDGET} - SUM(CAST(FLOOR(ex) AS BIGINT))
                       OVER (ORDER BY source ROWS BETWEEN UNBOUNDED
                             PRECEDING AND UNBOUNDED FOLLOWING)
                THEN 1 ELSE 0 END AS n_take
  FROM exact
), keyed AS (
  SELECT doc_id, source, n_chars,
         ROUND(LN((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                   1, 8)) AS BIGINT) + 0.5) / 4294967296.0)
               / CAST(n_chars AS DOUBLE), 12) AS es_key
  FROM documents WHERE n_chars > 0
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY es_key DESC, doc_id) AS rn
  FROM keyed
)
SELECT r.doc_id, r.source, r.n_chars, r.es_key,
       CAST(r.rn AS INT) AS rank_in_source
FROM ranked r JOIN quota q ON r.source = q.source
WHERE r.rn <= q.n_take
"""


@register(
    "temperature_sample_wor",
    _TSW_ORACLE,
    doc="temperature-balanced sampling WITHOUT replacement: per-source "
        "doc quotas from the T=2 sqrt-share mixture (exact counts, not "
        "the hash-rate cut's expected counts), members the derandomized "
        "E-S winners within each source — sources-sized quota frame "
        "broadcast back, one shuffle on the source key",
    tags=("text", "sampling"),
)
def q_temperature_sample_wor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.sampling import temperature_sample_wor

    docs = load_testdata(spark, sf_dir, "documents")
    return temperature_sample_wor(
        docs, key_col="doc_id", source_col="source",
        token_col="n_chars", budget_docs=_TSW_BUDGET,
    )


# ---------------------------------------------------------------------------
# Lang-ID confusion matrix: the evaluation report for the marker
# heuristic against the labeled lang column — per (labeled, predicted)
# cell counts with integer-exact row shares; the report that says
# which languages the heuristic confuses before it gates a corpus.
# ---------------------------------------------------------------------------
_LANGID_CONFUSION_ORACLE = f"""
WITH pred AS ({_LANG_ORACLE})
SELECT labeled_lang, predicted_lang, COUNT(*) AS n,
       CAST(FLOOR(COUNT(*) * 1000000.0
                  / SUM(COUNT(*)) OVER (PARTITION BY labeled_lang))
            AS BIGINT) AS row_share_ppm
FROM pred GROUP BY labeled_lang, predicted_lang
"""


@register(
    "langid_confusion",
    _LANGID_CONFUSION_ORACLE,
    doc="lang-ID evaluation: confusion matrix of the marker heuristic "
        "vs the labeled lang with integer-exact per-label shares — the "
        "report that says which languages get confused before the "
        "heuristic gates a corpus; one aggregation, totals window over "
        "the languages-squared frame",
    tags=("text", "langid", "diagnostics"),
)
def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_testdata(spark, sf_dir, "documents")
    pred = docs.select(
        F.col("lang").alias("labeled_lang"),
        X.lang_id(F.col("text")).alias("predicted_lang"),
    )
    cells = pred.groupBy("labeled_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    per_label = Window.partitionBy("labeled_lang")
    return cells.select(
        "labeled_lang", "predicted_lang", "n",
        F.floor(F.col("n") * 1000000.0 / F.sum("n").over(per_label))
        .cast("long")
        .alias("row_share_ppm"),
    )


# ---------------------------------------------------------------------------
# Cross-source contamination matrix: near-dup pairs rolled up by the
# (source_a, source_b) of their endpoints — the report that catches
# mirror sites and cross-feed copying (a heavy off-diagonal cell means
# two "independent" sources aren't). Composes the capped Jaccard
# inverted index; the rollup itself is one id join per endpoint + one
# aggregation over the pair list.
# ---------------------------------------------------------------------------
_XSRC_ORACLE = f"""
WITH {_JACCARD_CTES}
SELECT LEAST(da.source, db.source) AS source_x,
       GREATEST(da.source, db.source) AS source_y,
       COUNT(*) AS n_pairs,
       CAST(SUM(CAST(ROUND(jaccard, 6) AS DECIMAL(18,6))) AS DOUBLE)
         AS jaccard_mass
FROM kept k
JOIN documents da ON da.doc_id = k.doc_a
JOIN documents db ON db.doc_id = k.doc_b
GROUP BY LEAST(da.source, db.source), GREATEST(da.source, db.source)
"""


@register(
    "cross_source_contamination",
    _XSRC_ORACLE,
    doc="near-dup pairs rolled up by the unordered (source, source) of "
        "their endpoints with DECIMAL-exact jaccard mass — the mirror-"
        "site detector: heavy off-diagonal cells mean two 'independent' "
        "sources copy each other; two id joins + one aggregation over "
        "the (already capped) pair list",
    tags=("text", "dedup", "diagnostics", "provenance"),
)
def q_cross_source_contamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..extensions.dedup import ngram_jaccard_pairs

    docs = load_testdata(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, id_col="doc_id", text_col="text", n=3,
        threshold=0.1, max_df=100,
    )
    src = docs.select("doc_id", "source")
    joined = (
        pairs.join(
            src.select(F.col("doc_id").alias("doc_a"),
                       F.col("source").alias("_sa")),
            "doc_a",
        )
        .join(
            src.select(F.col("doc_id").alias("doc_b"),
                       F.col("source").alias("_sb")),
            "doc_b",
        )
    )
    return joined.groupBy(
        F.least("_sa", "_sb").alias("source_x"),
        F.greatest("_sa", "_sb").alias("source_y"),
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        # round-to-6 FIRST (cross-engine identical, as the pair query
        # proves), then sum exactly as DECIMAL — casting a raw double
        # to a 12-digit decimal hits engine rounding-mode knife edges
        F.sum(F.round(F.col("jaccard"), 6).cast("decimal(18,6)"))
        .cast("double").alias("jaccard_mass"),
    )


# ---------------------------------------------------------------------------
# Dedup-cluster size histogram: how big are the near-dup families —
# the planning distribution behind dedup cost estimates (one mega-
# cluster means a boilerplate template; a long tail of pairs means
# organic copying). Non-trivial clusters come from the CC fixpoint;
# singletons are everything else; one aggregation over the per-doc
# assignment.
# ---------------------------------------------------------------------------
_CLUSTER_HIST_ORACLE = f"""
WITH RECURSIVE {_JACCARD_CTES}, sym AS (
  SELECT DISTINCT src, dst FROM (
    SELECT doc_a AS src, doc_b AS dst FROM kept
    UNION ALL SELECT doc_b, doc_a FROM kept
  ) t WHERE src <> dst
), walk(node, label) AS (
  SELECT src, src FROM sym
  UNION
  SELECT e.dst, w.label FROM walk w JOIN sym e ON e.src = w.node
  WHERE w.label < e.dst
), comp AS (
  SELECT node, MIN(label) AS component FROM walk GROUP BY node
), csizes AS (
  SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY component
), hist AS (
  SELECT cluster_size, COUNT(*) AS n_clusters FROM csizes
  GROUP BY cluster_size
), singletons AS (
  SELECT 1 AS cluster_size,
         (SELECT COUNT(*) FROM documents)
         - (SELECT COUNT(*) FROM comp) AS n_clusters
)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(n_clusters AS BIGINT) AS n_clusters
FROM (
  SELECT * FROM hist UNION ALL
  SELECT * FROM singletons WHERE n_clusters > 0
) u
"""


@register(
    "dedup_cluster_histogram",
    _CLUSTER_HIST_ORACLE,
    doc="near-dup family size distribution: CC cluster sizes + the "
        "singleton count — the planning histogram behind dedup cost "
        "estimates (a mega-cluster = boilerplate template, a pair tail "
        "= organic copying); one aggregation over the per-doc "
        "assignment",
    tags=("text", "dedup", "diagnostics"),
)
def q_dedup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.dedup import ngram_jaccard_pairs
    from ..operators.graph import connected_components

    docs = load_testdata(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, id_col="doc_id", text_col="text",
                                n=3, threshold=0.1, max_df=100)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    cc = connected_components(edges)
    sizes = cc.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    hist = sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters")
    ).select(
        F.col("cluster_size").cast("long"),
        F.col("n_clusters").cast("long"),
    )
    # singletons: anti-join, counted distributedly (no driver scalars)
    single_hist = (
        docs.select(F.col("doc_id").alias("node"))
        .join(cc.select("node"), "node", "left_anti")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            F.lit(1).cast("long").alias("cluster_size"),
            F.col("n_clusters").cast("long"),
        )
        .filter(F.col("n_clusters") > 0)
    )
    return hist.unionByName(single_hist)


# ---------------------------------------------------------------------------
# Asymmetric containment: the quote-inclusion / subset-document case
# Jaccard misses — C(A|B) = |sh(A) & sh(B)| / |sh(A)| over the same
# capped shingle universe as ngram_jaccard_pairs. The contamination-
# style signal: a short doc embedded in a long one has tiny Jaccard
# but containment ~1.
# ---------------------------------------------------------------------------
_CONTAINMENT_ORACLE = f"""
WITH {_JACCARD_CTES.replace(
    "shared * 1.0 / (sa.n + sb.n - shared) AS jaccard",
    "shared * 1.0 / sa.n AS ca, shared * 1.0 / sb.n AS cb").replace(
    "WHERE shared * 1.0 / (sa.n + sb.n - shared) >= 0.1",
    "WHERE GREATEST(shared * 1.0 / sa.n, shared * 1.0 / sb.n) >= 0.4")}
SELECT doc_a, doc_b, shared,
       ROUND(ca, 6) AS containment_a,
       ROUND(cb, 6) AS containment_b
FROM kept
"""


@register(
    "containment_pairs",
    _CONTAINMENT_ORACLE,
    doc="asymmetric n-gram containment over the capped shingle "
        "universe: emits each candidate pair with BOTH directions' "
        "containment, kept when either clears 0.4 — catches subset/"
        "quote-inclusion duplicates (and benchmark contamination "
        "inside larger pages) that symmetric Jaccard misses; same "
        "two-shuffle inverted-index shape and df cap as "
        "ngram_jaccard_pairs",
    tags=("text", "dedup"),
)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.dedup import ngram_containment_pairs

    docs = load_testdata(spark, sf_dir, "documents")
    return ngram_containment_pairs(
        docs, id_col="doc_id", text_col="text", n=3, threshold=0.4,
        max_df=100,
    )


# ---------------------------------------------------------------------------
# Per-source score calibration: percentile-normalize the quality score
# WITHIN each source so thresholds mean the same thing everywhere —
# the step before a global quality gate that otherwise silently drops
# whole sources whose absolute score distribution sits lower.
# ---------------------------------------------------------------------------
_CALIB_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, source,
         CAST(FLOOR(({_QUALITY_SQL}) * 1000000) AS BIGINT) AS score_ppm
  FROM documents
), ranked AS (
  SELECT doc_id, source, score_ppm,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY score_ppm, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM scored
)
SELECT doc_id, source, score_ppm,
       CAST((rn - 1) * 1000000 // GREATEST(n - 1, 1) AS BIGINT) AS pct_ppm,
       rn > n - (n * 500000 // 1000000) AS keep
FROM ranked
"""


@register(
    "score_calibration",
    _CALIB_ORACLE,
    doc="per-source quantile calibration: in-source percentile (integer "
        "ppm, ties broken on doc_id) + a keep flag selecting the top "
        "half WITHIN each source — equal keep-rates across sources "
        "whose absolute quality distributions differ; all-integer rank "
        "arithmetic, one shuffle on source, windows per partition",
    tags=("text", "quality", "sampling"),
)
def q_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.ranking import per_source_score_calibration
    from ..functions import text as X

    docs = load_testdata(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source",
        F.floor(X.quality_score(F.col("text")) * 1_000_000)
        .cast("long").alias("score_ppm"),
    )
    return per_source_score_calibration(scored, keep_rate_ppm=500_000)


# ---------------------------------------------------------------------------
# Encoding-damage (mojibake) detection + repair — the ftfy pass as pure
# codegen. Damage is PLANTED deterministically (doc_id % 7 == 0 gets a
# suffix built only from MOJIBAKE_TABLE signatures), detection counts
# the fixed signature set with length arithmetic, repair is the pinned
# chained replace. The oracle replays synthesis, counting, and repair
# literally, so the hash check proves the repair table and its order.
# ---------------------------------------------------------------------------
_MOJI_SUFFIX = " naÃ¯ve cafÃ© â€œquoteâ€™ Â· fin"


def _moji_oracle() -> str:
    from ..functions.text import MOJIBAKE_TABLE

    damaged = (
        "CASE WHEN doc_id % 7 = 0 THEN text || '" + _MOJI_SUFFIX + "' "
        "ELSE text END"
    )
    hits = " + ".join(
        f"(length(x) - length(replace(x, '{bad}', ''))) // {len(bad)}"
        for bad, _ in MOJIBAKE_TABLE
    )
    repaired = "x"
    for bad, good in MOJIBAKE_TABLE:
        repaired = f"replace({repaired}, '{bad}', '{good}')"
    return f"""
WITH damaged AS (
  SELECT doc_id, {damaged} AS x FROM documents
)
SELECT doc_id,
       CAST({hits} AS BIGINT) AS hits,
       {hits} > 0 AS flagged,
       md5({repaired}) AS repaired_fp
FROM damaged
"""


@register(
    "mojibake_repair",
    _moji_oracle(),
    doc="encoding-damage detection + repair (the ftfy pass): counts a "
        "fixed table of UTF-8-as-cp1252 double-encoding signatures "
        "(â€™ for ', Ã© for é, ...) with length arithmetic and repairs "
        "them with a pinned chained replace — map-only codegen fused "
        "with the scan at 100 TB, zero regex, zero Python; damage is "
        "planted deterministically so the filter provably bites",
    tags=("text", "quality"),
)
def q_mojibake_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, "documents")
    damaged = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(_MOJI_SUFFIX)),
        ).otherwise(F.col("text")).alias("x"),
    )
    hits = X.mojibake_hits(F.col("x"))
    return damaged.select(
        "doc_id",
        hits.alias("hits"),
        (hits > 0).alias("flagged"),
        F.md5(X.repair_mojibake(F.col("x")).cast("binary")).alias(
            "repaired_fp"
        ),
    )


# ---------------------------------------------------------------------------
# Epoch-repeat mixture: the upsampling half of corpus mixing. Where
# mixture_sample caps every source at its availability, here src0's
# target EXCEEDS its token mass, so it ships full epochs plus a
# hash-cut fractional epoch — the public LLaMA/Gopher recipe of
# running small high-quality sources >1 epoch. All quota math after
# one IEEE multiply is 64-bit div/mod, replayed literally in SQL.
# ---------------------------------------------------------------------------
_MIX_EPOCHS_ORACLE = """
WITH totals AS (
  SELECT source, SUM(n_chars) AS tot FROM documents GROUP BY source
), quotas AS (
  SELECT source, tot,
         CAST(FLOOR((CASE WHEN source = 'src0' THEN 0.5
                          WHEN source = 'src1' THEN 0.2
                          ELSE 0.0 END) * 50000.0) AS BIGINT) // tot
           AS full_epochs,
         CAST(FLOOR((CASE WHEN source = 'src0' THEN 0.5
                          WHEN source = 'src1' THEN 0.2
                          ELSE 0.0 END) * 50000.0) AS BIGINT) % tot
           AS rem
  FROM totals
), copies AS (
  SELECT d.doc_id, d.source, d.n_chars AS n_tok,
         q.full_epochs
         + CASE WHEN CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                     % 10000 < (q.rem * 10000) // q.tot
                THEN 1 ELSE 0 END AS n_copies
  FROM documents d JOIN quotas q USING (source)
)
SELECT doc_id, source, n_tok,
       CAST(n_copies AS BIGINT) AS n_copies,
       CAST(g.e AS BIGINT) AS epoch
FROM copies
CROSS JOIN LATERAL (
  SELECT unnest(generate_series(1, CAST(n_copies AS BIGINT))) AS e
) g
"""


@register(
    "mixture_epochs",
    _MIX_EPOCHS_ORACLE,
    doc="epoch-repeat data mixture (upsampling): src0's token target "
        "(0.5 x 50k budget) exceeds its mass, so every src0 doc ships "
        "floor(target/tokens) full epochs plus a stable md5-bucket-cut "
        "fractional epoch, each copy tagged with its epoch number; "
        "quota math is 64-bit div/mod after one IEEE multiply — "
        "engine-exact; plan is one broadcast source-plan + a map-only "
        "sequence explode, corpus never shuffles",
    tags=("sampling", "mixture"),
)
def q_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.sampling import mixture_with_repeats

    docs = load_testdata(spark, sf_dir, "documents")
    return mixture_with_repeats(
        docs,
        key_col="doc_id",
        source_col="source",
        token_col="n_chars",
        weights={"src0": 0.5, "src1": 0.2},
        budget=50_000,
    )


# ---------------------------------------------------------------------------
# Within-document repeated-line dedup (Dolma-style paragraph pass):
# lines are synthesized from the doc's own tokens with PLANTED repeats
# (even docs reuse content slot i%3, so later lines duplicate earlier
# ones); the operator keeps each distinct line's first occurrence in
# order. Complement of the cross-doc passes (passage_dedup/dup_spans):
# this one is in-row, map-only, no shuffle at any scale.
# ---------------------------------------------------------------------------
_INTRADOC_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         string_split(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),
           '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS t
  FROM documents
), lined AS (
  SELECT doc_id,
         list_transform(
           generate_series(0, 5 + CAST(doc_id % 3 AS BIGINT)),
           i -> array_to_string(list_slice(
                  t,
                  (CASE WHEN doc_id % 2 = 0 THEN i % 3 ELSE i END) * 4 + 1,
                  (CASE WHEN doc_id % 2 = 0 THEN i % 3 ELSE i END) * 4 + 4
                ), ' ')
         ) AS lines
  FROM toks
), nonempty AS (
  SELECT doc_id,
         list_filter(list_transform(lines, x -> COALESCE(x, '')),
                     x -> x <> '') AS lines
  FROM lined
), deduped AS (
  SELECT doc_id, lines,
         list_filter(lines, (x, i) -> list_position(lines, x) = i) AS kept
  FROM nonempty
)
SELECT doc_id,
       CAST(len(lines) AS INT) AS n_lines,
       CAST(len(kept) AS INT) AS n_kept,
       md5(array_to_string(kept, chr(10))) AS clean_fp
FROM deduped
"""


@register(
    "intradoc_line_dedup",
    _INTRADOC_ORACLE,
    doc="within-doc repeated-line removal (Dolma-style paragraph "
        "dedup): keep each distinct line's first occurrence in order "
        "via one higher-order filter (line survives iff its index is "
        "the array's first occurrence of that content) — in-row, "
        "map-only, zero shuffles at any scale; repeats are planted so "
        "the op provably bites (even doc_ids reuse content slot i%3)",
    tags=("text", "dedup"),
)
def q_intradoc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, "documents")
    toks = X.tokens(F.col("text"))
    did = F.col("doc_id")

    def content(i):
        slot = F.when(did % 2 == 0, F.pmod(i, F.lit(3))).otherwise(i)
        return F.array_join(F.slice(toks, slot * 4 + 1, 4), " ")

    lines = F.transform(
        F.sequence(F.lit(0), (F.lit(5) + F.pmod(did, F.lit(3))).cast("int")),
        content,
    )
    # slices past the token array end synthesize empty lines — drop
    # them before dedup (and COALESCE in the oracle: DuckDB's
    # array_to_string of an empty list is NULL where Spark's is '')
    lines = F.filter(lines, lambda x: x != F.lit(""))
    lined = docs.select("doc_id", lines.alias("lines"))
    kept = X.dedup_lines(F.col("lines"))
    return lined.select(
        "doc_id",
        F.size("lines").cast("int").alias("n_lines"),
        F.size(kept).cast("int").alias("n_kept"),
        F.md5(F.array_join(kept, "\n").cast("binary")).alias("clean_fp"),
    )


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021 §A1.1, public): the second
# named-recipe document filter next to the C4 line rules — word-count
# window, mean-word-length window, alphabetic-word share, stopword
# presence, duplicate-bigram cap. Every rule is INTEGER arithmetic
# (cross-multiplied thresholds — 3n <= sumlen <= 10n instead of a
# float mean), so the audit row is engine-exact with no rounding
# hazard; one scan, zero shuffles, all rules fold into per-row exprs.
# ---------------------------------------------------------------------------
_GOPHER_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents
), feats AS (
  SELECT doc_id,
         len(ws) AS n_words,
         list_sum(list_transform(ws, w -> len(w))) AS sum_len,
         len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))
           AS n_alpha,
         len(list_filter(ws, w -> w IN {_EN_STOP_SQL})) AS n_stop,
         CASE WHEN len(ws) >= 2 THEN len(list_distinct(list_transform(
           generate_series(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i + 1]
         ))) ELSE 0 END AS d_g2,
         CASE WHEN len(ws) >= 2 THEN len(ws) - 1 ELSE 0 END AS n_g2
  FROM toks
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       n_words BETWEEN 20 AND 10000 AS r_words,
       3 * n_words <= sum_len AND sum_len <= 10 * n_words AS r_meanlen,
       5 * n_alpha >= 4 * n_words AS r_alpha,
       n_stop >= 2 AS r_stop,
       n_g2 = 0 OR 5 * d_g2 >= 4 * n_g2 AS r_dup2,
       (n_words BETWEEN 20 AND 10000)
         AND 3 * n_words <= sum_len AND sum_len <= 10 * n_words
         AND 5 * n_alpha >= 4 * n_words
         AND n_stop >= 2
         AND (n_g2 = 0 OR 5 * d_g2 >= 4 * n_g2) AS keep
FROM feats
"""


@register(
    "gopher_quality_filter",
    _GOPHER_ORACLE,
    doc="Gopher quality rules (public MassiveText recipe) as one "
        "map-only audit pass: word-count window, mean-word-length "
        "window via cross-multiplied integers (3n <= sumlen <= 10n), "
        "alphabetic-word share >= 0.8, >= 2 stopwords, duplicate-"
        "bigram fraction <= 0.2 — every threshold integer-exact, "
        "per-rule booleans + the composed keep; zero shuffles, fused "
        "with the scan at 100 TB",
    tags=("text", "quality"),
)
def q_gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r15 restructure (same values, same oracle): the naive inline form
    # re-evaluated the tokenize chain per expression REFERENCE (rules +
    # keep + n_words) and — inside word_ngrams_text's transform lambda —
    # per SHINGLE ELEMENT (an unbound subexpression inside a HOF lambda
    # is re-evaluated per element in the interpreted path); measured
    # 14.5 s at sf0.1. The token array and the five counts are bound as
    # REAL columns behind Generate barriers (explode/inline — Projects
    # cannot collapse through a Generate, so nothing re-inlines), after
    # which every rule is integer arithmetic on attributes; the gated
    # spread parallelizes the single-split testdata scan (accepted:
    # 1.02 -> 0.57 s; no-op on a multi-split table). 14.5 s -> 0.57 s
    # total, equality asserted over the corpus.
    from ..io import spread_small_scan

    docs = spread_small_scan(
        load_testdata(spark, sf_dir, "documents"), key="doc_id"
    )
    lined = docs.select(
        "doc_id", F.explode(F.array(X.tokens(F.col("text")))).alias("ws")
    )
    # word_ngrams_text's exact shape over the bound array (its
    # when(size >= n)/otherwise([]) NULL semantics preserved verbatim)
    ws = F.col("ws")
    g2 = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - 2),
            lambda i: F.array_join(F.slice(ws, i + 1, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = lined.select(
        "doc_id",
        F.inline(F.array(F.struct(
            F.size("ws").alias("n"),
            F.aggregate(
                "ws", F.lit(0), lambda acc, w: acc + F.length(w)
            ).alias("sum_len"),
            F.size(
                F.filter("ws", lambda w: w.rlike("[a-z]"))
            ).alias("n_alpha"),
            F.size(
                F.filter("ws", lambda w: w.isin(*X.EN_STOPWORDS))
            ).alias("n_stop"),
            F.size(F.array_distinct(g2)).alias("d_g2"),
            F.size(g2).alias("n_g2"),
        ))),
    )
    n = F.col("n")
    sum_len = F.col("sum_len")
    r_words = (n >= 20) & (n <= 10000)
    r_meanlen = (3 * n <= sum_len) & (sum_len <= 10 * n)
    r_alpha = 5 * F.col("n_alpha") >= 4 * n
    r_stop = F.col("n_stop") >= 2
    r_dup2 = (F.col("n_g2") == 0) | (5 * F.col("d_g2") >= 4 * F.col("n_g2"))
    return feats.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        r_words.alias("r_words"),
        r_meanlen.alias("r_meanlen"),
        r_alpha.alias("r_alpha"),
        r_stop.alias("r_stop"),
        r_dup2.alias("r_dup2"),
        (r_words & r_meanlen & r_alpha & r_stop & r_dup2).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Byte-level BPE encode (GPT-2 style; VERDICT r6 Next #4): the published
# pre-tokenizer regex + bytes_to_unicode lift + greedy merge replay, all
# in whole-stage codegen — closing the gap that word-level BPE above
# operates on whitespace words, not bytes (byte-level is what every
# modern open LLM dump actually ships). The merge table is a FIXED
# literal (training is the iterative trainer's job); the oracle replays
# the same wrapped-symbol chained replaces, with the pre-tokenizer
# specialized to the corpus charset ([a-z ], single-spaced — verified):
# on such text ' ?[a-z]+' extracts exactly what the full GPT-2 pattern
# does, and the byte lift reduces to space->Ġ with identity elsewhere.
# The Spark side runs the FULL published pattern and 256-entry table.
# ---------------------------------------------------------------------------
_BYTE_BPE_MERGES = [
    ("Ġ", "t"), ("h", "e"), ("Ġt", "he"), ("i", "n"),
    ("Ġ", "o"), ("e", "r"), ("Ġo", "f"),
]


def _byte_bpe_oracle() -> str:
    w1, w2 = "chr(1)", "chr(2)"
    enc = (
        f"regexp_replace(replace(t, ' ', 'Ġ'), '(.)', "
        f"{w1} || '\\1' || {w2}, 'g')"
    )
    for a, b in _BYTE_BPE_MERGES:
        pat = f"{w1} || '{a}' || {w2} || {w1} || '{b}' || {w2}"
        rep = f"{w1} || '{a}{b}' || {w2}"
        enc = f"replace({enc}, {pat}, {rep})"
    enc = (
        f"replace(trim({enc}, {w1} || {w2}), {w2} || {w1}, ' ')"
    )
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, ' ?[a-z]+') AS tk
  FROM documents
), enc AS (
  SELECT doc_id, len(tk) AS n_pretokens,
         COALESCE(array_to_string(
           list_transform(tk, t -> {enc}), ' '), '') AS subword_text
  FROM toks
)
SELECT doc_id, CAST(n_pretokens AS INT) AS n_pretokens,
       CAST(len(list_filter(string_split(subword_text, ' '),
                            s -> s <> '')) AS INT) AS n_subwords,
       subword_text
FROM enc
"""


@register(
    "byte_bpe_encode_tokens",
    _byte_bpe_oracle(),
    doc="GPT-2-style byte-level BPE encode with a fixed merge table: "
        "published pre-tokenizer regex (leading space joins the next "
        "token), full 256-entry bytes_to_unicode lift (space -> Ġ, "
        "multi-byte UTF-8 chars become multiple byte symbols), greedy "
        "merge replay as boundary-safe chained replaces — map-only "
        "codegen, zero shuffles; at 100 TB encode the distinct "
        "pretoken table once and broadcast-join it back",
    tags=("text", "tokenizer"),
)
def q_byte_bpe_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.bpe import byte_bpe_encode

    docs = load_testdata(spark, sf_dir, "documents")
    return byte_bpe_encode(docs, _BYTE_BPE_MERGES)


# ---------------------------------------------------------------------------
# Content-defined chunking dedup (CDC — the Rabin/FastCDC recipe at
# word granularity): chunk boundaries depend only on local content (a
# word's portable hash in residue class 0 mod 8 closes the chunk), so
# an insertion near the start of a near-duplicate document does NOT
# shift downstream chunk fingerprints the way fixed-size chunking
# (chunk_dedup) does. The Spark side assembles chunks with an in-row
# struct-accumulator fold (docs explode to CHUNKS, never to words);
# the oracle takes a completely different route — unnest words with
# ordinality, prefix-sum the boundary flags with a window, string_agg
# per (doc, chunk id) — so a hash match pins the semantics, not the
# plan.
# ---------------------------------------------------------------------------
_CDC_DIV = 8

_CDC_ORACLE = f"""
WITH l AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents
), w AS (
  SELECT doc_id, UNNEST(ws) AS w, UNNEST(range(len(ws))) AS ord
  FROM l
), wb AS (
  SELECT doc_id, w, ord,
         CASE WHEN CAST(concat('0x', substr(md5(w), 1, 8)) AS BIGINT)
                   % {_CDC_DIV} = 0 THEN 1 ELSE 0 END AS bnd
  FROM w
), cid AS (
  SELECT doc_id, w, ord,
         COALESCE(SUM(bnd) OVER (PARTITION BY doc_id ORDER BY ord
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) AS chunk_id
  FROM wb
), chunks AS (
  SELECT doc_id, chunk_id,
         md5(string_agg(w, ' ' ORDER BY ord)) AS fp
  FROM cid GROUP BY doc_id, chunk_id
), counted AS (
  SELECT doc_id, COUNT(*) OVER (PARTITION BY fp) AS copies
  FROM chunks
), per_doc AS (
  SELECT doc_id, COUNT(*) AS n_chunks,
         SUM(CASE WHEN copies > 1 THEN 1 ELSE 0 END) AS n_dup
  FROM counted GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_chunks, 0) AS BIGINT) AS n_chunks,
       CAST(COALESCE(p.n_dup, 0) AS BIGINT) AS n_dup_chunks,
       CAST(CASE WHEN COALESCE(p.n_chunks, 0) = 0 THEN 0
                 ELSE COALESCE(p.n_dup, 0) * 1000000 // p.n_chunks
            END AS BIGINT) AS dup_ppm
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""


@register(
    "cdc_chunk_stats",
    _CDC_ORACLE,
    doc="content-defined chunking dedup report: boundaries from a "
        "word's portable hash residue (expected chunk = 8 words), "
        "chunks assembled by one in-row fold (docs explode to chunks, "
        "never words), corpus-wide copy counts from one fingerprint "
        "shuffle — insertion-robust chunk fingerprints, the property "
        "fixed-size chunking lacks; oracle rebuilds chunks via "
        "unnest+window prefix-sum, a disjoint plan",
    tags=("text", "chunking", "dedup"),
)
def q_cdc_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.dedup import cdc_chunk_stats

    docs = load_testdata(spark, sf_dir, "documents")
    return cdc_chunk_stats(docs, divisor=_CDC_DIV)


# ---------------------------------------------------------------------------
# JSON schema inference / drift report: given a corpus of raw JSON
# event payloads, report per-key type histograms — the first tool an
# operator reaches for when an upstream producer changes a field type
# (the "user" key below is an integer for most producers but a STRING
# for the purchase producer: a planted type conflict the report must
# surface). Payloads are synthesized deterministically from event
# columns (flat objects: int / quoted string / boolean / null values,
# no float formatting so both engines build byte-identical JSON); the
# extraction is one regexp_extract_all + explode + type sniff + count
# — map-only until a single (key, type) aggregation.
# ---------------------------------------------------------------------------
_JS_PAIR_RE = '"[A-Za-z_]+"\\s*:\\s*("[^"]*"|[^,}\\s]+)'


def _js_synth_sql() -> str:
    return """
      CASE event_type
        WHEN 'click' THEN
          '{"user": ' || user_id || ', "clicks": ' ||
          CAST(FLOOR(value) AS BIGINT) || ', "tag": "t' ||
          user_id % 10 || '"}'
        WHEN 'view' THEN
          '{"user": ' || user_id || ', "hot": ' ||
          CASE WHEN value > 50 THEN 'true' ELSE 'false' END || '}'
        WHEN 'purchase' THEN
          '{"user": "' || user_id || '", "amount": ' ||
          CAST(FLOOR(value) AS BIGINT) || '}'
        WHEN 'signup' THEN
          '{"user": ' || user_id || ', "ref": null}'
        ELSE '{"user": ' || user_id || ', "code": "e' ||
          user_id % 7 || '"}'
      END
    """


_JS_ORACLE = f"""
WITH payload AS (
  SELECT ({_js_synth_sql()}) AS js FROM events
), pairs AS (
  SELECT UNNEST(regexp_extract_all(js, '{_JS_PAIR_RE}')) AS kv
  FROM payload
), typed AS (
  SELECT regexp_extract(kv, '"([A-Za-z_]+)"', 1) AS json_key,
         trim(regexp_extract(kv, ':\\s*(.*)$', 1)) AS v
  FROM pairs
)
SELECT json_key,
       CASE WHEN v LIKE '"%' THEN 'string'
            WHEN v IN ('true', 'false') THEN 'boolean'
            WHEN v = 'null' THEN 'null'
            WHEN regexp_matches(v, '^-?[0-9]+$') THEN 'integer'
            ELSE 'other' END AS vtype,
       CAST(COUNT(*) AS BIGINT) AS n
FROM typed
GROUP BY 1, 2
"""


@register(
    "json_schema_infer",
    _JS_ORACLE,
    doc="JSON schema inference over raw payloads: per-key value-type "
        "histogram (integer/string/boolean/null) via one "
        "regexp_extract_all + explode + sniff + count — surfaces the "
        "planted producer drift ('user' is integer for four producers "
        "but string for purchases) that silently breaks a typed "
        "ingest; map-only until one (key, type) aggregation, no "
        "Python, no JSON parser in the hot path",
    tags=("text", "json", "diagnostics"),
)
def q_json_schema_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_testdata(spark, sf_dir, "events")
    js = F.expr(_js_synth_sql())
    pairs = events.select(js.alias("js")).select(
        F.explode(F.regexp_extract_all(F.col("js"), F.lit(_JS_PAIR_RE), 0))
        .alias("kv")
    )
    v = F.trim(F.regexp_extract(F.col("kv"), r":\s*(.*)$", 1))
    vtype = (
        F.when(v.startswith('"'), "string")
        .when(v.isin("true", "false"), "boolean")
        .when(v == "null", "null")
        .when(v.rlike("^-?[0-9]+$"), "integer")
        .otherwise("other")
    )
    return (
        pairs.select(
            F.regexp_extract(F.col("kv"), '"([A-Za-z_]+)"', 1)
            .alias("json_key"),
            vtype.alias("vtype"),
        )
        .groupBy("json_key", "vtype")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
