"""Ranked-retrieval and LM-scoring queries (extensions/ranking.py) over
the documents table: BM25 top-k and bigram-LM perplexity filtering.

Both oracles replicate the Spark expression trees TERM-FOR-TERM (same
literals, same parenthesization) so the per-row doubles are IEEE
bit-identical; per-doc accumulation is DECIMAL-exact on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import load_testdata
from . import register
from .text import _NORM

BM25_QUERY = ("hash", "join", "spark")
_Q_SQL = "('" + "', '".join(BM25_QUERY) + "')"

_BM25_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term FROM documents
), tks AS (
  SELECT doc_id, term FROM tok WHERE term <> ''
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM tks GROUP BY doc_id
), stats AS (
  SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tks
  WHERE term IN {_Q_SQL} GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), s AS (
  SELECT tf.doc_id,
         CAST(ROUND(
           LN(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)),
         9) AS DECIMAL(28,10)) AS s
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
)
SELECT doc_id, CAST(ROUND(SUM(s), 6) AS DOUBLE) AS score
FROM s GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT 10
"""


@register(
    "bm25_topk",
    _BM25_ORACLE,
    doc="Okapi BM25 ranked retrieval (k1=1.2, b=0.75) for a 3-term query: "
        "query-term filter pushes down BEFORE any aggregation (the scan "
        "IS the inverted-index probe), N/avgdl ride as 1-row broadcasts, "
        "DECIMAL-exact score sum makes the top-10 LIMIT a total order.",
    tags=("text", "ranking"),
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.ranking import bm25_topk

    docs = load_testdata(spark, sf_dir, "documents")
    return bm25_topk(docs, BM25_QUERY, k1=1.2, b=0.75, k=10)


_LM_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
), uni AS (
  SELECT doc_id, unnest(w) AS term FROM tok
), tks AS (
  SELECT doc_id, term FROM uni WHERE term <> ''
), cu AS (
  SELECT term AS w1, COUNT(*) AS cu FROM tks GROUP BY term
), v AS (
  SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS v FROM tks
), bg AS (
  SELECT doc_id, w[CAST(i AS INT)] AS w1, w[CAST(i AS INT) + 1] AS w2
  FROM tok, unnest(generate_series(1, len(w) - 1)) AS t(i)
), bgf AS (
  SELECT doc_id, w1, w2 FROM bg WHERE w1 <> '' AND w2 <> ''
), cb AS (
  SELECT w1, w2, COUNT(*) AS cb FROM bgf GROUP BY w1, w2
), s AS (
  SELECT bgf.doc_id,
         CAST(ROUND(LN((cb.cb + 0.5) / (cu.cu + 0.5 * v.v)), 9)
              AS DECIMAL(28,10)) AS lp
  FROM bgf JOIN cb USING (w1, w2) JOIN cu USING (w1) CROSS JOIN v
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(-CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS avg_nll
FROM s GROUP BY doc_id
"""


@register(
    "lm_perplexity",
    _LM_ORACLE,
    doc="bigram-LM perplexity filter: add-0.5-smoothed bigram LM trained "
        "on the corpus (two count aggregations — the model IS two "
        "DataFrames), per-doc average negative log-likelihood scored via "
        "one shuffle on the bigram key; bigram extraction is an in-row "
        "array zip, no window. The KenLM-style quality signal (CCNet).",
    tags=("text", "ranking", "quality"),
)
def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.ranking import bigram_lm_scores

    docs = load_testdata(spark, sf_dir, "documents")
    return bigram_lm_scores(docs, add_k=0.5)
