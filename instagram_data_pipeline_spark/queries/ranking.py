"""Ranked-retrieval and LM-scoring queries (extensions/ranking.py) over
the documents table: BM25 top-k and bigram-LM perplexity filtering.

Both oracles replicate the Spark expression trees TERM-FOR-TERM (same
literals, same parenthesization) so the per-row doubles are IEEE
bit-identical; per-doc accumulation is DECIMAL-exact on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as X
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


# ---------------------------------------------------------------------------
# DSIR importance weights: target slice = lang='en' documents. The
# importance weight says "how much more likely is this doc's vocabulary
# under the target unigram model than under the raw-corpus model" —
# the selection signal for importance resampling toward a trusted
# distribution.
# ---------------------------------------------------------------------------
_DSIR_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term FROM documents
), tks AS (
  SELECT doc_id, term FROM tok WHERE term <> ''
), raw AS (
  SELECT term, COUNT(*) AS cr FROM tks GROUP BY term
), tgt AS (
  SELECT t.term, COUNT(*) AS ct FROM tks t
  JOIN documents d USING (doc_id) WHERE d.lang = 'en' GROUP BY t.term
), totals AS (
  SELECT (SELECT SUM(cr) FROM raw) AS tr,
         (SELECT COUNT(*) FROM raw) AS v,
         (SELECT SUM(ct) FROM tgt) AS tt
), model AS (
  SELECT raw.term, raw.cr, COALESCE(tgt.ct, 0) AS ct
  FROM raw LEFT JOIN tgt ON raw.term = tgt.term
), s AS (
  SELECT tks.doc_id,
         CAST(ROUND(
           LN((m.ct + 0.5) / (totals.tt + 0.5 * totals.v))
           - LN((m.cr + 0.5) / (totals.tr + 0.5 * totals.v)),
         9) AS DECIMAL(28,10)) AS lr
  FROM tks JOIN model m USING (term) CROSS JOIN totals
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(lr) AS DOUBLE) / COUNT(*), 6) AS avg_log_ratio
FROM s GROUP BY doc_id
"""


@register(
    "dsir_weights",
    _DSIR_ORACLE,
    doc="DSIR importance weights toward the lang='en' slice: per-doc "
        "average ln p_target(w) - ln p_raw(w) under add-0.5-smoothed "
        "unigram models (both models are vocabulary-sized count tables; "
        "scoring is one shuffle on the term key). The data-selection "
        "signal for importance resampling.",
    tags=("text", "ranking", "sampling"),
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..extensions.ranking import dsir_log_ratios

    docs = load_testdata(spark, sf_dir, "documents")
    return dsir_log_ratios(docs, F.col("lang") == "en", add_k=0.5)


# ---------------------------------------------------------------------------
# BPE tokenizer training (extensions/bpe.py). Genuinely iterative with a
# data-dependent argmax per round — not SQL-expressible (DuckDB's
# list_reduce cannot fold into a list accumulator), so rows-only here;
# the merge sequence itself is pinned by tests/test_bpe.py against the
# hand-computable Sennrich corpus, and determinism (lexicographic tie
# break) makes reruns bit-stable.
# ---------------------------------------------------------------------------
@register(
    "bpe_merges",
    None,
    doc="Sennrich BPE merge training on the word-frequency table (8 "
        "merges): per round one pair-count aggregation over the "
        "vocabulary-sized table, a 1-row argmax control read, and an "
        "in-row fold to apply the merge — corpus touched once, "
        "iterations never rescan it. Deterministic lexicographic tie "
        "break.",
    tags=("text", "tokenizer", "iterative"),
)
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.bpe import bpe_train

    docs = load_testdata(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=8)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count long"
    )


# ---------------------------------------------------------------------------
# Feature hashing (the hashing-trick vectorizer): model-free signed TF
# features over a fixed 64-bucket space. Long-form output (doc, bucket,
# v) is the oracle-comparable shape; the dense array form
# (ranking.hashed_tf_vectors) plugs into the ANN family and is
# pytest-covered end-to-end.
# ---------------------------------------------------------------------------
_HASHED_TF_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term FROM documents
), tks AS (
  SELECT doc_id, term FROM tok WHERE term <> ''
), h AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(term), 1, 8)) AS BIGINT) AS hv,
         CAST(concat('0x', substr(md5(term), 9, 8)) AS BIGINT) AS sv
  FROM tks
)
SELECT doc_id, hv % 64 AS bucket,
       CAST(SUM(CASE WHEN sv & 1 = 0 THEN 1 ELSE -1 END)
            AS BIGINT) AS v
FROM h GROUP BY doc_id, hv % 64
HAVING SUM(CASE WHEN sv & 1 = 0 THEN 1 ELSE -1 END) <> 0
"""


# ---------------------------------------------------------------------------
# Quality-classifier family: the SCORER is hash-checked under a fixed
# ±1 literal weight vector (integer-exact logits — no cross-engine
# float-sum hazard at all); the TRAINER (distributed gradients, driver
# updates) registers rows-only with convergence/determinism pytest.
# ---------------------------------------------------------------------------
def _classifier_score_oracle() -> str:
    from ..extensions.similarity import hyperplanes

    w = hyperplanes(64, 1, seed=11)[0]
    wlit = "[" + ", ".join(f"{x:.1f}" for x in w) + "]"
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term FROM documents
), tks AS (
  SELECT doc_id, term FROM tok WHERE term <> ''
), h AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(term), 1, 8)) AS BIGINT) AS hv,
         CAST(concat('0x', substr(md5(term), 9, 8)) AS BIGINT) AS sv
  FROM tks
), sparse AS (
  SELECT doc_id, hv % 64 AS bucket,
         SUM(CASE WHEN sv & 1 = 0 THEN 1 ELSE -1 END) AS v
  FROM h GROUP BY doc_id, hv % 64
), dense AS (
  SELECT d.doc_id, list(CAST(COALESCE(s.v, 0) AS DOUBLE) ORDER BY g.b) AS x
  FROM (SELECT DISTINCT doc_id FROM documents) d
  CROSS JOIN range(0, 64) g(b)
  LEFT JOIN sparse s ON s.doc_id = d.doc_id AND s.bucket = g.b
  GROUP BY d.doc_id
)
SELECT doc_id,
       ROUND(list_dot_product(x, {wlit}) - 2.0, 6) AS logit,
       list_dot_product(x, {wlit}) - 2.0 >= 0 AS keep
FROM dense
"""


@register(
    "classifier_score_fixed",
    _classifier_score_oracle(),
    doc="linear quality-classifier scoring of the corpus under a fixed "
        "±1 literal weight vector over hashed-TF features: integer-"
        "exact logits, keep = logit >= 0 (sigmoid is monotone, so "
        "decisions avoid cross-engine exp rounding); pure codegen fold, "
        "no Python — the serving half of the classifier family",
    tags=("text", "ranking", "classifier"),
)
def q_classifier_score_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.classifier import logit_score
    from ..extensions.ranking import hashed_tf_vectors
    from ..extensions.similarity import hyperplanes

    docs = load_testdata(spark, sf_dir, "documents")
    # every doc scores, even one whose signed TFs all cancelled (the
    # oracle's dense CTE spans all documents)
    feats = docs.select("doc_id").join(
        hashed_tf_vectors(docs, dim=64), "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce(
            F.col("embedding"), F.array_repeat(F.lit(0.0), 64)
        ).alias("embedding"),
    )
    model = {"weights": hyperplanes(64, 1, seed=11)[0], "bias": -2.0}
    return logit_score(feats, model, feat_col="embedding")


@register(
    "classifier_weights",
    None,  # iterative gradient descent with driver-side weight updates
    doc="quality-classifier training: full-batch logistic regression on "
        "hashed-TF features (one BLAS partial gradient per Arrow batch, "
        "decimal-exact reduce, deterministic under partitioning) against "
        "the cheap quality_score >= 0.5 label — the FineWeb-Edu distill "
        "shape; returns (bucket, weight)",
    tags=("text", "ranking", "classifier", "iterative"),
)
def q_classifier_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.classifier import logit_train
    from ..extensions.ranking import hashed_tf_vectors
    from ..functions import text as X

    docs = load_testdata(spark, sf_dir, "documents")
    labeled = hashed_tf_vectors(docs, dim=64).join(
        docs.select(
            "doc_id",
            (X.quality_score(F.col("text")) >= 0.5).cast("int").alias("y"),
        ),
        "doc_id",
    )
    model = logit_train(labeled, "embedding", "y", iters=15, lr=0.5)
    rows = [
        (i, round(w, 6)) for i, w in enumerate(model["weights"])
    ] + [(-1, round(model["bias"], 6))]
    return spark.createDataFrame(rows, "bucket int, weight double")


@register(
    "hashed_tf_features",
    _HASHED_TF_ORACLE,
    doc="feature hashing (Weinberger signed hashing trick, 64 buckets, "
        "md5-portable): model-free text vectorization with NO vocabulary "
        "pass, no OOV, bounded width — one tokenize + one groupBy. The "
        "dense form feeds the similarity/ANN family directly.",
    tags=("text", "ranking", "similarity"),
)
def q_hashed_tf_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.ranking import hashed_tf

    docs = load_testdata(spark, sf_dir, "documents")
    return hashed_tf(docs, dim=64)


# ---------------------------------------------------------------------------
# CCNet-style perplexity mixture: bucket every scored document into
# head / middle / tail quality tiers by FIXED perplexity cutoffs
# (CCNet's discipline: cutoffs are trained once on a held-out sample
# and shipped as constants — so tiering is pure map work, no global
# window or quantile pass on the corpus), then roll up the per-(tier,
# lang) mixture a sampling stage consumes. Integer-exact ppm math.
# ---------------------------------------------------------------------------
_PPL_T1 = 3390000  # head/middle cutoff, avg_nll ppm (~33rd pct at sf0.01)
_PPL_T2 = 3416000  # middle/tail cutoff (~66th pct)

_PPL_MIX_ORACLE = f"""
WITH scored AS (
  SELECT * FROM ({_LM_ORACLE}) t
), j AS (
  SELECT s.doc_id, d.lang, s.n_bigrams,
         CAST(FLOOR(s.avg_nll * 1000000) AS BIGINT) AS nll_ppm
  FROM scored s JOIN documents d ON s.doc_id = d.doc_id
), tiers AS (
  SELECT CASE WHEN nll_ppm < {_PPL_T1} THEN 'head'
              WHEN nll_ppm < {_PPL_T2} THEN 'middle'
              ELSE 'tail' END AS tier,
         lang, n_bigrams, nll_ppm
  FROM j
)
SELECT tier, lang, COUNT(*) AS n_docs,
       CAST(SUM(nll_ppm) AS BIGINT) // COUNT(*) AS mean_nll_ppm,
       CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams_total
FROM tiers GROUP BY tier, lang
"""


@register(
    "perplexity_mixture",
    _PPL_MIX_ORACLE,
    doc="CCNet head/middle/tail mixture: per-doc bigram-LM perplexity "
        "tiered by fixed shipped cutoffs (map-only — no corpus-wide "
        "quantile pass or global window at scoring time), rolled up "
        "per (tier, lang) with integer-exact mean NLL and bigram "
        "totals — the mixture table a quality-aware sampler consumes",
    tags=("text", "ranking", "quality", "sampling"),
)
def q_perplexity_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..extensions.ranking import bigram_lm_scores

    docs = load_testdata(spark, sf_dir, "documents")
    scored = bigram_lm_scores(docs, add_k=0.5)
    j = scored.join(docs.select("doc_id", "lang"), "doc_id").select(
        "lang",
        "n_bigrams",
        F.floor(F.col("avg_nll") * 1000000).cast("long").alias("nll_ppm"),
    )
    tiers = j.select(
        F.when(F.col("nll_ppm") < _PPL_T1, "head")
        .when(F.col("nll_ppm") < _PPL_T2, "middle")
        .otherwise("tail")
        .alias("tier"),
        "lang",
        "n_bigrams",
        "nll_ppm",
    )
    return tiers.groupBy("tier", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("sum(nll_ppm) div count(1)").alias("mean_nll_ppm"),
        F.sum("n_bigrams").cast("long").alias("n_bigrams_total"),
    )


# ---------------------------------------------------------------------------
# Classifier evaluation report: precision/recall of the fixed-weight
# scorer against the cheap quality label across a threshold sweep —
# the report that decides a keep-threshold before a corpus-wide apply
# (the classifier-family sibling of lsh_quality_report /
# ann_recall_report). Logits are integer-exact (±1 weights), so every
# threshold decision is engine-portable.
# ---------------------------------------------------------------------------
_CQR_THRESHOLDS = [-6.0, -4.0, -2.0, 0.0, 2.0]


def _classifier_report_oracle() -> str:
    from .text import _QUALITY_SQL

    thr_rows = ", ".join(f"({t!r})" for t in _CQR_THRESHOLDS)
    return f"""
WITH scores AS (
  SELECT * FROM ({_classifier_score_oracle()}) t
), labeled AS (
  SELECT s.doc_id, s.logit,
         ({_QUALITY_SQL}) >= 0.5 AS y
  FROM scores s JOIN documents d ON s.doc_id = d.doc_id
), thr(t) AS (VALUES {thr_rows}), agg AS (
  SELECT thr.t,
         SUM(CASE WHEN l.logit >= thr.t THEN 1 ELSE 0 END) AS n_pred,
         SUM(CASE WHEN l.logit >= thr.t AND l.y THEN 1 ELSE 0 END) AS tp,
         SUM(CASE WHEN l.y THEN 1 ELSE 0 END) AS n_pos
  FROM labeled l CROSS JOIN thr GROUP BY thr.t
)
SELECT CAST(t AS DOUBLE) AS threshold,
       CAST(n_pred AS BIGINT) AS n_pred, CAST(tp AS BIGINT) AS tp,
       CASE WHEN n_pred > 0
            THEN CAST(FLOOR(tp * 1000000.0 / n_pred) AS BIGINT) END
         AS precision_ppm,
       CASE WHEN n_pos > 0
            THEN CAST(FLOOR(tp * 1000000.0 / n_pos) AS BIGINT) END
         AS recall_ppm
FROM agg
"""


@register(
    "classifier_quality_report",
    _classifier_report_oracle(),
    doc="threshold sweep for the fixed-weight quality classifier: "
        "precision/recall (integer-exact ppm) vs the cheap quality "
        "label at 5 keep thresholds — the report that picks the "
        "operating point before a corpus-wide apply; one scoring pass "
        "+ one label join + a 5-row broadcast threshold explode",
    tags=("text", "ranking", "classifier", "diagnostics"),
)
def q_classifier_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..extensions.classifier import logit_score
    from ..extensions.ranking import hashed_tf_vectors
    from ..extensions.similarity import hyperplanes
    from ..functions import text as X

    docs = load_testdata(spark, sf_dir, "documents")
    feats = docs.select("doc_id").join(
        hashed_tf_vectors(docs, dim=64), "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce(
            F.col("embedding"), F.array_repeat(F.lit(0.0), 64)
        ).alias("embedding"),
    )
    model = {"weights": hyperplanes(64, 1, seed=11)[0], "bias": -2.0}
    scores = logit_score(feats, model, feat_col="embedding")
    labeled = scores.join(
        docs.select(
            "doc_id", (X.quality_score(F.col("text")) >= 0.5).alias("y")
        ),
        "doc_id",
    )
    swept = labeled.select(
        "logit", "y",
        F.explode(
            F.array(*[F.lit(t) for t in _CQR_THRESHOLDS])
        ).alias("threshold"),
    )
    agg = swept.groupBy("threshold").agg(
        F.sum(F.when(F.col("logit") >= F.col("threshold"), 1).otherwise(0))
        .alias("n_pred"),
        F.sum(
            F.when((F.col("logit") >= F.col("threshold")) & F.col("y"), 1)
            .otherwise(0)
        ).alias("tp"),
        F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("n_pos"),
    )
    return agg.select(
        "threshold", "n_pred", "tp",
        F.when(
            F.col("n_pred") > 0,
            F.floor(F.col("tp") * 1000000.0 / F.col("n_pred")).cast("long"),
        ).alias("precision_ppm"),
        F.when(
            F.col("n_pos") > 0,
            F.floor(F.col("tp") * 1000000.0 / F.col("n_pos")).cast("long"),
        ).alias("recall_ppm"),
    )


_LM_INTERP_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
), uni AS (
  SELECT doc_id, unnest(w) AS term FROM tok
), tks AS (
  SELECT doc_id, term FROM uni WHERE term <> ''
), cu AS (
  SELECT term AS w1, COUNT(*) AS cu FROM tks GROUP BY term
), cu2 AS (
  SELECT term AS w2, COUNT(*) AS cu2 FROM tks GROUP BY term
), stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS t,
         CAST(COUNT(DISTINCT term) AS BIGINT) AS v
  FROM tks
), bg AS (
  SELECT doc_id, w[CAST(i AS INT)] AS w1, w[CAST(i AS INT) + 1] AS w2
  FROM tok, unnest(generate_series(1, len(w) - 1)) AS t(i)
), bgf AS (
  SELECT doc_id, w1, w2 FROM bg WHERE w1 <> '' AND w2 <> ''
), cb AS (
  SELECT w1, w2, COUNT(*) AS cb FROM bgf GROUP BY w1, w2
), s AS (
  SELECT bgf.doc_id,
         CAST(ROUND(LN(
           0.75 * ((cb.cb + 0.5) / (cu.cu + 0.5 * stats.v))
           + 0.25 * ((cu2.cu2 + 0.5) / (stats.t + 0.5 * stats.v))
         ), 9) AS DECIMAL(28,10)) AS lp
  FROM bgf JOIN cb USING (w1, w2) JOIN cu USING (w1)
  JOIN cu2 USING (w2) CROSS JOIN stats
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(-CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS avg_nll
FROM s GROUP BY doc_id
"""


@register(
    "lm_perplexity_interpolated",
    _LM_INTERP_ORACLE,
    doc="Jelinek-Mercer interpolated bigram LM (lam=3/4 bigram + 1/4 "
        "unigram, both add-0.5-smoothed): the backoff that stops one "
        "unseen context from dominating a doc's NLL — exact binary-"
        "fraction mix, DECIMAL-exact sums; same one-shuffle scoring "
        "shape as the plain LM plus a vocab-sized w2 join and a 1-row "
        "totals broadcast",
    tags=("text", "ranking", "quality"),
)
def q_lm_perplexity_interpolated(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..extensions.ranking import bigram_lm_scores_interpolated

    docs = load_testdata(spark, sf_dir, "documents")
    return bigram_lm_scores_interpolated(docs, add_k=0.5, lam=0.75)


# ---------------------------------------------------------------------------
# Kneser-Ney: the third rung of the LM-scoring ladder (add-k -> JM
# interpolation -> absolute discounting with continuation-count
# backoff). Per-context distributions sum to exactly 1 (pinned in
# tests/test_ranking.py); D = 3/4 is an exact binary fraction so the
# discount arithmetic is engine-identical.
# ---------------------------------------------------------------------------
_LM_KN_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
), bg AS (
  SELECT doc_id, w[CAST(i AS INT)] AS w1, w[CAST(i AS INT) + 1] AS w2
  FROM tok, unnest(generate_series(1, len(w) - 1)) AS t(i)
), bgf AS (
  SELECT doc_id, w1, w2 FROM bg WHERE w1 <> '' AND w2 <> ''
), cb AS (
  SELECT w1, w2, COUNT(*) AS cb FROM bgf GROUP BY w1, w2
), ctx AS (
  SELECT w1, SUM(cb) AS cctx, COUNT(*) AS n1f FROM cb GROUP BY w1
), back AS (
  SELECT w2, COUNT(*) AS n1b FROM cb GROUP BY w2
), types AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM cb
), s AS (
  SELECT bgf.doc_id,
         CAST(ROUND(LN(
           (cb.cb - 0.75) / ctx.cctx
           + 0.75 * ctx.n1f / ctx.cctx * back.n1b / types.nt
         ), 9) AS DECIMAL(28,10)) AS lp
  FROM bgf JOIN cb USING (w1, w2) JOIN ctx USING (w1)
  JOIN back USING (w2) CROSS JOIN types
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(-CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS avg_nll
FROM s GROUP BY doc_id
"""


@register(
    "lm_perplexity_kneser_ney",
    _LM_KN_ORACLE,
    doc="interpolated Kneser-Ney bigram LM (D=3/4 absolute discount, "
        "continuation-count backoff, bigram-table context normalizer "
        "so every context distribution sums to exactly 1): the "
        "standard n-gram discounting family, scored corpus-on-itself "
        "with DECIMAL-exact sums — everything derives from the Zipf-"
        "bounded bigram count table; one corpus shuffle, vocab-sized "
        "joins, 1-row type-total broadcast",
    tags=("text", "ranking", "quality"),
)
def q_lm_perplexity_kneser_ney(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..extensions.ranking import bigram_lm_scores_kneser_ney

    docs = load_testdata(spark, sf_dir, "documents")
    return bigram_lm_scores_kneser_ney(docs, discount=0.75)


# ---------------------------------------------------------------------------
# Positional phrase search: exact "w1 w2 ..." matches via (L-1)-way
# joins over a positional postings frame, each leg pre-filtered to one
# term. Counts are exact integers, so the whole result hash-checks.
# ---------------------------------------------------------------------------
PHRASE_QUERIES = ("value table", "fast table", "hash join spark")


def _phrase_oracle() -> str:
    parts = []
    for phrase in PHRASE_QUERIES:
        words = phrase.split()
        joins = " ".join(
            f"JOIN i m{i} ON m{i}.doc_id = m0.doc_id "
            f"AND m{i}.pos = m0.pos + {i} AND m{i}.term = '{w}'"
            for i, w in enumerate(words[1:], start=1)
        )
        parts.append(
            f"SELECT '{phrase}' AS phrase, m0.doc_id, COUNT(*) AS n_hits\n"
            f"  FROM i m0 {joins}\n"
            f"  WHERE m0.term = '{words[0]}' GROUP BY 1, 2"
        )
    union = "\nUNION ALL\n".join(parts)
    return f"""
WITH tok AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
), idx AS (
  SELECT doc_id, unnest(generate_series(1, len(w))) AS pos,
         unnest(w) AS term
  FROM tok
), i AS (SELECT * FROM idx WHERE term <> '')
{union}
"""


@register(
    "phrase_search",
    _phrase_oracle(),
    doc="positional-index phrase search: exact multi-word matches via "
        "per-term-filtered postings joined on (doc, position) — each "
        "join leg is one term's postings list, never the full index, "
        "so per-phrase cost tracks the rarest term; exact per-doc hit "
        "counts for two bigram phrases and one trigram phrase",
    tags=("text", "ranking", "index"),
)
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.ranking import phrase_search

    docs = load_testdata(spark, sf_dir, "documents")
    return phrase_search(docs, PHRASE_QUERIES)
