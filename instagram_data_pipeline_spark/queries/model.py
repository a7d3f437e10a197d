"""U1/U2 oracle-checked: the batched model-inference table function and
its validation join.

The reference sends profile batches to an LLM (interest_analyzer.py:
171-214); the engine's deterministic stand-in (KeywordCategorizer) has
exactly the same contract and runs through the SAME mapInPandas operator
(U1, analysis/categorizer.py:183-207). Because the stand-in's scoring is
pure string logic, it is SQL-expressible — so the full Python-model path
(Arrow batches in, re-chunked model batches, Arrow batches out) gets an
exact DuckDB oracle instead of pytest-only coverage. The oracle SQL is
generated from the same keyword table and taxonomy the model uses (one
source of truth for the fixture).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analysis.categorizer import (
    _KEYWORDS,
    MAIN_CATEGORIES,
    SUBCATEGORIES,
    categorize_following,
)
from ..io import load_testdata
from . import register


def _hits_expr(category: str) -> str:
    terms = " + ".join(
        f"(CASE WHEN txt LIKE '%{kw}%' THEN 1 ELSE 0 END)"
        for kw in _KEYWORDS[category]
    )
    return f"({terms})"


def _scored_union() -> str:
    return "\nUNION ALL\n".join(
        f"SELECT username, '{cat}' AS category, {_hits_expr(cat)} AS hits FROM p"
        for cat in sorted(_KEYWORDS)
    )


def _taxonomy_values() -> str:
    """The default_categories dim as a SQL VALUES list (same id
    assignment: mains enumerated first, then sorted subcategories)."""
    rows = [(i, name) for i, name in enumerate(MAIN_CATEGORIES, start=1)]
    rows += [
        (j, name)
        for j, name in enumerate(
            sorted(SUBCATEGORIES), start=len(MAIN_CATEGORIES) + 1
        )
    ]
    return ", ".join(f"({i}, '{n.replace(chr(39), chr(39) * 2)}')" for i, n in rows)


_CATEGORIZE_BODY = f"""
WITH p AS (
  SELECT CAST(doc_id AS VARCHAR) AS username,
         lower(COALESCE(text, '')) AS txt
  FROM documents
), scored AS (
{_scored_union()}
), best AS (
  SELECT username, category, hits,
         ROW_NUMBER() OVER (PARTITION BY username
                            ORDER BY hits DESC, category) AS rn
  FROM scored WHERE hits >= 1
)
"""

_CATEGORIZE_ORACLE = _CATEGORIZE_BODY + """
SELECT username, category,
       ROUND(LEAST(0.6 + 0.15 * hits, 0.95), 2) AS confidence
FROM best WHERE rn = 1
"""

_VALIDATE_ORACLE = _CATEGORIZE_BODY + f""",
results AS (
  SELECT username AS user_id, category,
         ROUND(LEAST(0.6 + 0.15 * hits, 0.95), 2) AS confidence
  FROM best WHERE rn = 1
), cats(category_id, category_name) AS (
  VALUES {_taxonomy_values()}
)
SELECT r.user_id, c.category_id,
       COALESCE(r.confidence, 0.5) AS confidence_score
FROM results r JOIN cats c ON r.category = c.category_name
"""


def _doc_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").cast("string").alias("username"),
        F.lit(None).cast("string").alias("full_name"),
        F.col("text").alias("bio"),
    )


@register(
    "keyword_categorize",
    _CATEGORIZE_ORACLE,
    doc="U1: batched model inference via mapInPandas (KeywordCategorizer "
        "over document-derived profiles) vs the SQL reimplementation of "
        "the scoring — most-hits wins, alphabetical tie-break, "
        "confidence = min(0.6 + 0.15*hits, 0.95)",
    tags=("udf", "model", "text"),
)
def q_keyword_categorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the REAL U1 operator: Arrow batches -> 20-row model chunks -> Arrow
    return categorize_following(_doc_profiles(spark, sf_dir))


@register(
    "validate_interests",
    _VALIDATE_ORACLE,
    doc="U2: validation join of model output against the category dim — "
        "unknown categories dropped (P8), name -> id resolved via "
        "broadcast, NULL confidence defaulted to 0.5 "
        "(interest_analyzer.py:257-280)",
    tags=("udf", "model", "join"),
)
def q_validate_interests(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..analysis.interests import default_categories, validate_results

    results = categorize_following(_doc_profiles(spark, sf_dir)).select(
        F.col("username").alias("user_id"), "category", "confidence"
    )
    cats = default_categories(spark)
    return validate_results(results, cats)
