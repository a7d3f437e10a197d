"""U1: batched interest categorization as a Spark table function.

Reference behavior (``interest_analyzer.py:141-255``): partition the
"following" profiles into batches of 20, render one prompt per batch over
(username, full_name, bio), call GPT-4 in JSON mode, parse
``{"results": [{username, category, confidence}]}``.

Spark-first redesign: the batch loop becomes ``mapInPandas`` — each
Arrow batch streams through one Python worker, which re-chunks to the
model batch size and calls a pluggable ``Categorizer``. The default
model is a deterministic keyword scorer so the operator is reproducible
and oracle-checkable (SURVEY §7 risk 4); an OpenAI-compatible client is
provided behind an import-try and is never used in tests/CI.

At scale: inference cost dominates, so parallelism = number of Arrow
partitions; rate limiting is per-worker (the reference's 1 s/batch pause
becomes a client-side limiter injected into the live client, not an
engine concern).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator
from dataclasses import dataclass
from typing import Protocol

import pandas as pd
from pyspark.sql import DataFrame

RESULT_SCHEMA = "username string, category string, confidence double"

# The reference's taxonomy (interest_analyzer.py:42-59 main, 81-93 sub).
MAIN_CATEGORIES = (
    "Fashion", "Technology", "Sports", "Fitness", "Food", "Travel", "Art",
    "Music", "Photography", "Beauty", "Gaming", "Business", "Entertainment",
    "Education", "Science", "Politics", "Lifestyle", "Humor",
)
SUBCATEGORIES = {
    "Streetwear": "Fashion",
    "Luxury Fashion": "Fashion",
    "Sustainable Fashion": "Fashion",
    "Mobile Tech": "Technology",
    "AI & Machine Learning": "Technology",
    "Programming": "Technology",
    "Football": "Sports",
    "Basketball": "Sports",
    "Formula 1": "Sports",
}

# Keyword model: deterministic stand-in for the LLM, tuned to the
# reference's own test fixtures (fashion/tech/food bios,
# tests/test_scraper.py:44-60).
_KEYWORDS: dict[str, tuple[str, ...]] = {
    "Fashion": ("fashion", "style", "outfit", "wear", "clothing", "trends"),
    "Technology": ("tech", "software", "engineer", "coding", "ai",
                   "machine learning", "developer", "programming"),
    "Food": ("food", "chef", "recipe", "cooking", "restaurant", "baking"),
    "Sports": ("sport", "football", "basketball", "athlete", "training"),
    "Fitness": ("fitness", "gym", "workout", "yoga", "health"),
    "Travel": ("travel", "wanderlust", "adventure", "explore"),
    "Art": ("art", "artist", "painting", "design", "illustration"),
    "Music": ("music", "musician", "dj", "singer", "band"),
    "Photography": ("photo", "photography", "photographer", "camera"),
    "Beauty": ("beauty", "makeup", "skincare", "cosmetics"),
    "Gaming": ("gaming", "gamer", "esports", "streamer"),
    "Business": ("business", "entrepreneur", "startup", "founder", "ceo"),
    "Entertainment": ("movie", "film", "tv", "comedy", "actor"),
    "Education": ("education", "teacher", "learning", "school"),
    "Science": ("science", "research", "physics", "biology"),
    "Politics": ("politics", "policy", "government"),
    "Lifestyle": ("lifestyle", "daily", "living", "blogger"),
    "Humor": ("humor", "funny", "memes", "jokes"),
}


class Categorizer(Protocol):
    def categorize(self, records: list[dict]) -> list[dict]:
        """records: [{username, full_name, bio}] -> [{username, category,
        confidence}] (may drop or invent entries — validation is U2's
        job, not the model's)."""
        ...


@dataclass
class KeywordCategorizer:
    """Deterministic scorer: most keyword hits wins; confidence is a
    fixed function of hit count. Same contract as the LLM path."""

    min_hits: int = 1

    def categorize(self, records: list[dict]) -> list[dict]:
        out = []
        for rec in records:
            text = " ".join(
                str(rec.get(k) or "") for k in ("full_name", "bio")
            ).lower()
            best, best_hits = None, 0
            for category in sorted(_KEYWORDS):  # sorted -> deterministic ties
                hits = sum(1 for kw in _KEYWORDS[category] if kw in text)
                if hits > best_hits:
                    best, best_hits = category, hits
            if best is not None and best_hits >= self.min_hits:
                confidence = min(0.6 + 0.15 * best_hits, 0.95)
                out.append(
                    {
                        "username": rec["username"],
                        "category": best,
                        "confidence": round(confidence, 2),
                    }
                )
        return out


def build_prompt(records: list[dict]) -> str:
    """Prompt per the reference's template (interest_analyzer.py:217-255):
    numbered account lines + the category list + JSON-shape instruction."""
    lines = [
        f"{i + 1}. username: {r['username']}, name: {r.get('full_name') or ''}, "
        f"bio: {r.get('bio') or ''}"
        for i, r in enumerate(records)
    ]
    cats = ", ".join(MAIN_CATEGORIES + tuple(SUBCATEGORIES))
    return (
        "Categorize each Instagram account into exactly one of these "
        f"categories: {cats}.\n"
        "Respond as JSON: {\"results\": [{\"username\": ..., "
        "\"category\": ..., \"confidence\": 0.0-1.0}]}\n\n"
        "Accounts:\n" + "\n".join(lines)
    )


def parse_response(payload: str) -> list[dict]:
    """Parse the model's JSON (shape at interest_analyzer.py:240-251);
    malformed entries are dropped, missing confidence defaults to 0.5
    (interest_analyzer.py:263-265)."""
    try:
        data = json.loads(payload)
    except (TypeError, ValueError):
        return []
    out = []
    for item in data.get("results", []):
        if not isinstance(item, dict) or "username" not in item:
            continue
        out.append(
            {
                "username": item["username"],
                "category": item.get("category"),
                "confidence": float(item.get("confidence", 0.5)),
            }
        )
    return out


class OpenAICompatibleCategorizer:
    """Live-model client. Mirrors the reference call: model gpt-4,
    temperature 0.2, max_tokens 2000, JSON response format
    (interest_analyzer.py:180-189).

    ``client`` is the transport seam: anything exposing
    ``chat.completions.create(**kwargs)`` (the OpenAI-compatible
    surface). CI injects a fake transport to contract-test the request
    shape and the parse/validate round trip without network
    (tests/test_analysis.py); left to default it builds a real
    ``openai.OpenAI`` client (import-guarded — the package is optional
    and never needed in CI)."""

    def __init__(
        self,
        model: str = "gpt-4",
        api_key_env: str = "OPENAI_API_KEY",
        client=None,
    ):
        if client is None:  # pragma: no cover - needs the optional dep
            try:
                from openai import OpenAI  # type: ignore[import-not-found]
            except ImportError as exc:
                raise ImportError(
                    "openai package not installed; use KeywordCategorizer "
                    "or inject an OpenAI-compatible client"
                ) from exc
            client = OpenAI(api_key=os.environ[api_key_env])
        self._client = client
        self._model = model

    def categorize(self, records: list[dict]) -> list[dict]:
        resp = self._client.chat.completions.create(
            model=self._model,
            temperature=0.2,
            max_tokens=2000,
            response_format={"type": "json_object"},
            messages=[{"role": "user", "content": build_prompt(records)}],
        )
        return parse_response(resp.choices[0].message.content)


def categorize_following(
    profiles: DataFrame,
    categorizer: Categorizer | None = None,
    batch_size: int = 20,
) -> DataFrame:
    """The U1 table function: (username, full_name, bio) -> (username,
    category, confidence) via batched model calls inside mapInPandas.

    ``batch_size`` mirrors the reference's 20-account batches; the Arrow
    batch is re-chunked so the model never sees more than that."""
    model = categorizer or KeywordCategorizer()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            records = pdf[["username", "full_name", "bio"]].to_dict("records")
            results: list[dict] = []
            for i in range(0, len(records), batch_size):
                results.extend(model.categorize(records[i : i + batch_size]))
            yield pd.DataFrame(
                results, columns=["username", "category", "confidence"]
            )

    return profiles.select("username", "full_name", "bio").mapInPandas(
        op, schema=RESULT_SCHEMA
    )
