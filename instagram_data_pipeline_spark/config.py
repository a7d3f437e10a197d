"""Engine configuration from environment variables.

Mirrors the reference's env-driven config (``config.py:1-30``: DB creds,
API keys, proxy list) re-scoped to the Spark engine: warehouse location,
scheduler throttles, model batch size. Everything has the reference's
default; nothing is required.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default


@dataclass(frozen=True)
class EngineConfig:
    warehouse_root: str = field(
        default_factory=lambda: os.environ.get(
            "PIPELINE_WAREHOUSE", "/tmp/instagram_pipeline_warehouse"
        )
    )
    # scheduler throttles (job_scheduler.py:29, 93)
    daily_quota: int = field(default_factory=lambda: _int("PIPELINE_DAILY_QUOTA", 200))
    batch_size: int = field(default_factory=lambda: _int("PIPELINE_BATCH_SIZE", 10))
    # model batching (interest_analyzer.py:27)
    model_batch_size: int = field(
        default_factory=lambda: _int("PIPELINE_MODEL_BATCH", 20)
    )
    analysis_limit: int = field(default_factory=lambda: _int("PIPELINE_ANALYSIS_LIMIT", 5))
    # live-model credentials (config.py:25-27) — only read by the
    # OpenAI-compatible client, never in CI
    openai_api_key_env: str = "OPENAI_API_KEY"


def load_config() -> EngineConfig:
    return EngineConfig()
