"""S4/S5: live paginated edge sources behind an engine-facing protocol.

The reference walks a rate-limited, paginated iterator of follower/
following profiles and commits every page-ish chunk to PostgreSQL
(``instagram_scraper.py:227-318`` with its per-10-rows ledger commits).
The engine analog splits that into two halves:

* a **connector** (:class:`PagedEdgeSource` protocol) that owns network
  IO, pagination, and rate limiting — it just yields pages of dicts;
  the engine never sees a socket;
* a **landing adapter** (:class:`FileLandingAdapter`) that writes each
  page atomically as one JSON-lines file into a spool directory.

From there the existing machinery takes over unchanged: the spool is a
file stream (``streaming.events.stream_from_parquet``-style; here JSON
lines), ``maxFilesPerTrigger`` is the per-trigger page cap (T3), the
checkpoint is the resumable cursor (T6), and ``LedgerProgressSink`` does
the per-batch ledger commits (S9/A4). Page files are written tmp+rename
so a concurrent stream never observes a partial file.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator
from pathlib import Path
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Raw landed record: the scraped account + one related profile
# (the dict the reference builds per follower, instagram_scraper.py:252-258)
RAW_EDGE = T.StructType(
    [
        T.StructField("user_id", T.StringType()),        # scraped account
        T.StructField("relation", T.StringType()),       # followers|following
        T.StructField("other_id", T.StringType()),       # related account
        T.StructField("other_username", T.StringType()),
        T.StructField("other_full_name", T.StringType()),
        T.StructField("other_profile_pic_url", T.StringType()),
        T.StructField("other_is_private", T.BooleanType()),
    ]
)


class PagedEdgeSource(Protocol):
    """Connector contract: yield pages (lists of RAW_EDGE-shaped dicts)
    for one account. Implementations own pagination tokens, retry, and
    rate limiting (the reference's ``_add_delay``)."""

    def pages(
        self, username: str, max_count: int | None = None
    ) -> Iterator[list[dict]]:
        ...


class FileLandingAdapter:
    """Land a connector's pages as atomic JSON-lines files in a spool
    directory — the bridge from pull-based pagination to the file-stream
    micro-batch world."""

    def __init__(self, spool_dir: str):
        self.spool = Path(spool_dir)
        self.spool.mkdir(parents=True, exist_ok=True)

    def land(
        self,
        source: PagedEdgeSource,
        username: str,
        max_count: int | None = None,
    ) -> int:
        """Drain ``source`` for ``username``; one file per page. Returns
        rows landed. File names are unique (uuid) so repeated lands never
        collide; the stream checkpoint dedups by file name."""
        total = 0
        for page_no, page in enumerate(source.pages(username, max_count)):
            if not page:
                continue
            name = f"{username}-{page_no:06d}-{uuid.uuid4().hex[:8]}.jsonl"
            tmp = self.spool / f".{name}.tmp"
            with open(tmp, "w") as f:
                for rec in page:
                    f.write(json.dumps(rec) + "\n")
            os.rename(tmp, self.spool / name)  # atomic publish
            total += len(page)
        return total


def stream_edges(
    spark: SparkSession,
    spool_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File stream over a landing spool: each page file is (at most) one
    micro-batch; ``maxFilesPerTrigger`` caps pages per trigger (T3)."""
    reader = spark.readStream.schema(RAW_EDGE)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(spool_dir)


def read_edges(spark: SparkSession, spool_dir: str) -> DataFrame:
    """Batch read of the same spool (S4's one-shot form)."""
    return spark.read.schema(RAW_EDGE).json(str(Path(spool_dir) / "*.jsonl"))


def parse_edge_records(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(edges, stub_users) from landed records — the two INSERT ... ON
    CONFLICT DO NOTHING targets of the reference's follower loop
    (instagram_scraper.py:252-278): the edge row and the stub profile of
    the related account. Both are insert-if-absent (A2) downstream.

    Edge direction follows the relation: ``followers`` pages yield
    (user_id, follower_id=other); ``following`` pages yield
    (user_id, following_id=other). Returns followers-shaped edges with a
    ``relation`` column the caller splits on."""
    ok = raw.filter(
        F.col("user_id").isNotNull() & F.col("other_id").isNotNull()
    )
    edges = ok.select(
        "relation",
        "user_id",
        F.col("other_id").alias("edge_id"),
    )
    stubs = ok.select(
        F.col("other_id").alias("user_id"),
        F.col("other_username").alias("username"),
        F.col("other_full_name").alias("full_name"),
        F.lit(None).cast("string").alias("bio"),
        F.col("other_profile_pic_url").alias("profile_pic_url"),
        F.lit(None).cast("int").alias("follower_count"),
        F.lit(None).cast("int").alias("following_count"),
        F.col("other_is_private").alias("is_private"),
        F.lit(None).cast("timestamp").alias("last_updated"),
    ).dropDuplicates(["user_id"])
    return edges, stubs


class JsonFixtureSource:
    """Concrete :class:`PagedEdgeSource` over a cursor-paginated local
    fixture — a real connector minus the socket (VERDICT r3 "Next
    round" #7). The fixture directory mimics a paginated HTTP API's
    response shape exactly:

        <root>/<username>/page-<token>.json
            {"records": [RAW_EDGE-shaped dicts...],
             "next_token": "<token>" | null}

    ``pages`` follows ``next_token`` links from the entry page (token
    ``"start"``) — the walk order comes from the DATA, not directory
    listing, as with a network API. ``pages_from`` is the resume
    surface: start at an arbitrary token, yielding ``(page,
    next_token)`` so the caller can persist a cursor after each page
    (the reference scraper's resume point, instagram_scraper.py:
    227-318; T6)."""

    ENTRY_TOKEN = "start"

    def __init__(self, root: str):
        self.root = Path(root)

    def _load(self, username: str, token: str) -> dict:
        path = self.root / username / f"page-{token}.json"
        with open(path) as f:
            return json.load(f)

    def pages_from(
        self,
        username: str,
        token: str | None,
        max_count: int | None = None,
    ) -> Iterator[tuple[list[dict], str | None]]:
        taken = 0
        while token is not None:
            body = self._load(username, token)
            records = body["records"]
            if max_count is not None:
                records = records[: max_count - taken]
            taken += len(records)
            nxt = body.get("next_token")
            yield records, nxt
            if max_count is not None and taken >= max_count:
                return
            token = nxt

    def pages(
        self, username: str, max_count: int | None = None
    ) -> Iterator[list[dict]]:
        for page, _ in self.pages_from(username, self.ENTRY_TOKEN, max_count):
            yield page


class LandCursor:
    """Durable landing cursor: a JSON file (atomic tmp+rename, like the
    page files) recording per-username progress — ``pages`` landed, the
    ``token`` to resume from, ``done``. This is the engine analog of
    the reference's per-commit ledger checkpoint: a crashed land
    resumes from the last PUBLISHED page, never from page 0."""

    def __init__(self, path: str):
        self.path = Path(path)

    def get(self, username: str) -> dict:
        try:
            with open(self.path) as f:
                state = json.load(f)
        except FileNotFoundError:
            state = {}
        return state.get(
            username,
            {"pages": 0, "token": JsonFixtureSource.ENTRY_TOKEN,
             "done": False},
        )

    def put(self, username: str, entry: dict) -> None:
        try:
            with open(self.path) as f:
                state = json.load(f)
        except FileNotFoundError:
            state = {}
        state[username] = entry
        tmp = self.path.with_suffix(".tmp")
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.rename(tmp, self.path)


def land_resumable(
    adapter: FileLandingAdapter,
    source: JsonFixtureSource,
    username: str,
    cursor: LandCursor,
    max_count: int | None = None,
) -> int:
    """Crash-safe landing drive: follow the connector's token chain,
    publish each page atomically under a DETERMINISTIC name
    (``<username>-<page_no>.jsonl``), then advance the cursor. Crash
    anywhere and a re-invocation re-lands at most the one page whose
    cursor write didn't happen — same name, atomic rename, so the spool
    never holds duplicates and the file stream's checkpoint (which
    tracks paths) never double-reads. Returns rows landed THIS call."""
    state = cursor.get(username)
    if state["done"]:
        return 0
    total = 0
    page_no = state["pages"]
    for page, nxt in source.pages_from(username, state["token"], max_count):
        if page:
            name = f"{username}-{page_no:06d}.jsonl"
            tmp = adapter.spool / f".{name}.tmp"
            with open(tmp, "w") as f:
                for rec in page:
                    f.write(json.dumps(rec) + "\n")
            os.rename(tmp, adapter.spool / name)  # atomic publish
            total += len(page)
        page_no += 1
        cursor.put(
            username,
            {"pages": page_no, "token": nxt, "done": nxt is None},
        )
    return total


class FakePaginatedSource:
    """Deterministic in-memory connector for tests and dry runs: pages of
    ``page_size`` synthetic follower profiles, honoring ``max_count``
    (the reference's early-break, instagram_scraper.py:292-293)."""

    def __init__(self, n: int, page_size: int = 10, relation: str = "followers"):
        self.n = n
        self.page_size = page_size
        self.relation = relation

    def pages(
        self, username: str, max_count: int | None = None
    ) -> Iterator[list[dict]]:
        limit = min(self.n, max_count) if max_count else self.n
        for start in range(0, limit, self.page_size):
            yield [
                {
                    "user_id": username,
                    "relation": self.relation,
                    "other_id": f"{username}_f{i}",
                    "other_username": f"fan_{i}",
                    "other_full_name": f"Fan {i}",
                    "other_profile_pic_url": None,
                    "other_is_private": i % 3 == 0,
                }
                for i in range(start, min(start + self.page_size, limit))
            ]
