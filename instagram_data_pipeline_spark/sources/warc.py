"""WARC (Web ARChive, ISO 28500) source — the Common-Crawl ingestion
shape: offset-framed records inside large archive files, parsed into a
typed documents table.

The reference repo ingests live HTML via Selenium
(instagram_pipeline/scraper/instagram_scraper.py); a 100 TB corpus
ingests ARCHIVES instead, and WARC is the lingua franca. This module
implements the subset every crawl pipeline needs:

* ``write_warc`` — serialize (url, date, payload) rows into spec-shaped
  ``WARC/1.0`` response records (named headers, CRLF framing,
  Content-Length payload framing) — one archive member per input file
  partition, like real crawls write one .warc per fetcher.
* ``read_warc`` — parse archive files back into rows. Files load via
  Spark's ``binaryFile`` source and parse inside ``mapInPandas`` — the
  same batch-Python boundary as the media codecs, because WARC framing
  is byte arithmetic, not columns. Archives are parsed WHOLE per file
  (real gzipped WARCs are member-compressed and equally non-splittable;
  parallelism comes from the many-files layout, which is how Common
  Crawl ships — 64k files per crawl).
* Malformed records (bad framing, truncated payload, missing mandatory
  headers) land in a quarantine column instead of failing the scan —
  the profiles-source contract (sources/profiles.py) applied to binary
  framing.

Parsing is pure stdlib byte slicing — deterministic, no network, no
external deps.
"""

from __future__ import annotations

from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CRLF = b"\r\n"

WARC_SCHEMA = (
    "src_file string, record_offset long, url string, warc_date string, "
    "payload binary, error string"
)


def format_record(url: str, date: str, payload: bytes) -> bytes:
    """One spec-shaped WARC/1.0 response record."""
    headers = (
        b"WARC/1.0" + CRLF
        + b"WARC-Type: response" + CRLF
        + b"WARC-Target-URI: " + url.encode("utf-8") + CRLF
        + b"WARC-Date: " + date.encode("ascii") + CRLF
        + b"Content-Length: " + str(len(payload)).encode("ascii") + CRLF
        + CRLF
    )
    return headers + payload + CRLF + CRLF


def parse_members(data: bytes, src: str) -> Iterator[tuple]:
    """Yield (src, offset, url, date, payload, error) per record.

    A parse failure quarantines THE RECORD (or the unframeable tail)
    and resynchronizes at the next ``WARC/1.0`` magic — one bad record
    never poisons the archive."""
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos:pos + 8] != b"WARC/1.0":
            nxt = data.find(b"WARC/1.0", pos + 1)
            end = nxt if nxt != -1 else n
            yield (src, pos, None, None, None,
                   "bad magic: no WARC/1.0 at offset")
            if nxt == -1:
                return
            pos = nxt
            continue
        head_end = data.find(CRLF + CRLF, pos)
        if head_end == -1:
            yield (src, pos, None, None, None, "truncated header block")
            return
        header_blob = data[pos + 8:head_end]
        headers = {}
        for line in header_blob.split(CRLF):
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.strip().lower()] = v.strip()
        url = headers.get(b"warc-target-uri")
        date = headers.get(b"warc-date")
        clen = headers.get(b"content-length")
        body_at = head_end + 4
        if clen is None or not clen.isdigit():
            yield (src, pos, None, None, None, "missing content-length")
            nxt = data.find(b"WARC/1.0", body_at)
            if nxt == -1:
                return
            pos = nxt
            continue
        length = int(clen)
        if body_at + length > n:
            yield (src, pos, None, None, None, "truncated payload")
            return
        payload = data[body_at:body_at + length]
        err = None
        if url is None or date is None:
            err = "missing mandatory header"
        yield (
            src,
            pos,
            url.decode("utf-8", "replace") if url else None,
            date.decode("ascii", "replace") if date else None,
            bytes(payload) if err is None else None,
            err,
        )
        pos = body_at + length
        while data[pos:pos + 2] == CRLF:
            pos += 2


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Parse every ``*.warc`` under ``path`` into the typed record
    frame. One task per archive file (binaryFile is non-splittable by
    design here — see module docstring); byte work happens in Arrow
    batches."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterable["pd.DataFrame"]):
        for pdf in batches:
            rows = []
            for src, data in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_members(bytes(data), src.split("/")[-1]))
            yield pd.DataFrame(
                rows,
                columns=[
                    "src_file", "record_offset", "url", "warc_date",
                    "payload", "error",
                ],
            )

    return files.select("path", "content").mapInPandas(
        parse, schema=WARC_SCHEMA
    )


def write_warc(
    df: DataFrame,
    path: str,
    url_col: str = "url",
    date_col: str = "warc_date",
    payload_col: str = "payload",
    files: int = 4,
) -> None:
    """Serialize rows into ``files`` archive files under ``path`` —
    records are laid out in (url) order within a stable hash partition,
    so re-exports are byte-identical (the training-shard discipline
    applied to archives). ``path`` must be task-reachable (local/POSIX
    here; a shared mount or object-store FUSE on a cluster — parquet
    committers don't apply to foreign formats)."""
    import os

    part = F.pmod(F.xxhash64(F.col(url_col)), files).cast("int")
    rows = (
        df.select(
            part.alias("_p"), F.col(url_col).alias("u"),
            F.col(date_col).alias("d"), F.col(payload_col).alias("b"),
        )
        .repartition(files, "_p")
        .sortWithinPartitions("_p", "u")
    )
    os.makedirs(path, exist_ok=True)

    def dump(batches: Iterable["pd.DataFrame"]):
        # rows arrive sorted by (_p, u), so each archive's records are
        # contiguous: stream every record straight to the open file —
        # peak task memory is one Arrow batch, not the whole partition
        # (file-sized gzip members at Common-Crawl scale would OOM a
        # buffer-then-write task)
        import pandas as pd

        out: list[tuple[str, int]] = []
        cur_p, cur_f, cur_fn, cur_n = None, None, "", 0

        def close():
            nonlocal cur_f, cur_n
            if cur_f is not None:
                cur_f.close()
                out.append((cur_fn, cur_n))
                cur_f, cur_n = None, 0

        for pdf in batches:
            for p, u, d, b in zip(pdf["_p"], pdf["u"], pdf["d"], pdf["b"]):
                p = int(p)
                if p != cur_p:
                    close()
                    cur_p = p
                    cur_fn = os.path.join(path, f"part-{p:05d}.warc")
                    cur_f = open(cur_fn, "wb")
                cur_f.write(format_record(u, d, bytes(b)))
                cur_n += 1
        close()
        yield pd.DataFrame(out, columns=["file", "n_records"])

    # one file per partition; the action materializes the write
    rows.mapInPandas(dump, schema="file string, n_records long").collect()
