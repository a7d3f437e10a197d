"""WARC source: framing round trip, quarantine/resync on corruption,
byte-stable re-export."""

from __future__ import annotations

from instagram_data_pipeline_spark.sources.warc import (
    format_record,
    parse_members,
    read_warc,
    write_warc,
)


def test_parse_members_roundtrip_pure():
    blob = b"".join(
        format_record(f"https://x/{i}", "2024-01-01T00:00:00Z",
                      f"payload {i}".encode() * (i + 1))
        for i in range(5)
    )
    recs = list(parse_members(blob, "f"))
    assert len(recs) == 5
    for i, r in enumerate(recs):
        src, off, url, date, payload, err = r
        assert err is None and url == f"https://x/{i}"
        assert payload == f"payload {i}".encode() * (i + 1)


def test_parse_quarantines_and_resyncs():
    good1 = format_record("https://x/1", "2024-01-01T00:00:00Z", b"one")
    garbage = b"NOT A RECORD AT ALL\r\n\r\n"
    # record with a lying Content-Length that truncates the archive
    good2 = format_record("https://x/2", "2024-01-01T00:00:00Z", b"two")
    bad_missing = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x/3\r\n\r\n"  # no Content-Length
    )
    blob = garbage + good1 + bad_missing + good2
    recs = list(parse_members(blob, "f"))
    errs = [r for r in recs if r[5] is not None]
    oks = [r for r in recs if r[5] is None]
    # garbage quarantined, both good records recovered
    assert [r[2] for r in oks] == ["https://x/1", "https://x/2"]
    assert any("bad magic" in r[5] for r in errs)
    assert any("content-length" in r[5] for r in errs)


def test_parse_truncated_payload():
    rec = format_record("https://x/1", "2024-01-01T00:00:00Z", b"abcdef")
    recs = list(parse_members(rec[:-10], "f"))
    assert len(recs) == 1 and recs[0][5] == "truncated payload"


def test_write_read_spark_roundtrip_and_stability(spark, tmp_path):
    rows = [
        (f"https://site/{i}", "2024-01-01T00:00:00Z",
         bytes(f"document body {i} " * 3, "utf-8"))
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_date string, payload binary"
    )
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_warc(df, out1, files=3)
    write_warc(df, out2, files=3)
    # byte-identical re-export (stable partition + in-file order)
    import pathlib

    a = {p.name: p.read_bytes() for p in pathlib.Path(out1).glob("*.warc")}
    b = {p.name: p.read_bytes() for p in pathlib.Path(out2).glob("*.warc")}
    assert a == b and len(a) == 3
    got = {
        r.url: bytes(r.payload)
        for r in read_warc(spark, out1).collect()
        if r.error is None
    }
    assert got == {u: p for u, _, p in rows}
