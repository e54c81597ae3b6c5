"""WARC source (sources/warc.py): spec-shaped golden, byte-exact
framing under adversarial payloads, JVM fast-path agreement, and the
synthesize->parse round trip."""

import datetime as dt

from pyspark.sql import functions as F

from python_mecab_ner_spark.sources.warc import (
    parse_warc_jvm, parse_warc_records, synthesize_warc)

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _record(url, date, payload):
    return ("WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date}\r\n"
            f"Content-Length: {len(payload.encode())}\r\n\r\n"
            f"{payload}\r\n\r\n")


def test_parse_handwritten_file_golden(spark):
    raw = (_record("https://a.com/1", "2026-01-01T12:00:00Z", "hello")
           + _record("https://b.com/2", "2026-01-01T13:00:00Z",
                     "two\nlines"))
    d = spark.createDataFrame([(raw,)], "warc string")
    got = sorted((r.url, r.warc_ts, bytes(r.html).decode())
                 for r in parse_warc_records(d).collect())
    assert got == [
        ("https://a.com/1", T0, "hello"),
        ("https://b.com/2", T0.replace(hour=13), "two\nlines")]


def test_byte_parser_survives_magic_in_payload(spark):
    # payload embeds the record magic AND a fake header block: the
    # Content-Length framing must carry the scanner straight past it
    evil = "x WARC/1.0\r\nContent-Length: 3\r\n\r\nabc y"
    raw = (_record("https://a.com/1", "2026-01-01T12:00:00Z", evil)
           + _record("https://a.com/2", "2026-01-01T12:00:00Z", "tail"))
    d = spark.createDataFrame([(raw,)], "warc string")
    got = {r.url: bytes(r.html).decode()
           for r in parse_warc_records(d).collect()}
    assert got == {"https://a.com/1": evil, "https://a.com/2": "tail"}


def test_jvm_parser_agrees_on_clean_ascii(spark):
    rows = [(f"https://h{i}.com/p", T0, f"payload {i} body")
            for i in range(20)]
    pages = spark.createDataFrame(rows, "url string, warc_ts timestamp,"
                                        " payload string")
    raw = "".join(r.rec for r in
                  synthesize_warc(pages).orderBy("url").collect())
    d = spark.createDataFrame([(raw,)], "warc string")
    a = sorted((r.url, r.warc_ts, bytes(r.html))
               for r in parse_warc_records(d).collect())
    b = sorted((r.url, r.warc_ts, bytes(r.html))
               for r in parse_warc_jvm(d).collect())
    assert a == b and len(a) == 20


def test_roundtrip_preserves_url_ts_payload(spark):
    rows = [(f"https://site.example/{i}",
             T0 + dt.timedelta(seconds=i),
             f"doc body {i} with spaces") for i in range(7)]
    pages = spark.createDataFrame(rows, "url string, warc_ts timestamp,"
                                        " payload string")
    raw = "".join(r.rec for r in
                  synthesize_warc(pages).orderBy("url").collect())
    d = spark.createDataFrame([(raw,)], "warc string")
    got = sorted((r.url, r.warc_ts, bytes(r.html).decode())
                 for r in parse_warc_records(d).collect())
    assert got == sorted(rows)


def test_parse_stage_has_no_shuffle(spark):
    d = spark.createDataFrame([("x",)], "warc string")
    plan = parse_warc_records(d)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_ledger_clean_file(spark):
    raw = (_record("https://a.com/1", "2026-01-01T12:00:00Z", "hello")
           + _record("https://b.com/2", "2026-01-01T13:00:00Z", "yo"))
    d = spark.createDataFrame([(raw,)], "warc string")
    from python_mecab_ner_spark.sources.warc import parse_warc_ledger
    led = parse_warc_ledger(d).collect()[0]
    assert (led.records, led.malformed, led.aborted) == (2, 0, False)
    assert led.bytes_consumed == led.total_bytes == len(raw.encode())


def test_ledger_strict_abort_vs_resync(spark):
    # middle record lacks Content-Length: strict aborts (and the
    # ledger says so); strict=False resyncs and recovers the tail
    bad = ("WARC/1.0\r\nWARC-Type: response\r\n"
           "WARC-Target-URI: https://bad.com/x\r\n\r\noops\r\n\r\n")
    raw = (_record("https://a.com/1", "2026-01-01T12:00:00Z", "head")
           + bad
           + _record("https://c.com/3", "2026-01-01T14:00:00Z", "tail"))
    d = spark.createDataFrame([(raw,)], "warc string")
    from python_mecab_ner_spark.sources.warc import parse_warc_ledger

    strict_rows = {r.url for r in parse_warc_records(d).collect()}
    assert strict_rows == {"https://a.com/1"}
    led = parse_warc_ledger(d).collect()[0]
    assert led.aborted and led.malformed == 1 and led.records == 1
    assert led.bytes_consumed < led.total_bytes

    loose_rows = {r.url for r in
                  parse_warc_records(d, strict=False).collect()}
    assert loose_rows == {"https://a.com/1", "https://c.com/3"}
    led2 = parse_warc_ledger(d, strict=False).collect()[0]
    assert (led2.records, led2.malformed, led2.aborted) == (2, 1, False)
