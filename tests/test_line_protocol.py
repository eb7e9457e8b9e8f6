"""Line Protocol parser tests (reference escape/type cases,
/root/reference/internal/ingest/lineprotocol.go:83-436 and FIXTURES.md §7)."""

from __future__ import annotations

import pytest

from arc_spark.sources.line_protocol import (
    LineProtocolError,
    parse_batch,
    parse_line,
    lines_to_dataframe,
)


def test_basic_line():
    r = parse_line(
        "cpu,host=server01,region=us-east value=0.64,cpu_idle=35.2 1717689600000000000"
    )
    assert r["measurement"] == "cpu"
    assert r["tags"] == {"host": "server01", "region": "us-east"}
    assert r["fields"] == {"value": 0.64, "cpu_idle": 35.2}
    assert r["time_us"] == 1717689600000000


def test_type_suffixes_and_bools():
    r = parse_line('m f_int=42i,f_uint=7u,f_t=true,f_f=F,f_str="hi there" 1000000000')
    assert r["fields"] == {
        "f_int": 42, "f_uint": 7, "f_t": True, "f_f": False, "f_str": "hi there",
    }
    assert isinstance(r["fields"]["f_int"], int)


def test_escapes():
    r = parse_line(r"we\,ird\ name,tag\ key=va\=lue value=1 1")
    assert r["measurement"] == "we,ird name"
    assert r["tags"] == {"tag key": "va=lue"}


def test_string_field_with_comma_and_quote():
    r = parse_line('m s="a,b \\"quoted\\"",v=2 1')
    assert r["fields"]["s"] == 'a,b "quoted"'
    assert r["fields"]["v"] == 2.0


def test_precision():
    assert parse_line("m v=1 1700000000", precision="s")["time_us"] == 1700000000 * 10**6
    assert parse_line("m v=1 1700000000000", precision="ms")["time_us"] == 1700000000000 * 1000
    assert parse_line("m v=1 1700000000000000", precision="us")["time_us"] == 1700000000000000


def test_no_timestamp_uses_default():
    recs = parse_batch("m v=1\nm v=2 5000000", precision="us", default_time_us=42)
    assert recs[0]["time_us"] == 42
    assert recs[1]["time_us"] == 5000000


def test_malformed_lines():
    for bad in ["", "justname", "m,tag v", "m v= 1", "m =1 1", "m v=abc 1"]:
        with pytest.raises(LineProtocolError):
            parse_line(bad)


def test_comments_skipped():
    assert len(parse_batch("# comment\nm v=1 1\n\n")) == 1


def test_distributed_parse(spark):
    lines = [
        "cpu,host=a value=1.5,idle=90i 1700000000000000000",
        "cpu,host=b value=2.5,idle=80i 1700000001000000000",
        "# comment",
        "cpu,host=a value=3.5 1700003600000000000",
    ]
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    out = lines_to_dataframe(spark, df).orderBy("time")
    rows = out.collect()
    assert len(rows) == 3
    assert out.columns == ["measurement", "time", "host", "idle", "value"]
    assert rows[0]["host"] == "a" and rows[0]["value"] == 1.5 and rows[0]["idle"] == 90
    assert rows[2]["idle"] is None  # schema evolution: missing field → null


def test_lines_to_dataframe_epoch_zero(spark):
    """Regression (ADVICE low): distributed LP parse nulled epoch-0 times."""
    from arc_spark.sources.line_protocol import lines_to_dataframe

    lines = spark.createDataFrame([("cpu v=1 0",), ("cpu v=2 1000000000",)],
                                  "value string")
    out = {r["v"]: r["time"] for r in lines_to_dataframe(spark, lines).collect()}
    assert out[1.0] is not None and out[1.0].year == 1970
