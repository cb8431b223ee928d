"""Source tests: encoding fallback, incremental recency window,
filename-timestamp extraction (SURVEY.md §2a ops 1, 4; §2e op 33)."""

from __future__ import annotations

import datetime as dt
import os

from kaggle_ecommerce_etl_spark.sources.csv_source import (
    read_csv_with_encoding_fallback,
    read_recent_csv,
    with_filename_timestamp,
)


def test_encoding_fallback_latin1(spark, tmp_path):
    p = tmp_path / "latin.csv"
    with open(p, "wb") as f:
        f.write("name,city\n".encode("utf-8"))
        f.write("Müller,Köln\n".encode("iso-8859-1"))  # invalid UTF-8 bytes
    df = read_csv_with_encoding_fallback(spark, str(p))
    row = df.collect()[0]
    assert row.name == "Müller" and row.city == "Köln"


def test_encoding_utf8_first(spark, tmp_path):
    p = tmp_path / "utf8.csv"
    p.write_text("name\nMüller\n", encoding="utf-8")
    assert read_csv_with_encoding_fallback(spark, str(p)).collect()[0].name == "Müller"


def test_read_recent_csv_window(spark, tmp_path):
    fresh = tmp_path / "fresh.csv"
    stale = tmp_path / "stale.csv"
    fresh.write_text("a\n1\n")
    stale.write_text("a\n2\n")
    old = dt.datetime.now().timestamp() - 3600
    os.utime(stale, (old, old))
    df = read_recent_csv(spark, str(tmp_path), minutes=10)
    assert [r.a for r in df.collect()] == ["1"]


def test_filename_timestamp_extract(spark, tmp_path):
    p = tmp_path / "Amazon Sale Report_2022-04-30_12-30-00.csv"
    p.write_text("a\n1\n")
    df = with_filename_timestamp(
        spark.read.option("header", True).csv(str(tmp_path))
    )
    row = df.collect()[0]
    assert "Amazon" in row._source_file
    assert row._file_ts == dt.datetime(2022, 4, 30, 12, 30, 0)


def test_read_csv_quarantine(spark, tmp_path):
    """Healthy rows of a partially-damaged file survive; rows that
    cannot align to the header are quarantined as raw lines."""
    from kaggle_ecommerce_etl_spark.sources.csv_source import read_csv_quarantine

    p = tmp_path / "damaged.csv"
    p.write_text(
        "a,b,c\n"
        "1,2,3\n"
        "4,5,6,EXTRA,COLS\n"   # too many fields → quarantine
        "7,8\n"                 # too few fields → quarantine
        "9,10,11\n"
    )
    good, bad = read_csv_quarantine(spark, str(p))
    g = sorted(tuple(r) for r in good.collect())
    assert g == [("1", "2", "3"), ("9", "10", "11")]
    badlines = sorted(r.raw_line for r in bad.collect())
    assert badlines == ["4,5,6,EXTRA,COLS", "7,8"]


def test_encoding_fallback_late_garbling(spark, tmp_path):
    """Latin-1 bytes appearing only at row 100 — far beyond the 20-row
    head sample — must still trigger the ISO-8859-1 fallback (the tail
    byte-probe; pre-fix this mis-decoded to U+FFFD silently)."""
    p = tmp_path / "late.csv"
    rows = ["name"] + [f"clean{i}" for i in range(99)] + ["Franç"]
    p.write_bytes(("\n".join(rows) + "\n").encode("iso-8859-1"))
    df = read_csv_with_encoding_fallback(spark, str(p))
    vals = [r["name"] for r in df.collect()]
    assert "Franç" in vals and not any("�" in v for v in vals)
