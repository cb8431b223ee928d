"""Tests for the custom Python DataSource (sources/pyds.py): the
ingestion-boundary behaviors the oracle hash can't see — per-file
partitioning, the landing name filter, the two-codec decode fallback,
and short-row null padding.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kaggle_ecommerce_etl_spark.sources import pyds


def _land(tmp_path, name: str, data: bytes) -> None:
    (tmp_path / name).write_bytes(data)


@pytest.fixture()
def landing(tmp_path):
    _land(tmp_path, "sale_a.csv", b"id,name\n1,alpha\n2,beta\n")
    _land(tmp_path, "sale_b.csv", b"id,name\n3,gamma\n")
    return tmp_path


def _read(spark, path, **opts):
    pyds.register(spark)
    r = (
        spark.read.format("csv_manifest")
        .option("path", str(path))
        .option("columns", "id,name")
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_partition_per_file(spark, landing):
    df = _read(spark, landing)
    assert df.rdd.getNumPartitions() == 2
    rows = {(r.id, r.name, r._source_file) for r in df.collect()}
    assert rows == {
        ("1", "alpha", "sale_a.csv"),
        ("2", "beta", "sale_a.csv"),
        ("3", "gamma", "sale_b.csv"),
    }


def test_name_filter_skips_mangled_and_nonmatching(spark, landing):
    _land(landing, "sale%20dup.csv", b"id,name\n9,dup\n")
    _land(landing, "inventory.csv", b"id,name\n8,inv\n")
    _land(landing, "notes.txt", b"not a csv")
    df = _read(spark, landing, name_contains="sale")
    got = {r.id for r in df.collect()}
    assert got == {"1", "2", "3"}  # %20 name and non-sale file excluded


def test_encoding_fallback_iso8859(spark, tmp_path):
    # 0xE9 = 'é' in ISO-8859-1, invalid as a UTF-8 start byte
    _land(tmp_path, "latin.csv", b"id,name\n1,caf\xe9\n")
    df = _read(spark, tmp_path)
    assert df.collect()[0].name == "café"


def test_short_rows_null_padded(spark, tmp_path):
    _land(tmp_path, "ragged.csv", b"id,name\n1\n2,two,EXTRA\n")
    rows = {r.id: (r.name) for r in _read(spark, tmp_path).collect()}
    assert rows == {"1": None, "2": "two"}  # short padded, long truncated


def test_blank_lines_skipped(spark, tmp_path):
    _land(tmp_path, "gaps.csv", b"id,name\n1,a\n\n2,b\n\n")
    rows = {r.id for r in _read(spark, tmp_path).collect()}
    assert rows == {"1", "2"}  # no phantom all-null rows


def test_name_contains_case_insensitive(spark, landing):
    df = _read(spark, landing, name_contains="SALE")
    assert {r.id for r in df.collect()} == {"1", "2", "3"}


def test_quoted_fields_csv_dialect(spark, tmp_path):
    # standard dialect: embedded quote doubled, field quoted
    _land(tmp_path, "q.csv", b'id,name\n1,"say ""hi"", ok"\n')
    assert _read(spark, tmp_path).collect()[0].name == 'say "hi", ok'


def test_spark_write_matches_reader_dialect(spark, tmp_path):
    """The fixture writer in q_pyds_manifest_read uses escape='\"' so
    Spark emits the doubled-quote dialect csv.reader expects — a field
    with quotes and commas must survive the full write→read path."""
    src = spark.createDataFrame(
        [("1", 'he said "go", twice')], "id string, name string"
    )
    out = str(tmp_path / "w")
    (
        src.coalesce(1)
        .write.mode("overwrite")
        .option("header", "true")
        .option("escape", '"')
        .csv(out)
    )
    got = _read(spark, out).collect()[0]
    assert (got.id, got.name) == ("1", 'he said "go", twice')


def test_datasource_pickles_by_value():
    """Spark ships the registered class to Python processes that may
    not have this package importable (pyspark>=4 required — skip
    otherwise, matching the module's HAS_PYDS gate)."""
    if not pyds.HAS_PYDS:  # pragma: no cover
        pytest.skip("pyspark < 4: datasource API absent")
    _check_pickle_contract()


def _check_pickle_contract():
    """Spark ships the registered class to Python processes that may
    not have this package importable; a module-level class pickles by
    reference and dies there (observed: PYTHON_DATA_SOURCE_ERROR /
    ModuleNotFoundError in the driver-style harness). The factory
    pattern keeps '<locals>' in the qualname, which is what makes
    cloudpickle serialize by value — this test pins the contract."""
    assert "<locals>" in pyds.CsvManifestDataSource.__qualname__
    assert "<locals>" in pyds.CsvManifestReader.__qualname__


def test_columns_option_required(spark, tmp_path):
    _land(tmp_path, "x.csv", b"id\n1\n")
    pyds.register(spark)
    with pytest.raises(Exception, match="columns"):
        (
            spark.read.format("csv_manifest")
            .option("path", str(tmp_path))
            .load()
            .collect()
        )


def test_casts_stay_spark_side(spark, landing):
    """The contract: strings out of the scan, typing via Catalyst casts
    — the cast must appear in the plan as a JVM projection, not extra
    Python."""
    df = _read(spark, landing).select(F.col("id").cast("bigint").alias("id"))
    assert [r.id for r in df.orderBy("id").collect()] == [1, 2, 3]


# ---------------------------------------------------------------------------
# streaming landing-zone source (landing_stream)
# ---------------------------------------------------------------------------


def _drain_stream(spark, path, ckpt, qname):
    pyds.register_stream(spark)
    stream = (
        spark.readStream.format("landing_stream")
        .option("path", str(path))
        .option("columns", "id,name")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(qname)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname)


def test_stream_source_drains_all_files(spark, landing, tmp_path):
    out = _drain_stream(
        spark, landing, tmp_path / "ck1", "ls_all"
    ).collect()
    assert {(r["id"], r["name"], r["_source_file"]) for r in out} == {
        ("1", "alpha", "sale_a.csv"),
        ("2", "beta", "sale_a.csv"),
        ("3", "gamma", "sale_b.csv"),
    }


def test_stream_source_incremental_resume(spark, landing, tmp_path):
    """The checkpointed offset must survive a restart: a second
    AvailableNow drain on the SAME checkpoint processes ONLY the file
    landed in between — exact progress, no re-read, no loss. (A
    file sink, not memory: the memory sink cannot recover from a
    checkpoint.)"""
    ckpt, out_dir = tmp_path / "ck2", tmp_path / "out"

    def _drain_to_parquet():
        pyds.register_stream(spark)
        q = (
            spark.readStream.format("landing_stream")
            .option("path", str(landing))
            .option("columns", "id,name")
            .load()
            .writeStream.format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(str(out_dir))

    assert _drain_to_parquet().count() == 3
    # a new file lands, sorting after the consumed names
    _land(landing, "sale_c.csv", b"id,name\n4,delta\n5,epsilon\n")
    out = _drain_to_parquet().collect()
    assert len(out) == 5  # 3 old + 2 new, nothing re-read twice
    got = {(r["id"], r["_source_file"]) for r in out}
    assert got == {
        ("1", "sale_a.csv"),
        ("2", "sale_a.csv"),
        ("3", "sale_b.csv"),
        ("4", "sale_c.csv"),
        ("5", "sale_c.csv"),
    }


def test_stream_source_pickles_by_value():
    if not pyds.HAS_PYDS:  # pragma: no cover
        pytest.skip("pyspark < 4: datasource API absent")
    assert "<locals>" in pyds.LandingStreamDataSource.__qualname__
    assert "<locals>" in pyds.LandingStreamReader.__qualname__
