"""Driver-contract smoke tests: entry() and registry consistency."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty"}


def test_registry_consistency():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 25
    assert set(oracles) <= set(qs)


def test_all_queries_run_smoke(spark, sf_dir):
    """Every registered query builds a plan and returns rows at sf0.001."""
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_driver_window_invariants():
    """The first 50 registry entries ARE the rotation window: exactly
    50, unique, all resolvable, and every §2 family keeps at least one
    anchor inside (a rotation that drops a family loses its only
    driver-checked evidence for the round)."""
    from kaggle_ecommerce_etl_spark.queries import DRIVER_WINDOW, REGISTRY

    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50
    assert list(REGISTRY)[:50] == list(DRIVER_WINDOW)
    anchors = {
        # one per SURVEY §2 family — keep inside the window always
        "pricing_summary",        # scan+agg
        "conflict_split_clean",   # keyed conflict split (op 15)
        "dedup_full_rows",        # op 14
        "tolerant_numeric",       # ops 26-27
        "date_normalize",         # op 28
        "month_datetime",         # op 29
        "na_canonicalize",        # op 30
        "pipeline_amazon_clean",  # op 37 composition
        "csv_roundtrip",          # ops 1/3/33/34
        "upsert_roundtrip",       # ops 5/16
        "ddl_roundtrip",          # op 6
        "events_tumbling",        # streaming windows
        "dedup_exact_docs",       # doc dedup
        "minhash_signatures",     # minhash/LSH family
        "cosine_topk",            # similarity
        "multimodal_metadata",    # multimodal
    }
    missing = anchors - set(DRIVER_WINDOW)
    assert not missing, f"family anchors rotated out: {missing}"
    # every window entry must carry an oracle (rows-only entries waste
    # a hash-checked slot)
    for name in DRIVER_WINDOW:
        _fn, oracle = REGISTRY[name]
        assert oracle is not None, name
