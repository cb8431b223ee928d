"""Misaligned-row-group split tests (SURVEY.md §2f op 35, FIXTURES.md A3)."""

from __future__ import annotations

from kaggle_ecommerce_etl_spark.operators.structural import (
    split_misaligned_rowgroups,
    with_file_order,
)


def _intl_fixture(spark, embedded: bool):
    """Rows in file order: part1 data, optional embedded header, part2."""
    rows = [
        ("1", "2022-01-05", "jan", "CUST-A", "ST1", "SKU1", "M", "2", "100", "200"),
        ("2", "2022-01-06", "feb", "CUST-B", "ST2", "SKU2", "L", "1", "150", "150"),
    ]
    if embedded:
        # reference is_all_strings (pg.py:45-55) fires only when EVERY
        # cell is a letter-containing string → full-width header row
        rows.append(
            ("CUSTOMER", "DATE", "Months", "Style", "SKU", "PCS", "RATE",
             "GROSS AMT", "Stock", "Size")
        )
        rows.append(
            ("CUST-C", "2022-02-01", "feb", "ST3", "SKU3", "3", "55", "165", "9", "S")
        )
        rows.append(
            ("CUST-D", "2022-02-02", "mar", "ST4", "SKU4", "1", "75", "75", "4", "M")
        )
    cols = ["index", "DATE", "Months", "CUSTOMER", "Style", "SKU", "Size",
            "PCS", "RATE", "GROSS AMT"]
    return spark.createDataFrame(rows, cols)


def test_split_with_embedded_header(spark):
    ordered = with_file_order(_intl_fixture(spark, embedded=True))
    part1, part2 = split_misaligned_rowgroups(ordered)
    assert part1.count() == 2
    assert part2 is not None
    assert part2.columns == [
        "customer", "date", "months", "style", "sku", "pcs", "rate",
        "gross_amt", "stock", "size",
    ]
    assert part2.count() == 2
    assert sorted(r.customer for r in part2.collect()) == ["CUST-C", "CUST-D"]


def test_split_without_embedded_header(spark):
    ordered = with_file_order(_intl_fixture(spark, embedded=False))
    part1, part2 = split_misaligned_rowgroups(ordered)
    assert part2 is None
    assert part1.count() == 2
    assert "index" in part1.columns
