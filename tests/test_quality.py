"""Data-quality expectations: rules must COUNT violations correctly
on a frame that actually violates them (the registry query's corpus
is clean, so all-pass there is only half the contract)."""

from __future__ import annotations

from kaggle_ecommerce_etl_spark.operators.quality import (
    expect_in_set,
    expect_not_null,
    expect_range,
    expect_ref,
    expect_unique,
    validate,
)


def test_validate_counts_violations(spark):
    df = spark.createDataFrame(
        [
            (1, "F", 10.0, 100),
            (1, "O", -5.0, 101),     # dup key, negative price
            (2, "X", 20.0, 999),     # bad status, dangling ref
            (None, "F", None, 100),  # null key
        ],
        "k int, status string, price double, fk int",
    )
    dim = spark.createDataFrame([(100,), (101,)], "id int")
    out = {
        r.rule: (r.violations, r.passed)
        for r in validate(
            df,
            [
                expect_not_null("k"),
                expect_unique("k"),
                expect_in_set("status", ["F", "O"]),
                expect_range("price", lo=0.0),
                expect_ref("fk", dim, "id"),
            ],
        ).collect()
    }
    assert out["not_null:k"] == (1, False)
    # 4 rows, 3 distinct k (1, 2, NULL→not counted by count_distinct):
    # duplicates metric counts the extra copy of k=1 and the null row
    assert out["unique:k"][1] is False
    assert out["in_set:status"] == (1, False)
    assert out["range:price"] == (1, False)
    assert out["ref:fk->id"] == (1, False)


def test_validate_clean_frame_passes(spark):
    df = spark.createDataFrame([(1, "F"), (2, "O")], "k int, status string")
    out = validate(
        df, [expect_not_null("k"), expect_unique("k"),
             expect_in_set("status", ["F", "O"])]
    ).collect()
    assert all(r.passed for r in out)
    assert all(r.violations == 0 for r in out)


def test_validate_empty_rules_returns_empty_frame(spark):
    df = spark.createDataFrame([(1,)], "k int")
    out = validate(df, [])
    assert out.columns == ["rule", "violations", "passed"]
    assert out.count() == 0


def test_validate_rule_name_with_quote_is_safe(spark):
    # a column named with a single quote must not break the stack()
    # (rule names ride as lit() args, never interpolated into SQL)
    df = spark.createDataFrame([(1, None)], "k int, `o'brien` int")
    out = {r.rule: r.violations for r in validate(df, [expect_not_null("`o'brien`")]).collect()}
    assert out == {"not_null:`o'brien`": 1}
