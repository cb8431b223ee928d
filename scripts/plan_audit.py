"""Physical-plan audit over the whole query registry — the scale
posture, machine-checked.

For every registry query, build (don't run) the plan at a small SF and
flag the anti-patterns that kill 100 TB runs:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin``: O(n·m) joins.
  A few queries legitimately broadcast a tiny side into a non-equi
  join (e.g. the 12-row month lookup); those are whitelisted BY NAME
  with the reason inline, so a new unintentional one fails the audit.
- exchange count: shuffles are the scale currency; each query's count
  is recorded so a refactor that silently adds one shows up in the
  diff of this script's committed output.
- python workers (``BatchEvalPython`` / row-at-a-time UDFs): the slow
  path. Arrow nodes (``MapInPandas``/``ArrowEvalPython``) are allowed
  where contractually confined (similarity/multimodal).

Usage: python scripts/plan_audit.py [sf_dir] > PLAN_AUDIT.json
Exit code 1 if any un-whitelisted anti-pattern is found.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: queries allowed to contain a broadcast nested-loop join, with why.
BNLJ_OK = {
    # ≤12-row month-name lookup joined on a prefix expression
    # (normalize/casts.py month branch) — broadcast of a constant-size
    # side; the "loop" is over 12 rows.
    "month_prefix": "12-row month lookup broadcast into expression join",
    "pipeline_sale": "month lookup inside transform()",
    "pipeline_amazon_clean": "month lookup inside transform()",
    "pipeline_amazon_flagged": "month lookup inside transform()",
    "pipeline_international": "month lookup inside transform()",
    # exists_late_orders uses a non-equi semi join on purpose (Q4
    # shape); the probe side is date-filtered orders, the build side
    # broadcast by AQE at this SF — at scale Spark falls back to a
    # shuffled non-equi semi join on the same plan.
    "exists_late_orders": "non-equi EXISTS semi join (TPC-H Q4 shape)",
    # scalar-subquery pattern: the build side is a ONE-ROW aggregate
    # (avg threshold / corpus size) broadcast into a non-equi filter
    # join — constant-size broadcast, scale-safe.
    "parts_above_avg": "1-row avg threshold broadcast",
    # 1-row min(count/share) scale factor broadcast into the |langs|-row
    # quota table (both driver-tiny) — constant-size, scale-safe.
    "mix_rebalance": "1-row mix scale factor broadcast into lang quotas",
    "customers_no_orders": "1-row avg balance threshold broadcast",
    "tfidf_top_terms": "1-row corpus-count broadcast for idf",
    # both-sides-distributed block matmul: the 'cross' join pairs the
    # |Q|/block × |C|/block COARSE block rows (collect_list per
    # block), not raw rows — the n² lives inside bounded numpy
    # batches, and block counts are small by construction.
    "embedding_nearest": "block-pair cross of coarse matmul blocks",
    # exact-distinct (1 row) × theta-union-estimate (1 row): joining
    # the two scalar aggregates for the gate comparison — both sides
    # are single-row by construction at any scale.
    "theta_union_gate": "1-row exact × 1-row sketch-estimate gate join",
    "theta_set_algebra": "1-row exact × 1-row sketch-estimate gate join",
    "hll_union_gate": "1-row exact × 1-row sketch-estimate gate join",
    "kll_quantile_gate": "1-row exact × 1-row sketch-estimate gate join",
    # drift = vocab counts × 1-row slice totals, then × the 1-row TV
    # numerator — both broadcast sides are single-row aggregates by
    # construction at any scale (same family as tfidf's n_docs join).
    "source_token_drift": "1-row slice-totals and 1-row TV-sum broadcasts",
    # slice-id list (|slices| rows, 3 here — bounded by the monitor's
    # window count at any scale) × the vocab-sized reference counts:
    # the full-outer drift scoring needs every (slice, ref-token)
    # pair; both sides are dimension-sized, never corpus-sized.
    "streaming_drift_run": "slice-ids × reference-vocab bounded cross join",
    # 3-row literal k-list and 1-row corpus-total broadcast into the
    # vocab-sized ranked frame — both sides constant at any scale.
    "token_coverage_curve": "3-row k-list and 1-row total broadcasts",
}

#: queries allowed Arrow-batched python nodes (the documented
#: mapInPandas surfaces).
ARROW_OK_PREFIXES = (
    "cosine_",
    "embedding_",
    "ann_",
    "multimodal_",
    "dup_clusters",  # routes LSH pairs (vectorized bucket UDF)
    "udtf_",  # Arrow-batched Python UDTF (ArrowEvalPythonUDTF) — the
    # sanctioned table-function API surface, never row-pickling
    "arrow_",  # applyInArrow grouped-map (FlatMapGroupsInArrow) — the
    # custom per-group kernel tier for non-composable statistics
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from kaggle_ecommerce_etl_spark.queries import REGISTRY
    from kaggle_ecommerce_etl_spark.session import get_spark

    spark = get_spark("plan_audit", shuffle_partitions=8)
    report: dict[str, dict] = {}
    bad = []
    for name, (fn, _oracle) in REGISTRY.items():
        try:
            plan = (
                fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # noqa: BLE001 — audit must cover the rest
            report[name] = {"error": str(e).splitlines()[0][:200]}
            bad.append(name)
            continue
        entry = {
            "exchanges": plan.count("Exchange"),
            "cartesian": plan.count("CartesianProduct"),
            "bnlj": plan.count("BroadcastNestedLoopJoin"),
            "py_row_udf": plan.count("BatchEvalPython"),
            "arrow_python": plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInArrow"),
        }
        flags = []
        if entry["cartesian"]:
            flags.append("CARTESIAN")
        if entry["bnlj"] and name not in BNLJ_OK:
            flags.append("BNLJ")
        if entry["py_row_udf"]:
            flags.append("PY_ROW_UDF")
        if entry["arrow_python"] and not name.startswith(ARROW_OK_PREFIXES):
            flags.append("ARROW_OUTSIDE_CONTRACT")
        if flags:
            entry["flags"] = flags
            bad.append(name)
        report[name] = entry

    out = {
        "sf_dir": sf_dir,
        "n_queries": len(report),
        "flagged": sorted(bad),
        "queries": report,
    }
    print(json.dumps(out, indent=1))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
