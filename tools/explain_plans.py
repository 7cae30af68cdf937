"""Dump the formatted physical plan of every query to
docs/plans/<name>.txt and print a one-line plan-health summary
(exchanges, broadcast vs sort-merge joins, scans).

Usage: python tools/explain_plans.py [--sf DIR] [--only a,b]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--outdir", default="docs/plans")
    args = ap.parse_args()

    from cr_data_pipeline_project_spark.plans import all_queries
    from cr_data_pipeline_project_spark.session import get_session

    spark = get_session("explain", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.outdir, exist_ok=True)
    only = set(args.only.split(",")) if args.only else None

    for name, fn in sorted(all_queries().items()):
        if only and name not in only:
            continue
        df = fn(spark, args.sf)
        qe = df._jdf.queryExecution()
        formatted = qe.explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(args.outdir, f"{name}.txt"), "w") as f:
            f.write(formatted)
        plan = qe.executedPlan().toString()
        n_ex = plan.count("Exchange")
        n_bhj = plan.count("BroadcastHashJoin")
        n_smj = plan.count("SortMergeJoin")
        n_bnl = plan.count("BroadcastNestedLoopJoin")
        n_scan = plan.count("FileScan")
        print(
            f"{name:32s} exchanges={n_ex:2d} bhj={n_bhj} smj={n_smj} "
            f"bnlj={n_bnl} scans={n_scan}"
        )


if __name__ == "__main__":
    main()
