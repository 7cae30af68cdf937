"""Per-query plan/job profiler for the optimization rounds.

For each named query: capture ``explain('formatted')`` to a file,
run the builder + noop sink ``--runs`` times inside a dedicated job
group, and report min wall seconds plus the job/stage/task counts the
status tracker saw for that group — the "where do the seconds go"
breakdown guide §1 asks for before touching anything.

Usage:
    python tools/profile_query.py q257_copurchase_clustering q231_... \
        [--runs 3] [--explain-dir plans/r11] [--suffix before]

Writes ``<explain-dir>/<query>_<suffix>.txt`` and prints one line per
query: name, min wall s, n_jobs, n_stages, n_tasks (for ONE run).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cr_data_pipeline_project_spark.plans import all_queries  # noqa: E402
from cr_data_pipeline_project_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument(
        "--conf",
        action="append",
        default=[],
        help="extra k=v session confs for A/B experiments",
    )
    args = ap.parse_args()

    extra = dict(c.split("=", 1) for c in args.conf)
    spark = get_session("profile", extra_confs=extra or None)
    for k, v in extra.items():
        spark.conf.set(k, v)
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    tracker = spark.sparkContext.statusTracker()

    # warm-up: JVM + codegen + parquet footer caches
    run_noop(qs["q01_pricing_summary"](spark, SF_DIR))

    print(f"{'query':<42} {'min_s':>7} {'jobs':>5} {'stages':>7} {'tasks':>6}")
    for name in args.names:
        if name not in qs:
            print(f"{name:<42} MISSING")
            continue
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = qs[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(
                args.explain_dir, f"{name}_{args.suffix}.txt"
            )
            with open(path, "w") as f:
                f.write(buf.getvalue())
        best = float("inf")
        group_stats = None
        for i in range(args.runs):
            group = f"prof-{name}-{i}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.time()
            run_noop(qs[name](spark, SF_DIR))
            dt = time.time() - t0
            spark.sparkContext.setJobGroup(None, None)
            if dt < best:
                best = dt
                job_ids = tracker.getJobIdsForGroup(group)
                stages = set()
                tasks = 0
                for j in job_ids:
                    info = tracker.getJobInfo(j)
                    if info:
                        stages.update(info.stageIds)
                for s in stages:
                    si = tracker.getStageInfo(s)
                    if si:
                        tasks += si.numTasks
                group_stats = (len(job_ids), len(stages), tasks)
        nj, ns, nt = group_stats or (0, 0, 0)
        print(f"{name:<42} {best:7.3f} {nj:>5} {ns:>7} {nt:>6}")
    spark.stop()


if __name__ == "__main__":
    main()
