"""Per-run timestamped log-file sink (SURVEY.md S13) — the durable
run artifact the reference writes to ``logs/etl_logs/etl_log_*.log``
(/root/reference/etl_pipeline_script.py:20-29) alongside the
in-memory stats dict the engine already returns.

Driver-side only by design: the log records orchestration events and
per-stage row counts (small), never row data. At cluster scale this
file lands on the submitting host (or a mounted log volume) exactly
like the reference's scheduled-task host log."""

from __future__ import annotations

import datetime as _dt
import logging
import os

_FMT = "%(asctime)s %(levelname)s %(message)s"


def run_logger(log_dir: str, name: str = "etl") -> logging.Logger:
    """A logger writing ``<log_dir>/etl_log_<UTC timestamp>.log``
    (one file per run, reference filename convention). Repeated calls
    create fresh files; the logger is isolated from the root logger
    so Spark's own logging never interleaves."""
    os.makedirs(log_dir, exist_ok=True)
    stamp = _dt.datetime.now(_dt.timezone.utc).strftime("%Y%m%d_%H%M%S_%f")
    path = os.path.join(log_dir, f"etl_log_{stamp}.log")
    logger = logging.getLogger(f"cr_data_pipeline_project_spark.run.{stamp}")
    logger.setLevel(logging.INFO)
    logger.propagate = False
    handler = logging.FileHandler(path)
    handler.setFormatter(logging.Formatter(_FMT))
    logger.addHandler(handler)
    logger.log_path = path  # type: ignore[attr-defined]
    return logger


def log_stats(logger: logging.Logger, stage: str, stats: dict) -> None:
    """One line per metric — the reference logs inserted/updated row
    counts per stage (etl_pipeline_script.py:52,86,93,107,136,147)."""
    for key, val in sorted(stats.items()):
        logger.info("%s %s=%s", stage, key, val)


def close(logger: logging.Logger) -> None:
    for h in list(logger.handlers):
        h.close()
        logger.removeHandler(h)
