"""Durable per-run logfile artifact (S13) — reference filename
convention etl_log_*.log with per-stage metrics lines."""

import glob
import os

from cr_data_pipeline_project_spark import runlog


def test_run_logger_writes_timestamped_file(tmp_path):
    d = os.path.join(str(tmp_path), "logs")
    lg = runlog.run_logger(d)
    runlog.log_stats(lg, "run_etl", {"matches_inserted": 3, "clans_total": 1})
    runlog.close(lg)
    files = glob.glob(os.path.join(d, "etl_log_*.log"))
    assert len(files) == 1
    content = open(files[0]).read()
    assert "run_etl clans_total=1" in content
    assert "run_etl matches_inserted=3" in content


def test_each_run_gets_its_own_file(tmp_path):
    d = os.path.join(str(tmp_path), "logs")
    for _ in range(2):
        lg = runlog.run_logger(d)
        lg.info("marker")
        runlog.close(lg)
    assert len(glob.glob(os.path.join(d, "etl_log_*.log"))) == 2
