"""SLURM queue submission smoke test (sbatch stubbed)."""

import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from queue_tsadar_tpu import load_and_queue  # noqa: E402


def test_load_and_queue_writes_job_and_sbatches(tmp_path, monkeypatch):
    template = tmp_path / "base_job.sh"
    template.write_text("#!/bin/bash\n#SBATCH -t 01:00:00\n")
    monkeypatch.setenv("TPU_BASE_JOB_FILE", str(template))
    monkeypatch.setenv("TSADAR_RUNS_DIR", str(tmp_path / "runs"))

    calls = []
    monkeypatch.setattr(subprocess, "run", lambda cmd, **kw: calls.append(cmd))

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "..", "configs", "1d")
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        run_id = load_and_queue(cfg_dir, mode="fit", machine="tpu")
    finally:
        os.chdir(cwd)

    job = (tmp_path / "new_job.sh").read_text()
    assert job.startswith("#!/bin/bash")
    assert f"--run_id {run_id} --mode fit" in job
    assert calls == [["sbatch", "new_job.sh"]]
    # the run's config decks were registered as artifacts for run_job to resume
    deck_files = []
    for root, _, files in os.walk(tmp_path / "runs"):
        deck_files += [f for f in files if f in ("defaults.yaml", "inputs.yaml")]
    assert sorted(set(deck_files)) == ["defaults.yaml", "inputs.yaml"]


def test_load_and_queue_requires_template(tmp_path, monkeypatch):
    monkeypatch.delenv("TPU_BASE_JOB_FILE", raising=False)
    monkeypatch.setenv("TSADAR_RUNS_DIR", str(tmp_path / "runs"))
    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "..", "configs", "1d")
    with pytest.raises(EnvironmentError, match="TPU_BASE_JOB_FILE"):
        load_and_queue(cfg_dir, mode="fit", machine="tpu")
