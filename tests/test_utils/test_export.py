"""Run-export shim: bucket layout + ingestion marker (reference misc.py:62-125)."""

import json
import os

from tsadar_tpu.utils import mlflow_shim as mlflow
from tsadar_tpu.utils.export import export_run, upload_dir_to_s3


def test_upload_dir_layout_and_marker(tmp_path, monkeypatch):
    monkeypatch.setenv("TSADAR_S3_STAGING_DIR", str(tmp_path / "staging"))
    src = tmp_path / "src"
    (src / "sub").mkdir(parents=True)
    (src / "a.txt").write_text("A")
    (src / "sub" / "b.txt").write_text("B")

    upload_dir_to_s3(str(src), "bucket-x", "artifacts/rid42", "rid42", prefix="ingest", step=3)

    bucket = tmp_path / "staging" / "bucket-x"
    assert (bucket / "artifacts" / "rid42" / "a.txt").read_text() == "A"
    assert (bucket / "artifacts" / "rid42" / "sub" / "b.txt").read_text() == "B"
    # the marker is what the downstream ingestor polls for: at the bucket root,
    # named <prefix>-<run_id>-<step>.txt, body "ready"
    assert (bucket / "ingest-rid42-3.txt").read_text() == "ready"


def test_export_run_from_file_backend(tmp_path, monkeypatch):
    if mlflow.HAVE_MLFLOW:
        import pytest

        pytest.skip("file-backend path; real mlflow present")
    monkeypatch.setenv("TSADAR_RUNS_DIR", str(tmp_path / "runs"))
    monkeypatch.setenv("TSADAR_S3_STAGING_DIR", str(tmp_path / "staging"))

    artifact = tmp_path / "plot.png"
    artifact.write_text("fake-png")
    mlflow.set_experiment("exp1")
    with mlflow.start_run(run_name="job") as run:
        mlflow.log_metric("loss", 0.5)
        mlflow.log_params({"k": "v"})
        mlflow.log_artifact(str(artifact))
        run_id = run.info.run_id

    export_run(run_id, step=0)

    exported = tmp_path / "staging" / "remote-mlflow-staging" / "artifacts" / run_id
    meta = json.loads((exported / "run.json").read_text())
    assert meta["run_id"] == run_id
    assert meta["params"]["k"] == "v"
    assert (exported / "artifacts" / "plot.png").read_text() == "fake-png"
    assert (
        tmp_path / "staging" / "remote-mlflow-staging" / f"ingest-{run_id}-0.txt"
    ).read_text() == "ready"
