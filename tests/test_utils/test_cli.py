"""Console entry point surface (tsadar_tpu/cli.py; installed as `tsadar-tpu`)."""

import subprocess
import sys


def test_cli_help_exits_zero():
    out = subprocess.run(
        [sys.executable, "-c", "import sys; sys.argv=['tsadar-tpu','--help']; from tsadar_tpu.cli import main; main()"],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0
    assert "--cfg" in out.stdout and "--mode" in out.stdout


def test_cli_requires_cfg_or_run_id():
    out = subprocess.run(
        [sys.executable, "-c", "import sys; sys.argv=['tsadar-tpu']; from tsadar_tpu.cli import main; main()"],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode != 0
    assert "--cfg" in out.stderr
