"""SLURM queue submission (parity with /root/reference/queue_tsadar.py:11-38).

Registers the run (configs stored as artifacts), writes a job script around the
base template, and sbatches it.  Template paths come from CPU_BASE_JOB_FILE /
GPU_BASE_JOB_FILE (or TPU_BASE_JOB_FILE) environment variables.
"""

import argparse
import os
import subprocess

from tsadar_tpu.runner import load_and_make_folders


def load_and_queue(cfg_path: str, mode: str, machine: str = "tpu"):
    run_id, all_configs = load_and_make_folders(cfg_path)

    env_key = {"cpu": "CPU_BASE_JOB_FILE", "gpu": "GPU_BASE_JOB_FILE", "tpu": "TPU_BASE_JOB_FILE"}[machine]
    base_job_file = os.environ.get(env_key)
    if base_job_file is None:
        raise EnvironmentError(f"{env_key} must point at a base SLURM job template")

    with open(base_job_file, "r") as fh:
        base_job = fh.read()

    with open(os.path.join(os.getcwd(), "new_job.sh"), "w") as job_file:
        job_file.write(base_job)
        job_file.write(f"\nsrun python run_tsadar_tpu.py --run_id {run_id} --mode {mode}\n")

    subprocess.run(["sbatch", "new_job.sh"], check=True)
    return run_id


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Queue a TSADAR-TPU run via SLURM")
    parser.add_argument("--cfg", help="config directory")
    parser.add_argument("--mode", default="fit")
    parser.add_argument("--machine", default="tpu", choices=["cpu", "gpu", "tpu"])
    args = parser.parse_args()
    print(load_and_queue(args.cfg, args.mode, args.machine))
