"""Console entry point: ``tsadar-tpu --cfg <dir> --mode {fit,forward,series}``.

Same surface as ``run_tsadar_tpu.py`` (parity with the reference's
``run_tsadar.py``); installed as the ``tsadar-tpu`` script by pyproject.toml.
All imports happen inside ``main`` so the JAX configuration (persistent
compile cache, x64-on-CPU) is applied before the first backend use.
"""

import argparse
import os


def main():
    # reference default: float64 + no XLA preallocation (run_tsadar.py:4-9).
    # On TPU f64/c128 are unsupported; x64 is enabled on CPU only.
    os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")

    from jax import config as jax_config
    import jax

    # persistent compilation cache: TPU compiles dominate first-run wall clock
    jax_config.update(
        "jax_compilation_cache_dir",
        os.environ.get("TSADAR_COMPILE_CACHE", os.path.join(os.path.expanduser("~"), ".tsadar_jax_cache")),
    )
    jax_config.update("jax_persistent_cache_min_compile_time_secs", 2)

    if jax.default_backend() == "cpu":
        jax_config.update("jax_enable_x64", True)

    from tsadar_tpu.runner import run, run_job
    from tsadar_tpu.utils.export import export_run

    parser = argparse.ArgumentParser(description="TPU-native Thomson scattering analysis")
    parser.add_argument("--cfg", help="config directory containing defaults.yaml and inputs.yaml")
    parser.add_argument("--run_id", help="run id to resume (queued runs)")
    parser.add_argument("--mode", default="fit", help="fit, forward, or series")
    args = parser.parse_args()

    if args.run_id is not None:
        run_job(args.run_id, mode=args.mode, nested=False)
        run_id = args.run_id
    else:
        if args.cfg is None:
            parser.error("--cfg <config_dir> is required (or pass --run_id to resume a run)")
        run_id = run(args.cfg, mode=args.mode)

    # hosted-app ingestion export (reference run_tsadar.py:30-31); uploads to
    # S3 when boto3 exists, else mirrors the bucket layout to a local staging dir
    if "MLFLOW_EXPORT" in os.environ:
        export_run(run_id)


if __name__ == "__main__":
    main()
