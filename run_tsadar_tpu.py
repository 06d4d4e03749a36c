"""CLI entry point (parity with /root/reference/run_tsadar.py).

    python run_tsadar_tpu.py --cfg <config_dir> --mode {fit,forward,series}

Thin wrapper over ``tsadar_tpu.cli.main`` (also installed as the
``tsadar-tpu`` console script by ``pip install .``).
"""

from tsadar_tpu.cli import main

if __name__ == "__main__":
    main()
