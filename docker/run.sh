#!/usr/bin/env bash
# Launch a hosted fit for an existing tracked run id.
set -euo pipefail
RUN_ID=${1:?usage: run.sh <run_id>}
python docker/fit_for_app.py "$RUN_ID"
