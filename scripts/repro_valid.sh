#!/bin/bash
# Reproduce the reference's released-checkpoint validation numbers
# (BASELINE.md table / reference valid.txt:4,11) the day the dataset assets
# land. Auto-skips with a clear message while they are absent.
#
# Matches /root/reference/src/scripts/avdn_paper/run_et_haa.sh:40-43
# (inference mode, released best_val_unseen, max_action_len 5).
set -e
cd "$(dirname "$0")/.."
exec python tools/repro_valid.py --root_dir "${1:-../datasets}" "${@:2}"
