#!/usr/bin/env bash
# Standalone evaluation driver (reference scripts/run_evaluate.sh equivalent),
# with timestamped logs.
set -euo pipefail
cd "$(dirname "$0")/.."
source scripts/params.sh

MODEL_PATH=${MODEL_PATH:-$SAVE_PATH}
STAMP=$(date +%Y%m%d_%H%M%S)
LOG=${LOG_FILE:-logs/evaluate_${STAMP}.log}
mkdir -p "$(dirname "$LOG")"

exec python -c "import sys; from grasp_tpu.cli import evaluate_main; sys.exit(evaluate_main())" \
  --model_path "$MODEL_PATH" \
  --eval_ppl "$EVAL_PPL" \
  --eval_tasks "$EVAL_TASKS" \
  --data_root "$DATA_ROOT" \
  --log_file "$LOG"
