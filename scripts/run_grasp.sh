#!/usr/bin/env bash
# Full compression pipeline driver (reference scripts/run_grasp.sh equivalent).
set -euo pipefail
cd "$(dirname "$0")/.."
source scripts/params.sh

args=(
  --model_name_or_path "$MODEL_NAME_OR_PATH"
  --dataset_name "$DATASET_NAME"
  --num_prune_layers "$NUM_PRUNE_LAYERS"
  --metric "$METRIC"
  --num_samples "$NUM_SAMPLES"
  --seq_len "$SEQ_LEN"
  --batch_size "$BATCH_SIZE"
  --dtype "$DTYPE"
  --sweep "$SWEEP"
  --grad_mode "$GRAD_MODE"
  --save_path "$SAVE_PATH"
  --data_root "$DATA_ROOT"
  --dp "$DP"
  --tp "$TP"
  --svd_method "$SVD_METHOD"
)
[ -n "$RESUME_FROM_CHECKPOINT" ] && args+=(--resume_from_checkpoint "$RESUME_FROM_CHECKPOINT")
[ -n "$COMPRESSION_RATIO" ] && args+=(--compression_ratio "$COMPRESSION_RATIO")
[ -n "$THRESHOLD_RATIO" ] && args+=(--threshold_ratio "$THRESHOLD_RATIO")
[ -n "$LOG_FILE" ] && args+=(--log_file "$LOG_FILE")
[ "$ANGULAR" = "true" ] && args+=(--angular)
[ "$MERGE" = "true" ] && args+=(--merge)
[ "$RECOVERY" = "true" ] && args+=(--recovery)
if [ "$EVALUATE" = "true" ]; then
  args+=(--evaluate --eval_ppl "$EVAL_PPL" --eval_tasks "$EVAL_TASKS")
fi

exec python -m grasp_tpu.cli "${args[@]}"
