#!/usr/bin/env bash
# Config "file" for the driver scripts (reference scripts/params_script.sh
# equivalent). Source this, then run run_grasp.sh / run_evaluate.sh.
# Defaults encode the paper config: 7 pruned layers, ratio 0.9, taylor,
# 512 x 512-token wikitext2 samples.

export MODEL_NAME_OR_PATH=${MODEL_NAME_OR_PATH:-llama2-7b}
export DATASET_NAME=${DATASET_NAME:-wikitext2}
export NUM_PRUNE_LAYERS=${NUM_PRUNE_LAYERS:-7}
export COMPRESSION_RATIO=${COMPRESSION_RATIO:-0.9}
export THRESHOLD_RATIO=${THRESHOLD_RATIO:-}
export METRIC=${METRIC:-taylor}
export NUM_SAMPLES=${NUM_SAMPLES:-512}
export SEQ_LEN=${SEQ_LEN:-512}
export BATCH_SIZE=${BATCH_SIZE:-1}
export DTYPE=${DTYPE:-bfloat16}
export SWEEP=${SWEEP:-sequential}          # sequential | parallel
export GRAD_MODE=${GRAD_MODE:-dense}       # dense | svd
export ANGULAR=${ANGULAR:-false}
export MERGE=${MERGE:-false}
export RECOVERY=${RECOVERY:-false}
export EVALUATE=${EVALUATE:-false}
export EVAL_PPL=${EVAL_PPL:-wikitext2,ptb,c4}
export EVAL_TASKS=${EVAL_TASKS:-boolq,piqa,hellaswag,winogrande,arc_easy,arc_challenge,openbookqa,mathqa}
export SAVE_PATH=${SAVE_PATH:-./checkpoint/grasp}
export LOG_FILE=${LOG_FILE:-}
export DATA_ROOT=${DATA_ROOT:-.}
export DP=${DP:-1}                         # data-parallel mesh axis
export TP=${TP:-1}                         # tensor-parallel mesh axis
export SVD_METHOD=${SVD_METHOD:-auto}      # auto | host | device | gram
export RESUME_FROM_CHECKPOINT=${RESUME_FROM_CHECKPOINT:-}
