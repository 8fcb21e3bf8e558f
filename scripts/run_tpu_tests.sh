#!/usr/bin/env bash
# Run the TPU-only Pallas kernel tests on the real chip. CI forces the CPU
# backend (tests/conftest.py); GRASP_TPU_TESTS=1 lifts that so the
# @skipif(not TPU) tests execute on hardware. Single source of truth: the
# same pytest tests, not a parallel re-implementation.
set -euo pipefail
cd "$(dirname "$0")/.."
exec env GRASP_TPU_TESTS=1 python -m pytest tests -q -k "tpu" "$@"
