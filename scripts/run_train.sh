#!/usr/bin/env bash
# Training entry point (reference: scripts/run_train.sh — note the reference
# script points at a stale driver/list; this one is kept in sync with the CLI).
set -euo pipefail

CKPT_DIR=${CKPT_DIR:-exp}
TR_LIST=${TR_LIST:-examples/filelists/tr_list.txt}
CV_FILE=${CV_FILE:-examples/h5/cv.ex}

python -m aec_tpu.cli.train \
  --tr_list "$TR_LIST" \
  --cv_file "$CV_FILE" \
  --ckpt_dir "$CKPT_DIR" \
  "$@"
