#!/bin/bash
# Score-refresh A/B (VERDICT round-3 item 4): does the score-mode base
# refresh cause the late-training accuracy dip (longrun_r3: 98.4% @ epoch
# 10 -> 91.45% final), or is it inherent to the training dynamic?
# Three 60-epoch runs at the longrun geometry (10k/2k synthetic CIFAR),
# identical except the refresh policy:
#   score1  — the default: score-mode refresh every epoch (longrun_r3 config)
#   random1 — random refresh every epoch
#   score5  — score-mode refresh every 5 epochs
# Serialized: ONE TPU process at a time (CLAUDE.md).
set -e
cd "$(dirname "$0")"
COMMON="--sup_train_type gl --dataset cifar10 --synth_n_train 10000
  --synth_n_test 2000 --epochs 60 --cosine --device_data --bf16
  --mesh auto --batch_size 1250 --num_train 250 --plot_freq_ss 10
  --viz_max_n 0"
run() {
  name=$1; shift
  rm -rf "$name"; mkdir -p "$name"; cd "$name"
  PYTHONPATH="$PYTHONPATH:/root/repo" timeout 4000 \
    python -m graphlearninglayer_tpu.train.fullysup $COMMON "$@" \
    2>&1 | tail -3
  cd ..
  echo "=== $name done ==="
}
run score1
run random1 --gl_update_base_mode random
run score5  --gl_update_base_epochs 5
grep -h "Accuracy for GL" */save/*/*/output_record_*.txt | tail -30
