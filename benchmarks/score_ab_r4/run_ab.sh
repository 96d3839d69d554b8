#!/bin/bash
# Score-refresh A/B (VERDICT round-3 item 4): does the score-mode base
# refresh cause the late-training accuracy dip (longrun_r3: 98.4% @ epoch
# 10 -> 91.45% final; dressrehearsal_r4: 96.93% @ 30 -> 95.31% final), or
# is it inherent to the training dynamic?
#
# Protocol (round-4 revision): from-scratch GLL training at the default
# lr is chaotically unstable (see RESULTS.md dress-rehearsal notes), so
# the A/B uses the reference README's checkpoint recipe: ONE shared MLP
# pretrain, then three 60-epoch GL runs identical except refresh policy:
#   score1  — score-mode refresh every epoch (longrun_r3 / default config)
#   random1 — random refresh every epoch
#   score5  — score-mode refresh every 5 epochs
# Geometry: 10k/2k synthetic CIFAR (longrun_r3's). Serialized: ONE TPU
# process at a time (CLAUDE.md).
set -e
cd "$(dirname "$0")"
COMMON="--dataset cifar10 --synth_n_train 10000 --synth_n_test 2000
  --cosine --device_data --bf16 --mesh auto --batch_size 1250
  --num_train 250 --viz_max_n 0"

if [ ! -d pretrain ]; then
  mkdir -p pretrain; cd pretrain
  PYTHONPATH="$PYTHONPATH:/root/repo" timeout 4000 \
    python -m graphlearninglayer_tpu.train.fullysup $COMMON \
    --sup_train_type mlp --epochs 20 --plot_freq_ss 100 2>&1 | tail -2
  cd ..
  echo "=== pretrain done ==="
fi
CKPT=$(ls -d "$PWD"/pretrain/save/_Sup_and_SS_mlp/*/last | head -1)
echo "CKPT=$CKPT"

run() {
  name=$1; shift
  rm -rf "$name"; mkdir -p "$name"; cd "$name"
  PYTHONPATH="$PYTHONPATH:/root/repo" timeout 4000 \
    python -m graphlearninglayer_tpu.train.fullysup $COMMON \
    --sup_train_type gl --epochs 60 --plot_freq_ss 10 \
    --cp_load_path "$CKPT" "$@" 2>&1 | tail -2
  cd ..
  echo "=== $name done ==="
}
run score1
run random1 --gl_update_base_mode random
run score5  --gl_update_base_epochs 5
for d in score1 random1 score5; do
  echo "--- $d ---"
  grep "Accuracy for GL" $d/save/*/*/output_record_*.txt
done
