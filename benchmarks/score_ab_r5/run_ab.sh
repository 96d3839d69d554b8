#!/bin/bash
# Score-refresh A/B re-run on the HARD proxy (VERDICT r4 item 1, final
# clause): the round-4 A/B ran on the saturated legacy generator — all
# three arms pinned at 99.95%, so "policy has no effect" carried limited
# weight.  Same protocol, hard generator at the calibrated sep, where
# accuracy has real room to differ:
#   score1  — score-mode refresh every epoch (default config)
#   random1 — random refresh every epoch
#   score5  — score-mode refresh every 5 epochs
# Geometry: 10k/2k hard synthetic CIFAR; shared 100-epoch MLP pretrain
# (at batch 1250 a 10k epoch is only 8 steps; the round-4 20-epoch
# pretrain = 160 steps collapses on the hard generator — loss pinned at
# ln 10 — while 800 steps learns);
# three identical 60-epoch GL runs differing ONLY in refresh policy.
# Usage: SEP=1.1 run_ab.sh    Serialized: ONE TPU process at a time.
set -e
cd "$(dirname "$0")"
SEP=${SEP:-1.1}
COMMON="--dataset cifar10 --synth_n_train 10000 --synth_n_test 2000
  --synth_sep $SEP --cosine --device_data --bf16 --mesh auto
  --batch_size 1250 --num_train 250 --viz_max_n 0"

if [ ! -d pretrain ]; then
  mkdir -p pretrain; cd pretrain
  PYTHONPATH="$PYTHONPATH:/root/repo" timeout 4000 \
    python -m graphlearninglayer_tpu.train.fullysup $COMMON \
    --sup_train_type mlp --epochs 100 --plot_freq_ss 100 2>&1 | tail -2
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
  grep -h "Accuracy for GL" $d/save/*/*/output_record_*.txt
done
