#!/bin/bash
# The reference's literal recipe (VERDICT r4 item 5): SimCLR/SupCon
# pretrain -> GL training from that checkpoint (reference README.md:28-33
# ships a SimCLR-pretrained ResNet-18 and starts GLL from it).
#
# Runs at the round-5 dress-rehearsal geometry on the HARD proxy and
# compares the GL epoch-0 transductive from three starts:
#   scratch          (no checkpoint)
#   mlp pretrain     (the r5 rehearsal's stage A — reused if present)
#   simclr pretrain  (this script's stage S)
# Usage: SEP=1.1 run.sh   Serialized: ONE TPU process at a time.
set -e
cd "$(dirname "$0")"
SEP=${SEP:-1.1}
COMMON="--dataset cifar10 --synth_n_train 50000 --synth_n_test 10000
  --synth_sep $SEP --cosine --device_data --bf16 --mesh auto
  --batch_size 1250 --num_train 250 --viz_max_n 0"

if [ ! -d simclr_$SEP ]; then
  mkdir -p simclr_$SEP; cd simclr_$SEP
  PYTHONPATH="$PYTHONPATH:/root/repo" timeout 5000 \
    python -m graphlearninglayer_tpu.train.supcon $COMMON \
    --epochs 30 --temp 0.5 --learning_rate 0.5 2>&1 | tail -3
  # (default --sup_method SupCE => SimCLR/unsupervised mode in this
  # driver; 'SupCon' is the labeled contrastive variant)
  cd ..
  echo "=== stage S (simclr pretrain) done ==="
fi
CKPT=$(ls -d "$PWD"/simclr_$SEP/save/*/*/supcon 2>/dev/null | head -1)
[ -z "$CKPT" ] && CKPT=$(find "$PWD"/simclr_$SEP -name "supcon" -type d | head -1)
echo "SIMCLR_CKPT=$CKPT"

run_gl() {  # $1 = name, rest = extra flags
  name=$1; shift
  rm -rf $name; mkdir -p $name; cd $name
  PYTHONPATH="$PYTHONPATH:/root/repo" timeout 3000 \
    python -m graphlearninglayer_tpu.train.fullysup $COMMON \
    --sup_train_type gl --epochs 1 --plot_freq_ss 10 "$@" 2>&1 | tail -2
  cd ..
}

run_gl gl_from_simclr_$SEP --cp_load_path "$CKPT"
run_gl gl_from_scratch_$SEP
MLP=$(ls -d /root/repo/benchmarks/dressrehearsal_r5/pretrain_sep$SEP/save/_Sup_and_SS_mlp/*/last 2>/dev/null | head -1)
[ "$SEP" = "1.0" ] && MLP=$(ls -d /root/repo/benchmarks/dressrehearsal_r5/pretrain/save/_Sup_and_SS_mlp/*/last | head -1)
if [ -n "$MLP" ]; then run_gl gl_from_mlp_$SEP --cp_load_path "$MLP"; fi

echo "=== GL epoch-0 transductive by pretraining start (sep=$SEP) ==="
for d in gl_from_simclr_$SEP gl_from_scratch_$SEP gl_from_mlp_$SEP; do
  [ -d $d ] || continue
  echo "--- $d ---"
  grep -h "Accuracy for GL" $d/save/*/*/output_record_*.txt | head -1
done
