#!/bin/bash
# CIFAR robust config + fresh attack sweeps (VERDICT r4 item 4).
#
# Reference config (train_and_adversarial.py:862-886): PreActResNet18,
# batch 200, base_sample_rate 10, SGD momentum + cosine, PGD eps=0.05 /
# 5 iters.  Data: hard synthetic proxy (zero egress) at 10k/2k so the
# runs converge in minutes; batch/network/eps are the reference's, so the
# throughput row is at the reference SHAPE.  Trains GL+MLP x natural+
# robust, then sweeps FGSM/IFGSM epsilon and CW c on the TRAINED
# checkpoints (replacing the round-2 2-epoch sweeps).
# Usage: SEP=1.1 EPOCHS=40 run.sh    Serialized: one TPU process at a time.
set -e
cd "$(dirname "$0")"
SEP=${SEP:-1.1}
EPOCHS=${EPOCHS:-40}
SY="synth_sep=$SEP n_train=10000 n_test=2000"

for rob in natural robust; do
  if [ ! -f train_${rob}.log ]; then
    PYTHONPATH="$PYTHONPATH:/root/repo" timeout 6000 \
      python -m graphlearninglayer_tpu.train.adversarial_driver \
      both $rob cifar10 $EPOCHS $SY 2>&1 | tee train_${rob}.log | tail -2
    echo "=== train both $rob done ==="
  fi
done

for atk in fgsm ifgsm cw; do
  for rob in natural robust; do
    PYTHONPATH="$PYTHONPATH:/root/repo" timeout 6000 \
      python -m graphlearninglayer_tpu.attack.driver \
      $atk both $rob cifar10 $SY 2>&1 | tee attack_${atk}_${rob}.log | tail -4
    echo "=== attack $atk $rob done ==="
  done
done
grep -h "acc" attack_*.log | tail -40
