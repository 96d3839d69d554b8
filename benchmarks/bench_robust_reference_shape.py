"""Robust-training throughput at the reference FMNIST shape (VERDICT item 6).

Reference config (train_and_adversarial.py:830-860): batch 2000, ResNet-18,
PGD-5 (=> 6 graph builds per optimizer step, each on a 2200-node graph:
2000 batch + 200 base).  Data is the synthetic FMNIST fallback; the
reference's tau=0 is numerically fine on real FMNIST but the synthetic
stand-in's collapsed early features need the same tiny tau the 'synthetic'
smoke config uses (1e-6) — throughput is what is being measured and is
tau-independent.

Run (TPU): python benchmarks/bench_robust_reference_shape.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from dataclasses import replace

import graphlearninglayer_tpu.train.adversarial_driver as adv


def main():
    cfg = adv.DATASET_CONFIGS["fashionmnist"]
    adv.DATASET_CONFIGS["fashionmnist"] = replace(cfg, gl_tau=1e-6)
    t0 = time.time()
    adv.run("gl", "robust", "fashionmnist", epochs=4)
    print(f"total {time.time() - t0:.1f}s (epoch lines above: steps/epoch "
          f"= 2 at batch 2000; warm epochs time the 6-graph-build PGD "
          f"step)")


if __name__ == "__main__":
    main()
