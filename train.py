#!/usr/bin/env python
"""Training entry point (reference-compatible CLI):

    python train.py -dc configs/synthetic/dynamic.yaml -ec configs/exp.yaml
"""
from lidar_rt_tpu.cli import main_train

if __name__ == "__main__":
    main_train()
