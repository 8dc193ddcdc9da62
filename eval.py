#!/usr/bin/env python
"""Evaluation entry point (reference-compatible CLI):

    python eval.py -dc configs/synthetic/dynamic.yaml -ec configs/exp.yaml -t test
"""
from lidar_rt_tpu.cli import main_eval

if __name__ == "__main__":
    main_eval()
