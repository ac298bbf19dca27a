#!/bin/sh
# Self-contained demo: full incremental SfM on the synthetic sphere scene
# (no dataset download needed).
python train.py --yaml=configs/synthetic.yaml --group=synthetic --name=sphere "$@"
