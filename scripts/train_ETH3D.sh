#!/bin/sh
# Canonical ETH3D launch (mirrors reference scripts/train_ETH3D.sh usage)
SCENE=${1:-courtyard}
python preparation/main.py --data data/ETH3D --scene "$SCENE"
python train.py --yaml=configs/eth3d.yaml --data.scene="$SCENE" \
    --group=ETH3D --name="$SCENE"
