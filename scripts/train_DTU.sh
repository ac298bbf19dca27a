#!/bin/sh
# Canonical DTU launch (mirrors reference scripts/train_DTU.sh usage)
# Usage: sh scripts/train_DTU.sh scan24
SCENE=${1:-scan24}
python preparation/main.py --data data/DTU --scene "$SCENE"
python train.py --yaml=configs/dtu.yaml --data.scene="$SCENE" \
    --group=DTU --name="$SCENE"
