#!/bin/sh
# Canonical BlendedMVS launch (mirrors reference scripts/train_bmvs.sh usage)
SCENE=${1:-Fountain}
python preparation/main.py --data data/BlendedMVS --scene "$SCENE"
python train.py --yaml=configs/bmvs.yaml --data.scene="$SCENE" \
    --group=bmvs --name="$SCENE"
