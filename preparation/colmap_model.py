"""Minimal COLMAP sparse-model readers (cameras/images bin+txt).

Own implementation of the public COLMAP model format — functional
replacement for the reference's `preparation/read_write_model.py`
(SURVEY.md §2.1 L8). Only the pieces the pipeline needs: image
registration order and poses.
"""
from __future__ import annotations

import os
import struct
from dataclasses import dataclass
from typing import Dict

import numpy as np


@dataclass
class ColmapImage:
    image_id: int
    qvec: np.ndarray
    tvec: np.ndarray
    camera_id: int
    name: str


def qvec_to_rotmat(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q
    return np.asarray([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


def read_images_txt(path: str) -> Dict[int, ColmapImage]:
    images = {}
    with open(path) as f:
        lines = [l.strip() for l in f if l.strip() and not l.startswith("#")]
    for i in range(0, len(lines), 2):
        parts = lines[i].split()
        image_id = int(parts[0])
        qvec = np.asarray(list(map(float, parts[1:5])))
        tvec = np.asarray(list(map(float, parts[5:8])))
        images[image_id] = ColmapImage(image_id, qvec, tvec,
                                       int(parts[8]), parts[9])
    return images


def read_images_bin(path: str) -> Dict[int, ColmapImage]:
    images = {}
    with open(path, "rb") as f:
        n = struct.unpack("<Q", f.read(8))[0]
        for _ in range(n):
            image_id = struct.unpack("<I", f.read(4))[0]
            qvec = np.asarray(struct.unpack("<4d", f.read(32)))
            tvec = np.asarray(struct.unpack("<3d", f.read(24)))
            camera_id = struct.unpack("<I", f.read(4))[0]
            name = b""
            c = f.read(1)
            while c != b"\x00":
                name += c
                c = f.read(1)
            n2d = struct.unpack("<Q", f.read(8))[0]
            f.read(24 * n2d)  # skip 2D points (x, y, point3D_id)
            images[image_id] = ColmapImage(image_id, qvec, tvec,
                                           camera_id, name.decode())
    return images


def read_images(model_dir: str) -> Dict[int, ColmapImage]:
    bin_path = os.path.join(model_dir, "images.bin")
    txt_path = os.path.join(model_dir, "images.txt")
    if os.path.exists(bin_path):
        return read_images_bin(bin_path)
    if os.path.exists(txt_path):
        return read_images_txt(txt_path)
    raise FileNotFoundError(f"no images.bin/txt in {model_dir}")
