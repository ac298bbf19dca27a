"""Minimal COLMAP SQLite database access (read/write).

Our own implementation of the standard, publicly documented COLMAP
database schema (cameras/images/keypoints/descriptors/matches/
two_view_geometries) — functional replacement for the reference's
`preparation/database.py` (SURVEY.md §2.1 L8).

pair_id convention: pair_id = image_id1 * 2147483647 + image_id2 with
image_id1 < image_id2 (COLMAP's public on-disk format).
"""
from __future__ import annotations

import sqlite3
from typing import Dict, Tuple

import numpy as np

MAX_IMAGE_ID = 2147483647


def pair_id_to_image_ids(pair_id: int) -> Tuple[int, int]:
    image_id2 = pair_id % MAX_IMAGE_ID
    image_id1 = (pair_id - image_id2) // MAX_IMAGE_ID
    return int(image_id1), int(image_id2)


def image_ids_to_pair_id(image_id1: int, image_id2: int) -> int:
    if image_id1 > image_id2:
        image_id1, image_id2 = image_id2, image_id1
    return image_id1 * MAX_IMAGE_ID + image_id2


def _blob_to_array(blob, dtype, shape=(-1,)):
    if blob is None:
        return np.zeros(0, dtype).reshape(shape if -1 not in shape else (0,))
    return np.frombuffer(blob, dtype=dtype).reshape(*shape)


class ColmapDatabase:
    def __init__(self, path: str):
        self.conn = sqlite3.connect(path)

    def close(self):
        self.conn.close()

    def image_names(self) -> Dict[int, str]:
        rows = self.conn.execute("SELECT image_id, name FROM images").fetchall()
        return {int(i): n for i, n in rows}

    def keypoints(self) -> Dict[int, np.ndarray]:
        out = {}
        for image_id, rows, cols, blob in self.conn.execute(
                "SELECT image_id, rows, cols, data FROM keypoints"):
            arr = _blob_to_array(blob, np.float32, (rows, cols))
            out[int(image_id)] = arr[:, :2].copy()
        return out

    def descriptors(self) -> Dict[int, np.ndarray]:
        out = {}
        for image_id, rows, cols, blob in self.conn.execute(
                "SELECT image_id, rows, cols, data FROM descriptors"):
            out[int(image_id)] = _blob_to_array(blob, np.uint8, (rows, cols)).copy()
        return out

    def matches(self, table: str = "matches") -> Dict[Tuple[int, int], np.ndarray]:
        assert table in ("matches", "two_view_geometries")
        out = {}
        for pair_id, rows, cols, blob in self.conn.execute(
                f"SELECT pair_id, rows, cols, data FROM {table}"):
            if rows == 0:
                continue
            arr = _blob_to_array(blob, np.uint32, (rows, cols))[:, :2]
            out[pair_id_to_image_ids(pair_id)] = arr.astype(np.int64).copy()
        return out

    def two_view_geometries(self) -> Dict[Tuple[int, int], np.ndarray]:
        return self.matches("two_view_geometries")
