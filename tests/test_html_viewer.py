"""HTML viewer export: self-contained artifact with embedded scene data."""
import json
import os

import numpy as np

from level_s2fm_tpu.utils import marching_cubes as mc
from level_s2fm_tpu.viz import html_viewer


def _make_run(tmp_path):
    pts = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
    mc.write_ply(os.path.join(tmp_path, "pointcloud.ply"), pts)
    cams = [{"id": 0, "K": [[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]],
             "W2C": np.eye(4)[:3].tolist(), "img_size": [64, 64]},
            {"id": 3, "K": [[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]],
             "W2C": [[1, 0, 0, 0.2], [0, 1, 0, 0], [0, 0, 1, 0.5]],
             "img_size": [64, 64]}]
    with open(os.path.join(tmp_path, "cameras.json"), "w") as f:
        json.dump(cams, f)
    return pts


def test_export_html(tmp_path):
    pts = _make_run(str(tmp_path))
    out = html_viewer.export_html(str(tmp_path))
    assert out == os.path.join(str(tmp_path), "viewer.html")
    html = open(out).read()
    assert "<canvas" in html and "DATA" in html
    # embedded data parses back and matches the scene
    payload = html.split("const DATA = ", 1)[1].split(";\n", 1)[0]
    data = json.loads(payload)
    assert len(data["points"]) == len(pts)
    assert len(data["frusta"]) == 2
    assert {f["id"] for f in data["frusta"]} == {0, 3}
    for fr in data["frusta"]:
        segs = np.asarray(fr["segs"])
        assert segs.shape == (8, 2, 3)
        assert np.isfinite(segs).all()


def test_export_html_subsamples(tmp_path):
    _make_run(str(tmp_path))
    out = html_viewer.export_html(str(tmp_path), max_points=10)
    payload = open(out).read().split("const DATA = ", 1)[1].split(";\n", 1)[0]
    assert len(json.loads(payload)["points"]) == 10


def test_frustum_geometry():
    """Apex is the camera center; far corners sit in front of the camera."""
    K = np.asarray([[50.0, 0, 32], [0, 50.0, 32], [0, 0, 1]])
    W2C = np.asarray([[1.0, 0, 0, 0.1], [0, 1, 0, -0.2], [0, 0, 1, 0.3]])
    segs = html_viewer.camera_frustum_segments(K, W2C, (64, 64), scale=0.2)
    C = -W2C[:3, :3].T @ W2C[:3, 3]
    for i in range(4):
        np.testing.assert_allclose(segs[i][0], C, atol=1e-12)
    # far points at depth `scale` in camera frame
    R, t = W2C[:3, :3], W2C[:3, 3]
    for i in range(4):
        pc = R @ segs[i][1] + t
        np.testing.assert_allclose(pc[2], 0.2, atol=1e-9)


def test_timeline_snapshots(tmp_path):
    """Per-view vis dumps become slider steps with embedded points."""
    _make_run(str(tmp_path))
    vis = os.path.join(str(tmp_path), "vis")
    os.makedirs(vis)
    rng = np.random.default_rng(1)
    # both naming conventions: pipeline dumps `_pointcloud.ply`
    for (i, n), suffix in zip([(3, 20), (4, 40)],
                              ["points", "pointcloud"]):
        mc.write_ply(os.path.join(vis, f"{i:04d}_{suffix}.ply"),
                     rng.normal(size=(n, 3)).astype(np.float32))
    out = html_viewer.export_html(str(tmp_path))
    payload = open(out).read().split("const DATA = ", 1)[1].split(";\n", 1)[0]
    tl = json.loads(payload)["timeline"]
    assert [s["label"] for s in tl] == ["0003", "0004"]
    assert [s["n"] for s in tl] == [20, 40]
    assert len(tl[0]["points"]) == 20 and len(tl[1]["points"]) == 40


def test_metric_recorder_numpy_scalars(tmp_path):
    """np.int64 view ids must serialize (regression: synthprep crash)."""
    from level_s2fm_tpu.utils.obs import MetricRecorder
    p = os.path.join(str(tmp_path), "m.jsonl")
    rec = MetricRecorder(path=p)
    rec.log(np.int64(3), view=np.int64(7), err=np.float32(0.5),
            arr=np.arange(2))
    line = json.loads(open(p).read())
    assert line["view"] == 7 and line["err"] == 0.5 and line["arr"] == [0, 1]
