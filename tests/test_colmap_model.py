"""COLMAP sparse-model reader tests: bin/txt roundtrip on hand-built
fixtures (format parity with the reference's read_write_model.py surface:
read_cameras / read_images / read_points3D / read_model)."""
import os
import struct

import numpy as np
import pytest

from preparation import colmap_model as cm


def _write_cameras_bin(path):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", 2))
        # PINHOLE (id 1): fx fy cx cy
        f.write(struct.pack("<IiQQ", 1, 1, 640, 480))
        f.write(struct.pack("<4d", 500.0, 510.0, 320.0, 240.0))
        # SIMPLE_RADIAL (id 2): f cx cy k
        f.write(struct.pack("<IiQQ", 2, 2, 100, 80))
        f.write(struct.pack("<4d", 90.0, 50.0, 40.0, 0.01))


def _write_points3D_bin(path):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<Q", 7))
        f.write(struct.pack("<3d", 0.1, -0.2, 1.5))
        f.write(struct.pack("<3B", 10, 20, 30))
        f.write(struct.pack("<d", 0.75))
        f.write(struct.pack("<Q", 2))
        f.write(struct.pack("<4i", 1, 4, 2, 9))  # (image_id, point2D_idx) x2


def test_cameras_bin_and_K(tmp_path):
    p = os.path.join(tmp_path, "cameras.bin")
    _write_cameras_bin(p)
    cams = cm.read_cameras(str(tmp_path))
    assert set(cams) == {1, 2}
    c1 = cams[1]
    assert (c1.model, c1.width, c1.height) == ("PINHOLE", 640, 480)
    np.testing.assert_allclose(
        c1.K(), [[500, 0, 320], [0, 510, 240], [0, 0, 1]])
    c2 = cams[2]
    assert c2.model == "SIMPLE_RADIAL"
    np.testing.assert_allclose(
        c2.K(), [[90, 0, 50], [0, 90, 40], [0, 0, 1]])


def test_cameras_txt_matches_bin(tmp_path):
    _write_cameras_bin(os.path.join(tmp_path, "cameras.bin"))
    bin_cams = cm.read_cameras_bin(os.path.join(tmp_path, "cameras.bin"))
    txt = os.path.join(tmp_path, "t")
    os.makedirs(txt)
    with open(os.path.join(txt, "cameras.txt"), "w") as f:
        f.write("# Camera list\n")
        f.write("1 PINHOLE 640 480 500 510 320 240\n")
        f.write("2 SIMPLE_RADIAL 100 80 90 50 40 0.01\n")
    txt_cams = cm.read_cameras(txt)
    for cid in (1, 2):
        assert txt_cams[cid].model == bin_cams[cid].model
        np.testing.assert_allclose(txt_cams[cid].params, bin_cams[cid].params)
        np.testing.assert_allclose(txt_cams[cid].K(), bin_cams[cid].K())


def test_points3D_bin_and_txt(tmp_path):
    _write_points3D_bin(os.path.join(tmp_path, "points3D.bin"))
    pts = cm.read_points3D(str(tmp_path))
    assert set(pts) == {7}
    p = pts[7]
    np.testing.assert_allclose(p.xyz, [0.1, -0.2, 1.5])
    assert tuple(p.rgb) == (10, 20, 30)
    assert p.error == pytest.approx(0.75)
    np.testing.assert_array_equal(p.image_ids, [1, 2])
    np.testing.assert_array_equal(p.point2D_idxs, [4, 9])

    txt = os.path.join(tmp_path, "t")
    os.makedirs(txt)
    with open(os.path.join(txt, "points3D.txt"), "w") as f:
        f.write("# 3D point list\n")
        f.write("7 0.1 -0.2 1.5 10 20 30 0.75 1 4 2 9\n")
    q = cm.read_points3D(txt)[7]
    np.testing.assert_allclose(q.xyz, p.xyz)
    np.testing.assert_array_equal(q.image_ids, p.image_ids)
    np.testing.assert_array_equal(q.point2D_idxs, p.point2D_idxs)


def test_write_read_roundtrip_bin_and_txt(tmp_path):
    cams = {1: cm.ColmapCamera(1, "PINHOLE", 640, 480,
                               np.asarray([500.0, 510.0, 320.0, 240.0]))}
    R = cm.qvec_to_rotmat(np.asarray([0.9, 0.1, -0.2, 0.3]) /
                          np.linalg.norm([0.9, 0.1, -0.2, 0.3]))
    q = cm.rotmat_to_qvec(R)
    imgs = {2: cm.ColmapImage(2, q, np.asarray([0.1, 0.2, 0.3]), 1, "a.png")}
    pts = {5: cm.ColmapPoint3D(5, np.asarray([1.0, 2.0, 3.0]),
                               np.asarray([9, 8, 7], np.uint8), 0.5,
                               np.asarray([2]), np.asarray([11]))}
    for ext in (".bin", ".txt"):
        d = os.path.join(tmp_path, ext.strip("."))
        cm.write_model(cams, imgs, pts, d, ext=ext)
        rc, ri, rp = cm.read_model(d)
        np.testing.assert_allclose(rc[1].params, cams[1].params)
        assert rc[1].model == "PINHOLE"
        np.testing.assert_allclose(ri[2].qvec, q, atol=1e-12)
        np.testing.assert_allclose(ri[2].tvec, imgs[2].tvec, atol=1e-12)
        assert ri[2].name == "a.png"
        np.testing.assert_allclose(rp[5].xyz, pts[5].xyz)
        np.testing.assert_array_equal(rp[5].image_ids, [2])
        np.testing.assert_array_equal(rp[5].point2D_idxs, [11])


def test_rotmat_qvec_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = cm.qvec_to_rotmat(q)
        np.testing.assert_allclose(cm.rotmat_to_qvec(R), q, atol=1e-10)
        # trace<=0 branches: 180-degree rotations about each axis
    for axis in range(3):
        R = -np.eye(3)
        R[axis, axis] = 1.0
        np.testing.assert_allclose(cm.qvec_to_rotmat(cm.rotmat_to_qvec(R)), R,
                                   atol=1e-10)


def test_read_model_full(tmp_path):
    _write_cameras_bin(os.path.join(tmp_path, "cameras.bin"))
    _write_points3D_bin(os.path.join(tmp_path, "points3D.bin"))
    with open(os.path.join(tmp_path, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<I", 3))
        f.write(struct.pack("<4d", 1.0, 0.0, 0.0, 0.0))
        f.write(struct.pack("<3d", 0.0, 0.0, 0.5))
        f.write(struct.pack("<I", 1))
        f.write(b"im3.png\x00")
        f.write(struct.pack("<Q", 0))
    cams, imgs, pts = cm.read_model(str(tmp_path))
    assert set(cams) == {1, 2} and set(imgs) == {3} and set(pts) == {7}
    assert imgs[3].name == "im3.png"
    np.testing.assert_allclose(cm.qvec_to_rotmat(imgs[3].qvec), np.eye(3))


def test_image_observations_roundtrip(tmp_path):
    """2D observations (xys + point3D links) survive bin and txt IO —
    including an image with ZERO observations mixed in (the txt format
    still owns a blank second line for it)."""
    xys = np.asarray([[1.5, 2.25], [10.0, 20.5], [3.25, 4.0]])
    p3d = np.asarray([7, -1, 12], np.int64)
    imgs = {
        1: cm.ColmapImage(1, np.asarray([1.0, 0, 0, 0]),
                          np.asarray([0.0, 0, 0.5]), 1, "a.png", xys, p3d),
        2: cm.ColmapImage(2, np.asarray([1.0, 0, 0, 0]),
                          np.asarray([0.0, 0, 1.0]), 1, "b.png"),
        3: cm.ColmapImage(3, np.asarray([1.0, 0, 0, 0]),
                          np.asarray([1.0, 0, 0.0]), 1, "c.png",
                          xys[:1], p3d[:1]),
    }
    for writer, reader, fname in [
            (cm.write_images_bin, cm.read_images_bin, "images.bin"),
            (cm.write_images_txt, cm.read_images_txt, "images.txt")]:
        path = os.path.join(str(tmp_path), fname)
        writer(imgs, path)
        back = reader(path)
        assert set(back) == {1, 2, 3}
        np.testing.assert_allclose(back[1].xys, xys)
        np.testing.assert_array_equal(back[1].point3D_ids, p3d)
        assert back[2].xys is None or len(back[2].xys) == 0
        np.testing.assert_allclose(back[3].xys, xys[:1])
        np.testing.assert_array_equal(back[3].point3D_ids, p3d[:1])


def test_exported_model_tracks_consistent(tmp_path):
    """export_colmap_model writes points3D tracks that dereference into
    written 2D observations (regression: images had zero points2D)."""
    import jax
    from level_s2fm_tpu.config import build_options
    from level_s2fm_tpu.data import synthetic
    from level_s2fm_tpu.sfm.pipeline import LevelSfM
    from level_s2fm_tpu.utils.export import export_colmap_model

    opt = build_options([
        "--yaml=configs/synthetic.yaml", "--optim.init.max_iter=10",
        "--sfm_mode=fast", f"--output_root={tmp_path}"])
    scene = synthetic.make_scene(n_views=2, H=64, W=64, n_points=256, seed=0)
    m = LevelSfM(opt, seed=0)
    m.load_data(synthetic.scene_to_var(scene))
    m.initialize_two_views(0, 1, verbose=False)
    out = os.path.join(str(tmp_path), "sparse", "0")
    export_colmap_model(m.camera_set, m.point_set, out)
    cams, imgs, pts = cm.read_model(out)
    assert len(pts) == len(m.point_set) and len(imgs) == 2
    for p in pts.values():
        for iid, kidx in zip(p.image_ids, p.point2D_idxs):
            im = imgs[int(iid)]
            assert im.xys is not None and 0 <= int(kidx) < len(im.xys)
            # the 2D observation links back to this 3D point
            assert int(im.point3D_ids[int(kidx)]) == int(p.point3D_id)
