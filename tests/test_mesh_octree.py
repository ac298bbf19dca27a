"""MISE-style octree mesh extraction vs dense marching on the init SDF.

The geometric-init SDF is ~|x| - bias, so the extracted surface can be
checked against the analytic sphere AND against the dense single-pass
extraction at the same final resolution (ref equivalent:
`utils/util_vis.py:298-600` Extractor3D; `utils/plots.py:140-223`)."""
import numpy as np

import jax

from level_s2fm_tpu.utils import export, marching_cubes as mc
from tests.test_dual_field import build


def _fields():
    params, sdf_cfg, _, _ = build(dual=False)
    return {"sdf": params["sdf"]}, sdf_cfg


def test_octree_matches_dense(tmp_path):
    params, sdf_cfg = _fields()
    res = 65  # 64 cells; steps=2 -> base 16 cells

    v_oct, f_oct, n_evals = export.extract_mesh_octree(
        params, sdf_cfg, str(tmp_path / "oct.ply"), resolution=res, steps=2,
        grid_boundary=(-1.0, 1.0))
    v_dense, f_dense = export.extract_mesh(
        params, sdf_cfg, str(tmp_path / "dense.ply"), resolution=res,
        grid_boundary=(-1.0, 1.0))

    assert len(v_oct) > 500 and len(f_oct) > 500
    # device-eval savings: the whole point of the octree pass
    assert n_evals < 0.55 * res ** 3, n_evals

    # both surfaces sit on the init sphere (radius = bias = 0.5)
    r_oct = np.linalg.norm(v_oct, axis=-1)
    r_dense = np.linalg.norm(v_dense, axis=-1)
    assert abs(r_oct.mean() - r_dense.mean()) < 5e-3
    assert abs(r_oct.std() - r_dense.std()) < 5e-3

    # one-sided chamfer octree->dense: every octree vertex has a dense
    # vertex within ~1 fine cell (the two extractions triangulate the
    # same band of the same field)
    cell = 2.0 / (res - 1)
    d2 = ((v_oct[:, None, :] - v_dense[None, :, :]) ** 2).sum(-1)
    nn = np.sqrt(d2.min(axis=1))
    assert np.quantile(nn, 0.95) < 1.5 * cell, np.quantile(nn, 0.95)


def test_octree_empty_field():
    """A field with no zero crossing inside the box yields an empty mesh
    (init SDF evaluated in a far-off corner-sized sub-box)."""
    params, sdf_cfg = _fields()
    v, f, n_evals = export.extract_mesh_octree(
        params, sdf_cfg, None, resolution=17, steps=2,
        grid_boundary=(0.8, 0.95))
    assert len(v) == 0 and len(f) == 0
    assert n_evals >= 5 ** 3  # base grid always evaluated


def test_octree_resolution_validation():
    params, sdf_cfg = _fields()
    try:
        export.extract_mesh_octree(params, sdf_cfg, None, resolution=64,
                                   steps=2)
    except ValueError as e:
        assert "divisible" in str(e)
    else:
        raise AssertionError("expected ValueError for 63 % 4 != 0")


def test_dense_mc_slab_seams():
    """Slab-chunked dense MC welds across slab boundaries identically to
    a single-slab pass."""
    xs = np.linspace(-1, 1, 33)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    vol = np.linalg.norm(g, axis=-1) - 0.5
    sp = xs[1] - xs[0]
    v1, f1 = mc.marching_cubes(vol, 0.0, origin=(-1, -1, -1),
                               spacing=(sp, sp, sp), slab_cells=5)
    v2, f2 = mc.marching_cubes(vol, 0.0, origin=(-1, -1, -1),
                               spacing=(sp, sp, sp), slab_cells=1000)
    # same welded vertex set (ordering may differ)
    k1 = {tuple(np.round(v * 1e5).astype(np.int64)) for v in v1}
    k2 = {tuple(np.round(v * 1e5).astype(np.int64)) for v in v2}
    assert k1 == k2
    assert len(f1) == len(f2)
