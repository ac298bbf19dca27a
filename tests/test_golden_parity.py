"""Golden numerical parity vs hand-built PyTorch oracles.

The north-star requirement (BASELINE.md): rendered images, sphere-traced
depths, and parameter gradients allclose against a torch implementation
of the reference math (`models/base.py`, `models/SDF.py:55-226`,
`models/Renderer.py:33-127`). The oracles here are written from the
formulas with torch primitives — nothing is imported from /root/reference.

Covered: hash-encode forward + table/input gradients, the full VolSDF
render forward (uniform path), bidirectional sphere-traced depth, and an
init-style loss gradient w.r.t. the hash table and MLP weights.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from level_s2fm_tpu.config import Opt
from level_s2fm_tpu.fields import hashgrid, mlp, radiance as radf, sdf as sdf_mod
from level_s2fm_tpu.rendering import renderer as ren_mod

_PRIMES = (1, 2654435761, 805459861)


# ---------------------------------------------------------------------------
# torch oracle
# ---------------------------------------------------------------------------

def torch_hash_encode(table_t, x_unit_t, cfg):
    """NGP hash encode (`models/base.py:12-40` semantics via tcnn):
    per-level scaled trilinear interpolation, dense indexing when the
    level grid fits, xor-prime spatial hash otherwise."""
    L, T, F = table_t.shape
    res_np = cfg.resolutions()
    outs = []
    for l in range(L):
        res = int(res_np[l])
        pos = x_unit_t * res
        base = torch.floor(pos)
        frac = pos - base
        base = base.long()
        feats = 0.0
        out = torch.zeros(x_unit_t.shape[0], F, dtype=table_t.dtype)
        for cx in (0, 1):
            for cy in (0, 1):
                for cz in (0, 1):
                    corner = base + torch.tensor([cx, cy, cz])
                    corner = torch.clamp(corner, 0, res)
                    x, y, z = corner[:, 0], corner[:, 1], corner[:, 2]
                    if (res + 1) ** 3 <= T:
                        idx = (x + (res + 1) * (y + (res + 1) * z)) % T
                    else:
                        h = ((x * _PRIMES[0]) & 0xFFFFFFFF) \
                            ^ ((y * _PRIMES[1]) & 0xFFFFFFFF) \
                            ^ ((z * _PRIMES[2]) & 0xFFFFFFFF)
                        idx = (h & 0xFFFFFFFF) % T
                    w = torch.ones_like(frac[:, 0])
                    for d, c in enumerate((cx, cy, cz)):
                        w = w * (frac[:, d] if c == 1 else 1.0 - frac[:, d])
                    out = out + table_t[l][idx] * w[:, None]
        outs.append(out)
    return torch.cat(outs, dim=-1)


def torch_embed(table_t, xyz_t, cfg, bmin, bmax, rescale=1.0):
    bmin = torch.tensor(bmin, dtype=xyz_t.dtype)
    bmax = torch.tensor(bmax, dtype=xyz_t.dtype)
    x_unit = (xyz_t - bmin) / (bmax - bmin)
    enc = torch_hash_encode(table_t, x_unit, cfg)
    if cfg.include_input:
        enc = torch.cat([xyz_t / rescale, enc], dim=-1)
    return enc


def torch_wn_linear(p):
    """weight-norm linear from the jax param dict {"V","g","b"}."""
    V = torch.from_numpy(np.asarray(p["V"]).copy())
    g = torch.from_numpy(np.asarray(p["g"]).copy())
    b = torch.from_numpy(np.asarray(p["b"]).copy())
    V.requires_grad_(True)

    def apply(x):
        W = g.reshape(-1, 1) * V / V.norm(dim=1, keepdim=True)
        return x @ W.T + b
    return apply, V


def torch_geometry_mlp(params):
    layers = [torch_wn_linear(p) for p in params["layers"]]
    sp = torch.nn.Softplus(beta=100, threshold=20)

    def apply(x):
        t = x
        for li, (lin, _) in enumerate(layers):
            t = lin(t)
            if li <= len(layers) - 2:
                t = sp(t)
        return t
    return apply, [v for _, v in layers]


def torch_radiance_mlp(params):
    layers = [torch_wn_linear(p) for p in params["layers"]]

    def apply(x):
        t = x
        for lin, _ in layers:
            t = lin(t)              # dead inner ReLU: no activation
        return torch.sigmoid(t)
    return apply, [v for _, v in layers]


def torch_fourier(x, n_freqs=4, max_log2=3.0):
    out = [x]
    for f in 2.0 ** np.linspace(0.0, max_log2, n_freqs):
        out += [torch.sin(x * f), torch.cos(x * f)]
    return torch.cat(out, dim=-1)


def torch_aabb(o, d, center, half, eps=1e-10):
    safe = torch.where(d.abs() < eps, torch.where(d >= 0, torch.full_like(d, eps),
                                                  torch.full_like(d, -eps)), d)
    inv = 1.0 / safe
    lo = (center - half - o) * inv
    hi = (center + half - o) * inv
    t1 = torch.minimum(lo, hi).max(dim=-1).values.clamp(min=0.0)
    t2 = torch.maximum(lo, hi).min(dim=-1).values
    valid = t2 > t1
    return torch.where(valid, t1, torch.full_like(t1, -1.0)), \
        torch.where(valid, t2, torch.full_like(t2, -1.0)), valid


class TorchField:
    """sdf + feature + normal oracle over copied jax params."""

    def __init__(self, params, sdf_cfg):
        self.cfg = sdf_cfg
        self.table = torch.from_numpy(np.asarray(params["table"]).copy())
        self.table.requires_grad_(True)
        self.mlp, self.mlp_vs = torch_geometry_mlp(params["mlp"])

    def feat(self, xyz):
        enc = torch_embed(self.table, xyz, self.cfg.grid,
                          self.cfg.bound_min, self.cfg.bound_max,
                          rescale=self.cfg.rescale)
        return self.mlp(enc)

    def sdf(self, xyz):
        return self.feat(xyz)[..., :1] / self.cfg.scale_mlp

    def sdf_normal_feat(self, xyz):
        x = xyz.detach().clone().requires_grad_(True)
        f = self.feat(x)
        s = f[..., :1] / self.cfg.scale_mlp
        n = torch.autograd.grad(s.sum(), x, create_graph=True)[0]
        return s, n, f


def torch_render(field, rad_params, sdf_cfg, n_samples, center, ray, bg):
    """Uniform-path VolSDF render (`models/Renderer.py:33-127`)."""
    R = center.shape[0]
    t1, t2, valid = torch_aabb(center, ray, torch.zeros(3), torch.ones(3))
    rand = 0.5 + torch.arange(n_samples, dtype=center.dtype)
    depths = rand[None, :] / n_samples * (t2 - t1)[:, None] + t1[:, None]
    p3d = center[:, None, :] + ray[:, None, :] * depths[..., None]
    flat = p3d.reshape(-1, 3)
    s, n, f = field.sdf_normal_feat(flat)

    rad_apply, _ = torch_radiance_mlp(rad_params["rad_mlp"])
    view = ray[:, None, :].expand(-1, n_samples, -1).reshape(-1, 3)
    all_enc = torch.cat([flat, n, torch_fourier(view), f[..., 1:]], dim=-1)
    rgbs = rad_apply(all_enc).reshape(R, n_samples, 3)
    s = s.reshape(R, n_samples)

    beta = torch.tensor(sdf_cfg.beta_init)
    alpha = 1.0 / beta
    e = 0.5 * torch.exp(-s.abs() / beta)
    sigma = alpha * torch.where(s >= 0, e, 1 - e)

    ray_len = ray.norm(dim=-1, keepdim=True)
    dist = (depths[:, 1:] - depths[:, :-1]) * ray_len
    sd = sigma[:, :-1] * dist
    alpha_k = 1 - torch.exp(-sd)
    T = torch.exp(-torch.cumsum(torch.cat([torch.zeros_like(sd[:, :1]), sd], 1), 1))[:, :-1]
    prob = T * alpha_k
    rgb = (rgbs[:, :-1] * prob[..., None]).sum(1)
    opacity = prob.sum(1, keepdim=True)
    rgb = rgb + (1 - opacity) * torch.tensor(bg)
    depth = (depths[:, :-1] * prob).sum(1, keepdim=True) \
        + (1 - opacity) * depths[:, -1:]
    return rgb, depth, opacity


def torch_sphere_trace(field, sdf_cfg, o, d):
    """Bidirectional fixed-trip march + differentiable re-eval
    (`models/SDF.py:116-226` as reshaped in fields/sdf.py)."""
    BN = o.shape[0]
    t1, t2, valid = torch_aabb(o, d, torch.zeros(3), torch.ones(3))
    thr = sdf_cfg.sdf_threshold
    with torch.no_grad():
        acc_s, acc_e = t1.clone(), t2.clone()
        nsdf_s = field.sdf(o + acc_s[:, None] * d)[:, 0]
        nsdf_e = field.sdf(o + acc_e[:, None] * d)[:, 0]
        unf_s = torch.ones(BN, dtype=torch.bool)
        unf_e = torch.ones(BN, dtype=torch.bool)
        track = torch.zeros(sdf_cfg.iters_max, BN, 3)
        executed = torch.zeros(sdf_cfg.iters_max, dtype=torch.bool)
        first = True
        for i in range(sdf_cfg.iters_max):
            curr_s = torch.where(nsdf_s.abs() <= thr, torch.zeros_like(nsdf_s), nsdf_s)
            curr_e = torch.where(nsdf_e.abs() <= thr, torch.zeros_like(nsdf_e), nsdf_e)
            new_unf_s = curr_s.abs() > thr if first else unf_s & (curr_s.abs() > thr)
            new_unf_e = curr_e.abs() > thr if first else unf_e & (curr_e.abs() > thr)
            step_active = bool(new_unf_s.any())
            if step_active:
                track[i] = o + acc_s[:, None] * d
                executed[i] = True
                acc_s2 = torch.minimum(acc_s + curr_s, t2)
                acc_e2 = torch.minimum(acc_e + curr_e, t2)
                ns2 = field.sdf(o + acc_s2[:, None] * d)[:, 0]
                ne2 = field.sdf(o + acc_e2[:, None] * d)[:, 0]
                nsdf_s = torch.where(new_unf_s, ns2, nsdf_s)
                nsdf_e = torch.where(new_unf_e, ne2, nsdf_e)
                order_ok = acc_s2 < acc_e2
                unf_s = new_unf_s & order_ok
                unf_e = new_unf_e & order_ok
                acc_s, acc_e = acc_s2, acc_e2
            else:
                unf_s, unf_e = new_unf_s, new_unf_e
            first = False
        if not executed[0]:
            track[0] = o + t1[:, None] * d
        contrib = executed.clone()
        contrib[0] = True
        last_idx = int(max(i for i in range(sdf_cfg.iters_max) if contrib[i]))
    sdf_tracks = field.sdf(track.reshape(-1, 3)).reshape(sdf_cfg.iters_max, BN)
    d_pred = (sdf_tracks * contrib[:, None].float()).sum(0) + t1
    d_pred = torch.minimum(d_pred, t2)
    sdf_last = sdf_tracks[last_idx]
    finish = (sdf_last.detach().abs() < sdf_cfg.finish_threshold) & valid
    return d_pred, finish


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

def _small_opt():
    return Opt({
        "Res": 100,
        "Ablate_config": {"dual_field": False},
        "SDF": {"arch": {"layers": [None, 32, 16], "skip": []},
                "NN_Init": {"scale_mlp": 1, "bias": 0.5, "tf_init": True},
                "VolSDF": {"sample_intvs": 32, "final_sample_intvs": 16,
                           "volsdf_sampling": False, "max_upsample_iter": 2,
                           "iters_max_st": 8, "eps": 0.1, "beta_init": 0.05,
                           "rescale": 1.0, "beta_speed": 1.0,
                           "sdf_threshold": 1e-3},
                "Hash_config": {"n_levels": 8, "n_features_per_level": 2,
                                "log2_hashmap_size": 12,
                                "base_resolution": 16}},
        "RadF": {"arch": {"layers": [None, 32, 32, 3], "skip": []}},
        "data": {"bound_min": [-1, -1, -1], "bound_max": [1, 1, 1],
                 "inside": True, "bg_sdf": None, "bg_rad": 2.0,
                 "scene": "gold", "bgcolor": [0.2, 0.3, 0.4]},
    })


@pytest.fixture(scope="module")
def fields():
    opt = _small_opt()
    sdf_cfg = sdf_mod.config_from_opt(opt)
    rad_cfg = radf.config_from_opt(opt)
    ren_cfg = ren_mod.config_from_opt(opt)
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    params = {"sdf": sdf_mod.init_params(k1, sdf_cfg),
              "rad": radf.init_params(k2, rad_cfg)}
    return opt, sdf_cfg, rad_cfg, ren_cfg, params


def _rays(n=64, seed=0):
    rng = np.random.default_rng(seed)
    center = np.broadcast_to([0.0, 0.0, -2.0], (n, 3)).astype(np.float32).copy()
    ray = np.concatenate([rng.normal(size=(n, 2)) * 0.15, np.ones((n, 1))],
                         -1).astype(np.float32)
    return center, ray


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_hash_encode_forward_matches_torch(fields):
    _, sdf_cfg, _, _, params = fields
    cfg = sdf_cfg.grid
    rng = np.random.default_rng(1)
    x = rng.uniform(0.02, 0.98, size=(128, 3)).astype(np.float32)
    ours = np.asarray(hashgrid.encode(params["sdf"]["table"], jnp.asarray(x), cfg))
    table_t = torch.from_numpy(np.asarray(params["sdf"]["table"]).copy())
    ref = torch_hash_encode(table_t, torch.from_numpy(x), cfg).detach().numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_hash_encode_grads_match_torch(fields):
    """Table gradient (scatter-add) AND input gradient (the path the
    reference needs tcnn double-backward for, `models/SDF.py:102-114`)."""
    _, sdf_cfg, _, _, params = fields
    cfg = sdf_cfg.grid
    rng = np.random.default_rng(2)
    x = rng.uniform(0.05, 0.95, size=(64, 3)).astype(np.float32)
    cot = rng.normal(size=(64, cfg.n_levels * cfg.n_features_per_level)
                     ).astype(np.float32)

    def loss_j(table, xs):
        return jnp.sum(hashgrid.encode(table, xs, cfg) * cot)

    gt_j, gx_j = jax.grad(loss_j, argnums=(0, 1))(
        params["sdf"]["table"], jnp.asarray(x))

    table_t = torch.from_numpy(np.asarray(params["sdf"]["table"]).copy())
    table_t.requires_grad_(True)
    x_t = torch.from_numpy(x).requires_grad_(True)
    loss_t = (torch_hash_encode(table_t, x_t, cfg)
              * torch.from_numpy(cot)).sum()
    loss_t.backward()
    np.testing.assert_allclose(np.asarray(gt_j), table_t.grad.numpy(),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gx_j), x_t.grad.numpy(),
                               rtol=1e-3, atol=2e-4)


def test_render_forward_matches_torch(fields):
    _, sdf_cfg, rad_cfg, ren_cfg, params = fields
    center, ray = _rays(48)
    out = ren_mod.render(params["sdf"], sdf_cfg, params["rad"], rad_cfg,
                         ren_cfg, jnp.asarray(center)[None], jnp.asarray(ray)[None])

    field = TorchField(params["sdf"], sdf_cfg)
    rgb_t, depth_t, op_t = torch_render(
        field, params["rad"], sdf_cfg, ren_cfg.sample_intvs,
        torch.from_numpy(center), torch.from_numpy(ray),
        list(ren_cfg.bgcolor))
    np.testing.assert_allclose(np.asarray(out["rgb"][0]),
                               rgb_t.detach().numpy(), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["depth_mlp"][0]),
                               depth_t.detach().numpy(), rtol=1e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(out["opacity"][0]),
                               op_t.detach().numpy(), rtol=1e-4, atol=2e-5)


def test_sphere_trace_depth_matches_torch(fields):
    _, sdf_cfg, _, _, params = fields
    center, ray = _rays(40, seed=5)
    tr = sdf_mod.sphere_tracing(params["sdf"], sdf_cfg,
                                jnp.asarray(center)[None],
                                jnp.asarray(ray)[None],
                                key=jax.random.PRNGKey(0))
    field = TorchField(params["sdf"], sdf_cfg)
    d_t, fin_t = torch_sphere_trace(field, sdf_cfg,
                                    torch.from_numpy(center),
                                    torch.from_numpy(ray))
    np.testing.assert_allclose(np.asarray(tr.d_pred[0]),
                               d_t.detach().numpy(), rtol=1e-4, atol=1e-4)
    assert (np.asarray(tr.finish_mask[:, 0]) == fin_t.numpy()).mean() > 0.97


def test_init_loss_gradient_matches_torch(fields):
    """d(rgb L1 + eikonal)/d(hash table, first MLP layer) allclose — the
    init-phase gradient path (`Initialization.py:167-179`)."""
    _, sdf_cfg, rad_cfg, ren_cfg, params = fields
    center, ray = _rays(32, seed=9)
    rng = np.random.default_rng(10)
    rgb_gt = rng.uniform(size=(32, 3)).astype(np.float32)

    def loss_j(p):
        out = ren_mod.render(p, sdf_cfg, params["rad"], rad_cfg, ren_cfg,
                             jnp.asarray(center)[None], jnp.asarray(ray)[None])
        n = jnp.linalg.norm(out["normals"], axis=-1)
        return (jnp.mean(jnp.abs(out["rgb"][0] - rgb_gt))
                + 0.1 * jnp.mean(jnp.abs(n - 1.0)))

    g_j = jax.grad(loss_j)(params["sdf"])

    field = TorchField(params["sdf"], sdf_cfg)
    t1, t2, _ = torch_aabb(torch.from_numpy(center), torch.from_numpy(ray),
                           torch.zeros(3), torch.ones(3))
    S = ren_cfg.sample_intvs
    rand = 0.5 + torch.arange(S, dtype=torch.float32)
    depths = rand[None] / S * (t2 - t1)[:, None] + t1[:, None]
    p3d = (torch.from_numpy(center)[:, None, :]
           + torch.from_numpy(ray)[:, None, :] * depths[..., None]).reshape(-1, 3)
    s, n, f = field.sdf_normal_feat(p3d)
    rad_apply, _ = torch_radiance_mlp(params["rad"]["rad_mlp"])
    view = torch.from_numpy(ray)[:, None, :].expand(-1, S, -1).reshape(-1, 3)
    all_enc = torch.cat([p3d, n, torch_fourier(view), f[..., 1:]], dim=-1)
    rgbs = rad_apply(all_enc).reshape(32, S, 3)
    s2 = s.reshape(32, S)
    beta = torch.tensor(sdf_cfg.beta_init)
    e = 0.5 * torch.exp(-s2.abs() / beta)
    sigma = (1.0 / beta) * torch.where(s2 >= 0, e, 1 - e)
    ray_len = torch.from_numpy(ray).norm(dim=-1, keepdim=True)
    dist = (depths[:, 1:] - depths[:, :-1]) * ray_len
    sd = sigma[:, :-1] * dist
    alpha_k = 1 - torch.exp(-sd)
    T = torch.exp(-torch.cumsum(torch.cat([torch.zeros_like(sd[:, :1]), sd], 1), 1))[:, :-1]
    prob = T * alpha_k
    rgb = (rgbs[:, :-1] * prob[..., None]).sum(1)
    rgb = rgb + (1 - prob.sum(1, keepdim=True)) * torch.tensor(list(ren_cfg.bgcolor))
    nn_ = n.reshape(32, S, 3).norm(dim=-1)
    loss_t = (rgb - torch.from_numpy(rgb_gt)).abs().mean() \
        + 0.1 * (nn_ - 1.0).abs().mean()
    loss_t.backward()

    g_table_t = field.table.grad.numpy()
    g_table_j = np.asarray(g_j["table"])
    scale = np.abs(g_table_t).max()
    np.testing.assert_allclose(g_table_j, g_table_t,
                               rtol=5e-3, atol=5e-4 * scale)
    g_V_t = field.mlp_vs[0].grad.numpy()
    g_V_j = np.asarray(g_j["mlp"]["layers"][0]["V"])
    scale_v = np.abs(g_V_t).max()
    np.testing.assert_allclose(g_V_j, g_V_t, rtol=5e-3, atol=5e-4 * scale_v)
