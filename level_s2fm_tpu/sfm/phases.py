"""Jitted optimization phases: init / geoinit (triangulation) / BA / refine.

This is the TPU-native reshape of the reference's per-phase torch loops
(SURVEY.md §7.1 item 4): each phase is ONE jitted step function over a
static-shape padded batch, with optax optimizers, scanned on device for
the full iteration count (one XLA dispatch per phase via ``run``).

Loss semantics mirror, per phase:
  * init   — `pipelines/Initialization.py:138-275` + `Camera.py:448-538`
  * geoinit— `pipelines/Registration.py:133-317` (SDF-based triangulation)
  * ba     — `pipelines/BA.py:110-218` (neural bundle adjustment)
  * refine — `pipelines/rendering_refine.py:73-121`

Deviations (explicit, cf. SURVEY.md §7.3):
  * fixed-trip-count loops and masked/padded batches instead of dynamic
    shapes (no behavioral difference when batches are full);
  * the reference re-picks the "tracing" camera per iteration with python
    random; here a jax PRNG key drives the same choice on device.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..fields import radiance as radf
from ..fields import sdf as sdf_mod
from ..geometry import lie, transforms as T
from ..parallel import mesh as pmesh
from ..rendering import renderer as ren_mod
from . import losses as L
from . import optim as optim_mod

EPS = 1e-6


@dataclasses.dataclass(frozen=True)
class PhaseCfgs:
    """Static configuration shared by all phases."""
    sdf: sdf_mod.SDFConfig
    rad: radf.RadFConfig
    ren: ren_mod.RendererConfig
    H: int
    W: int
    rand_rays: int = 8192
    dc_unfinish_weight: Optional[float] = None  # None: dataset in the ref's list


def project_points_per(pts, poses, K, eps=EPS):
    """Project per-element: pts [P,3], poses [P,3,4], K [3,3] -> uv [P,2], z [P].

    The divisor is clamped AWAY from zero on both sides (the reference's
    ``z + eps`` still crosses zero for points near/behind the image
    plane, overflowing uv to inf and NaN-ing the masked gradient); the
    losses additionally gate such observations out via their masks.
    """
    Xh = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    Xc = jnp.einsum("pij,pj->pi", poses, Xh)
    uvw = Xc @ K.T
    z = uvw[..., 2]
    denom = jnp.where(z >= 0, jnp.maximum(z, eps), jnp.minimum(z, -eps))
    uv = uvw[..., :2] / denom[..., None]
    return uv, z


# ============================================================================
# shared render core (ref CameraSet.render, `pipelines/Camera.py:448-538`)
# ============================================================================

def render_core(params, cfgs: PhaseCfgs, key, poses, intr, images, grid,
                tracing=None, occ=None, dc_trace_frozen: bool = False,
                cam_mask=None):
    """Random-ray multi-view render + the standard loss bundle.

    poses [C,3,4]; intr [3,3]; images [C,HW,3]; grid [HW,2].
    tracing: optional dict with per-camera padded tracked-keypoint data
      {"center" [C,Nt,3], "ray" [C,Nt,3], "xyz" [C,Nt,3], "mask" [C,Nt]}
      for the multi-view sphere-trace consistency loss
      (`Camera.py:476-488`).
    ONE sphere march serves both the DC-loss rays and the tracing-branch
    keypoint rays (the reference runs two separate traces,
    `Camera.py:476-516`; the combined fixed-trip march is step-for-step
    identical when the loop runs to its iteration cap, the common case).
    ``dc_trace_frozen`` re-evaluates the DC branch's track with a frozen
    SDF (value-only): used by BA, where the reference detaches the march
    anyway and pose/field gradients flow through the rendered depth.
    ``cam_mask`` [C] bool marks the REAL cameras when the camera axis is
    padded to a shape bucket (see `bundle.cam_bucket`): padded cameras'
    rays are excluded from every loss/metric, and the tracing camera is
    drawn from the real prefix only. None = all cameras real.
    Returns dict of losses/metrics (all scalars) plus 'normals', 'mask_bg'.
    """
    C = poses.shape[0]
    HW = cfgs.H * cfgs.W
    k_rays, k_trace, k_cam, k_st = jax.random.split(key, 4)
    n_rays = max(cfgs.rand_rays // C, 1)
    mesh = pmesh.get_mesh()
    if mesh is not None:
        # pad the per-camera ray count up to a mesh multiple so the ray
        # axis always shards (a non-divisible count silently no-oped the
        # sharding constraint before); duplicated rays only re-average
        # identical loss terms
        nd = mesh.devices.size
        n_rays = -(-n_rays // nd) * nd
    n_rays = min(n_rays, HW)
    rays_idx = jax.random.permutation(k_rays, HW)[:n_rays]
    grid_sel = grid[rays_idx]
    centers, rays = T.get_center_and_ray(poses, intr, grid_sel)   # [C,R,3]
    rgbs_gt = images[:, rays_idx]                                  # [C,R,3]
    # shard the ray batch over the data mesh (no-op single-device)
    centers = pmesh.constrain(centers, axis=1)
    rays = pmesh.constrain(rays, axis=1)
    rgbs_gt = pmesh.constrain(rgbs_gt, axis=1)

    n_valid = C if cam_mask is None else jnp.sum(cam_mask)
    out = {}
    # combined ray set: DC rays for all cams + (optionally) the random
    # camera's tracked keypoints — one march, branch-specific re-eval
    flat_c = centers.reshape(-1, 3)
    flat_r = rays.reshape(-1, 3)
    n_dc = flat_c.shape[0]
    if tracing is not None:
        # real cameras occupy the prefix of a padded camera axis
        cam_j = jax.random.randint(k_cam, (), 0, n_valid)
        tc = tracing["center"][cam_j]
        tray = tracing["ray"][cam_j]
        txyz = tracing["xyz"][cam_j]
        tmask = tracing["mask"][cam_j]
        all_c = jnp.concatenate([flat_c, tc], 0)[None]
        all_d = jnp.concatenate([flat_r, tray], 0)[None]
    else:
        all_c = flat_c[None]
        all_d = flat_r[None]

    march = sdf_mod.sphere_march(params["sdf"], cfgs.sdf, all_c, all_d)

    if tracing is not None:
        m_tr = sdf_mod.march_slice(march, n_dc, None)
        _, sdf_surf_tr, _, pts_surf_tr = sdf_mod.sphere_reeval(
            params["sdf"], cfgs.sdf, m_tr, tc[None], tray[None])
        tdist = L.safe_norm(txyz - pts_surf_tr[0], axis=-1)
        out["tracing_loss"] = L.masked_mean(tdist, tmask)
        out["sdfs_traced"] = sdf_surf_tr
        out["tmask"] = tmask
    else:
        out["tracing_loss"] = jnp.asarray(0.0)

    ren = ren_mod.render(params["sdf"], cfgs.sdf, params["rad"], cfgs.rad,
                         cfgs.ren, centers, rays, occ_grid=occ)
    rgb = ren["rgb"]
    depth_mlp = ren["depth_mlp"]

    dc_params = (jax.tree.map(jax.lax.stop_gradient, params["sdf"])
                 if dc_trace_frozen else params["sdf"])
    m_dc = sdf_mod.march_slice(march, 0, n_dc)
    d_dc, _, fin_dc, _ = sdf_mod.sphere_reeval(
        dc_params, cfgs.sdf, m_dc,
        centers.reshape(1, -1, 3), rays.reshape(1, -1, 3))
    d_points = d_dc.reshape(C, n_rays, 1)
    mask_finish = fin_dc.reshape(C, n_rays)

    mean_gt = rgbs_gt.mean(axis=-1)
    mask_bg = (mean_gt < 0.95) & (mean_gt > 0.05)
    ray_real = (jnp.ones((C, n_rays), bool) if cam_mask is None
                else jnp.broadcast_to(cam_mask[:, None], (C, n_rays)))
    mask_bg = mask_bg & ray_real
    mask_fin = mask_finish & mask_bg

    dc_elem = L.smooth_l1(d_points[..., 0], depth_mlp[..., 0])
    dc = L.masked_mean(dc_elem, mask_fin)
    dc = jnp.where(jnp.sum(mask_fin) > 0, dc, 0.0)
    if cfgs.dc_unfinish_weight is not None:
        rgb_err = jax.lax.stop_gradient(jnp.abs(rgb - rgbs_gt).mean(axis=-1))
        w_dc = jnp.exp(-100.0 * rgb_err)
        dc_unf = L.masked_mean(
            w_dc * L.smooth_l1(d_points[..., 0], jax.lax.stop_gradient(depth_mlp[..., 0])),
            (~mask_fin) & ray_real)
        dc = dc + cfgs.dc_unfinish_weight * n_valid * dc_unf

    rgb_loss = (L.l1(rgb, rgbs_gt) if cam_mask is None
                else L.masked_mean(jnp.abs(rgb - rgbs_gt).mean(axis=-1),
                                   ray_real))
    out.update(
        rgb_loss=rgb_loss,
        DC_loss=dc,
        PSNR=L.psnr(rgb, rgbs_gt, mask_bg),
        normals=ren["normals"],
        mask_bg=mask_bg,
        ray_real=ray_real,
    )
    return out


import os

_DEFAULT_SCAN_CHUNK = int(os.environ.get("LS2FM_SCAN_CHUNK", "50"))


def chunked_run(run_jit, state, batch, key, n_iters: int,
                chunk: int = _DEFAULT_SCAN_CHUNK):
    """Execute a phase as several smaller device scans.

    One giant scan (500-1000 iters in a single XLA dispatch) can run for
    minutes; the remote-TPU transport kills long-running single calls
    ("TPU worker process crashed"). Chunks of ~50 keep each dispatch in
    the tens of seconds while costing negligible dispatch overhead.
    Tune with env LS2FM_SCAN_CHUNK.
    """
    from ..utils import obs as _obs
    _obs.COMPILES.record(getattr(run_jit, "__qualname__", str(run_jit)), batch)
    metrics_parts = []
    done = 0
    i = 0
    while done < n_iters:
        n = min(chunk, n_iters - done)
        state, m = run_jit(state, batch, jax.random.fold_in(key, i), n_iters=n)
        metrics_parts.append(m)
        done += n
        i += 1
    metrics = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0),
                           *metrics_parts)
    return state, metrics


_PHASE_CACHE: dict = {}


def get_cached_phase(cls, cfgs, weights, **kwargs):
    """Reuse phase instances (and their jax.jit caches) across pipeline
    steps.

    A fresh phase object per registration/BA would retrace + recompile the
    identical program every view (minutes each through the remote TPU
    compiler). The cache key covers everything that shapes the traced
    computation: phase class, static cfgs, loss weights, lrs/max_iter.
    """
    key = (cls.__name__, cfgs, tuple(sorted(weights.items())),
           tuple(sorted(kwargs.items())))
    if key not in _PHASE_CACHE:
        _PHASE_CACHE[key] = cls(cfgs, weights, **kwargs)
    return _PHASE_CACHE[key]


def guarded_update(tx, grads, opt_state, params):
    """Apply an optimizer update, skipping the step when ANY gradient
    OR update leaf is non-finite, and sanitizing poisoned optimizer
    moments.

    A single poisoned step (inf loss on an unmasked outlier, a residual
    at exactly 0 under an unguarded norm, ...) would otherwise write NaN
    into the fields IRREVERSIBLY mid-scan — 3h of chip time lost on the
    round-3 flagship run. Skipped steps still advance the optimizer's
    schedule/step count (same iteration budget as the reference), and the
    returned ``bad`` flag is surfaced as the ``nonfinite`` metric so a
    firing guard is visible in the phase printout, never silent.

    Why updates are checked separately from grads (measured failure,
    round-3 flagship view-5 global BA): a finite-but-huge gradient
    (~1e20, f32) passes the grad check, but Adam's second moment g**2
    overflows to inf; once the FIRST moment also overflows, the update
    m/sqrt(v) = inf/inf = NaN while every gradient along the way was
    finite — NaN params with the grad-only guard never firing. The
    update check catches the NaN step, and the moment sanitization
    (non-finite inexact opt-state entries reset to 0, i.e. a local
    optimizer restart for the overflowed entries) stops the poisoned
    moments from NaN-ing every subsequent step.

    Returns (params_new, opt_state_new, bad) with bad in {0.0, 1.0}.
    """
    ok = jnp.asarray(True)
    for g in jax.tree.leaves(grads):
        ok = ok & jnp.all(jnp.isfinite(g))
    grads = jax.tree.map(lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
    updates, opt_state = tx.update(grads, opt_state, params)
    for u in jax.tree.leaves(updates):
        ok = ok & jnp.all(jnp.isfinite(u))
    updates = jax.tree.map(lambda u: jnp.where(ok, u, jnp.zeros_like(u)),
                           updates)
    params = optax.apply_updates(params, updates)
    opt_state = jax.tree.map(
        lambda x: (jnp.where(jnp.isfinite(x), x, jnp.zeros_like(x))
                   if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact) else x),
        opt_state)
    return params, opt_state, 1.0 - ok.astype(jnp.float32)


def eikonal_from_normals(normals, mask=None):
    n = L.safe_norm(normals, axis=-1)
    if mask is None:
        return L.l1(n, jnp.ones_like(n))
    return L.masked_mean(jnp.abs(n - 1.0), jnp.broadcast_to(mask[..., None], n.shape))


# ============================================================================
# Phase: two-view initialization
# ============================================================================

class InitPhase:
    """Two-view SDF+color fitting (ref `Initialization.py:138-219`).

    batch keys:
      center_k [2,N,3], ray_k [2,N,3] — rays through inlier keypoints
      proj_pose [2,3,4]               — opposite camera w2c
      kp_src [2,N,2], kp_mask [2,N]   — projection targets + padding mask
      poses [2,3,4], intr [3,3], images [2,HW,3], grid [HW,2]
    """

    def __init__(self, cfgs: PhaseCfgs, weights: Dict, lr_sdf=1e-3, lr_sdf_end=1e-4,
                 lr_color=1e-2, max_iter=500):
        self.cfgs = cfgs
        self.weights = dict(weights)
        self.max_iter = max_iter
        gamma = optim_mod.decay_gamma(lr_sdf, lr_sdf_end, max_iter)
        self._mk_tx = lambda params: optim_mod.make_phase_optimizer(
            params, {"sdf": "sdf", "rad": "color"},
            {"sdf": lr_sdf, "color": lr_color}, gamma)
        self._step = jax.jit(self._step_impl)
        self._run = jax.jit(self._run_impl, static_argnames=("n_iters",))
        self._tri = jax.jit(self._triangulate_impl)

    def init_state(self, params):
        tx = self._mk_tx(params)
        self._tx = tx
        return {"params": params, "opt": tx.init(params)}

    def _losses(self, params, batch, key):
        cfgs = self.cfgs
        k1, k2 = jax.random.split(key)
        tr = sdf_mod.sphere_tracing(params["sdf"], cfgs.sdf,
                                    batch["center_k"], batch["ray_k"], key=k1)
        uv0, _ = T.project_points(tr.pts_surface[0][None], batch["proj_pose"][0][None],
                                  batch["intr"][None])
        uv1, _ = T.project_points(tr.pts_surface[1][None], batch["proj_pose"][1][None],
                                  batch["intr"][None])
        uv = jnp.stack([uv0[0], uv1[0]], 0)                      # [2,N,2]
        re = L.safe_norm(uv - batch["kp_src"], axis=-1)           # [2,N]
        loss = {}
        loss["reproj_error"] = L.masked_mean(re, batch["kp_mask"])
        sdf_surf = tr.sdf_surf.reshape(2, -1)
        loss["sdf_surf"] = L.masked_mean(jnp.abs(sdf_surf), batch["kp_mask"])

        rc = render_core(params, cfgs, k2, batch["poses"], batch["intr"],
                         batch["images"], batch["grid"],
                         occ=batch.get("occ"))
        loss["eikonal_loss"] = eikonal_from_normals(rc["normals"])
        loss["rgb"] = rc["rgb_loss"]
        loss["DC_Loss"] = rc["DC_loss"]
        metrics = {"PSNR": rc["PSNR"]}
        return loss, metrics

    def _step_impl(self, state, batch, key):
        def total_fn(params):
            loss, metrics = self._losses(params, batch, key)
            return L.weighted_total(loss, self.weights), (loss, metrics)

        (total, (loss, metrics)), grads = jax.value_and_grad(total_fn, has_aux=True)(
            state["params"])
        params, opt, bad = guarded_update(self._tx, grads, state["opt"],
                                          state["params"])
        metrics.update(loss)
        metrics["all"] = total
        metrics["nonfinite"] = bad
        return {"params": params, "opt": opt}, metrics

    def _run_impl(self, state, batch, key, n_iters: int):
        keys = jax.random.split(key, n_iters)

        def body(st, k):
            st, m = self._step_impl(st, batch, k)
            return st, m

        state, metrics = jax.lax.scan(body, state, keys)
        return state, metrics

    def step(self, state, batch, key):
        return self._step(state, batch, key)

    def run(self, state, batch, key, n_iters=None):
        return chunked_run(self._run, state, batch, key,
                           n_iters or self.max_iter)

    def _triangulate_impl(self, params, batch, key):
        tr = sdf_mod.sphere_tracing(params["sdf"], self.cfgs.sdf,
                                    batch["center_k"], batch["ray_k"], key=key)
        finish = tr.finish_mask.reshape(2, -1)
        return tr.pts_surface, finish

    def triangulate(self, params, batch, key):
        """Final sphere-traced surface points for two-view triangulation
        (host applies the 3-sigma + convergence filter,
        ref `Initialization.py:185-217`)."""
        return self._tri(params, batch, key)


# ============================================================================
# Phase: geoinit — SDF-based triangulation of a newly registered view
# ============================================================================

class GeoInitPhase:
    """New-view triangulation (ref `Registration.py:133-303`).

    batch keys (P = padded pair-observation count, S = #src-view pairs):
      center [2,P,3], ray [2,P,3]   — row0: rays from the NEW camera,
                                       row1: rays from the source cameras
      kp_src [2,P,2]                — row0: targets in src cam; row1: in new cam
      pose0 [P,3,4]                 — src-cam pose (projects new-cam-traced pts)
      pose1 [P,3,4]                 — new-cam pose (projects src-cam-traced pts)
      seg [P]                       — pair index in [0,S)
      valid [P]                     — padding mask
      mask_new [P]                  — new-cam keypoint has no 3D point yet
      xyz_target [P,3], has_target [P] — existing 3D point for tracked kypts
      pts_exists [E,3], pts_mask [E]   — existing point cloud (for sdf/eikonal reg)
      intr [3,3]
    """

    def __init__(self, cfgs: PhaseCfgs, weights: Dict, n_segments: int,
                 lr_sdf=1e-3, lr_sdf_end=1e-3, max_iter=500, reproj_max=15.0,
                 exist_subsample=4096):
        # reference samples 4000 existing points (`Registration.py:258`);
        # gradient calls are chunked to <=2048 points each
        # (sdf.gradient_chunked) to stay under the remote compiler's
        # SIGILL threshold while keeping the full regularizer count
        self.cfgs = cfgs
        self.weights = dict(weights)
        self.max_iter = max_iter
        self.n_segments = n_segments
        self.reproj_max = reproj_max
        self.exist_subsample = exist_subsample
        gamma = optim_mod.decay_gamma(lr_sdf, lr_sdf_end, max_iter)
        self._mk_tx = lambda params: optim_mod.make_phase_optimizer(
            params, {"sdf": "sdf", "rad": "frozen"}, {"sdf": lr_sdf}, gamma)
        self._step = jax.jit(self._step_impl)
        self._run = jax.jit(self._run_impl, static_argnames=("n_iters",))
        self._final = jax.jit(self._final_impl)

    def init_state(self, params):
        tx = self._mk_tx(params)
        self._tx = tx
        return {"params": params, "opt": tx.init(params)}

    def _trace_and_masks(self, params, batch, key):
        cfgs = self.cfgs
        tr = sdf_mod.sphere_tracing(params["sdf"], cfgs.sdf,
                                    batch["center"], batch["ray"], key=key)
        pts = tr.pts_surface                       # [2,P,3]
        finish = tr.finish_mask.reshape(2, -1)     # [2,P]
        uv0, _ = project_points_per(pts[0], batch["pose0"], batch["intr"])
        uv1, _ = project_points_per(pts[1], batch["pose1"], batch["intr"])
        re0 = L.safe_norm(uv0 - batch["kp_src"][0], axis=-1)
        re1 = L.safe_norm(uv1 - batch["kp_src"][1], axis=-1)
        rmax = self.reproj_max
        m0 = finish[0] & (re0 > rmax)
        m1 = finish[1] & (re1 > rmax)
        reject = (m0 & m1) | ((re0 > 2 * rmax) & (re1 > 2 * rmax))
        reject = reject | (re0 > 4 * rmax) | (re1 > 4 * rmax)
        return tr, pts, finish, re0, re1, reject

    def _losses(self, params, batch, key):
        cfgs = self.cfgs
        S = self.n_segments
        k1, k2 = jax.random.split(key)
        tr, pts, finish, re0, re1, reject = self._trace_and_masks(params, batch, k1)
        valid = batch["valid"]
        mask_new = batch["mask_new"] & valid
        seg = batch["seg"]

        # per-pair mean reprojection over accepted NEW observations.
        # segment reductions as one-hot matmuls: S is tiny (<=64), the
        # matmul rides the MXU, and it avoids the scatter path entirely
        seg_onehot = (seg[:, None] == jnp.arange(S)[None, :]).astype(re0.dtype)
        w_re = (mask_new & (~reject)).astype(re0.dtype)
        v_re = (re0 + re1) / 2
        seg_sum = (v_re * w_re) @ seg_onehot
        seg_cnt = w_re @ seg_onehot
        has_re = seg_cnt > 0
        per_seg = jnp.where(has_re, seg_sum / jnp.maximum(seg_cnt, 1.0), 0.0)
        n_frames_re = jnp.sum(has_re)
        reproj = jnp.sum(per_seg) / jnp.maximum(n_frames_re, 1)

        # tracing loss for already-tracked keypoints of the new camera
        w_tr = ((~batch["mask_new"]) & valid & batch["has_target"]).astype(re0.dtype)
        tdist = L.safe_norm(batch["xyz_target"] - pts[0], axis=-1)
        seg_tsum = (tdist * w_tr) @ seg_onehot
        seg_tcnt = w_tr @ seg_onehot
        has_t = seg_tcnt > 0
        per_seg_t = jnp.where(has_t, seg_tsum / jnp.maximum(seg_tcnt, 1.0), 0.0)
        tracing = jnp.sum(per_seg_t) / jnp.maximum(jnp.sum(has_t), 1)

        # sdf-surface + eikonal regularization with existing points
        E = batch["pts_exists"].shape[0]
        n_sub = min(self.exist_subsample, E)
        pick = jax.random.permutation(k2, E)[:n_sub]
        pe = batch["pts_exists"][pick]
        pe_mask = batch["pts_mask"][pick]
        # fused eval: sdf + eikonal normal at the existing points in ONE
        # gather pass (g_exist consumed below)
        sdf_e_full, g_exist = sdf_mod.infer_with_normal_chunked(
            params["sdf"], cfgs.sdf, pe)
        sdf_e = sdf_e_full[..., 0]
        near = (jnp.abs(sdf_e) < cfgs.sdf.sdf_threshold) & pe_mask
        kp_mask2 = jnp.concatenate([valid, valid], 0)
        sdf_abs_sum = (jnp.sum(jnp.abs(sdf_e) * near)
                       + jnp.sum(jnp.abs(tr.sdf_surf) * kp_mask2))
        sdf_cnt = jnp.sum(near) + jnp.sum(kp_mask2)
        sdf_surf = sdf_abs_sum / jnp.maximum(sdf_cnt, 1.0)

        g_samp = sdf_mod.gradient_chunked(params["sdf"], cfgs.sdf, tr.sample_pts)
        gn = jnp.concatenate([L.safe_norm(g_exist, axis=-1),
                              L.safe_norm(g_samp[0], axis=-1)], 0)
        gmask = jnp.concatenate([pe_mask, jnp.ones(g_samp.shape[1], bool)], 0)
        eik = L.masked_mean(jnp.abs(gn - 1.0), gmask)

        loss = {"reproj_error": reproj, "tracing_loss": tracing,
                "sdf_surf": sdf_surf, "eikonal_loss": eik}
        # drop reproj when no frame has accepted observations (ref :267-270)
        loss["reproj_error"] = jnp.where(n_frames_re > 0, loss["reproj_error"], 0.0)
        metrics = {"n_frames_re": n_frames_re}
        return loss, metrics

    def _step_impl(self, state, batch, key):
        def total_fn(params):
            loss, metrics = self._losses(params, batch, key)
            return L.weighted_total(loss, self.weights), (loss, metrics)

        (total, (loss, metrics)), grads = jax.value_and_grad(total_fn, has_aux=True)(
            state["params"])
        params, opt, bad = guarded_update(self._tx, grads, state["opt"],
                                          state["params"])
        metrics.update(loss)
        metrics["all"] = total
        metrics["nonfinite"] = bad
        return {"params": params, "opt": opt}, metrics

    def _run_impl(self, state, batch, key, n_iters: int):
        keys = jax.random.split(key, n_iters)

        def body(st, k):
            return self._step_impl(st, batch, k)

        return jax.lax.scan(body, state, keys)

    def step(self, state, batch, key):
        return self._step(state, batch, key)

    def run(self, state, batch, key, n_iters=None):
        return chunked_run(self._run, state, batch, key,
                           n_iters or self.max_iter)

    def _final_impl(self, params, batch, key):
        """Final trace for host-side point acceptance (ref `:281-302`)."""
        tr, pts, finish, re0, re1, reject = self._trace_and_masks(params, batch, key)
        valid = batch["valid"]
        w_tr = (~batch["mask_new"]) & valid & batch["has_target"]
        tdist = L.safe_norm(batch["xyz_target"] - pts[0], axis=-1)
        return {"pts": pts, "finish": finish, "reject": reject,
                "trace_dist": tdist, "trace_mask": w_tr}

    def final(self, params, batch, key):
        return self._final_impl(params, batch, key)


# ============================================================================
# Phase: neural bundle adjustment
# ============================================================================

class BAPhase:
    """Joint pose + field optimization (ref `BA.py:110-188`).

    params: {"sdf","rad","se3_r" [C,3],"se3_t" [C,3]}; the track points are
    NOT free variables — they are re-projected onto the SDF zero set each
    iteration and carried (ref `BA.py:123-124,182`).

    batch keys:
      xyzs [P,3] (initial; carried in state), pose_idx [P], kp [P,2], valid [P]
      poses_fixed [C,3,4] — old poses for the tracing branch rays
      images [C,HW,3], intr [3,3], grid [HW,2]
      tracing {"center","ray","xyz","mask"} per-camera padded
    """

    def __init__(self, cfgs: PhaseCfgs, weights: Dict, mode: str = "sfm",
                 single_cam: bool = False,
                 lr_sdf=1e-4, lr_sdf_end=5e-5, lr_color=1e-3,
                 lr_pose_r=5e-3, lr_pose_t=1e-2, max_iter=1000):
        assert mode in ("sfm", "sfm_refine", "rad_init")
        self.cfgs = cfgs
        self.weights = dict(weights)
        self.mode = mode
        self.single_cam = single_cam
        self.max_iter = max_iter
        gamma = optim_mod.decay_gamma(lr_sdf, lr_sdf_end, max_iter)
        label_of = {"sdf": "sdf", "rad": "color", "se3_r": "pose_r", "se3_t": "pose_t"}
        if mode == "rad_init":
            label_of["se3_r"] = label_of["se3_t"] = "frozen"
        if mode == "sfm":
            # pure-reprojection BA has NO rendering loss, so the radiance
            # grads are identically zero and Adam's update is exactly 0
            # (m=v=0 under zero grads) — but the moment update still
            # costs a full rad-hash-table read-modify-write per iter.
            # Freezing rad is bit-identical to the reference's optimizer
            # (which includes color params with those same zero grads,
            # `BA.py:66-74`) and drops the dead HBM traffic.
            label_of["rad"] = "frozen"
        self._mk_tx = lambda params: optim_mod.make_phase_optimizer(
            params, label_of,
            {"sdf": lr_sdf, "color": lr_color, "pose_r": lr_pose_r, "pose_t": lr_pose_t},
            gamma)
        self._step = jax.jit(self._step_impl)
        self._run = jax.jit(self._run_impl, static_argnames=("n_iters",))

    def init_state(self, params, xyzs):
        tx = self._mk_tx(params)
        self._tx = tx
        return {"params": params, "opt": tx.init(params), "xyzs": xyzs}

    def _losses(self, params, xyzs, batch, key):
        cfgs = self.cfgs
        thr = cfgs.sdf.finish_threshold
        se3 = jnp.concatenate([params["se3_r"], params["se3_t"]], axis=1)  # [C,6]

        xyzs = pmesh.constrain(xyzs, axis=0)  # track points sharded over mesh
        xyzs_new, normals_value = sdf_mod.get_surface_pts(params["sdf"], cfgs.sdf, xyzs)
        sdfs = sdf_mod.infer_sdf(params["sdf"], cfgs.sdf, xyzs_new)        # [P,1]
        poses_fwd = lie.se3_to_SE3(se3[batch["pose_idx"]])                 # [P,3,4]
        uv, _ = project_points_per(xyzs_new, poses_fwd, batch["intr"])
        r = L.safe_norm(uv - batch["kp"], axis=-1)                         # [P]
        mask_surf = (jnp.abs(sdfs[..., 0]) < 2 * thr) & batch["valid"]
        mask_ok = mask_surf & jnp.isfinite(r)
        robust = 0.5 * (2 * jnp.log(1 + r ** 2 / 4)) + 0.5 * r
        reproj_loss = L.masked_mean(robust, mask_ok)
        reproj_loss = jnp.where(jnp.sum(mask_surf) > 0, reproj_loss, 0.0)
        reproj_metric = L.masked_mean(r, mask_ok)

        loss = {"reproj_error": reproj_loss}
        metrics = {"reproj_px": reproj_metric,
                   "pts3d_ratio": jnp.sum(mask_surf) / jnp.maximum(jnp.sum(batch["valid"]), 1)}

        if self.mode != "sfm":
            pose_input = lie.se3_to_SE3(se3)
            if not self.single_cam:
                pose_input = jax.lax.stop_gradient(pose_input)
            rc = render_core(params, cfgs, key, pose_input, batch["intr"],
                             batch["images"], batch["grid"],
                             tracing=batch["tracing"], occ=batch.get("occ"),
                             dc_trace_frozen=True,
                             cam_mask=batch.get("cam_mask"))
            loss["eikonal_loss"] = eikonal_from_normals(rc["normals"], rc["mask_bg"])
            loss["rgb"] = rc["rgb_loss"]
            loss["DC_Loss"] = rc["DC_loss"]
            loss["sdf_surf"] = L.masked_mean(jnp.abs(sdfs[..., 0]), batch["valid"])
            loss["tracing_loss"] = rc["tracing_loss"]
            metrics["PSNR"] = rc["PSNR"]
        else:
            loss["sdf_surf"] = L.masked_mean(jnp.abs(sdfs[..., 0]), batch["valid"])
            loss["eikonal_loss"] = L.masked_mean(
                jnp.abs(normals_value[..., 0] - 1.0), batch["valid"])
        return loss, metrics, xyzs_new

    def _step_impl(self, state, batch, key):
        def total_fn(params):
            loss, metrics, xyzs_new = self._losses(params, state["xyzs"], batch, key)
            # dynamic reprojection weight flip (ref `BA.py:164-167`)
            w = dict(self.weights)
            w_re = jnp.where(metrics["reproj_px"] > 10.0, 1.0, 0.0)
            total = L.weighted_total(
                {k: v for k, v in loss.items() if k != "reproj_error"}, w)
            total = total + 10.0 ** w_re * loss["reproj_error"]
            return total, (loss, metrics, xyzs_new)

        (total, (loss, metrics, xyzs_new)), grads = jax.value_and_grad(
            total_fn, has_aux=True)(state["params"])
        params, opt, bad = guarded_update(self._tx, grads, state["opt"],
                                          state["params"])
        metrics.update(loss)
        metrics["all"] = total
        metrics["nonfinite"] = bad
        # carried surface-projected points: never let a non-finite
        # projection poison the carry (the guard above protects params,
        # this protects state)
        xyzs_new = jax.lax.stop_gradient(xyzs_new)
        fin = jnp.all(jnp.isfinite(xyzs_new), axis=-1, keepdims=True)
        xyzs_new = jnp.where(fin, xyzs_new, state["xyzs"])
        new_state = {"params": params, "opt": opt, "xyzs": xyzs_new}
        return new_state, metrics

    def _run_impl(self, state, batch, key, n_iters: int):
        keys = jax.random.split(key, n_iters)

        def body(st, k):
            return self._step_impl(st, batch, k)

        return jax.lax.scan(body, state, keys)

    def step(self, state, batch, key):
        return self._step(state, batch, key)

    def run(self, state, batch, key, n_iters=None):
        return chunked_run(self._run, state, batch, key,
                           n_iters or self.max_iter)


# ============================================================================
# Phase: rendering refine
# ============================================================================

class RefinePhase:
    """Freeze poses, optimize fields on rendering losses
    (ref `rendering_refine.py:73-121`).

    batch keys: poses [C,3,4], intr, images [C,HW,3], grid, tracing{...}.
    """

    def __init__(self, cfgs: PhaseCfgs, weights: Dict,
                 lr_sdf=1e-3, lr_sdf_end=5e-4, lr_color=1e-3, max_iter=500):
        self.cfgs = cfgs
        self.weights = dict(weights)
        self.max_iter = max_iter
        gamma = optim_mod.decay_gamma(lr_sdf, lr_sdf_end, max_iter)
        self._mk_tx = lambda params: optim_mod.make_phase_optimizer(
            params, {"sdf": "sdf", "rad": "color"},
            {"sdf": lr_sdf, "color": lr_color}, gamma)
        self._step = jax.jit(self._step_impl)
        self._run = jax.jit(self._run_impl, static_argnames=("n_iters",))

    def init_state(self, params):
        tx = self._mk_tx(params)
        self._tx = tx
        return {"params": params, "opt": tx.init(params)}

    def _losses(self, params, batch, key):
        rc = render_core(params, self.cfgs, key, batch["poses"], batch["intr"],
                         batch["images"], batch["grid"],
                         tracing=batch["tracing"], occ=batch.get("occ"),
                         cam_mask=batch.get("cam_mask"))
        loss = {
            "eikonal_loss": eikonal_from_normals(rc["normals"], rc["ray_real"]),
            "rgb": rc["rgb_loss"],
            "DC_Loss": rc["DC_loss"],
            "tracing_loss": rc["tracing_loss"],
            # refine's sdf_surf acts on the traced keypoints' sdf (ref
            # `Camera.py:485-486` + `rendering_refine.py:106`)
            "sdf_surf": L.masked_mean(jnp.abs(rc["sdfs_traced"]), rc["tmask"]),
        }
        return loss, {"PSNR": rc["PSNR"]}

    def _step_impl(self, state, batch, key):
        def total_fn(params):
            loss, metrics = self._losses(params, batch, key)
            return L.weighted_total(loss, self.weights), (loss, metrics)

        (total, (loss, metrics)), grads = jax.value_and_grad(total_fn, has_aux=True)(
            state["params"])
        params, opt, bad = guarded_update(self._tx, grads, state["opt"],
                                          state["params"])
        metrics.update(loss)
        metrics["all"] = total
        metrics["nonfinite"] = bad
        return {"params": params, "opt": opt}, metrics

    def _run_impl(self, state, batch, key, n_iters: int):
        keys = jax.random.split(key, n_iters)

        def body(st, k):
            return self._step_impl(st, batch, k)

        return jax.lax.scan(body, state, keys)

    def step(self, state, batch, key):
        return self._step(state, batch, key)

    def run(self, state, batch, key, n_iters=None):
        return chunked_run(self._run, state, batch, key,
                           n_iters or self.max_iter)
