"""Hash-encoded SDF field + differentiable sphere tracing (functional JAX).

TPU-native re-design of the reference SDF module (`models/SDF.py`):

* ``infer_sdf`` — hash-encode -> geometry MLP -> signed distance, with the
  inside/outside sign convention and optional background-sphere min
  (`models/SDF.py:55-78`).
* ``gradient`` — spatial gradient via jax.grad; second-order safe (the
  reference needs double-backward through tcnn, `models/SDF.py:102-114`;
  here JAX provides it natively through the jnp hash encode).
* ``sphere_tracing`` — the reference's bidirectional fixed-step march
  (`models/SDF.py:116-226`) reshaped for XLA: a fixed-trip-count
  `lax.fori_loop` with per-ray active masks (no data-dependent break), the
  march itself under stop_gradient, then a differentiable re-evaluation of
  the SDF along the stored track: depth = t_min + sum(sdf(track)) exactly
  as `models/SDF.py:206-210`. Deviation: the reference exits early when all
  rays converge (shortening the track); we always run ``iters_max`` steps
  but mask non-executed steps, which matches the reference whenever its
  loop runs to the cap (the common case on real scenes).

Field parameters are a pytree: {"table": [L,T,F], "mlp": {...}, "beta": [1]}.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import hashgrid, mlp
from ..rendering import aabb as aabb_mod


def _safe_r(xyz):
    """|xyz| with a finite gradient at the origin (jnp.linalg.norm's VJP
    is NaN at 0, and an exactly-zero query point — e.g. a padded batch
    slot — would poison the whole gradient even when masked out of the
    loss, because 0 * NaN = NaN)."""
    return jnp.sqrt(jnp.sum(xyz * xyz, axis=-1, keepdims=True) + 1e-12)


@dataclasses.dataclass(frozen=True)
class SDFConfig:
    grid: hashgrid.HashGridConfig
    layers: Tuple[Optional[int], ...] = (None, 64, 16)
    skip: Tuple[int, ...] = ()
    bound_min: Tuple[float, float, float] = (-1.0, -1.0, -1.0)
    bound_max: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    inside: bool = True
    bg_sdf: bool = False
    bg_rad: float = 2.0
    scale_mlp: float = 1.0
    sphere_bias: float = 1.0
    tf_init: bool = True
    rescale: float = 1.0
    beta_init: float = 0.05
    beta_speed: float = 1.0
    sdf_threshold: float = 1e-3
    iters_max: int = 20
    res: int = 100  # `opt.Res` — sphere-trace convergence resolution
    # >0: trace re-eval dedup budget (fraction of iters_max*BN unique
    # track points evaluated; duplicates forward-filled). 0 = reference
    # parity path (every track entry gathered). See _reeval_track_compact.
    reeval_compact: float = 0.0
    # >0: per-step march compaction budget (fraction of BN rays whose SDF
    # is evaluated once fewer than that many remain unconverged; exact
    # full-eval fallback above the budget). 0 = parity (full-batch eval
    # every executed step). See sphere_march.
    march_compact: float = 0.0

    @property
    def feat_dim(self) -> int:
        return self.layers[-1] + 1

    @property
    def center(self):
        return (np.asarray(self.bound_max) + np.asarray(self.bound_min)) / 2

    @property
    def half_size(self):
        return (np.asarray(self.bound_max) - np.asarray(self.bound_min)) / 2

    @property
    def finish_threshold(self) -> float:
        # (bound_max[0]-bound_min[0])/10/Res (ref `models/SDF.py:213-214`)
        return (self.bound_max[0] - self.bound_min[0]) / 10.0 / self.res


def config_from_opt(opt) -> SDFConfig:
    grid = hashgrid.config_from_opt(opt)
    return SDFConfig(
        grid=grid,
        layers=tuple(opt.SDF.arch.layers),
        skip=tuple(opt.SDF.arch.get("skip", ())),
        bound_min=tuple(opt.data.bound_min),
        bound_max=tuple(opt.data.bound_max),
        inside=bool(opt.data.get("inside", True)),
        bg_sdf=bool(opt.data.get("bg_sdf") or False),
        bg_rad=float(opt.data.get("bg_rad", 2.0)),
        scale_mlp=float(opt.SDF.NN_Init.scale_mlp),
        sphere_bias=float(opt.SDF.NN_Init.bias),
        tf_init=bool(opt.SDF.NN_Init.get("tf_init", True)),
        rescale=float(opt.SDF.VolSDF.rescale),
        beta_init=float(opt.SDF.VolSDF.beta_init),
        beta_speed=float(opt.SDF.VolSDF.beta_speed),
        sdf_threshold=float(opt.SDF.VolSDF.sdf_threshold),
        iters_max=int(opt.SDF.VolSDF.iters_max_st),
        res=int(opt.get("Res", 100)),
        reeval_compact=float(opt.SDF.VolSDF.get("reeval_compact", 0.0)),
        march_compact=float(opt.SDF.VolSDF.get("march_compact", 0.0)),
    )


def init_params(key, cfg: SDFConfig):
    k1, k2 = jax.random.split(key)
    table = hashgrid.init_table(k1, cfg.grid)
    input_dim = cfg.grid.out_dim
    mlp_params = mlp.init_geometry_mlp(k2, input_dim, cfg.layers, cfg.skip,
                                       sphere_bias=cfg.sphere_bias, tf_init=cfg.tf_init)
    beta = jnp.asarray([np.log(cfg.beta_init) / cfg.beta_speed], jnp.float32)
    return {"table": table, "mlp": mlp_params, "beta": beta}


# ----------------------------------------------------------------------------- core eval

def infer_feat(params, cfg: SDFConfig, xyz: jnp.ndarray) -> jnp.ndarray:
    enc = hashgrid.embed(params["table"], xyz, cfg.grid,
                         cfg.bound_min, cfg.bound_max, rescale=cfg.rescale)
    return mlp.apply_geometry_mlp(params["mlp"], enc, skip=cfg.skip)


def infer_sdf(params, cfg: SDFConfig, xyz: jnp.ndarray) -> jnp.ndarray:
    """[...,3] -> [...,1] signed distance."""
    feat = infer_feat(params, cfg, xyz)
    if cfg.inside:
        sdf = feat[..., :1] / cfg.scale_mlp
        if cfg.bg_sdf:
            sdf = jnp.minimum(sdf, cfg.bg_rad - _safe_r(xyz))
    else:
        sdf = -feat[..., :1] / cfg.scale_mlp
    return sdf


@functools.partial(jax.jit, static_argnums=(1,))
def _infer_sdf_jit(params, cfg: SDFConfig, xyz: jnp.ndarray) -> jnp.ndarray:
    return infer_sdf(params, cfg, xyz)


def _host_bucket(n: int, base: int = 256) -> int:
    """Smallest bucket >= n from the geometric ladder base*1.5^k (~2.4
    buckets/octave) — bounds padding waste at 50%."""
    m = base
    while m < n:
        m = (m * 3 + 1) // 2
    return m


def infer_sdf_host(params, cfg: SDFConfig, pts: np.ndarray) -> np.ndarray:
    """Jitted, shape-bucketed sdf eval for host-side callers (PnP gating,
    NBV candidate scoring — ref `pipelines/Registration.py:85-88`).

    Host call sites feed data-dependent point counts; evaluating eagerly
    (or jitting per exact shape) pays a fresh remote-TPU compile + one
    dispatch per op every view (~25 s/view measured on chip). Padding N
    up the ~2.4-buckets/octave ladder reuses ONE compiled program per
    bucket across the whole scene.
    """
    pts = np.asarray(pts, np.float32).reshape(-1, 3)
    n = pts.shape[0]
    if n == 0:
        return np.zeros((0,), np.float32)
    m = _host_bucket(n)
    padded = np.zeros((m, 3), np.float32)
    padded[:n] = pts
    out = _infer_sdf_jit(params, cfg, jnp.asarray(padded))
    return np.asarray(out)[:n, 0]


def infer_all(params, cfg: SDFConfig, xyz: jnp.ndarray):
    """Return (sdf [...,1], feat [...,feat_dim]) in one eval."""
    feat = infer_feat(params, cfg, xyz)
    if cfg.inside:
        sdf = feat[..., :1] / cfg.scale_mlp
        if cfg.bg_sdf:
            sdf = jnp.minimum(sdf, cfg.bg_rad - _safe_r(xyz))
    else:
        sdf = -feat[..., :1] / cfg.scale_mlp
    return sdf, feat


def infer_all_with_normal(params, cfg: SDFConfig, xyz: jnp.ndarray):
    """(sdf [...,1], feat [...,D], normal [...,3]) in ONE hash-gather pass.

    The normal is assembled from the encode's analytic spatial Jacobian
    (`hashgrid.embed_with_grad`) chained through a single MLP vjp — this
    replaces the reference's double-backward normals (`models/SDF.py:102-114`)
    with a formulation whose memory traffic is one gather instead of three.
    All ops are plain jnp, so the outer loss can differentiate through it
    (eikonal-in-BA second order works).
    """
    enc, denc = hashgrid.embed_with_grad(params["table"], xyz, cfg.grid,
                                         cfg.bound_min, cfg.bound_max,
                                         rescale=cfg.rescale)
    sign = 1.0 if cfg.inside else -1.0

    def feat_and_sdf(e):
        f = mlp.apply_geometry_mlp(params["mlp"], e, skip=cfg.skip)
        return sign * f[..., :1] / cfg.scale_mlp, f

    (sdf_raw, feat), vjp_fn = jax.vjp(feat_and_sdf, enc, has_aux=False)
    cot = (jnp.ones_like(sdf_raw), jnp.zeros_like(feat))
    dsdf_denc = vjp_fn(cot)[0]                                     # [...,D]
    normal = jnp.einsum("...d,...dj->...j", dsdf_denc, denc)

    sdf = sdf_raw
    if cfg.inside and cfg.bg_sdf:
        r = _safe_r(xyz)
        bg = cfg.bg_rad - r
        take_bg = bg < sdf_raw
        sdf = jnp.where(take_bg, bg, sdf_raw)
        bg_normal = -xyz / jnp.maximum(r, 1e-12)
        normal = jnp.where(take_bg, bg_normal, normal)
    return sdf, feat, normal


def gradient(params, cfg: SDFConfig, xyz: jnp.ndarray) -> jnp.ndarray:
    """Spatial SDF gradient (normals); differentiable again for eikonal-in-BA.

    Uses the fused analytic path (one gather pass; see
    ``infer_all_with_normal``).
    """
    _, _, normal = infer_all_with_normal(params, cfg, xyz)
    return normal


def gradient_chunked(params, cfg: SDFConfig, xyz: jnp.ndarray,
                     chunk: int = 2048) -> jnp.ndarray:
    """``gradient`` over large point sets, split into <=``chunk``-point
    calls inside the same jitted step.

    The remote TPU compiler SIGILLs deterministically on spatial-gradient
    graphs past a few thousand points per gradient call (bisected: 2.8k
    OK, 5.6k crash); chunking via ``lax.map`` keeps each traced gradient
    body at ``chunk`` points while regularizing the reference's full 4096+
    sample count (ref `Registration.py:258`, `models/SDF.py:223`).
    """
    # one chunking implementation: the fused eval's unused sdf output is
    # dead-code-eliminated by XLA, so this is exactly the gradient path
    return infer_with_normal_chunked(params, cfg, xyz, chunk)[1].reshape(
        xyz.shape)


def infer_with_normal_chunked(params, cfg: SDFConfig, xyz: jnp.ndarray,
                              chunk: int = 2048):
    """(sdf [...,1], normal [...,3]) from the fused one-gather eval,
    chunked like ``gradient_chunked`` (same remote-compiler constraint).

    Use where a phase needs BOTH the sdf value and the eikonal normal at
    the same points (e.g. geoinit's existing-point regularizers) — one
    gather pass instead of separate infer_sdf + gradient calls.
    """
    flat = xyz.reshape(-1, 3)
    n = flat.shape[0]

    def one(p):
        s, _, g = infer_all_with_normal(params, cfg, p)
        return s, g

    if n <= chunk:
        s, g = one(flat)
    else:
        pad = (-n) % chunk
        flat_p = jnp.pad(flat, ((0, pad), (0, 0)))
        parts = flat_p.reshape(-1, chunk, 3)
        s, g = jax.lax.map(one, parts)
        s = s.reshape(-1, 1)[:n]
        g = g.reshape(-1, 3)[:n]
    return (s.reshape(*xyz.shape[:-1], 1), g.reshape(*xyz.shape[:-1], 3))


def forward_ab(params, cfg: SDFConfig):
    beta = jnp.exp(params["beta"] * cfg.beta_speed)
    return 1.0 / beta, beta


def sdf_to_sigma(sdf, alpha, beta):
    """Laplace-CDF density (VolSDF; ref `models/SDF.py:84-87`)."""
    e = 0.5 * jnp.exp(-jnp.abs(sdf) / beta)
    psi = jnp.where(sdf >= 0, e, 1 - e)
    return alpha * psi


def get_surface_pts(params, cfg: SDFConfig, pts: jnp.ndarray):
    """Project points to the zero level set along the (unnormalized) normal.

    surf = pts - n * sdf / stop_grad(|n|) (ref `models/SDF.py:95-100`).
    Returns (surf_pts, |n|).

    sdf and normal come from ONE fused eval (`infer_all_with_normal`) —
    one hash-gather pass instead of the two separate infer_sdf + gradient
    calls (the reference detaches the query points for the sdf branch,
    `models/SDF.py:96`; the only caller feeds a non-differentiable carried
    buffer, so evaluating both branches at the detached points is exact).
    """
    pts_d = jax.lax.stop_gradient(pts)
    with hashgrid.trace_site("surface_project"):
        sdf, _, normals = infer_all_with_normal(params, cfg, pts_d)
    nval = jnp.linalg.norm(normals, axis=-1, keepdims=True)
    # clamp the divisor: |n| -> 0 in flat/degenerate field regions would
    # launch the projected point to inf and poison the BA carry; with the
    # clamp the step length stays <= |n|/eps * |sdf| <= |sdf|
    denom = jax.lax.stop_gradient(jnp.maximum(nval, 1e-8))
    surf = pts - normals / denom * sdf
    return surf, nval


# ----------------------------------------------------------------------------- sphere tracing

class SphereTraceResult(NamedTuple):
    d_pred: jnp.ndarray        # [B,N] predicted depth (differentiable)
    sdf_surf: jnp.ndarray      # [B*N] sdf at the last traced point (differentiable)
    sample_pts: jnp.ndarray    # [1,K,3] track subsample + free-space samples (detached)
    finish_mask: jnp.ndarray   # [B*N,1] bool convergence mask
    pts_surface: jnp.ndarray   # [B,N,3] surface points center + d*ray (differentiable)


class SphereMarch(NamedTuple):
    """Detached march state (ref runs the march under no_grad,
    `models/SDF.py:137-200`); feed to ``sphere_reeval`` for the
    differentiable depth."""
    track: jnp.ndarray         # [iters, BN, 3] positions appended per step
    contrib: jnp.ndarray       # [iters] bool — steps that executed
    last_idx: jnp.ndarray      # [] index of the last contributing step
    min_dis: jnp.ndarray       # [BN]
    max_dis: jnp.ndarray       # [BN]
    acc_e: jnp.ndarray         # [BN] backward-march accumulated depth
    valid: jnp.ndarray         # [BN] ray-AABB hit mask


def sphere_march(params, cfg: SDFConfig, ray0: jnp.ndarray,
                 ray_dir: jnp.ndarray) -> SphereMarch:
    """Bidirectional fixed-trip sphere-trace march (detached).

    ray0/ray_dir: [B,N,3] (ray_dir need not be unit; steps are in sdf units
    times the direction, matching the reference which also uses
    unnormalized, intrinsics-scaled rays).
    """
    BN = ray0.shape[0] * ray0.shape[1]
    o = ray0.reshape(BN, 3)
    d = ray_dir.reshape(BN, 3)

    t_near, t_far, valid = aabb_mod.ray_aabb_intersect(
        o, d, jnp.asarray(cfg.center, jnp.float32), jnp.asarray(cfg.half_size, jnp.float32))
    min_dis = t_near
    max_dis = t_far
    thr = cfg.sdf_threshold

    def sdf_at(pts):
        return infer_sdf(params, cfg, pts)[..., 0]

    # per-step active-ray compaction (EXACT; deviation in execution only):
    # converged rays' positions are frozen and their values masked out by
    # the caller's jnp.where, yet the full-batch eval still gathers their
    # L*8 table rows every remaining step. When at most K = march_compact
    # * BN rays are still active, evaluate only those (top_k selection,
    # scatter back; inactive slots get 0, which the caller's mask
    # discards). Above the budget: exact full-batch fallback.
    K_m = max(int(cfg.march_compact * BN), 1) if (
        0.0 < cfg.march_compact < 1.0) else 0

    def sdf_at_active(pts, active):
        if K_m == 0 or K_m >= BN:
            return sdf_at(pts)

        def compact():
            score = active.astype(pts.dtype)
            _, sel = jax.lax.top_k(score, K_m)      # active rays first
            v = sdf_at(pts[sel]) * score[sel]       # zero the fillers
            return jnp.zeros((BN,), pts.dtype).at[sel].set(v)

        return jax.lax.cond(jnp.sum(active) <= K_m, compact,
                            lambda: sdf_at(pts))

    # -------- non-differentiable march (reference runs it under no_grad) ----
    p_detach = jax.lax.stop_gradient
    o_d, d_d = p_detach(o), p_detach(d)

    start0 = o_d + min_dis[:, None] * d_d
    end0 = o_d + max_dis[:, None] * d_d
    nsdf_s0 = p_detach(sdf_at(start0))
    nsdf_e0 = p_detach(sdf_at(end0))

    track0 = jnp.zeros((cfg.iters_max, BN, 3), o.dtype)
    executed0 = jnp.zeros((cfg.iters_max,), bool)

    def body(i, state):
        (acc_s, acc_e, nsdf_s, nsdf_e, unf_s, unf_e, first, track, executed) = state
        curr_s = jnp.where(jnp.abs(nsdf_s) <= thr, 0.0, nsdf_s)
        curr_e = jnp.where(jnp.abs(nsdf_e) <= thr, 0.0, nsdf_e)
        new_unf_s = jnp.where(first, jnp.abs(curr_s) > thr, unf_s & (jnp.abs(curr_s) > thr))
        new_unf_e = jnp.where(first, jnp.abs(curr_e) > thr, unf_e & (jnp.abs(curr_e) > thr))
        step_active = jnp.any(new_unf_s)

        # positions BEFORE the step are what the reference appends to the track
        pts_before = o_d + acc_s[:, None] * d_d
        track = jnp.where(step_active,
                          track.at[i].set(pts_before), track)
        executed = executed.at[i].set(step_active)

        acc_s2 = jnp.minimum(acc_s + curr_s, max_dis)
        acc_e2 = jnp.minimum(acc_e + curr_e, max_dis)
        pts_s = o_d + acc_s2[:, None] * d_d
        pts_e = o_d + acc_e2[:, None] * d_d
        # gate each side's hash-grid eval on "any ray still unfinished":
        # jnp.where would mask the VALUE but still pay the full gather
        # pass every remaining iteration; lax.cond skips the eval outright
        # once a side converges (the backward march typically converges
        # in a few steps). Numerics identical — the skipped values were
        # fully masked anyway.
        nsdf_s2 = jax.lax.cond(
            jnp.any(new_unf_s),
            lambda: jnp.where(new_unf_s,
                              p_detach(sdf_at_active(pts_s, new_unf_s)),
                              nsdf_s),
            lambda: nsdf_s)
        nsdf_e2 = jax.lax.cond(
            jnp.any(new_unf_e),
            lambda: jnp.where(new_unf_e,
                              p_detach(sdf_at_active(pts_e, new_unf_e)),
                              nsdf_e),
            lambda: nsdf_e)
        order_ok = acc_s2 < acc_e2
        new_unf_s2 = new_unf_s & order_ok
        new_unf_e2 = new_unf_e & order_ok

        # where the step did not run (all converged), keep the old state
        keep = lambda new, old: jnp.where(step_active, new, old)
        return (keep(acc_s2, acc_s), keep(acc_e2, acc_e),
                keep(nsdf_s2, nsdf_s), keep(nsdf_e2, nsdf_e),
                keep(new_unf_s2, new_unf_s), keep(new_unf_e2, new_unf_e),
                jnp.asarray(False), track, executed)

    init_state = (min_dis, max_dis, nsdf_s0, nsdf_e0,
                  jnp.ones((BN,), bool), jnp.ones((BN,), bool),
                  jnp.asarray(True), track0, executed0)
    (acc_s, acc_e, _, _, _, _, _, track, executed) = jax.lax.fori_loop(
        0, cfg.iters_max, body, init_state)

    # if no step executed at all, the track is just the entry points
    track = track.at[0].set(jnp.where(executed[0], track[0], start0))
    contrib = executed.at[0].set(True)  # entry point always contributes
    last_idx = jnp.maximum(jnp.max(jnp.where(contrib, jnp.arange(cfg.iters_max), 0)), 0)
    return SphereMarch(track=p_detach(track), contrib=contrib,
                       last_idx=last_idx, min_dis=p_detach(min_dis),
                       max_dis=p_detach(max_dis), acc_e=p_detach(acc_e),
                       valid=valid)


def march_slice(m: SphereMarch, lo: int, hi) -> SphereMarch:
    """Slice a march over its ray axis (for branch-specific re-eval of a
    combined-batch march). ``contrib``/``last_idx`` stay global: with a
    combined batch a step executes when ANY ray is unfinished, exactly as
    a single bigger batch would in the reference's loop."""
    return SphereMarch(track=m.track[:, lo:hi], contrib=m.contrib,
                       last_idx=m.last_idx, min_dis=m.min_dis[lo:hi],
                       max_dis=m.max_dis[lo:hi], acc_e=m.acc_e[lo:hi],
                       valid=m.valid[lo:hi])


def _reeval_track_compact(params, cfg: SDFConfig, m: SphereMarch,
                          frac: float) -> jnp.ndarray:
    """Deduplicated differentiable track re-eval (EXACT, deviation in
    execution only — same points, same sum as the parity path).

    A threshold-converged ray's step size is 0 from convergence on, so
    its track tail repeats one point bitwise; the parity re-eval
    (`infer_sdf(m.track)`) still gathers L*8 table rows for every
    repeat — measured 67% of trace-path rows, most of them duplicates.
    Here only FIRST occurrences are evaluated (compacted to a static
    budget ``K = frac * iters_max * BN`` via top_k) and the tail is
    forward-filled from each ray's last unique value, which reproduces
    the parity sum exactly (duplicate entries contribute the same value)
    and routes (n_dups+1)x the gradient through the one evaluated point,
    exactly as n_dups+1 separate evaluations would. When a batch has
    more unique points than the budget (pathological: nothing
    converges), lax.cond falls back to the full parity eval — never an
    approximation. Default OFF (cfg.reeval_compact = 0).

    Exactness assumption (ADVICE r4): duplicate track rows only occur as
    frozen TAILS — true by construction of the march (a converged ray's
    accumulator stops moving and every later step repeats its final
    point bitwise; step sizes >= sdf_threshold in acc units dwarf f32
    ulp at scene scale, so a still-active ray cannot produce a bitwise-
    equal row mid-track and then move again). A hypothetical mid-track
    duplicate would get uniq=False with a later re-activation that
    compact() would forward-fill from the wrong source. The n_uniq<=K
    fallback does not guard this case; the march structure does."""
    E, BN = m.track.shape[0], m.track.shape[1]
    tr = m.track
    same = jnp.all(tr[1:] == tr[:-1], axis=-1)                 # [E-1,BN]
    uniq = jnp.concatenate([jnp.ones((1, BN), bool), ~same], axis=0)
    uniq = uniq & m.contrib[:, None]
    n_uniq = jnp.sum(uniq)
    K = max(min(int(frac * E * BN), E * BN), 1)

    idxs = jnp.arange(E, dtype=jnp.int32)[:, None]
    # last unique step per ray (step 0 is always unique+contributing)
    k_last = jnp.max(jnp.where(uniq, idxs, -1), axis=0)        # [BN]

    def compact():
        score = uniq.reshape(-1).astype(jnp.float32)
        _, sel = jax.lax.top_k(score, K)                       # unique first
        pts = tr.reshape(E * BN, 3)[sel]
        v = infer_sdf(params, cfg, pts)[..., 0] * score[sel]   # zero fillers
        vals = jnp.zeros(E * BN, v.dtype).at[sel].set(v).reshape(E, BN)
        last_vals = jnp.take_along_axis(vals, k_last[None, :], axis=0)
        return jnp.where(idxs <= k_last[None, :], vals, last_vals)

    def full():
        return infer_sdf(params, cfg, tr)[..., 0]

    return jax.lax.cond(n_uniq <= K, compact, full)


def sphere_reeval(params, cfg: SDFConfig, m: SphereMarch,
                  ray0: jnp.ndarray, ray_dir: jnp.ndarray):
    """Differentiable re-evaluation of the SDF along a stored march track:
    depth = t_min + sum(sdf(track)) exactly as `models/SDF.py:206-210`.

    Returns (d_pred [B,N], sdf_surf [BN], finish_mask [BN,1],
    pts_surface [B,N,3]). Pass ``jax.lax.stop_gradient``-ed params to get
    the trace value without the table/MLP backward (frozen-trace DC in
    BA, sanctioned because the reference detaches the march itself).
    """
    B, N = ray0.shape[0], ray0.shape[1]
    p_detach = jax.lax.stop_gradient
    if 0.0 < cfg.reeval_compact < 1.0:
        sdf_tracks = _reeval_track_compact(params, cfg, m,
                                           cfg.reeval_compact)  # [iters, BN]
    else:
        sdf_tracks = infer_sdf(params, cfg, m.track)[..., 0]     # [iters, BN]
    sdf_sum = jnp.sum(sdf_tracks * m.contrib[:, None], axis=0)   # [BN]
    d_pred = sdf_sum + m.min_dis
    d_pred = jnp.minimum(d_pred, m.max_dis)
    sdf_last = sdf_tracks[m.last_idx]                            # [BN]
    finish_mask = (jnp.abs(p_detach(sdf_last)) < cfg.finish_threshold)[:, None]
    finish_mask = finish_mask & m.valid[:, None]
    pts_surface = (ray0 + ray_dir * d_pred.reshape(B, N)[..., None])
    return d_pred.reshape(B, N), sdf_last, finish_mask, pts_surface


def march_samples(m: SphereMarch, ray0, ray_dir, key,
                  track_subsample: int = 4096,
                  max_sample_pts: Optional[int] = 4096) -> jnp.ndarray:
    """Free-space + track sample points for eikonal regularization
    (detached; ref `models/SDF.py:216-225`). Returns [1,K,3]."""
    BN = m.min_dis.shape[0]
    p_detach = jax.lax.stop_gradient
    o_d = p_detach(ray0.reshape(BN, 3))
    d_d = p_detach(ray_dir.reshape(BN, 3))
    k1, k2, k3 = jax.random.split(key, 3)
    factor_rand = jax.random.uniform(k1, (BN,))
    d_up = jnp.minimum(1.5 * m.acc_e, m.max_dis)
    d_sample = (1 - factor_rand) * d_up + factor_rand * m.min_dis
    free_pts = o_d + d_sample[:, None] * d_d                     # [BN,3]
    n_pick = min(track_subsample, BN)
    pick = jax.random.permutation(k2, BN)[:n_pick]
    track_pick = jnp.swapaxes(m.track, 0, 1)[pick].reshape(-1, 3)
    sample_pts = jnp.concatenate([track_pick, free_pts], axis=0)
    if max_sample_pts is not None and sample_pts.shape[0] > max_sample_pts:
        # random regularizer subsample (the reference caps at 4096 rays,
        # `models/SDF.py:223`). Downstream gradient() calls chunk to
        # <=2048 points per call (see ``gradient_chunked``) to stay under
        # the remote compiler's SIGILL threshold.
        pick2 = jax.random.permutation(k3, sample_pts.shape[0])[:max_sample_pts]
        sample_pts = sample_pts[pick2]
    return p_detach(sample_pts[None])


def sphere_tracing(params, cfg: SDFConfig, ray0: jnp.ndarray, ray_dir: jnp.ndarray,
                   key: Optional[jax.Array] = None,
                   track_subsample: int = 4096,
                   max_sample_pts: Optional[int] = 4096,
                   reeval_params=None) -> SphereTraceResult:
    """Bidirectional sphere tracing: march + differentiable re-eval.

    ``reeval_params`` overrides the parameters used for the differentiable
    track re-evaluation (e.g. pass stop_gradient-ed params for a
    value-only trace).
    """
    with hashgrid.trace_site("march"):
        m = sphere_march(params, cfg, ray0, ray_dir)
    with hashgrid.trace_site("trace_reeval"):
        d_pred, sdf_last, finish_mask, pts_surface = sphere_reeval(
            reeval_params if reeval_params is not None else params,
            cfg, m, ray0, ray_dir)
    if key is None:
        key = jax.random.PRNGKey(0)
    sample_pts = march_samples(m, ray0, ray_dir, key,
                               track_subsample, max_sample_pts)
    return SphereTraceResult(d_pred=d_pred, sdf_surf=sdf_last,
                             sample_pts=sample_pts,
                             finish_mask=finish_mask, pts_surface=pts_surface)
