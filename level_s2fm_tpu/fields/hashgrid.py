"""Multiresolution hash-grid encoding (instant-NGP style) in JAX.

TPU-native replacement for the reference's tiny-cuda-nn `tcnn.Encoding`
(`models/base.py:12-40`, SURVEY.md §2.3). Implemented with jnp gathers and
trilinear interpolation so JAX autodiff provides:
  * grads w.r.t. the feature tables (scatter-add, automatic),
  * grads w.r.t. the input positions (needed for SDF normals), and
  * second-order grads (eikonal-through-BA double backward) for free.
The gather itself stays in XLA: Mosaic (Pallas-TPU) cannot lower
large-table vector gathers ("Cannot do int indexing on TPU", verified on
the chip), and XLA's gather already runs at the measured hardware floor
(~840M gathers/s on v5e).

Hash-grid hyperparameters follow the reference config
(`options/config_hash_sdf.json`: L=16, F=2, T=2^19, N_min=16) with the
derived per-level scale b = exp(ln(2048*scale/N_min)/(L-1))
(`models/base.py:128-139`).
"""
from __future__ import annotations

import contextlib
import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# tcnn-compatible hashing primes (public constants of the NGP paper)
_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 1.38
    include_input: bool = True
    # 'bfloat16' halves the gather payload (+20% measured on TPU); the
    # master table stays f32 (cast before the gather, features cast back)
    compute_dtype: str = "float32"
    # Gather x-adjacent corner pairs of the DENSE levels as one 2-row
    # slice (4 paired gathers instead of 8 row gathers). Dense levels use
    # x-fastest row-major indexing, so corners (x,y,z)/(x+1,y,z) are
    # consecutive table rows; gather cost on TPU is per-row, so this
    # halves the gathered row count for the dense prefix of the pyramid
    # (~1/3 of all rows at the reference config). Off by default until
    # measured on chip (bench.py --microgather A/Bs it).
    paired_dense: bool = False

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def n_dense_levels(self) -> int:
        """Static count of the dense prefix: levels whose full corner grid
        fits in the table (resolutions are monotonically increasing)."""
        res = self.resolutions().astype(np.int64)
        return int(np.sum((res + 1) ** 3 <= self.table_size))

    @property
    def out_dim(self) -> int:
        d = self.n_levels * self.n_features_per_level
        if self.include_input:
            d += 3
        return d

    def resolutions(self) -> np.ndarray:
        ls = np.arange(self.n_levels)
        return np.floor(self.base_resolution * self.per_level_scale ** ls).astype(np.int32)


def config_from_opt(opt, bound_extent: Optional[float] = None) -> HashGridConfig:
    """Derive the per-level scale the way the reference does
    (`models/base.py:128-139`)."""
    hc = opt.SDF.Hash_config
    L = hc.get("n_levels", 16)
    F = hc.get("n_features_per_level", 2)
    log2_T = hc.get("log2_hashmap_size", 19)
    N_min = hc.get("base_resolution", 16)
    if bound_extent is None:
        bound_extent = float(opt.data.bound_max[0] - opt.data.bound_min[0])
    scale = bound_extent / 2
    b = float(np.exp(np.log(2048 * scale / N_min) / (L - 1)))
    return HashGridConfig(n_levels=L, n_features_per_level=F,
                          log2_hashmap_size=log2_T, base_resolution=N_min,
                          per_level_scale=b,
                          compute_dtype=str(hc.get("compute_dtype", "float32")),
                          paired_dense=bool(hc.get("paired_dense", False)))


def init_table(key, cfg: HashGridConfig, dtype=jnp.float32) -> jnp.ndarray:
    """[L, T, F] feature table; uniform(-1e-4, 1e-4) like tcnn's default."""
    shape = (cfg.n_levels, cfg.table_size, cfg.n_features_per_level)
    return jax.random.uniform(key, shape, dtype, minval=-1e-4, maxval=1e-4)


def _level_indices(grid_int: jnp.ndarray, res: jnp.ndarray,
                   dense_fits: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """Map integer corner coords [..., 3] (per level) to table indices.

    Uses dense row-major indexing when the level's grid fits in the table
    (``dense_fits`` is a static per-level bool from numpy), spatial hashing
    otherwise (tcnn semantics).
    """
    res1 = res + 1  # corners per side
    x, y, z = grid_int[..., 0], grid_int[..., 1], grid_int[..., 2]
    dense_idx = (x + res1 * (y + res1 * z)).astype(jnp.uint32)
    hashed = (x.astype(jnp.uint32) * np.uint32(_PRIMES[0])
              ^ y.astype(jnp.uint32) * np.uint32(_PRIMES[1])
              ^ z.astype(jnp.uint32) * np.uint32(_PRIMES[2]))
    hashed = hashed % np.uint32(table_size)
    return jnp.where(dense_fits, dense_idx % np.uint32(table_size), hashed).astype(jnp.int32)


#: Trace-time gather-row accounting for the bench's roofline metric.
#: Shapes are static under jit, so incrementing at TRACE time counts the
#: table rows each compiled program gathers per execution. ``fwd`` counts
#: primal gather rows; ``tangent`` counts tangent-gather rows — whose
#: transpose is exactly the backward table-cotangent scatter, so it
#: doubles as the scatter-row count. Enable by assigning a dict
#: ({"fwd": 0, "tangent": 0}), then trace (e.g. ``jit(f).lower(...)``).
TRACE_ROWS = None

#: Stack of semantic call-site labels (see ``trace_site``). When non-empty
#: at trace time, rows are ALSO accumulated under "<site>:<kind>" keys so
#: the bench can attribute the roofline between march / re-eval / sampling
#: / render-eval / BA-surface consumers.
#: NB: module-global mutable stack, like TRACE_ROWS — tracing is assumed
#: single-threaded (true for the bench and CLI). Concurrent traces in one
#: process would interleave labels; impact is limited to misattributed
#: bench rows (trace-time diagnostics only, never compiled execution).
TRACE_SITE = []


@contextlib.contextmanager
def trace_site(name: str):
    """Label encode calls traced inside this context for TRACE_ROWS
    attribution. Trace-time only — a no-op for compiled execution."""
    TRACE_SITE.append(name)
    try:
        yield
    finally:
        TRACE_SITE.pop()


def _count_rows(kind: str, n: int):
    if TRACE_ROWS is not None:
        TRACE_ROWS[kind] = TRACE_ROWS.get(kind, 0) + int(n)
        if TRACE_SITE:
            k = f"{TRACE_SITE[-1]}:{kind}"
            TRACE_ROWS[k] = TRACE_ROWS.get(k, 0) + int(n)


@functools.partial(jax.custom_jvp, nondiff_argnums=(2,))
def _table_gather(flat: jnp.ndarray, gi: jnp.ndarray, bf16: bool) -> jnp.ndarray:
    """Table-row gather with a lane-packed differentiation path.

    The PRIMAL is a plain row gather on [M, F] (the fastest forward form on
    TPU). The TANGENT is expressed as a scalar gather from the 1-D
    flattened table: its transpose — the table-cotangent accumulation that
    dominates every training step — then lowers to a scalar scatter-add
    into a flat [M*F] buffer instead of a row scatter into [M, F]. XLA
    lays out an [8.4M, 2] scatter target with the minor dim padded to the
    128-lane tile, so the row-scatter form wastes ~64x the write
    bandwidth; the flat form is lane-dense. Measured on the v5e: encode
    fwd+bwd at 65k points drops 79 -> 33 ms/iter with identical numerics.

    Using custom_jvp (not custom_vjp) keeps every AD order composable:
    reverse-over-reverse (the eikonal-in-BA double backward) transposes
    the scatter back into a flat gather.

    bf16=True additionally casts the table to bf16 *before* the primal
    gather so the HBM read is half-width, while the tangent/cotangent path
    stays f32: thousands of ray samples land in the same coarse-level
    cell, and accumulating that many contributions at bf16's 8-bit
    mantissa swamps small updates — measured to destabilize init-phase
    training into NaN. Standard mixed-precision recipe (low-precision
    reads, full-precision accumulation)."""
    src = flat.astype(jnp.bfloat16) if bf16 else flat
    _count_rows("fwd", gi.size)
    return src[gi].astype(flat.dtype)


@_table_gather.defjvp
def _table_gather_jvp(bf16, primals, tangents):
    flat, gi = primals
    dflat, _ = tangents
    out = _table_gather(flat, gi, bf16)
    F = flat.shape[1]
    gidx = gi[:, None] * F + jnp.arange(F, dtype=gi.dtype)[None, :]
    _count_rows("tangent", gi.size)
    dout = dflat.reshape(-1)[gidx]
    return out, dout


@functools.partial(jax.custom_jvp, nondiff_argnums=(2,))
def _table_gather_pair(flat: jnp.ndarray, gi: jnp.ndarray, bf16: bool) -> jnp.ndarray:
    """Gather CONSECUTIVE row pairs [gi, gi+1] from the [M, F] table in one
    XLA gather (slice_sizes=(2, F)) — half the gathered rows of the plain
    row gather for the same feature payload. Same lane-packed tangent
    trick as ``_table_gather``: the tangent is a scalar gather of 2F
    consecutive elements from the 1-D flattened table, so its transpose
    (the table-cotangent scatter) is a flat, lane-dense scatter-add of
    2F-contiguous runs. Returns [n, 2, F]."""
    src = flat.astype(jnp.bfloat16) if bf16 else flat
    F = flat.shape[1]
    _count_rows("fwd", 2 * gi.size)
    out = jax.lax.gather(
        src, gi[:, None],
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0,)),
        slice_sizes=(2, F),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    return out.astype(flat.dtype)


@_table_gather_pair.defjvp
def _table_gather_pair_jvp(bf16, primals, tangents):
    flat, gi = primals
    dflat, _ = tangents
    out = _table_gather_pair(flat, gi, bf16)
    F = flat.shape[1]
    gidx = gi[:, None] * F + jnp.arange(2 * F, dtype=gi.dtype)[None, :]
    _count_rows("tangent", 2 * gi.size)
    dout = dflat.reshape(-1)[gidx].reshape(gi.shape[0], 2, F)
    return out, dout


def _flat_gather(table: jnp.ndarray, idx: jnp.ndarray,
                 cfg: HashGridConfig) -> jnp.ndarray:
    """Gather [L,N,8] per-level indices from the [L,T,F] table as one flat
    1-D gather on [L*T, F]."""
    L, T, F = table.shape
    flat = table.reshape(L * T, F)
    lvl = jnp.arange(L, dtype=jnp.int32)[:, None, None] * T
    gi = (idx + lvl).reshape(-1)
    out = _table_gather(flat, gi, cfg.compute_dtype == "bfloat16")
    return out.reshape(*idx.shape, F).astype(table.dtype)


_OFFSETS8 = tuple((i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1))


def _corner_data(table: jnp.ndarray, x: jnp.ndarray, cfg: HashGridConfig):
    """Gather the 8 trilerp corner features for every level.

    x: [N,3] in [0,1]^3. Returns (feats [L,N,8,F], frac [L,N,3], jac_gate)
    where jac_gate is None on the default path and a {0,1} float mask
    [L,N,3] on the paired-dense path — zero where the position is clamped
    to the grid edge, so the analytic spatial Jacobian matches the default
    path's clamp-to-edge behavior (clipped duplicate corners cancel).
    """
    N = x.shape[0]
    res = jnp.asarray(cfg.resolutions())  # [L]
    pos = x[None, :, :] * res[:, None, None].astype(x.dtype)  # [L,N,3]
    offsets = jnp.asarray(_OFFSETS8, dtype=jnp.int32)  # [8,3]
    nd = cfg.n_dense_levels if cfg.paired_dense else 0

    if nd == 0:
        pos_floor = jnp.floor(pos)
        frac = pos - pos_floor  # [L,N,3]
        base = pos_floor.astype(jnp.int32)
        corners = base[:, :, None, :] + offsets[None, None, :, :]  # [L,N,8,3]
        corners = jnp.clip(corners, 0, (res[:, None, None, None]))
        res_np = cfg.resolutions().astype(np.int64)
        dense_fits = jnp.asarray((res_np + 1) ** 3 <= cfg.table_size)[:, None, None]
        idx = _level_indices(corners, res[:, None, None], dense_fits, cfg.table_size)
        feats = _flat_gather(table, idx, cfg)  # [L,N,8,F]
        return feats, frac, None

    # paired-dense path: dense prefix levels fetch x-adjacent corner pairs
    # (x is the fastest dense axis, so (x,y,z)/(x+1,y,z) are consecutive
    # rows) as 4 two-row slices; hashed tail keeps the row gather.
    L, T, F = table.shape
    flat = table.reshape(L * T, F)
    bf16 = cfg.compute_dtype == "bfloat16"
    fdt = x.dtype

    pos_d = pos[:nd]  # [nd,N,3]
    res_d = res[:nd, None, None]  # [nd,1,1]
    base_d = jnp.clip(jnp.floor(pos_d), 0.0, (res_d - 1).astype(fdt))
    frac_d = jnp.clip(pos_d - base_d, 0.0, 1.0)
    gate_d = ((pos_d >= 0.0) & (pos_d < res_d.astype(fdt))).astype(fdt)
    base_i = base_d.astype(jnp.int32)
    res1 = res_d + 1
    # (y,z) offsets of the 4 pairs, in canonical corner order c = j*2+k
    off4 = jnp.asarray([(j, k) for j in (0, 1) for k in (0, 1)], jnp.int32)
    y4 = base_i[:, :, None, 1] + off4[None, None, :, 0]  # [nd,N,4]
    z4 = base_i[:, :, None, 2] + off4[None, None, :, 1]
    idx0 = base_i[:, :, None, 0] + res1 * (y4 + res1 * z4)  # [nd,N,4]
    lvl_d = jnp.arange(nd, dtype=jnp.int32)[:, None, None] * T
    pair = _table_gather_pair(flat, (idx0 + lvl_d).reshape(-1), bf16)
    pair = pair.reshape(nd, N, 4, 2, F).astype(table.dtype)
    # canonical corner order: c = i*4 + j*2 + k with i the pair axis
    feats_d = jnp.concatenate([pair[:, :, :, 0], pair[:, :, :, 1]], axis=2)

    if nd == L:
        return feats_d, frac_d, gate_d

    pos_h = pos[nd:]
    floor_h = jnp.floor(pos_h)
    frac_h = pos_h - floor_h
    base_h = floor_h.astype(jnp.int32)
    corners = base_h[:, :, None, :] + offsets[None, None, :, :]
    corners = jnp.clip(corners, 0, (res[nd:, None, None, None]))
    idx_h = _level_indices(corners, res[nd:, None, None],
                           jnp.asarray(False), cfg.table_size)  # hashed only
    lvl_h = jnp.arange(nd, L, dtype=jnp.int32)[:, None, None] * T
    gi_h = (idx_h + lvl_h).reshape(-1)
    feats_h = _table_gather(flat, gi_h, bf16)
    feats_h = feats_h.reshape(L - nd, N, 8, F).astype(table.dtype)

    feats = jnp.concatenate([feats_d, feats_h], axis=0)
    frac = jnp.concatenate([frac_d, frac_h], axis=0)
    gate = jnp.concatenate([gate_d, jnp.ones_like(frac_h)], axis=0)
    return feats, frac, gate


def encode(table: jnp.ndarray, x_unit: jnp.ndarray, cfg: HashGridConfig) -> jnp.ndarray:
    """Hash-encode positions.

    table: [L, T, F]; x_unit: [..., 3] in [0,1]^3.
    Returns [..., L*F] trilinear-interpolated features.
    """
    orig_shape = x_unit.shape[:-1]
    x = x_unit.reshape(-1, 3)  # [N,3]
    N = x.shape[0]
    offsets = jnp.asarray(_OFFSETS8, dtype=jnp.int32)  # [8,3]

    feats, frac, _ = _corner_data(table, x, cfg)  # [L,N,8,F], [L,N,3]

    # trilinear weights: w = prod over dims of (1-frac or frac)
    w = jnp.where(offsets[None, None, :, :] == 1, frac[:, :, None, :], 1.0 - frac[:, :, None, :])
    w = w[..., 0] * w[..., 1] * w[..., 2]  # [L,N,8]

    out = jnp.sum(feats * w[..., None], axis=2)  # [L,N,F]
    out = jnp.moveaxis(out, 0, 1).reshape(N, cfg.n_levels * cfg.n_features_per_level)
    return out.reshape(*orig_shape, -1)


def encode_with_grad(table: jnp.ndarray, x_unit: jnp.ndarray,
                     cfg: HashGridConfig):
    """Hash-encode positions AND the analytic spatial Jacobian in one
    gather pass.

    Returns (enc [...,L*F], denc_dx [...,L*F,3]) where denc_dx is the
    derivative w.r.t. x_unit (unit-cube coords). The Jacobian reuses the
    already-gathered corner features — d(trilerp)/dx_j = sum_c feat_c *
    (±prod of the other two dims' weights) * N_l — so SDF normals cost no
    extra memory traffic (the gather dominates the encode, measured ~95%
    of forward time on TPU).
    """
    orig_shape = x_unit.shape[:-1]
    x = x_unit.reshape(-1, 3)
    N = x.shape[0]
    res = jnp.asarray(cfg.resolutions())
    offsets = jnp.asarray(_OFFSETS8, dtype=jnp.int32)  # [8,3]

    feats, frac, gate = _corner_data(table, x, cfg)     # [L,N,8,F], [L,N,3]

    sgn = jnp.where(offsets[None, None, :, :] == 1, 1.0, -1.0)      # [1,1,8,3]
    wd = jnp.where(offsets[None, None, :, :] == 1,
                   frac[:, :, None, :], 1.0 - frac[:, :, None, :])  # [L,N,8,3]
    w = wd[..., 0] * wd[..., 1] * wd[..., 2]                        # [L,N,8]
    enc = jnp.sum(feats * w[..., None], axis=2)                     # [L,N,F]

    # dw/dfrac_j = sgn_j * prod_{k!=j} wd_k ; dfrac/dx_unit = N_l
    others = jnp.stack([wd[..., 1] * wd[..., 2],
                        wd[..., 0] * wd[..., 2],
                        wd[..., 0] * wd[..., 1]], axis=-1)           # [L,N,8,3]
    dscale = res[:, None, None, None].astype(x.dtype)
    if gate is not None:
        # clamp-to-edge: the Jacobian vanishes where the position is
        # clipped (the default path gets this from duplicate corners
        # cancelling; the paired path reads the true neighbor, so gate)
        dscale = dscale * gate[:, :, None, :]
    dw_dx = sgn * others * dscale                                    # [L,N,8,3]
    denc = jnp.einsum("lncf,lncj->lnfj", feats, dw_dx)               # [L,N,F,3]

    enc = jnp.moveaxis(enc, 0, 1).reshape(N, cfg.n_levels * cfg.n_features_per_level)
    denc = jnp.moveaxis(denc, 0, 1).reshape(
        N, cfg.n_levels * cfg.n_features_per_level, 3)
    return (enc.reshape(*orig_shape, -1),
            denc.reshape(*orig_shape, enc.shape[-1], 3))


def embed_with_grad(table: jnp.ndarray, xyz: jnp.ndarray, cfg: HashGridConfig,
                    bound_min, bound_max, rescale: float = 1.0):
    """Like ``embed`` but also returns d(embedding)/d(xyz) [...,D,3]."""
    bound_min = jnp.asarray(bound_min, xyz.dtype)
    bound_max = jnp.asarray(bound_max, xyz.dtype)
    scale = 1.0 / (bound_max - bound_min)
    x_unit = (xyz - bound_min) * scale
    enc, denc_unit = encode_with_grad(table, x_unit, cfg)
    denc = denc_unit * scale  # chain rule through the normalization
    if cfg.include_input:
        enc = jnp.concatenate([xyz / rescale, enc], axis=-1)
        eye = jnp.broadcast_to(jnp.eye(3, dtype=xyz.dtype) / rescale,
                               (*xyz.shape[:-1], 3, 3))
        denc = jnp.concatenate([eye, denc], axis=-2)
    return enc, denc


def embed(table: jnp.ndarray, xyz: jnp.ndarray, cfg: HashGridConfig,
          bound_min, bound_max, rescale: float = 1.0) -> jnp.ndarray:
    """Full embedder: normalize into the AABB, hash-encode, optionally
    prepend raw xyz/rescale (ref `models/base.py:23-40`)."""
    bound_min = jnp.asarray(bound_min, xyz.dtype)
    bound_max = jnp.asarray(bound_max, xyz.dtype)
    x_unit = (xyz - bound_min) / (bound_max - bound_min)
    enc = encode(table, x_unit, cfg)
    if cfg.include_input:
        enc = jnp.concatenate([xyz / rescale, enc], axis=-1)
    return enc
