"""Pallas TPU kernels for the front-end hot path.

1. Packed-Hamming distance matrix — the framework's most-executed op
   (every SearchBy* variant reduces over it — ops/hamming.py).  The XLA
   lowering materializes the (Na, Nb, 8) XOR tensor in HBM; this kernel
   tiles the computation through VMEM so each (128, 128) output tile reads
   its two descriptor blocks once and keeps the XOR/popcount intermediate
   on-chip.

2. Fused FAST-9 corner score + 3x3 NMS — the detector half of
   ORBextractor::ComputeKeyPointsOctTree (src/ORBextractor.cc:≈790).  The
   XLA path builds 16 shifted difference maps + 2x16 rolling window-mins +
   a reduce_window NMS, each a full-image HBM round trip when fusion
   breaks; this kernel streams row strips through VMEM and does the whole
   detector (diffs, arc mins, score, NMS with raster tie-break) in one
   pass: the image is read once, the suppressed score map written once.

Used automatically on TPU; callers fall back to XLA paths elsewhere
(CPU tests, odd shapes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _hamming_kernel(a_ref, bt_ref, out_ref):
    # a_ref: (TILE, 8) u32; bt_ref: (8, TILE) u32; out: (TILE, TILE) i32.
    # The 8 descriptor words are unrolled so every VPU op is a full
    # (TILE, TILE) tile — a (TILE, 8) broadcast would use 8 of 128 lanes.
    acc = jnp.zeros((TILE, TILE), jnp.int32)
    for k in range(8):
        x = jnp.bitwise_xor(a_ref[:, k][:, None], bt_ref[k, :][None, :])
        acc = acc + jax.lax.population_count(x).astype(jnp.int32)
    out_ref[:] = acc


@jax.jit
def hamming_matrix_pallas(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """(Na, 8) x (Nb, 8) uint32 -> (Na, Nb) int32, tiled through VMEM.

    Requires Na, Nb to be multiples of 128 (the caller pads).
    """
    na, nb = desc_a.shape[0], desc_b.shape[0]
    desc_bt = desc_b.T  # (8, Nb): lane dim = candidate index
    grid = (na // TILE, nb // TILE)
    return pl.pallas_call(
        _hamming_kernel,
        out_shape=jax.ShapeDtypeStruct((na, nb), jnp.int32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (TILE, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (8, TILE), lambda i, j: (0, j), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (TILE, TILE), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=na * nb * 16,
            bytes_accessed=(na * 8 + nb * 8) * 4 * (na // TILE) + na * nb * 4,
            transcendentals=0,
        ),
    )(desc_a, desc_bt)


# ---------------------------------------------------------------------------
# Fused FAST-9 score + 3x3 NMS
# ---------------------------------------------------------------------------

# Bresenham circle offsets, duplicated from ops/fast.py (kept static here so
# the kernel has no runtime dependency on that module's arrays).
_CIRCLE = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3),
    (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3),
    (0, -3), (-1, -3), (-2, -2), (-3, -1),
)
_ARC = 9
_HALO = 4          # 3 px circle radius + 1 px NMS ring
_STRIP = 32        # output rows per grid step


def _fast_nms_kernel(img_ref, out_ref, *, h: int, w: int):
    """One row strip: img (1, STRIP + 2*HALO, Wp) -> out (1, STRIP, Wp)."""
    strip = pl.program_id(0)
    img = img_ref[0]                     # (S + 8, Wp) float32
    S = _STRIP
    Wp = img.shape[1]

    # Column-rolled copies of the strip (lane shifts); row offsets become
    # static slices below.  Wrap-around columns land in the zero padding /
    # outside the interior mask.
    rolled = {}
    for dx in {-3, -2, -1, 0, 1, 2, 3}:
        rolled[dx] = pltpu.roll(img, (-dx) % Wp, axis=1) if dx else img

    # Scores for rows [HALO-1, HALO-1 + S+2): the strip's S output rows plus
    # the one-row NMS ring above and below.
    r0 = _HALO - 1                       # = 3: circle halo satisfied
    center = img[r0:r0 + S + 2, :]
    diffs = [
        rolled[dx][r0 + dy:r0 + dy + S + 2, :] - center
        for dy, dx in _CIRCLE
    ]

    # min over each circular 9-window (log-depth tree, fully unrolled).
    def window_min(maps):
        n = len(maps)
        m2 = [jnp.minimum(maps[s], maps[(s + 1) % n]) for s in range(n)]
        m4 = [jnp.minimum(m2[s], m2[(s + 2) % n]) for s in range(n)]
        m8 = [jnp.minimum(m4[s], m4[(s + 4) % n]) for s in range(n)]
        return [jnp.minimum(m8[s], maps[(s + 8) % n]) for s in range(n)]

    bright = window_min(diffs)
    dark = window_min([-d for d in diffs])
    score = bright[0]
    for s in range(16):
        score = jnp.maximum(score, bright[s])
        score = jnp.maximum(score, dark[s])
    score = jnp.maximum(score, 0.0)      # (S + 2, Wp)

    # Interior mask in GLOBAL image coordinates (3-px circle border).
    gy = (
        jax.lax.broadcasted_iota(jnp.int32, (S + 2, Wp), 0)
        + strip * S + _HALO - 1 - _HALO  # global row of score row 0
    )
    gx = jax.lax.broadcasted_iota(jnp.int32, (S + 2, Wp), 1) - _HALO
    interior = (gy >= 3) & (gy < h - 3) & (gx >= 3) & (gx < w - 3)
    score = jnp.where(interior, score, 0.0)

    # 3x3 NMS with raster-order tie-break: keep pixel p iff for every
    # neighbor n: score > n (strict) when n precedes p in raster order,
    # score >= n when n follows — i.e. p is the first raster-order maximum
    # of its window (matches ops/fast.nms3x3).
    s_mid = score[1:1 + S, :]            # (S, Wp) the strip's output rows
    keep = jnp.ones(s_mid.shape, bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            n = (pltpu.roll(score, (-dx) % Wp, axis=1) if dx else score)[
                1 + dy:1 + dy + S, :]
            precedes = (dy < 0) or (dy == 0 and dx < 0)
            keep = keep & ((s_mid > n) if precedes else (s_mid >= n))
    out_ref[0] = jnp.where(keep, s_mid, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fast_score_nms_pallas(image: jnp.ndarray, interpret: bool = False):
    """Dense FAST-9 score with 3x3 NMS applied, one fused VMEM pass.

    Matches ops/fast.nms3x3(ops/fast.fast_score(image)) (same score
    semantics: max threshold with a surviving 9-arc; raster tie-break).
    """
    h, w = image.shape
    S = _STRIP
    n_strips = -(-h // S)
    hp = n_strips * S + 2 * _HALO
    wp = -(-(w + 2 * _HALO) // 128) * 128
    img = jnp.zeros((hp, wp), jnp.float32)
    img = jax.lax.dynamic_update_slice(
        img, image.astype(jnp.float32), (_HALO, _HALO)
    )
    # Overlapping strips materialized once: (n_strips, S + 2*HALO, wp).
    strips = jnp.stack(
        [jax.lax.dynamic_slice(img, (i * S, 0), (S + 2 * _HALO, wp))
         for i in range(n_strips)]
    )
    out = pl.pallas_call(
        functools.partial(_fast_nms_kernel, h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((n_strips, S, wp), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(n_strips,),
            in_specs=[
                pl.BlockSpec(
                    (1, S + 2 * _HALO, wp), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, S, wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=hp * wp * 200,
            bytes_accessed=n_strips * (S + 2 * _HALO) * wp * 4 + hp * wp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(strips)
    return out.reshape(n_strips * S, wp)[:h, _HALO:_HALO + w]


# ---------------------------------------------------------------------------
# Fused projection matcher: Hamming + window/level mask + best-2 reduction
# ---------------------------------------------------------------------------

_INVALID = 10_000  # > any 256-bit distance (ops/hamming._INVALID_DIST)


def _proj_best2_kernel(
    a_ref, bt_ref, ma_ref, mb_ref, bi_ref, b1_ref, b2_ref, *, level_band: int
):
    """One (row-tile i, col-tile j) step of the fused projection matcher.

    a_ref  (TILE, 8) u32   source descriptors
    bt_ref (8, TILE) u32   target descriptors, transposed
    ma_ref (TILE, 8) f32   per-source meta [u, v, rr2, level, valid, 0, 0, 0]
    mb_ref (TILE, 8) f32   per-target meta [x, y, level, valid, 0, 0, 0, 0]
    outputs (1, TILE): best index / best dist / second dist per source row,
    merged across column tiles (grid dim 1 iterates sequentially).
    """
    j = pl.program_id(1)

    dist = jnp.zeros((TILE, TILE), jnp.int32)
    for k in range(8):
        x = jnp.bitwise_xor(a_ref[:, k][:, None], bt_ref[k, :][None, :])
        dist = dist + jax.lax.population_count(x).astype(jnp.int32)

    du = ma_ref[:, 0][:, None] - mb_ref[:, 0][None, :]
    dv = ma_ref[:, 1][:, None] - mb_ref[:, 1][None, :]
    d2 = du * du + dv * dv
    lvl_ok = (
        jnp.abs(ma_ref[:, 3][:, None] - mb_ref[:, 2][None, :])
        <= float(level_band)
    )
    mask = (
        (d2 <= ma_ref[:, 2][:, None])
        & lvl_ok
        & (ma_ref[:, 4][:, None] > 0.5)
        & (mb_ref[:, 3][None, :] > 0.5)
    )
    dist = jnp.where(mask, dist, _INVALID)

    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
    t1 = jnp.min(dist, axis=1)
    # First-minimum column without argmin (Mosaic argmin is f32-only):
    # the smallest column index attaining the row minimum.
    targ = jnp.min(
        jnp.where(dist == t1[:, None], cols, TILE), axis=1
    ).astype(jnp.int32)
    t2 = jnp.min(jnp.where(cols == targ[:, None], _INVALID, dist), axis=1)
    t_idx = targ + j * TILE

    # Outputs are (1, 8, TILE) blocks (TPU block shapes need the last two
    # dims (8k, 128)); the 8 sublane rows carry identical copies and row 0
    # is read back by the caller.
    @pl.when(j == 0)
    def _():
        bi_ref[0] = jnp.broadcast_to(t_idx, (8, TILE))
        b1_ref[0] = jnp.broadcast_to(t1, (8, TILE))
        b2_ref[0] = jnp.broadcast_to(t2, (8, TILE))

    @pl.when(j > 0)
    def _():
        b1 = b1_ref[0, 0, :]
        b2 = b2_ref[0, 0, :]
        bi = bi_ref[0, 0, :]
        take = t1 < b1  # strict: ties keep the earlier (lower) column
        new_b2 = jnp.minimum(jnp.maximum(b1, t1), jnp.minimum(b2, t2))
        bi_ref[0] = jnp.broadcast_to(jnp.where(take, t_idx, bi), (8, TILE))
        b1_ref[0] = jnp.broadcast_to(jnp.minimum(b1, t1), (8, TILE))
        b2_ref[0] = jnp.broadcast_to(new_b2, (8, TILE))


@functools.partial(
    jax.jit, static_argnames=("level_band", "interpret")
)
def projection_best2_pallas(
    desc_a: jnp.ndarray,   # (Na, 8) u32
    meta_a: jnp.ndarray,   # (Na, 8) f32 [u, v, rr2, level, valid, ...]
    desc_b: jnp.ndarray,   # (Nb, 8) u32
    meta_b: jnp.ndarray,   # (Nb, 8) f32 [x, y, level, valid, ...]
    level_band: int = 1,
    interpret: bool = False,
):
    """Fused SearchByProjection core: for every source row, the best and
    second-best Hamming distance over targets inside the source's search
    window (d2 <= rr2) and octave band, plus validity — identical to
    hamming.masked_best2(hamming_matrix(a, b), spatial & level & valid)
    but without materializing any (Na, Nb) matrix in HBM.

    Na, Nb must be multiples of 128 (callers' capacities are).
    Returns (best_idx, best, second) int32.
    """
    na, nb = desc_a.shape[0], desc_b.shape[0]
    grid = (na // TILE, nb // TILE)
    bi, b1, b2 = pl.pallas_call(
        functools.partial(_proj_best2_kernel, level_band=level_band),
        out_shape=(
            jax.ShapeDtypeStruct((na // TILE, 8, TILE), jnp.int32),
            jax.ShapeDtypeStruct((na // TILE, 8, TILE), jnp.int32),
            jax.ShapeDtypeStruct((na // TILE, 8, TILE), jnp.int32),
        ),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE, 8), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, TILE), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, 8), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, 8), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, 8, TILE), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, TILE), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, TILE), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=na * nb * 24,
            bytes_accessed=(na + nb) * 64 * (nb // TILE) + 3 * na * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(desc_a, desc_b.T, meta_a, meta_b)
    return (
        bi[:, 0, :].reshape(na),
        b1[:, 0, :].reshape(na),
        b2[:, 0, :].reshape(na),
    )
