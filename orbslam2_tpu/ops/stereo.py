"""Stereo feature matching (left/right disparity).

TPU-native equivalent of ``Frame::ComputeStereoMatches``
(src/Frame.cc:≈470): per-row banded search of right-image features for each
left keypoint by descriptor distance.  Expressed as one masked Hamming
matching (the band is the pair mask) instead of the reference's per-row
bucket lists.

Like the reference, the feature-level match is followed by a sub-pixel SAD
refinement: an 11x11 patch around the left keypoint is correlated against
a +-5 px horizontal sweep at the matched right position, and the SAD
minimum is localized with a parabola fit (Frame.cc:≈540's sliding-window
SAD + parabola).  Without this, integer disparities put ~z^2/bf depth
noise on every stereo point.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .extractor import Features
from .hamming import TH_HIGH, match_descriptors

_PATCH = 5     # half patch size (11x11)
_SWEEP = 5     # +-5 px disparity sweep


def _gather_patch(img, x, y, half):
    return jax.lax.dynamic_slice(
        img, (y - half, x - half), (2 * half + 1, 2 * half + 1)
    )


@jax.jit
def _subpixel_refine(
    img_left: jnp.ndarray,
    img_right: jnp.ndarray,
    xl: jnp.ndarray,
    yl: jnp.ndarray,
    xr0: jnp.ndarray,
) -> jnp.ndarray:
    """Per-keypoint sub-pixel right-u via SAD sweep + parabola.

    xl/yl: int32 left keypoint position; xr0: int32 initial right u.
    Returns float32 refined right u.
    """
    h, w = img_left.shape

    def one(xli, yli, xri):
        xli = jnp.clip(xli, _PATCH, w - _PATCH - 1)
        yli = jnp.clip(yli, _PATCH, h - _PATCH - 1)
        xri = jnp.clip(xri, _PATCH + _SWEEP, w - _PATCH - _SWEEP - 1)
        pl = _gather_patch(img_left, xli, yli, _PATCH)
        pl = pl - pl[_PATCH, _PATCH]  # center-normalized like the reference
        wide = jax.lax.dynamic_slice(
            img_right,
            (yli - _PATCH, xri - _PATCH - _SWEEP),
            (2 * _PATCH + 1, 2 * (_PATCH + _SWEEP) + 1),
        )

        def sad(o):
            pr = jax.lax.dynamic_slice(
                wide, (0, o), (2 * _PATCH + 1, 2 * _PATCH + 1)
            )
            pr = pr - pr[_PATCH, _PATCH]
            return jnp.sum(jnp.abs(pl - pr))

        sads = jax.vmap(sad)(jnp.arange(2 * _SWEEP + 1))
        best = jnp.argmin(sads)
        # Parabola fit around the minimum (clamped to the interior).
        bi = jnp.clip(best, 1, 2 * _SWEEP - 1)
        s0, s1, s2 = sads[bi - 1], sads[bi], sads[bi + 1]
        denom = s0 - 2.0 * s1 + s2
        delta = jnp.where(
            jnp.abs(denom) > 1e-6, 0.5 * (s0 - s2) / denom, 0.0
        )
        delta = jnp.clip(delta, -1.0, 1.0)
        return xri.astype(jnp.float32) + (bi - _SWEEP).astype(jnp.float32) + delta

    return jax.vmap(one)(xl, yl, xr0)


@jax.jit
def compute_stereo_matches(
    left: Features,
    right: Features,
    image_left: jnp.ndarray,
    image_right: jnp.ndarray,
    scale_factors: jnp.ndarray,
    bf: jnp.ndarray,
    min_disp: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (ur, depth): per-left-keypoint right-image u and depth,
    -1 where unmatched.

    Band: |v_l - v_r| <= 2 * scale(level_l); disparity in (min_disp, bf];
    candidate = best Hamming match in band; then sub-pixel SAD refine.
    """
    # Vertical band scaled by octave (reference: r = 2*scaleFactor^octave).
    r = 2.0 * scale_factors[jnp.clip(left.level, 0, scale_factors.shape[0] - 1)]
    dv = jnp.abs(left.xy[:, None, 1] - right.xy[None, :, 1])
    band = dv <= r[:, None]
    # Same-ish octave (reference checks levelR in [levelL-1, levelL+1]).
    level_ok = jnp.abs(left.level[:, None] - right.level[None, :]) <= 1
    disp = left.xy[:, None, 0] - right.xy[None, :, 0]
    disp_ok = (disp > min_disp) & (disp <= bf)

    m = match_descriptors(
        left.desc, left.valid, right.desc, right.valid,
        pair_mask=band & level_ok & disp_ok,
        max_dist=TH_HIGH, ratio=1.0,
    )
    xr0 = jnp.take_along_axis(
        right.xy[:, 0][None, :].repeat(left.xy.shape[0], 0), m.idx[:, None], 1
    )[:, 0]
    ur = _subpixel_refine(
        image_left.astype(jnp.float32),
        image_right.astype(jnp.float32),
        jnp.round(left.xy[:, 0]).astype(jnp.int32),
        jnp.round(left.xy[:, 1]).astype(jnp.int32),
        jnp.round(xr0).astype(jnp.int32),
    )
    matched_disp = left.xy[:, 0] - ur
    ok = m.ok & (matched_disp > min_disp) & (matched_disp <= bf)
    ur = jnp.where(ok, ur, -1.0)
    depth = jnp.where(ok, bf / jnp.maximum(matched_disp, 1e-6), -1.0)
    return ur, depth


@jax.jit
def depth_from_depthmap(
    feats: Features, depth_map: jnp.ndarray, bf: jnp.ndarray,
    depth_factor: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RGB-D: sample the (raw-coordinate) depth map at each keypoint
    (Frame::ComputeStereoFromRGBD, src/Frame.cc:≈590) and synthesize the
    virtual right-image coordinate ur = u - bf/z."""
    h, w = depth_map.shape
    xi = jnp.clip(jnp.round(feats.xy[:, 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(feats.xy[:, 1]).astype(jnp.int32), 0, h - 1)
    d = depth_map[yi, xi] / jnp.maximum(depth_factor, 1e-9)
    ok = (d > 0.0) & feats.valid
    ur = jnp.where(ok, feats.xy[:, 0] - bf / jnp.maximum(d, 1e-9), -1.0)
    depth = jnp.where(ok, d, -1.0)
    return ur, depth
