"""Oriented rBRIEF descriptors: orientation + rotated binary tests.

TPU-native replacement for the descriptor half of ``ORBextractor``:
``IC_Angle`` (src/ORBextractor.cc:≈80, intensity centroid over a radius-15
circular patch) and ``computeOrbDescriptor`` (src/ORBextractor.cc:≈110,
256 rotated pairwise intensity comparisons -> 32 bytes).

Design differences from the reference (deliberate, TPU-first):
* All keypoints of a level are processed as one batched gather — no per-
  keypoint loop.
* The 256-pair sampling pattern is generated deterministically (seeded
  isotropic Gaussian, the BRIEF construction the learned ORB pattern was
  selected from) instead of shipping OpenCV's learned table.  Descriptors
  are therefore NOT bit-compatible with OpenCV ORB, but are self-consistent
  across frames, which is all the SLAM pipeline requires (SURVEY.md §7:
  gate on downstream matching quality, not bitwise parity).
* Descriptors are packed 256 bits -> 8 x uint32 so Hamming distance is
  XOR + ``lax.population_count`` (ops/hamming.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

HALF_PATCH = 15  # circular patch radius for orientation
PATCH = 2 * HALF_PATCH + 1


def _make_pattern(seed: int = 42, n_pairs: int = 256) -> np.ndarray:
    """(n_pairs, 2, 2) int32 sample offsets (x, y) within the 31x31 patch.

    Isotropic Gaussian with sigma = patch/5 (Calonder's BRIEF G-II), clipped
    to the radius-13 disc so rotated samples stay inside the patch.
    """
    rng = np.random.default_rng(seed)
    pts = []
    while len(pts) < n_pairs * 2:
        cand = rng.normal(0.0, PATCH / 5.0, size=(n_pairs * 4, 2))
        cand = np.round(cand).astype(np.int32)
        r = np.hypot(cand[:, 0], cand[:, 1])
        cand = cand[r <= 13.0]
        pts.extend(cand.tolist())
    pts = np.array(pts[: n_pairs * 2], np.int32)
    return pts.reshape(n_pairs, 2, 2)


BRIEF_PATTERN = _make_pattern()  # (256, 2, 2) int32, (x, y) offsets

# Circular mask + coordinate grids for the intensity centroid.
_yy, _xx = np.mgrid[-HALF_PATCH : HALF_PATCH + 1, -HALF_PATCH : HALF_PATCH + 1]
_CIRC_MASK = (_xx**2 + _yy**2 <= HALF_PATCH**2).astype(np.float32)
_MX = (_xx * _CIRC_MASK).astype(np.float32)
_MY = (_yy * _CIRC_MASK).astype(np.float32)


@jax.jit
def compute_orientations(image: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation for each keypoint.

    Args:
      image: (H, W) float32 level image.
      xy: (N, 2) float32 keypoint coords (x, y) in this level's frame
        (integer-valued from FAST; rounded here).

    Returns:
      (N,) float32 angles in radians: atan2(m01, m10) over the circular patch.
    """
    mx = jnp.asarray(_MX)
    my = jnp.asarray(_MY)

    def one(kp):
        x = jnp.round(kp[0]).astype(jnp.int32)
        y = jnp.round(kp[1]).astype(jnp.int32)
        patch = jax.lax.dynamic_slice(
            image, (y - HALF_PATCH, x - HALF_PATCH), (PATCH, PATCH)
        )
        m10 = jnp.sum(patch * mx)
        m01 = jnp.sum(patch * my)
        return jnp.arctan2(m01, m10)

    return jax.vmap(one)(xy)


@jax.jit
def compute_descriptors(
    image_blur: jnp.ndarray, xy: jnp.ndarray, angles: jnp.ndarray
) -> jnp.ndarray:
    """Rotated-BRIEF descriptors, packed.

    Args:
      image_blur: (H, W) float32 blurred level image (gaussian_blur 7x7 σ=2,
        like the reference pre-descriptor blur).
      xy: (N, 2) float32 keypoint coords in this level's frame.
      angles: (N,) float32 keypoint orientations.

    Returns:
      (N, 8) uint32 packed 256-bit descriptors.
    """
    pattern = jnp.asarray(BRIEF_PATTERN, jnp.float32)  # (256, 2, 2) (x, y)
    h, w = image_blur.shape

    ca = jnp.cos(angles)[:, None, None]
    sa = jnp.sin(angles)[:, None, None]
    px = pattern[None, :, :, 0]  # (1, 256, 2)
    py = pattern[None, :, :, 1]
    # Rotate the pattern by the keypoint angle (steered BRIEF), then round to
    # integer offsets like the reference's cvRound.
    rx = jnp.round(px * ca - py * sa) + jnp.round(xy[:, None, None, 0])
    ry = jnp.round(px * sa + py * ca) + jnp.round(xy[:, None, None, 1])
    rxi = jnp.clip(rx.astype(jnp.int32), 0, w - 1)
    ryi = jnp.clip(ry.astype(jnp.int32), 0, h - 1)

    samples = image_blur[ryi, rxi]  # (N, 256, 2)
    bits = samples[..., 0] < samples[..., 1]  # (N, 256)

    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    packed = jnp.sum(
        bits.reshape(bits.shape[0], 8, 32).astype(jnp.uint32) * weights, axis=-1,
        dtype=jnp.uint32,
    )
    return packed
