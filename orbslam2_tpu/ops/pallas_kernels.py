"""Pallas TPU kernels for the matching hot path.

The packed-Hamming distance matrix is the framework's most-executed op
(every SearchBy* variant reduces over it — ops/hamming.py).  The XLA
lowering materializes the (Na, Nb, 8) XOR tensor in HBM; this kernel tiles
the computation through VMEM so each (128, 128) output tile reads its two
descriptor blocks once and keeps the XOR/popcount intermediate on-chip —
HBM traffic drops from O(Na*Nb*8) words to O(Na*Nb/128 * 8) block reads +
the output.

Used automatically on TPU for aligned shapes; ops/hamming.py falls back to
the XLA path elsewhere (CPU tests, odd shapes).
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
