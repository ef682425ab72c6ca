"""Map checkpoint / resume.

The reference famously CANNOT save or reload a map (SURVEY.md §5 —
'a famous gap; forks add it'); only trajectories are exported.  Our map is
a struct-of-arrays pytree, so checkpointing is a flat npz dump — and a
resumed session can localize against the loaded map immediately
(localization-only mode) or continue mapping.
"""

from __future__ import annotations

import numpy as np

from ..models.map_state import MapState


def save_map(m: MapState, path: str) -> None:
    np.savez_compressed(
        path, **{name: np.asarray(val) for name, val in m._asdict().items()}
    )


def load_map(path: str) -> MapState:
    import jax.numpy as jnp

    z = np.load(path)
    fields = {}
    for name in MapState._fields:
        arr = z[name]
        if arr.ndim == 0:
            fields[name] = jnp.asarray(arr[()])
        else:
            fields[name] = jnp.asarray(arr)
    return MapState(**fields)
