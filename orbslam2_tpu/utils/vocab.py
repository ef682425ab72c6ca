"""Vocabulary IO: ORBvoc.txt conversion + packed npz save/load.

The reference loads DBoW2's 44 MB ``ORBvoc.txt`` at startup (~10-20 s,
System.cc:≈55 — SURVEY.md §2.3).  We convert it ONCE to packed arrays
(ops/bow.Vocabulary) and load the npz in milliseconds thereafter — the
'ship a converter to a packed binary form' item from SURVEY.md §2.3.

ORBvoc.txt format (DBoW2 TemplatedVocabulary::loadFromTextFile,
Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:≈1300):
  line 1: 'k L scoring_type weighting_type'
  then one line per node (preorder, root implicit):
    parent_id is_leaf d0 d1 ... d31 weight
"""

from __future__ import annotations

import numpy as np

from ..ops.bow import Vocabulary


def load_orbvoc_text(path: str) -> Vocabulary:
    """Parse DBoW2's ORBvoc.txt into a packed Vocabulary.

    Uses the native C++ streaming parser (utils/native.py) when available
    — ~20-40x faster than the Python loop on the 44 MB ORBvoc — with a
    pure-Python fallback."""
    import jax.numpy as jnp

    from .native import parse_orbvoc_fast

    fast = parse_orbvoc_fast(path)
    if fast is not None:
        header, parents_a, leaves_a, descs_a, weights_a = fast
        k, L = int(header[0]), int(header[1])
        parents = parents_a.tolist()
        n = len(parents) + 1  # + root
        node_desc = np.zeros((n, 32), np.uint8)
        node_parent = np.full(n, -1, np.int64)
        is_leaf = np.zeros(n, bool)
        weight = np.zeros(n, np.float64)
        node_desc[1:] = descs_a
        node_parent[1:] = parents_a
        is_leaf[1:] = leaves_a
        weight[1:] = weights_a
    else:
        with open(path, "r") as f:
            header = f.readline().split()
            k, L = int(header[0]), int(header[1])
            parents, leaves, descs, weights = [], [], [], []
            for line in f:
                p = line.split()
                if len(p) < 35:
                    continue
                parents.append(int(p[0]))
                leaves.append(int(p[1]) != 0)
                descs.append([int(x) for x in p[2:34]])
                weights.append(float(p[34]))

        n = len(parents) + 1  # + root
        node_desc = np.zeros((n, 32), np.uint8)
        node_parent = np.full(n, -1, np.int64)
        is_leaf = np.zeros(n, bool)
        weight = np.zeros(n, np.float64)
        if parents:
            node_desc[1:] = np.asarray(descs, np.uint8)
            node_parent[1:] = np.asarray(parents, np.int64)
            is_leaf[1:] = np.asarray(leaves, bool)
            weight[1:] = np.asarray(weights, np.float64)

    # Vectorized children table: at ORBvoc scale (1.11M nodes) the naive
    # per-node Python loop dominates load time; group nodes by parent with
    # a stable argsort and compute each node's slot as its rank within the
    # parent's group.
    children = np.full((n, k), -1, np.int32)
    if n > 1:
        ids = np.arange(1, n, dtype=np.int64)
        par = node_parent[1:]
        ok = (par >= 0) & (par < n)
        ids, par = ids[ok], par[ok]
        order = np.argsort(par, kind="stable")
        ps, ns = par[order], ids[order]
        first = np.r_[True, ps[1:] != ps[:-1]]
        grp_start = np.maximum.accumulate(
            np.where(first, np.arange(len(ps)), 0)
        )
        pos = np.arange(len(ps)) - grp_start
        in_k = pos < k
        children[ps[in_k], pos[in_k]] = ns[in_k].astype(np.int32)

    word_id = np.full(n, -1, np.int32)
    leaf_ids = np.nonzero(is_leaf)[0]
    word_id[leaf_ids] = np.arange(len(leaf_ids), dtype=np.int32)
    idf = weight[leaf_ids].astype(np.float32)

    packed = (
        node_desc.reshape(n, 8, 4)
        .astype(np.uint32)
    )
    packed = (
        packed[:, :, 0]
        | (packed[:, :, 1] << 8)
        | (packed[:, :, 2] << 16)
        | (packed[:, :, 3] << 24)
    )

    return Vocabulary(
        node_desc=jnp.asarray(packed),
        children=jnp.asarray(children),
        word_id=jnp.asarray(word_id),
        idf=jnp.asarray(idf),
        levels=L,
    )


def save_vocabulary(vocab: Vocabulary, path: str) -> None:
    np.savez_compressed(
        path,
        node_desc=np.asarray(vocab.node_desc),
        children=np.asarray(vocab.children),
        word_id=np.asarray(vocab.word_id),
        idf=np.asarray(vocab.idf),
        levels=np.int32(vocab.levels),
    )


def load_vocabulary(path: str) -> Vocabulary:
    import jax.numpy as jnp

    z = np.load(path)
    return Vocabulary(
        node_desc=jnp.asarray(z["node_desc"]),
        children=jnp.asarray(z["children"]),
        word_id=jnp.asarray(z["word_id"]),
        idf=jnp.asarray(z["idf"]),
        levels=int(z["levels"]),
    )
