"""Checkpointing: full-model state as a single .npz archive.

Logical schema matches the reference's ``save_state_dict`` /
``load_state_dict`` (reference impl/model.py:653-713): hyperparameters,
(a, b), per-encoder sigma/rho, and -- deliberately, as in the reference
-- the training data, graphs, and embeddings, because transform/invert
query them (SURVEY.md §2.10h). Under exact kNN every array is
fixed-shape, so plain npz is sufficient and portable.
"""

from __future__ import annotations

import io
import json
import os

import jax.numpy as jnp
import numpy as np

from ..ops.graph import EdgeGraph

_SCHEMA_VERSION = 1


def save_state(path: str, state: dict, compress: bool = False) -> None:
    """Serializes a mixture-model state dict to ``path`` (npz).

    Expected keys: k_neighbors, out_dim, min_dist, num_encoders, a, b,
    sigmas (list), rhos (list), data (list), graphs (list[EdgeGraph]),
    embeds (list).

    ``compress`` defaults to False: the state includes the raw feature
    matrices (hundreds of MB at flickr scale) and zlib on this class of
    single-vCPU host costs far more than the disk it saves.

    bf16 arrays (beyond-HBM feature tables, models/mixture.py
    ``feature_dtype``) are stored as uint16 bit views -- npz writes
    ml_dtypes.bfloat16 as an opaque void dtype otherwise -- with their
    keys recorded in the meta so :func:`load_state` restores the dtype.
    """
    meta = {
        "schema": _SCHEMA_VERSION,
        "k_neighbors": int(state["k_neighbors"]),
        "out_dim": int(state["out_dim"]),
        "min_dist": float(state["min_dist"]),
        "num_encoders": int(state["num_encoders"]),
        "a": float(state["a"]),
        "b": float(state["b"]),
        "spectral_method": str(state.get("spectral_method", "auto")),
        "knn_engine": str(state.get("knn_engine") or ""),
        "graph_shapes": [
            [g.num_rows, g.num_cols] for g in state["graphs"]
        ],
    }
    arrays: dict[str, np.ndarray] = {}
    for i in range(meta["num_encoders"]):
        arrays[f"sigmas_{i}"] = np.asarray(state["sigmas"][i])
        arrays[f"rhos_{i}"] = np.asarray(state["rhos"][i])
        arrays[f"data_{i}"] = np.asarray(state["data"][i])
        arrays[f"embeds_{i}"] = np.asarray(state["embeds"][i])
        g: EdgeGraph = state["graphs"][i]
        arrays[f"graph_{i}_rows"] = np.asarray(g.rows)
        arrays[f"graph_{i}_cols"] = np.asarray(g.cols)
        arrays[f"graph_{i}_weights"] = np.asarray(g.weights)
        arrays[f"graph_{i}_valid"] = np.asarray(g.valid)

    bf16_keys = [k for k, v in arrays.items()
                 if v.dtype == jnp.bfloat16.dtype]
    for k in bf16_keys:
        arrays[k] = arrays[k].view(np.uint16)
    meta["bf16_keys"] = bf16_keys

    dirname = os.path.dirname(path)
    if dirname:
        os.makedirs(dirname, exist_ok=True)
    buf = io.BytesIO()
    saver = np.savez_compressed if compress else np.savez
    saver(buf, meta=json.dumps(meta), **arrays)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def feature_fingerprint(feats) -> int:
    """Cheap content guard for the graph cache: CRC over a strided
    sample of up to 64 rows (always including first and last) plus the
    table shape. Detects a cache written for different features --
    including re-extracted tables that share row 0 -- without hashing
    the whole (N, D) table (64 rows x 4096 dims is ~1 MB of CRC at any
    N)."""
    import zlib

    n = int(np.shape(feats)[0])
    idx = sorted({0, n - 1, *range(0, n, -(-n // 62))})
    # One gather + one host readback (per-row reads would be ~60 tunnel
    # round-trips on a device-resident table).
    rows = np.ascontiguousarray(np.asarray(feats[np.asarray(idx)]))
    crc = zlib.crc32(rows.tobytes())
    shape = ",".join(str(s) for s in np.shape(feats))
    return zlib.crc32(shape.encode(), crc)


def save_graph_cache(path: str, *, k_neighbors: int, out_dim: int,
                     spectral_method: str, graphs, denses, inits,
                     sigmas, rhos, fingerprints) -> None:
    """Phase-level snapshot of fit's graph stage (kNN sweep + fuzzy
    weights + symmetrization + spectral init).

    At beyond-flickr scale the graph stage is minutes of device time and
    the most crash-exposed phase of a run (the kNN sweep and spectral
    filter are the longest dispatches in the pipeline); ``fit`` resumed
    via ``progress_path`` rebuilds it deterministically but re-pays the
    full cost. With ``graph_cache_path`` the rebuilt run loads this
    snapshot and jumps straight to the layout phase. The reference has
    no counterpart (its only resumability is the feature cache,
    reference impl/dataset.py:24-25); this extends SURVEY.md §5.3 to the
    graph phase.
    """
    m = len(graphs)
    meta = {
        "schema": _SCHEMA_VERSION,
        "kind": "graph_cache",
        "k_neighbors": int(k_neighbors),
        "out_dim": int(out_dim),
        "spectral_method": str(spectral_method),
        "num_encoders": m,
        "graph_shapes": [[g.num_rows, g.num_cols] for g in graphs],
        "fingerprints": [int(f) for f in fingerprints],
    }
    arrays: dict[str, np.ndarray] = {}
    for i in range(m):
        g = graphs[i]
        arrays[f"graph_{i}_rows"] = np.asarray(g.rows)
        arrays[f"graph_{i}_cols"] = np.asarray(g.cols)
        arrays[f"graph_{i}_weights"] = np.asarray(g.weights)
        arrays[f"graph_{i}_valid"] = np.asarray(g.valid)
        d = denses[i]
        arrays[f"dense_{i}_nbrs"] = np.asarray(d.nbrs)
        arrays[f"dense_{i}_weights"] = np.asarray(d.weights)
        arrays[f"dense_{i}_bwd_valid"] = np.asarray(d.bwd_valid)
        arrays[f"init_{i}"] = np.asarray(inits[i])
        arrays[f"sigmas_{i}"] = np.asarray(sigmas[i])
        arrays[f"rhos_{i}"] = np.asarray(rhos[i])
    dirname = os.path.dirname(path)
    if dirname:
        os.makedirs(dirname, exist_ok=True)
    tmp = path + ".tmp"
    buf = io.BytesIO()
    np.savez(buf, meta=json.dumps(meta), **arrays)
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)


def load_graph_cache(path: str, *, k_neighbors: int, out_dim: int,
                     spectral_method: str, fingerprints) -> dict | None:
    """Loads a :func:`save_graph_cache` snapshot, or None when the file
    is absent or was written for different data/hyperparameters (the
    caller then rebuilds and overwrites). Edge lists stay host-side
    numpy (fit offloads them at this scale anyway); dense graphs and
    inits are returned as device arrays."""
    from ..ops.graph import DenseSymGraph

    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        if (meta.get("kind") != "graph_cache"
                or meta["k_neighbors"] != int(k_neighbors)
                or meta["out_dim"] != int(out_dim)
                # The cached init_* arrays are the spectral stage's
                # output: a different requested method must rebuild,
                # not silently serve the old method's subspace.
                or meta.get("spectral_method") != str(spectral_method)
                or meta["fingerprints"] != [int(f) for f in fingerprints]):
            return None
        m = meta["num_encoders"]
        out = {"graphs": [], "denses": [], "inits": [],
               "sigmas": [], "rhos": []}
        for i in range(m):
            num_rows, num_cols = meta["graph_shapes"][i]
            out["graphs"].append(EdgeGraph(
                rows=z[f"graph_{i}_rows"],
                cols=z[f"graph_{i}_cols"],
                weights=z[f"graph_{i}_weights"],
                valid=z[f"graph_{i}_valid"],
                num_rows=int(num_rows), num_cols=int(num_cols),
            ))
            out["denses"].append(DenseSymGraph(
                nbrs=jnp.asarray(z[f"dense_{i}_nbrs"]),
                weights=jnp.asarray(z[f"dense_{i}_weights"]),
                bwd_valid=jnp.asarray(z[f"dense_{i}_bwd_valid"]),
                num_rows=int(num_rows),
            ))
            out["inits"].append(jnp.asarray(z[f"init_{i}"]))
            out["sigmas"].append(jnp.asarray(z[f"sigmas_{i}"]))
            out["rhos"].append(jnp.asarray(z[f"rhos_{i}"]))
    return out


def load_state(path: str) -> dict:
    """Loads a state dict saved by :func:`save_state`."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        n = meta["num_encoders"]
        bf16_keys = set(meta.get("bf16_keys", ()))

        def arr(key):
            a = z[key]
            if key in bf16_keys:
                a = a.view(jnp.bfloat16.dtype)
            return jnp.asarray(a)
        state = {
            "k_neighbors": meta["k_neighbors"],
            "out_dim": meta["out_dim"],
            "min_dist": meta["min_dist"],
            "num_encoders": n,
            "a": meta["a"],
            "b": meta["b"],
            # Absent in schema-1 archives written before the knobs.
            "spectral_method": meta.get("spectral_method", "auto"),
            "knn_engine": meta.get("knn_engine", "") or None,
            "sigmas": [],
            "rhos": [],
            "data": [],
            "embeds": [],
            "graphs": [],
        }
        for i in range(n):
            state["sigmas"].append(arr(f"sigmas_{i}"))
            state["rhos"].append(arr(f"rhos_{i}"))
            state["data"].append(arr(f"data_{i}"))
            state["embeds"].append(arr(f"embeds_{i}"))
            num_rows, num_cols = meta["graph_shapes"][i]
            state["graphs"].append(
                EdgeGraph(
                    rows=arr(f"graph_{i}_rows"),
                    cols=arr(f"graph_{i}_cols"),
                    weights=arr(f"graph_{i}_weights"),
                    valid=arr(f"graph_{i}_valid"),
                    num_rows=int(num_rows),
                    num_cols=int(num_cols),
                )
            )
    return state
