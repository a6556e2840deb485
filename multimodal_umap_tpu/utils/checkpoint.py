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
