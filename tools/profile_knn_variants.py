"""kNN kernel compile/runtime comparison: scan+top_k vs single-block vs
approx_min_k. Usage: python -u tools/profile_knn_variants.py [N]"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_umap_tpu.ops.knn import knn


def timed(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    warm = time.perf_counter() - t0
    print(f"{name}: cold={cold:.2f}s warm={warm * 1e3:.1f}ms", flush=True)
    return out


@functools.partial(jax.jit, static_argnames=("k",))
def knn_approx(q, r, k):
    q_sq = jnp.sum(q * q, axis=1, keepdims=True)
    r_sq = jnp.sum(r * r, axis=1)
    d = q_sq + r_sq[None, :] - 2.0 * jnp.dot(
        q, r.T, preferred_element_type=jnp.float32, precision="highest"
    )
    i = jnp.arange(q.shape[0])
    d = d.at[i, i].set(jnp.inf)
    neg, ids = jax.lax.approx_max_k(-d, k, recall_target=0.99,
                                    aggregate_to_topk=True)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), ids


@functools.partial(jax.jit, static_argnames=("k",))
def knn_full_topk(q, r, k):
    q_sq = jnp.sum(q * q, axis=1, keepdims=True)
    r_sq = jnp.sum(r * r, axis=1)
    d = q_sq + r_sq[None, :] - 2.0 * jnp.dot(
        q, r.T, preferred_element_type=jnp.float32, precision="highest"
    )
    i = jnp.arange(q.shape[0])
    d = d.at[i, i].set(jnp.inf)
    neg, ids = jax.lax.top_k(-d, k)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), ids


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, 128)).astype(np.float32))

    d0, i0 = timed("scan blocks=1024 (current)",
                   lambda: knn(x, x, 15, exclude_self=True))
    d1, i1 = timed("single dense + top_k", knn_full_topk, x, x, 15)
    d2, i2 = timed("single dense + approx_max_k", knn_approx, x, x, 15)
    d3, i3 = timed("scan blocks=4096",
                   lambda: knn(x, x, 15, exclude_self=True, block_cols=4096))

    match_full = float(jnp.mean((jnp.sort(i0, 1) == jnp.sort(i1, 1)).all(1).astype(jnp.float32)))
    match_approx = float(jnp.mean((jnp.sort(i1, 1) == jnp.sort(i2, 1)).all(1).astype(jnp.float32)))
    print(f"rows matching scan vs full: {match_full:.4f}", flush=True)
    print(f"rows matching full vs approx: {match_approx:.4f}", flush=True)


if __name__ == "__main__":
    main()
