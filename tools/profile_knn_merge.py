"""Top-k merge strategy comparison at flickr scale (N=31k).

Row-blocked panels (4096 x N); compare full-width top_k vs tiled
top_k+merge vs approx_max_k. Usage: python -u tools/profile_knn_merge.py
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

N, D, K, RB = 31744, 128, 15, 4096
CT = 8192  # column tile for the tiled merge


def timed(name, fn, *args):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    warm = time.perf_counter() - t0
    print(f"{name}: cold={cold:.2f}s warm={warm * 1e3:.1f}ms", flush=True)


def panel(qb, r, r_sq):
    q_sq = jnp.sum(qb * qb, axis=1, keepdims=True)
    return q_sq + r_sq[None, :] - 2.0 * jnp.dot(
        qb, r.T, preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("k",))
def full_topk(qb, r, r_sq, k):
    d = panel(qb, r, r_sq)
    neg, ids = jax.lax.top_k(-d, k)
    return -neg, ids


@functools.partial(jax.jit, static_argnames=("k",))
def tiled_topk(qb, r, r_sq, k):
    d = panel(qb, r, r_sq)  # (RB, N)
    nt = N // CT
    d3 = d.reshape(qb.shape[0], nt, CT)
    neg, idx_in_tile = jax.lax.top_k(-d3, k)  # (RB, nt, k)
    tile_base = (jnp.arange(nt, dtype=jnp.int32) * CT)[None, :, None]
    ids = idx_in_tile + tile_base
    cand_d = (-neg).reshape(qb.shape[0], nt * k)
    cand_i = ids.reshape(qb.shape[0], nt * k)
    neg2, pos = jax.lax.top_k(-cand_d, k)
    return -neg2, jnp.take_along_axis(cand_i, pos, axis=1)


@functools.partial(jax.jit, static_argnames=("k",))
def approx(qb, r, r_sq, k):
    d = panel(qb, r, r_sq)
    neg, ids = jax.lax.approx_max_k(-d, k, recall_target=0.99,
                                    aggregate_to_topk=True)
    return -neg, ids


def main():
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    qb = r[:RB]
    r_sq = jnp.sum(r * r, axis=1)

    timed("full-width top_k", full_topk, qb, r, r_sq, K)
    timed("tiled top_k + merge", tiled_topk, qb, r, r_sq, K)
    timed("approx_max_k", approx, qb, r, r_sq, K)

    d1, i1 = full_topk(qb, r, r_sq, K)
    d2, i2 = tiled_topk(qb, r, r_sq, K)
    d3, i3 = approx(qb, r, r_sq, K)
    m12 = float(jnp.mean((jnp.sort(i1, 1) == jnp.sort(i2, 1)).all(1).astype(jnp.float32)))
    m13 = float(jnp.mean((jnp.sort(i1, 1) == jnp.sort(i3, 1)).all(1).astype(jnp.float32)))
    print(f"tiled matches full: {m12:.4f}; approx matches full: {m13:.4f}",
          flush=True)


if __name__ == "__main__":
    main()
