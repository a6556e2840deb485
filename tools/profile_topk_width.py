"""top_k vs approx_max_k at full flickr width (31744 columns).

Usage: python -u tools/profile_topk_width.py
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_umap_tpu.utils.cache import enable_compilation_cache

N, D, K, RB = 31744, 4096, 15, 8192


def timed(name, fn, *args):
    jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    print(f"{name}: warm={time.perf_counter() - t0 :.3f}s", flush=True)


def panel_of(qb, r, r_sq, precision):
    q_sq = jnp.sum(qb * qb, axis=1, keepdims=True)
    return q_sq + r_sq[None, :] - 2.0 * jnp.dot(
        qb, r.T, preferred_element_type=jnp.float32, precision=precision
    )


@jax.jit
def panel_only(qb, r, r_sq):
    return panel_of(qb, r, r_sq, "highest")


@jax.jit
def panel_high(qb, r, r_sq):
    return panel_of(qb, r, r_sq, "high")


@jax.jit
def panel_default(qb, r, r_sq):
    return panel_of(qb, r, r_sq, None)


@jax.jit
def exact_topk(qb, r, r_sq):
    neg, ids = jax.lax.top_k(-panel_of(qb, r, r_sq, "highest"), K)
    return -neg, ids


@functools.partial(jax.jit, static_argnames=("recall",))
def approx_topk(qb, r, r_sq, recall=0.99):
    neg, ids = jax.lax.approx_max_k(
        -panel_of(qb, r, r_sq, "highest"), K,
        recall_target=recall, aggregate_to_topk=True,
    )
    return -neg, ids


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32))
    r = jnp.tile(r, (1, D // 128))  # cheap way to get D=4096 on 1 vCPU
    qb = r[:RB]
    r_sq = jnp.sum(r * r, axis=1)

    timed("panel only (highest)", panel_only, qb, r, r_sq)
    timed("panel only (high)", panel_high, qb, r, r_sq)
    timed("panel only (default bf16)", panel_default, qb, r, r_sq)
    timed("panel + exact top_k", exact_topk, qb, r, r_sq)
    timed("panel + approx_max_k(0.99)", approx_topk, qb, r, r_sq)
    timed("panel + approx_max_k(0.95)",
          functools.partial(approx_topk, recall=0.95), qb, r, r_sq)

    d1, i1 = exact_topk(qb, r, r_sq)
    d2, i2 = approx_topk(qb, r, r_sq)
    row_match = jnp.mean(
        (jnp.sort(i1, 1) == jnp.sort(i2, 1)).all(1).astype(jnp.float32)
    )
    elem_recall = jnp.mean(
        (jnp.sort(i1, 1) == jnp.sort(i2, 1)).astype(jnp.float32)
    )
    print(f"approx vs exact: row match {float(row_match):.4f}, "
          f"element recall {float(elem_recall):.5f}", flush=True)


if __name__ == "__main__":
    main()
