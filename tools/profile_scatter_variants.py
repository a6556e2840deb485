"""Scatter-add replacement candidates at flickr-epoch shapes.

(E,64) updates aggregated into (N,64) by row id:
  a) scatter-add, random ids
  b) scatter-add, sorted ids
  c) segment_sum with indices_are_sorted=True (pre-sorted ids)
  d) gather(perm) + cumsum + boundary-diff (sort-free per epoch)

Usage: python -u tools/profile_scatter_variants.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from multimodal_umap_tpu.utils.cache import enable_compilation_cache

N, D, E = 31744, 64, 952320


def _force(state):
    leaf = jax.tree_util.tree_leaves(state)[-1]
    return float(jnp.asarray(leaf).ravel()[0])


def timed_chain(name, fn, init, iters=30):
    state = fn(init)
    _force(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state)
    _force(state)
    print(f"{name}: {(time.perf_counter() - t0) / iters * 1e3:.2f} ms",
          flush=True)


def main():
    enable_compilation_cache()
    idx = jax.random.randint(jax.random.PRNGKey(1), (E,), 0, N)
    idx_sorted = jnp.sort(idx)
    perm = jnp.argsort(idx)
    upd = jax.random.normal(jax.random.PRNGKey(2), (E, D))
    # Row boundaries for the cumsum-diff variant (one-time build cost).
    counts = jnp.bincount(idx, length=N)
    ends = jnp.cumsum(counts)  # (N,)

    def chain(agg_fn):
        def step(s):
            u, salt = s
            out = agg_fn(u)  # (N, D)
            # Feed a cheap function of the output back into the updates
            # to defeat result memoization.
            u2 = u + out[:1, :1] * 1e-9
            return (u2, salt + 1)
        return jax.jit(step)

    timed_chain("a) scatter-add random idx",
                chain(lambda u: jnp.zeros((N, D)).at[idx].add(u)),
                (upd, 0))
    timed_chain("b) scatter-add sorted idx",
                chain(lambda u: jnp.zeros((N, D)).at[idx_sorted].add(u)),
                (upd, 0))
    timed_chain("c) segment_sum sorted",
                chain(lambda u: jax.ops.segment_sum(
                    u, idx_sorted, num_segments=N, indices_are_sorted=True)),
                (upd, 0))

    def cumsum_diff(u):
        s = u[perm]  # reorder into row-major
        c = jnp.cumsum(s, axis=0)
        c = jnp.concatenate([jnp.zeros((1, D), c.dtype), c], axis=0)
        return c[ends] - c[ends - counts]

    timed_chain("d) gather+cumsum+diff", chain(cumsum_diff), (upd, 0))


if __name__ == "__main__":
    main()
