"""Microbench: row gather, RNG, scatter-add at flickr-epoch shapes.

NOTE: the axon backend appears to memoize executions with identical
input buffers, so every measured op must be CHAINED (output feeds the
next input) to force real executions.

Usage: python -u tools/profile_gather.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from multimodal_umap_tpu.utils.cache import enable_compilation_cache

N, D, E, R = 31744, 64, 952320, 8


def _force(state):
    """Host readback: block_until_ready over the axon tunnel returns
    before the queue drains, so pull one scalar to the host."""
    leaf = jax.tree_util.tree_leaves(state)[-1]
    return float(jnp.asarray(leaf).ravel()[0])


def timed_chain(name, fn, init, iters=50):
    """fn: state -> state (jitted). Chains states to force execution."""
    state = fn(init)
    _force(state)  # compile + drain
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state)
    _force(state)
    print(f"{name}: {(time.perf_counter() - t0) / iters * 1e3:.2f} ms",
          flush=True)


def main():
    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    embed = jax.random.normal(key, (N, D))
    idx0 = jax.random.randint(jax.random.PRNGKey(1), (E,), 0, N)
    upd0 = jax.random.normal(jax.random.PRNGKey(2), (E, D))

    timed_chain(
        "gather (E,64) random idx",
        jax.jit(lambda s: (s[0], (s[0][s[1]].sum(1).astype(jnp.int32)
                                  + s[1]) % N)),
        (embed, idx0),
    )
    timed_chain(
        "randint (E,) chained",
        jax.jit(lambda k: jax.random.split(
            jax.random.fold_in(k, jax.random.randint(k, (E,), 0, N)[0]))[0]),
        key,
    )
    timed_chain(
        "uniform (E,) + bernoulli chained",
        jax.jit(lambda k: jax.random.fold_in(
            k, (jax.random.uniform(k, (E,)) < 0.5).sum().astype(jnp.int32))),
        key,
    )
    timed_chain(
        "randint (E,8) chained",
        jax.jit(lambda k: jax.random.fold_in(
            k, jax.random.randint(k, (E, R), 0, N)[0, 0])),
        key,
    )
    timed_chain(
        "scatter-add (E,64)->(N,64)",
        jax.jit(lambda s: (jnp.zeros((N, D)).at[s[1]].add(s[2]) + s[0] * 0,
                           (s[1] + 1) % N, s[2])),
        (embed, idx0, upd0),
    )
    timed_chain(
        "gather+attr+gather pair (fwd-ish)",
        jax.jit(lambda s: (
            s[0],
            (s[1] + jnp.log1p(
                1.577 * jnp.maximum(
                    ((s[0][s[1]] - s[0][(s[1] + 7) % N]) ** 2).sum(-1), 1e-6
                ) ** 0.895).astype(jnp.int32)[:E]) % N,
        )),
        (embed, idx0),
    )


if __name__ == "__main__":
    main()
