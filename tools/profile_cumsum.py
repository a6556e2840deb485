"""Is big-axis cumsum viable on this TPU? (backward path of the
scatter-free aggregation). Usage: python -u tools/profile_cumsum.py"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from multimodal_umap_tpu.utils.cache import enable_compilation_cache

E, D, N = 952320, 64, 31744


def _force(x):
    return float(jnp.asarray(x).ravel()[0])


def timed_chain(name, fn, init, iters=20):
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
    u = jax.random.normal(jax.random.PRNGKey(0), (E, D))
    timed_chain("associative_scan (952k, 64) axis0",
                jax.jit(lambda x: jax.lax.associative_scan(
                    jnp.add, x, axis=0) * 1e-6), u)
    ends = jnp.arange(1, N + 1) * (E // N)
    counts = jnp.full((N,), E // N)

    def agg(x):
        c = jax.lax.associative_scan(jnp.add, x, axis=0)
        c = jnp.concatenate([jnp.zeros((1, D)), c], axis=0)
        return jnp.tile((c[ends] - c[ends - counts]) * 1e-6,
                        (E // N, 1))

    timed_chain("full aggregate path", jax.jit(agg), u)


if __name__ == "__main__":
    main()
