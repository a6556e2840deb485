"""Static-memory micro-probe of the InfoNCE term at beyond-flickr N.

Compiles value_and_grad of the symmetric InfoNCE pair (as the fit
epoch uses it) for (N, 64) embeddings and prints XLA's temp-buffer
accounting, with and without jax.checkpoint, to localize the ~10 GiB
of temps the 524k layout-chunk probe attributed to this term.

Usage: python -u tools/probe_infonce_memory.py [n] [variant...]
"""

import functools
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from multimodal_umap_tpu.ops import losses as L


def report(name, fn, *args):
    lowered = jax.jit(jax.value_and_grad(fn)).lower(*args)
    ma = lowered.compile().memory_analysis()
    gb = 1 / (1 << 30)
    print(f"{name:24s} temps {ma.temp_size_in_bytes * gb:6.2f} GiB  "
          f"args {ma.argument_size_in_bytes * gb:5.2f}  "
          f"out {ma.output_size_in_bytes * gb:5.2f}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
    d = 64
    x0 = jax.ShapeDtypeStruct((n, d), jnp.float32)
    x1 = jax.ShapeDtypeStruct((n, d), jnp.float32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)

    def pair(params, key):
        k1, k2 = jax.random.split(key)
        return L.infonce(k1, params[0], params[1]) + L.infonce(
            k2, params[1], params[0])

    def pair_ckpt(params, key):
        f = jax.checkpoint(L.infonce)
        k1, k2 = jax.random.split(key)
        return f(k1, params[0], params[1]) + f(k2, params[1], params[0])

    report("infonce-pair", functools.partial(pair, key=jax.random.PRNGKey(0)),
           (x0, x1))
    report("infonce-pair-ckpt",
           functools.partial(pair_ckpt, key=jax.random.PRNGKey(0)),
           (x0, x1))


if __name__ == "__main__":
    main()
