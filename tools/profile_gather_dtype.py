"""Is the layout's irregular traffic bytes-bound or row-latency-bound?

Times the epoch's two irregular primitives -- the (N, k, D) neighbor
gather and its backward scatter-add -- at f32 vs bf16 element type, at
flickr scale (N=31744, k=15, D=64). If gathers/scatters are HBM
bytes-bound, bf16 halves them; if each row access pays fixed latency,
dtype changes nothing and the bf16 layout variant is not worth its
precision cost.

Usage: python -u tools/profile_gather_dtype.py [n]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_umap_tpu.utils.cache import enable_compilation_cache


def sync(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf[..., :1])
    return x


def main():
    enable_compilation_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 31744
    k, d = 15, 64
    reps = 50

    rng = np.random.default_rng(0)
    nbrs = jnp.asarray(rng.integers(0, n, (n, k)), dtype=jnp.int32)
    embed = jnp.asarray(rng.normal(size=(n, d)), dtype=jnp.float32)
    grads = jnp.asarray(rng.normal(size=(n, k, d)), dtype=jnp.float32)

    def run(label, fn, *args):
        out = jax.jit(fn)(*args)
        sync(out)  # compile + first run
        t0 = time.perf_counter()
        x = args[0]
        for _ in range(reps):
            # Chain to defeat identical-input memoization on the tunnel.
            out = jax.jit(fn)(x, *args[1:])
            x = x + 0.0 * out.reshape(-1)[0].astype(x.dtype)
        sync(x)
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"{label:42s} {ms:7.2f} ms", flush=True)

    def gather_f32(e, idx):
        return e[idx]

    def gather_bf16(e, idx):
        return e.astype(jnp.bfloat16)[idx].astype(jnp.float32)

    def scatter_f32(g, idx):
        return jax.ops.segment_sum(
            g.reshape(-1, d), idx.reshape(-1), num_segments=n)

    def scatter_bf16(g, idx):
        out = jax.ops.segment_sum(
            g.astype(jnp.bfloat16).reshape(-1, d), idx.reshape(-1),
            num_segments=n)
        return out.astype(jnp.float32)

    run("gather (N,k,D) f32", gather_f32, embed, nbrs)
    run("gather (N,k,D) bf16 src", gather_bf16, embed, nbrs)
    run("scatter-add (N*k,D)->N f32", scatter_f32, grads, nbrs)
    run("scatter-add (N*k,D)->N bf16", scatter_bf16, grads, nbrs)

    # The fused pair as autodiff produces it: gather fwd + scatter bwd.
    def attr_f32(e, idx):
        y = e[idx]
        return jnp.sum((e[:, None, :] - y) ** 2)

    def attr_bf16(e, idx):
        y = e.astype(jnp.bfloat16)[idx].astype(jnp.float32)
        return jnp.sum((e[:, None, :] - y) ** 2)

    run("d(attr)/d(embed) f32 gather", jax.grad(attr_f32), embed, nbrs)
    run("d(attr)/d(embed) bf16 gather", jax.grad(attr_bf16), embed, nbrs)


if __name__ == "__main__":
    main()
