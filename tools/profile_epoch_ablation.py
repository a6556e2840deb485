"""Ablates the fit epoch step at 31k to locate the hot component.

Requires the graph cache from profile_layout31k.py build.
Usage: python -u tools/profile_epoch_ablation.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_umap_tpu.models.layout import make_loss_fn, task_from_graph
from multimodal_umap_tpu.ops.graph import EdgeGraph
from multimodal_umap_tpu.utils.cache import enable_compilation_cache

CACHE = "/tmp/layout31k_graph.npz"
N = 31744


def load_tasks():
    z = np.load(CACHE)
    tasks, statics, inits = [], [], []
    for m in range(2):
        g = EdgeGraph(
            rows=jnp.asarray(z[f"rows_{m}"]),
            cols=jnp.asarray(z[f"cols_{m}"]),
            weights=jnp.asarray(z[f"weights_{m}"]),
            valid=jnp.asarray(z[f"valid_{m}"]),
            num_rows=N, num_cols=N,
        )
        t, s = task_from_graph(g, 256)
        tasks.append(t)
        statics.append(s)
        inits.append(jnp.asarray(z[f"init_{m}"]))
    return tuple(tasks), tuple(statics), tuple(inits)


def bench_step(name, fn, *args, iters=20):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt * 1e3:.1f} ms/epoch", flush=True)


def main():
    enable_compilation_cache()
    tasks, statics, inits = load_tasks()
    ab = (jnp.float32(1.577), jnp.float32(0.8951))
    key = jax.random.PRNGKey(0)

    def variant(num_rep, alpha, grad):
        loss_fn = make_loss_fn(statics, mode="fit", num_rep=num_rep,
                               alpha=alpha, batch_size=256)
        if grad:
            f = jax.jit(lambda p, t, a, k: jax.value_and_grad(loss_fn)(p, t, a, k))
        else:
            f = jax.jit(loss_fn)
        return f

    bench_step("fwd only,  rep=8, infonce", variant(8, 1.0, False),
               inits, tasks, ab, key)
    bench_step("fwd+grad,  rep=8, infonce", variant(8, 1.0, True),
               inits, tasks, ab, key)
    bench_step("fwd+grad,  rep=8, NO infonce", variant(8, 0.0, True),
               inits, tasks, ab, key)
    bench_step("fwd+grad,  rep=1, NO infonce", variant(1, 0.0, True),
               inits, tasks, ab, key)
    bench_step("fwd+grad,  rep=1, infonce", variant(1, 1.0, True),
               inits, tasks, ab, key)


if __name__ == "__main__":
    main()
