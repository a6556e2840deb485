"""Does the axon PJRT runtime co-allocate temps of QUEUED dispatches?

The 1M split-dispatch fit epoch OOMs on the real chip even though its
largest single program (grad_nce) peaks at 7.87 GiB AOT and the live
residents measure ~2.3 GiB (live-array dump, .ladder diag log) -- a sum
comfortably inside the ~15 GiB allocatable HBM measured by incremental
1 GiB allocations. The remaining suspect is dispatch-time temp
allocation: grad_mod (4.72 GiB temps) and grad_nce (6.87 GiB temps) are
enqueued back-to-back with no host sync, and if PJRT reserves a
program's temps at ENQUEUE rather than execution, the two reservations
overlap: 2.3 + 5.2 + 7.9 ~= 15.4 GiB > HBM.

This probe builds the REAL split-runner gradient programs at 1M shapes
(synthetic task arrays -- shapes are all that matters) and runs one
epoch twice:

  1. SYNCED:   float(loss) readback between the two grad dispatches
               (serializes temp lifetimes) -- expected OK;
  2. UNSYNCED: exactly the engine's current dispatch pattern --
               expected RESOURCE_EXHAUSTED if the theory holds.

Usage: python -u tools/probe_dispatch_overlap.py [n] [k] [d]
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax

from multimodal_umap_tpu.models import layout as LY
from multimodal_umap_tpu.ops.graph import DenseSymGraph
from multimodal_umap_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    m, batch_size, num_rep, alpha, lr = 2, 256, 8, 1.0, 0.01

    key = jax.random.PRNGKey(0)
    tasks, statics, params = [], [], []
    for i in range(m):
        key, k1, k2, k3 = jax.random.split(key, 4)
        dense = DenseSymGraph(
            nbrs=jax.random.randint(k1, (n, k), 0, n, jnp.int32),
            weights=jax.random.uniform(k2, (n, k), jnp.float32),
            bwd_valid=jnp.ones((n, k), jnp.bool_),
            num_rows=n,
        )
        t, s = LY.fit_task(dense, batch_size)
        tasks.append(t)
        statics.append(s)
        params.append(jax.random.normal(k3, (n, d)) * 0.1)
    tasks, statics, params = tuple(tasks), tuple(statics), tuple(params)

    loss_mod = LY.make_loss_fn(statics, mode="fit", num_rep=num_rep,
                               alpha=alpha, batch_size=batch_size,
                               terms="modality")
    loss_nce = LY.make_loss_fn(statics, mode="fit", num_rep=num_rep,
                               alpha=alpha, batch_size=batch_size,
                               terms="infonce")
    grad_mod = jax.jit(jax.value_and_grad(loss_mod))
    grad_nce = jax.jit(jax.value_and_grad(loss_nce))
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)
    jax.block_until_ready(opt_state)
    ab = (jnp.float32(1.577), jnp.float32(0.8951))

    def epoch(i, sync):
        ekey = jax.random.PRNGKey(100 + i)
        l1, g1 = grad_mod(params, tasks, ab, ekey)
        if sync:
            print(f"  grad_mod loss {float(l1):.4f} (synced)", flush=True)
        l2, g2 = grad_nce(params, tasks, ab, ekey)
        # Drain before measuring verdicts either way.
        return float(l1), float(l2)

    for label, sync in (("SYNCED", True), ("UNSYNCED", False)):
        try:
            l1, l2 = epoch(0 if sync else 1, sync)
            print(f"{label}: OK (mod {l1:.4f}, nce {l2:.4f})", flush=True)
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)
            break


if __name__ == "__main__":
    main()
