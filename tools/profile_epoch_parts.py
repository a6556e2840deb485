"""Fine-grained layout-epoch ablation at 31k: where do the ~14 ms
beyond the fused attraction gather/scatter go?

Times a 100-epoch scanned Adam loop (the production chunk shape) over
variants of the fit loss built directly from make_loss_fn:

  * full            -- production epoch (rep=8, alpha=1)
  * deterministic   -- Bernoulli keeps replaced by expectations:
                       isolates the 4 uniform (N, k) draws/epoch
  * rep0/alpha0     -- cross-check against profile_layout_ablate
  * attr-only-fixed -- attraction with precomputed constant coef
                       (no keep draws, no window machinery): the
                       gather/loss/scatter floor plus Adam

Usage: python -u tools/profile_epoch_parts.py [n]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_umap_tpu import Config, MultimodalUMAP
from multimodal_umap_tpu.data.synthetic import clustered_modalities_device
from multimodal_umap_tpu.models.layout import fit_task, make_loss_fn
from multimodal_umap_tpu.ops import losses as L
from multimodal_umap_tpu.utils.cache import enable_compilation_cache


def sync(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf[..., :1])
    return x


def main():
    enable_compilation_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 31744
    cfg = Config()
    epochs = 100

    data = clustered_modalities_device(n, dims=(768, 4096), n_clusters=256,
                                       seed=0, centers_seed=0)
    arrays = [data[k] for k in data]
    model = MultimodalUMAP(cfg.k_neighbors, cfg.out_dim, cfg.min_dist,
                           num_encoders=2)
    denses, inits = [], []
    for enc, feats in zip(model.encoders, arrays):
        _, d, i = enc.fit_graph(feats)
        denses.append(d)
        inits.append(i)
    sync([d.weights for d in denses] + list(inits))
    tasks, statics = zip(*(fit_task(d, cfg.batch_size) for d in denses))
    ab = (jnp.float32(model.a), jnp.float32(model.b))

    def timed_scan(label, loss_fn):
        optimizer = optax.adam(cfg.lr)

        @jax.jit
        def run(params, opt_state, keys):
            def step(carry, ekey):
                params, opt_state = carry
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, tasks, ab, ekey)
                updates, opt_state = optimizer.update(
                    grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss
            (params, opt_state), hist = jax.lax.scan(
                step, (params, opt_state), keys)
            return params, hist

        params = tuple(jnp.array(e, copy=True) for e in inits)
        opt_state = optimizer.init(params)
        # Distinct keys for warm vs timed run: identical-input jit
        # calls are memoized on the axon tunnel (see memory notes).
        sync(run(params, opt_state,
                 jax.random.split(jax.random.PRNGKey(1), epochs)))
        t0 = time.perf_counter()
        out = run(params, opt_state,
                  jax.random.split(jax.random.PRNGKey(2), epochs))
        sync(out)
        ms = (time.perf_counter() - t0) / epochs * 1e3
        print(f"{label:34s} {ms:6.1f} ms/epoch", flush=True)

    timed_scan("full (rep=8, alpha=1)",
               make_loss_fn(statics, mode="fit", num_rep=cfg.num_rep,
                            alpha=cfg.alpha, batch_size=cfg.batch_size))
    timed_scan("deterministic keeps",
               make_loss_fn(statics, mode="fit", num_rep=cfg.num_rep,
                            alpha=cfg.alpha, batch_size=cfg.batch_size,
                            deterministic=True))
    timed_scan("bare attraction (rep=0, alpha=0)",
               make_loss_fn(statics, mode="fit", num_rep=0, alpha=0.0,
                            batch_size=cfg.batch_size))
    timed_scan("bare attraction deterministic",
               make_loss_fn(statics, mode="fit", num_rep=0, alpha=0.0,
                            batch_size=cfg.batch_size, deterministic=True))

    # Floor: attraction with a precomputed constant coefficient -- no
    # keep draws, no per-window machinery, just gather + curve + scatter
    # + Adam on both modalities.
    coefs = [jnp.asarray(np.full(t.nbrs.shape, 1e-3, np.float32))
             for t in tasks]

    def floor_loss(params, tasks_, ab_, key):
        a, b = ab_
        total = jnp.float32(0.0)
        for i, t in enumerate(tasks_):
            y = params[i][t.nbrs]
            attr = L.umap_attr(params[i][:, None, :], y, a, b)
            total = total + jnp.sum(coefs[i] * attr)
        return total

    timed_scan("floor: fixed-coef attraction", floor_loss)


if __name__ == "__main__":
    main()
