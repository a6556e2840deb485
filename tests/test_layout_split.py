"""Split-dispatch epoch engine == fused epoch engine.

At beyond-HBM single-device scale (>600k rows) the fit epoch runs as
three dispatches -- grad(modality losses), grad(InfoNCE), Adam apply
(models/layout.py _split_chunk_runner) -- because the fused program's
scheduled peak overcommits the chip (the round-4 1M
RESOURCE_EXHAUSTED). The split must be a pure memory transformation:
same per-epoch PRNG stream, same loss history, same trajectory.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_umap_tpu.models import layout as LY
from multimodal_umap_tpu.ops.graph import fuzzy_weights, symmetrize_dense
from multimodal_umap_tpu.ops.knn import knn

pytestmark = pytest.mark.fast


def _fit_setup(rng, n=96, dims=(11, 7), d_out=4, k=5, batch_size=32):
    tasks, statics, inits = [], [], []
    for i, d_in in enumerate(dims):
        x = jnp.asarray(rng.normal(size=(n, d_in)).astype(np.float32))
        dists, nbrs = knn(x, x, k, exclude_self=True)
        w, _, _ = fuzzy_weights(dists)
        task, static = LY.fit_task(symmetrize_dense(nbrs, w), batch_size)
        tasks.append(task)
        statics.append(static)
        inits.append(jnp.asarray(
            rng.normal(size=(n, d_out)).astype(np.float32)))
    return tasks, statics, inits


def _run(tasks, statics, inits, epochs=6):
    embeds, hist = LY.train_layout(
        list(inits), tasks, statics, mode="fit", epochs=epochs,
        num_rep=4, lr=0.05, alpha=1.0, batch_size=32,
        a=1.577, b=0.8951, key=jax.random.PRNGKey(3), epoch_chunk=2,
    )
    return [np.asarray(e) for e in embeds], np.asarray(hist)


def test_split_engine_matches_fused(rng, monkeypatch):
    tasks, statics, inits = _fit_setup(rng)
    fused_embeds, fused_hist = _run(tasks, statics, inits)

    monkeypatch.setenv("MMUMAP_SPLIT_GRAD_ROWS", "1")
    before = LY._split_chunk_runner.cache_info()
    split_embeds, split_hist = _run(tasks, statics, inits)
    after = LY._split_chunk_runner.cache_info()
    assert after.currsize + after.hits > before.currsize + before.hits, (
        "split engine did not engage under MMUMAP_SPLIT_GRAD_ROWS=1")

    # Same key splits => identical randomness; grad(sum) vs sum(grads)
    # differ only in float accumulation order.
    np.testing.assert_allclose(split_hist, fused_hist, rtol=2e-5,
                               atol=1e-6)
    for s, f in zip(split_embeds, fused_embeds):
        np.testing.assert_allclose(s, f, rtol=5e-4, atol=1e-5)


def test_split_engine_without_infonce(rng, monkeypatch):
    """alpha=0 skips the InfoNCE dispatch entirely (two-dispatch
    epoch); the trajectory still matches the fused engine's."""
    tasks, statics, inits = _fit_setup(rng, dims=(9,))

    def run():
        embeds, hist = LY.train_layout(
            list(inits), tasks, statics, mode="fit", epochs=4,
            num_rep=4, lr=0.05, alpha=0.0, batch_size=32,
            a=1.577, b=0.8951, key=jax.random.PRNGKey(5), epoch_chunk=2,
        )
        return np.asarray(embeds[0]), np.asarray(hist)

    fused_e, fused_h = run()
    monkeypatch.setenv("MMUMAP_SPLIT_GRAD_ROWS", "1")
    split_e, split_h = run()
    np.testing.assert_allclose(split_h, fused_h, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(split_e, fused_e, rtol=5e-4, atol=1e-5)
