"""End-to-end quality parity vs the executed reference.

tools/gen_e2e_goldens.py ran the torch reference (with the intended
invert semantics patched in, SURVEY.md §2.10a) on fixed small synthetic
datasets and recorded its evaluation metrics. These tests run OUR
pipeline on the identical data and configuration and require
match-or-beat within statistical bands (both pipelines are randomized;
SURVEY.md §4: parity is statistical, not bitwise). Three independent
golden configurations guard against band-fitting to one dataset.

Bands (tightened per VERDICT round 1 task 4): cosine >= ref - 0.03,
knn5 >= 0.9x ref, recon MSE <= 1.1x ref, trustworthiness >= ref - 0.02
per modality -- exact kNN should match or beat the reference's
randomized NN-descent graphs. The knn5 gate averages over a few model
seeds (see _KNN5_SEEDS) because at these test sizes a single draw's
counting noise is comparable to the band width."""

import glob
import json
import os

import numpy as np
import pytest

from multimodal_umap_tpu.data.synthetic import clustered_modalities
from multimodal_umap_tpu.models.mixture import MultimodalUMAP

GOLDEN_FILES = sorted(glob.glob(
    os.path.join(os.path.dirname(__file__), "goldens", "reference_e2e*.json")
))


def _knn5(e0: np.ndarray, e1: np.ndarray) -> float:
    n_test = e0.shape[0]
    d = np.linalg.norm(e0[:, None] - e1[None, :], axis=2)
    fwd = np.argsort(d, axis=1)[:, :5]
    bwd = np.argsort(d.T, axis=1)[:, :5]
    ids = np.arange(n_test)[:, None]
    return float(
        (np.any(fwd == ids, 1).mean() + np.any(bwd == ids, 1).mean()) / 2
    )


# Model seeds the knn5 gate averages over. At n_test <= 72 the
# retrieval metric's counting noise alone is ~4pp (sigma of a mean of
# ~144 Bernoulli outcomes), so a single fit/transform draw sits within
# noise of the 0.9x band edge and ANY legitimate PRNG-stream change
# (e.g. the round-2 advisor's distinct-negative-offsets fix) re-rolls
# it. The mean over a few model seeds gates the ESTIMATOR, not one
# draw; cosine/recon/trust are stable at seed 0 and stay single-run.
_KNN5_SEEDS = (0, 1, 2)


def _run_pipeline(golden):
    cfg = golden["config"]
    data = clustered_modalities(
        cfg["n_train"] + cfg["n_test"], dims=tuple(cfg["dims"]),
        n_clusters=cfg["n_clusters"], seed=cfg["seed"],
    )
    n_tr = cfg["n_train"]
    train = [data["texts"][:n_tr], data["images"][:n_tr]]
    test = [data["texts"][n_tr:], data["images"][n_tr:]]

    knn5_vals = []
    model = None
    for seed in _KNN5_SEEDS:
        m = MultimodalUMAP(cfg["k"], cfg["out_dim"], 0.1, num_encoders=2,
                           seed=seed)
        m.fit(train, epochs=cfg["epochs"], num_rep=4, lr=0.05, alpha=1.0,
              batch_size=64)
        embeds = m.transform(test, epochs=cfg["test_epochs"],
                             data_indices=[0, 1], num_rep=4, lr=0.05,
                             batch_size=64)
        knn5_vals.append(_knn5(np.asarray(embeds[0]), np.asarray(embeds[1])))
        if seed == 0:
            model = m
            e0, e1 = np.asarray(embeds[0]), np.asarray(embeds[1])
    knn5 = float(np.mean(knn5_vals))

    e0n = e0 / np.maximum(np.linalg.norm(e0, axis=1, keepdims=True), 1e-12)
    e1n = e1 / np.maximum(np.linalg.norm(e1, axis=1, keepdims=True), 1e-12)
    cosine = float((e0n * e1n).sum(1).mean())

    z = model.transform([test[0]], epochs=cfg["test_epochs"],
                        data_indices=[0], num_rep=4, lr=0.05,
                        batch_size=64)
    recon = np.asarray(
        model.inverse_transform(z, epochs=cfg["test_epochs"],
                                data_indices=[1], num_rep=4, lr=0.05,
                                batch_size=64)[0]
    )
    mse = float(np.mean((recon - np.asarray(test[1])) ** 2))

    from multimodal_umap_tpu.eval.trustworthiness import trustworthiness

    trust = [
        float(trustworthiness(np.asarray(train[i]),
                              np.asarray(model.embeds[i]), k=10))
        for i in range(2)
    ]
    return {"cosine": cosine, "knn5": knn5, "recon_mse": mse,
            "trustworthiness": trust}


@pytest.fixture(scope="module", params=GOLDEN_FILES,
                ids=[os.path.basename(p) for p in GOLDEN_FILES])
def case(request):
    with open(request.param) as f:
        golden = json.load(f)
    return golden, _run_pipeline(golden)


def test_cosine_parity(case):
    golden, results = case
    ref = golden["reference"]["cosine"]
    assert results["cosine"] >= ref - 0.03, (results, ref)


def test_knn_retrieval_parity(case):
    golden, results = case
    ref = golden["reference"]["knn5"]
    assert results["knn5"] >= 0.9 * ref, (results, ref)


def test_recon_mse_parity(case):
    golden, results = case
    ref = golden["reference"]["recon_mse"]
    assert results["recon_mse"] <= 1.1 * ref, (results, ref)


def test_trustworthiness_parity(case):
    """Layout-quality gauge (BASELINE.json): exact-kNN graphs should
    yield fit embeddings at least as trustworthy as the reference's
    randomized NN-descent graphs, per modality."""
    golden, results = case
    refs = golden["reference"]["trustworthiness"]
    for ours, ref in zip(results["trustworthiness"], refs):
        assert ours >= ref - 0.02, (results["trustworthiness"], refs)
