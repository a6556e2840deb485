"""Runs the torch reference end-to-end on small synthetic data and
records its evaluation metrics as quality-parity goldens.

The reference's inverse_transform crashes as shipped (SURVEY.md §2.10a);
the intended data-space init is patched in-memory here (the same
semantics our implementation adopts) so the recon metric is defined.

Usage: python tools/gen_e2e_goldens.py
"""

import json
import os
import sys
import time

import numpy as np
import torch

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from impl.model import UMAPMixture  # noqa: E402

from multimodal_umap_tpu.data.synthetic import clustered_modalities  # noqa: E402

import argparse

_p = argparse.ArgumentParser()
_p.add_argument("--variant", default="a", choices=["a", "b", "c"])
_args = _p.parse_args()

if _args.variant == "a":
    OUT_NAME = "reference_e2e.json"
    N_TRAIN, N_TEST, K, OUT_DIM = 256, 64, 8, 8
    EPOCHS, TEST_EPOCHS = 200, 60
    DIMS, N_CLUSTERS, SEED = (24, 40), 8, 11
elif _args.variant == "b":
    OUT_NAME = "reference_e2e_b.json"
    N_TRAIN, N_TEST, K, OUT_DIM = 320, 80, 10, 6
    EPOCHS, TEST_EPOCHS = 150, 50
    DIMS, N_CLUSTERS, SEED = (32, 16), 5, 23
else:
    OUT_NAME = "reference_e2e_c.json"
    N_TRAIN, N_TEST, K, OUT_DIM = 288, 72, 12, 10
    EPOCHS, TEST_EPOCHS = 180, 45
    DIMS, N_CLUSTERS, SEED = (20, 28), 6, 37

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                   OUT_NAME)


def main():
    rng_data = clustered_modalities(
        N_TRAIN + N_TEST, dims=DIMS, n_clusters=N_CLUSTERS, seed=SEED
    )
    x0 = torch.tensor(rng_data["texts"])
    x1 = torch.tensor(rng_data["images"])
    train = [x0[:N_TRAIN], x1[:N_TRAIN]]
    test = [x0[N_TRAIN:], x1[N_TRAIN:]]

    torch.manual_seed(0)
    t0 = time.time()
    model = UMAPMixture(k_neighbors=K, out_dim=OUT_DIM, min_dist=0.1,
                        num_encoders=2)

    # Intended invert semantics (SURVEY.md §2.10a): initialize the
    # reconstruction from training DATA rows, not latent rows.
    original_init = model.init.__func__

    def patched_init(self, inputs, mode="fit", data_indices=None):
        if mode != "invert":
            return original_init(self, inputs, mode, data_indices)
        inputs = [x for x in inputs]
        graphs, embeds = [], []
        indices = data_indices if data_indices is not None else range(
            self.num_encoders)
        for idx, i in enumerate(indices):
            enc = self.encoders[i]
            graph = enc.fuzzy_knn_graph(
                self.embeds[i], "invert", query=inputs[idx],
                ref_data=self.graphs[i], a=self.a, b=self.b)
            embed = enc.embed_query(self.data[i], graph)
            graphs.append(graph)
            embeds.append(embed)
        return graphs, embeds

    model.init = patched_init.__get__(model)

    model.fit(train, epochs=EPOCHS, num_rep=4, lr=0.05, alpha=1.0,
              batch_size=64)
    fit_s = time.time() - t0

    embeds = model.transform(test, epochs=TEST_EPOCHS, data_indices=[0, 1],
                             num_rep=4, lr=0.05, batch_size=64)
    e0 = torch.nn.functional.normalize(embeds[0], dim=1)
    e1 = torch.nn.functional.normalize(embeds[1], dim=1)
    cosine = float((e0 * e1).sum(dim=1).mean())

    correct = 0
    for idx in range(N_TEST):
        d_f = torch.norm(embeds[1] - embeds[0][idx], dim=1)
        if idx in torch.topk(d_f, 5, largest=False).indices:
            correct += 1
        d_b = torch.norm(embeds[0] - embeds[1][idx], dim=1)
        if idx in torch.topk(d_b, 5, largest=False).indices:
            correct += 1
    knn5 = correct / (2 * N_TEST)

    z = model.transform([test[0]], epochs=TEST_EPOCHS, data_indices=[0],
                        num_rep=4, lr=0.05, batch_size=64)
    recon = model.inverse_transform(z, epochs=TEST_EPOCHS,
                                    data_indices=[1], num_rep=4, lr=0.05,
                                    batch_size=64)[0]
    mse = float(((recon - test[1]) ** 2).mean())
    shuffled = float(((recon - test[1][torch.randperm(N_TEST)]) ** 2).mean())

    # Trustworthiness of the FIT embeddings per modality (the layout-
    # quality gauge named in BASELINE.json; computed last so the torch
    # RNG stream feeding the metrics above is unchanged vs older
    # goldens). The metric implementation is framework-neutral and
    # oracle-tested (tests/test_trustworthiness.py).
    from multimodal_umap_tpu.eval.trustworthiness import trustworthiness

    trust = [
        float(trustworthiness(
            np.asarray(train[i].cpu()), np.asarray(model.embeds[i].detach()),
            k=10,
        ))
        for i in range(2)
    ]

    golden = {
        "config": {"n_train": N_TRAIN, "n_test": N_TEST, "k": K,
                   "out_dim": OUT_DIM, "epochs": EPOCHS,
                   "test_epochs": TEST_EPOCHS, "dims": list(DIMS),
                   "n_clusters": N_CLUSTERS, "seed": SEED},
        "reference": {"cosine": cosine, "knn5": knn5, "recon_mse": mse,
                      "recon_mse_shuffled": shuffled,
                      "trustworthiness": trust,
                      "fit_seconds_cpu": fit_s},
    }
    with open(OUT, "w") as f:
        json.dump(golden, f, indent=2)
    print(json.dumps(golden, indent=2))


if __name__ == "__main__":
    main()
