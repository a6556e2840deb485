"""Generates golden parity fixtures by executing the reference
implementation (torch, CPU) on fixed inputs.

The reference at /root/reference is the oracle (SURVEY.md §4): its
deterministic stages (sigma solve, a/b curve fit, loss formulas,
symmetrization, spectral operator) are evaluated on inputs we control
and the outputs are committed as tests/goldens/*.npz. Tests never
import the reference at runtime.

Usage: python tools/gen_goldens.py
"""

import os
import sys

import numpy as np
import torch

sys.path.insert(0, "/root/reference")
from impl.model import UMAPEncoder, UMAPMixture  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
os.makedirs(OUT, exist_ok=True)

rng = np.random.default_rng(1234)
out = {}

# --- 1. sigma solver -------------------------------------------------------
k = 15
n = 64
base = np.sort(rng.gamma(2.0, 1.0, size=(n, k)).astype(np.float32), axis=1)
enc = UMAPEncoder(k_neighbors=k, out_dim=8)
dists_t = torch.tensor(base)
min_dists = dists_t.min(dim=1).values.unsqueeze(1).repeat(1, k)
sigmas = enc.get_sigmas(dists_t, min_dists)
out["sigma_dists"] = base
out["sigma_rhos"] = min_dists[:, 0].numpy()
out["sigma_values"] = sigmas.numpy()

# --- 2. a/b curve fit ------------------------------------------------------
mixture = UMAPMixture.__new__(UMAPMixture)
min_dists_grid = np.array([0.01, 0.05, 0.1, 0.25, 0.5, 1.0], dtype=np.float32)
ab = np.array(
    [mixture.get_ab_coeffs(float(md)) for md in min_dists_grid],
    dtype=np.float32,
)
out["ab_min_dists"] = min_dists_grid
out["ab_values"] = ab

# --- 3. loss formulas ------------------------------------------------------
m = UMAPMixture.__new__(UMAPMixture)
emb = torch.tensor(rng.normal(size=(40, 6)).astype(np.float32))
ref = torch.tensor(rng.normal(size=(50, 6)).astype(np.float32))
i_idx = torch.tensor(rng.integers(0, 40, size=64))
j_idx = torch.tensor(rng.integers(0, 40, size=64))
jr_idx = torch.tensor(rng.integers(0, 50, size=64))
sig = torch.tensor(rng.gamma(2.0, 0.5, size=50).astype(np.float32))
rho = torch.tensor(rng.gamma(1.0, 0.3, size=50).astype(np.float32))
a_t, b_t = 1.577, 0.8951

out["loss_embeds"] = emb.numpy()
out["loss_ref"] = ref.numpy()
out["loss_i_idx"] = i_idx.numpy()
out["loss_j_idx"] = j_idx.numpy()
out["loss_jr_idx"] = jr_idx.numpy()
out["loss_sigma"] = sig.numpy()
out["loss_rho"] = rho.numpy()
out["loss_ab"] = np.array([a_t, b_t], dtype=np.float32)
out["loss_attr"] = m._umap_attr_loss(emb, i_idx, j_idx, a_t, b_t).item()
out["loss_rep"] = m._umap_rep_loss(emb, i_idx, j_idx, a_t, b_t).item()
out["loss_attr_ref"] = m._umap_attr_loss(
    emb, i_idx, jr_idx, a_t, b_t, ref=ref
).item()
out["loss_rep_ref"] = m._umap_rep_loss(
    emb, i_idx, jr_idx, a_t, b_t, ref=ref
).item()
out["loss_inv_attr"] = m._inv_attr_loss(
    emb, i_idx, jr_idx, a_t, b_t, ref, sig
).item()
out["loss_inv_rep"] = m._inv_rep_loss(emb, i_idx, jr_idx, ref, sig, rho).item()

# --- 4. symmetrization + spectral ------------------------------------------
n_g, k_g = 96, 6
feats = rng.normal(size=(n_g, 12)).astype(np.float32)
d = np.linalg.norm(feats[:, None, :] - feats[None, :, :], axis=2)
np.fill_diagonal(d, np.inf)
nbr_ids = np.argsort(d, axis=1)[:, :k_g].astype(np.int64)
nbr_d = np.take_along_axis(d, nbr_ids, axis=1).astype(np.float32)

enc_g = UMAPEncoder(k_neighbors=k_g, out_dim=4)
d_t = torch.tensor(nbr_d)
md_t = d_t.min(dim=1).values.unsqueeze(1).repeat(1, k_g)
sig_g = enc_g.get_sigmas(d_t, md_t)
w_g = torch.exp(-(d_t - md_t) / sig_g.unsqueeze(1))

rows_t = torch.arange(n_g).repeat_interleave(k_g)
cols_t = torch.tensor(nbr_ids.reshape(-1))
adj = torch.sparse_coo_tensor(
    torch.stack([rows_t, cols_t]), w_g.flatten(), (n_g, n_g)
).coalesce()
sym = (adj + adj.transpose(0, 1) - adj * adj.transpose(0, 1)).coalesce()

out["sym_nbrs"] = nbr_ids.astype(np.int32)
out["sym_dists"] = nbr_d
out["sym_weights"] = w_g.numpy()
out["sym_dense"] = sym.to_dense().numpy()

vecs = enc_g.embed_all(sym)
out["spectral_vectors"] = vecs.numpy()

np.savez(os.path.join(OUT, "reference_goldens.npz"), **out)
print("wrote", os.path.join(OUT, "reference_goldens.npz"))
for key, val in sorted(out.items()):
    arr = np.asarray(val)
    print(f"  {key}: shape={arr.shape} dtype={arr.dtype}")
