"""Scatter-free building blocks for the layout engine's gradients.

XLA lowers the backward of a random-index row gather to a scatter-add,
measured at ~16 ms per (1M, 64) aggregation on v5e; a naive autodiff
layout epoch contains 10+ of them. The v3 engine (models/layout.py)
keeps exactly ONE such scatter per modality and draws everything else
from structures whose backward is a reindex, not a scatter:

  * ``permutation_gather`` -- ``table[pi]`` for a permutation ``pi``:
    each output row receives exactly one cotangent row, so the VJP is
    ``ct[pi_inv]``, an exact gather-only reindexing;
  * ``random_permutation_pair`` -- a uniform permutation and its
    inverse (two sorts, ~0.3 ms at n=31k).

Alternatives that were implemented, measured on v5e, and rejected (see
commit history): transpose-ordered cumsum/associative-scan aggregation
(28.5 ms per (1M, 64) pass -- worse than the scatter it replaced);
padded per-column gather maps (hub in-degree ~8x-inflates the work);
and a cap-2k padded transpose map + hub-overflow scatter (round 2:
71 vs 36 ms/epoch bare attraction at 31k -- random row GATHERS at
(N, 2k, D) cost as much as the scatter they replace, so precomputing
the transpose buys nothing on this hardware).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def permutation_gather(table: jax.Array, pi: jax.Array, pi_inv: jax.Array):
    """``table[pi]`` whose VJP is ``ct[pi_inv]`` -- a gather, never a
    scatter. ``pi`` must be a permutation with inverse ``pi_inv``."""
    return table[pi]


def _perm_fwd(table, pi, pi_inv):
    return table[pi], (pi_inv,)


def _perm_bwd(res, ct):
    (pi_inv,) = res
    return ct[pi_inv], None, None


permutation_gather.defvjp(_perm_fwd, _perm_bwd)


def random_permutation_pair(key: jax.Array, n: int):
    """(pi, pi_inv) for a uniform random permutation of [0, n)."""
    pi = jax.random.permutation(key, n)
    pi_inv = jnp.argsort(pi)
    return pi.astype(jnp.int32), pi_inv.astype(jnp.int32)
