"""Layout losses: UMAP attract/repel, inverse-mode attract/repel, InfoNCE.

Per-edge formulations matching reference impl/model.py:312-394 exactly,
including its conventions (SURVEY.md §2.5, §2.10d):
  * "dist" inside the attract/repel curves is the **squared** Euclidean
    distance clamped >= 1e-6, so a*d^b realizes a*||delta||^(2b);
  * repulsion adds 1e-6 inside the log;
  * inverse-mode attraction is ||delta|| / (q*sigma_j + 1e-6) with q the
    output-space curve weight; inverse repulsion uses the input-space
    fuzzy membership.

Everything here returns *per-sample* values; the window-mean /
mean-of-means weighting lives in models/layout.py where the reference's
batching semantics (impl/model.py:423-453) are reproduced.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sq_dist(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.maximum(jnp.sum((x - y) ** 2, axis=-1), 1e-6)


def umap_attr(x: jax.Array, y: jax.Array, a, b) -> jax.Array:
    """Per-edge attraction log(1 + a d^b), d = squared distance
    (reference impl/model.py:312-322)."""
    d = _sq_dist(x, y)
    return jnp.log1p(a * jnp.power(d, b))


def umap_rep(x: jax.Array, y: jax.Array, a, b) -> jax.Array:
    """Per-sample repulsion -log(a d^b / (1 + a d^b) + 1e-6)
    (reference impl/model.py:324-334)."""
    ad_b = a * jnp.power(_sq_dist(x, y), b)
    return -jnp.log(ad_b / (1.0 + ad_b) + 1e-6)


def inv_attr(x: jax.Array, ref: jax.Array, a, b, sigma_j: jax.Array) -> jax.Array:
    """Inverse-mode attraction ||delta|| / (q*sigma_j + 1e-6), q the
    output-space curve weight (reference impl/model.py:336-348)."""
    sq = _sq_dist(x, ref)
    dist = jnp.sqrt(sq)
    q = 1.0 / (1.0 + a * jnp.power(sq, b))
    return dist / (q * sigma_j + 1e-6)


def inv_rep(
    x: jax.Array, ref: jax.Array, sigma_j: jax.Array, rho_j: jax.Array
) -> jax.Array:
    """Inverse-mode repulsion -log(1 - exp(-max(d-rho,1e-6)/(sigma+1e-6)) + 1e-6)
    (reference impl/model.py:350-362)."""
    dist = jnp.sqrt(_sq_dist(x, ref))
    w = jnp.exp(-jnp.maximum(dist - rho_j, 1e-6) / (sigma_j + 1e-6))
    return -jnp.log(1.0 - w + 1e-6)


def _l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    # Gradient-safe at x == 0 (spectral-init rows can be exactly zero):
    # clamping the *squared* norm keeps d(sqrt)/dx finite, matching
    # torch F.normalize's eps-clamped denominator forward behavior.
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(sq, eps * eps))


# Above this many rows, infonce streams row blocks (see _per_elem_blocked):
# the whole-table form holds ~12-17 (num, D) buffers across fwd+bwd, which
# is GiBs at beyond-flickr N (tools/probe_infonce_memory.py).
_INFONCE_BLOCK_ROWS = 1 << 16


def _infonce_per_elem(
    e0: jax.Array,
    e1: jax.Array,
    permuted_1: jax.Array,
    q: jax.Array,
    rot: jax.Array,
    offsets: jax.Array,
    temperature: float,
    block_rows: int,
) -> jax.Array:
    """Whole-table per-element InfoNCE values (slot order; slot i holds
    the row with natural id (i + rot) % num)."""
    del block_rows
    num = e0.shape[0]
    anchors = _l2_normalize(jnp.roll(e0, -rot, axis=0))
    positives = _l2_normalize(jnp.roll(e1, -rot, axis=0))
    pos_sim = jnp.sum(anchors * positives, axis=1) / temperature

    neg_idx = (jnp.arange(num, dtype=jnp.int32)[:, None]
               + offsets[None, :]) % num  # (num, n_neg+1)
    neg_rows = q[neg_idx]  # actual negative row ids (int gather, no grad)
    anchor_ids = (jnp.arange(num, dtype=jnp.int32) + rot) % num
    not_self = neg_rows != anchor_ids[:, None]
    # Negative column c is the cyclic shift permuted_1[(i + off_c) % num]
    # == roll(permuted_1, -off_c). Rolling the ONCE-normalized table
    # instead of gathering (num, n_neg+1, D) copies keeps the backward a
    # roll (dynamic-slice VJP) -- no (num*(n_neg+1), D) scatter-add, and
    # the normalize runs once instead of n_neg+1 times. All n_neg+1
    # rolled tables materialize here (fwd + roll-back cotangents bwd,
    # ~36 (num, D) buffers for the pair) -- fine below the block
    # threshold (<= ~600 MB at 64k); past it infonce routes to
    # :func:`_infonce_per_elem_blocked` instead.
    normed_1 = _l2_normalize(permuted_1)
    neg_sim = jnp.stack(
        [jnp.sum(anchors * jnp.roll(normed_1, -offsets[c], axis=0), axis=1)
         for c in range(offsets.shape[0])],
        axis=1,
    ) / temperature
    neg_sim = jnp.where(not_self, neg_sim, -jnp.inf)

    logits = jnp.concatenate([pos_sim[:, None], neg_sim], axis=1)
    return -jax.nn.log_softmax(logits, axis=1)[:, 0]


def _infonce_per_elem_blocked(
    e0: jax.Array,
    e1: jax.Array,
    permuted_1: jax.Array,
    q: jax.Array,
    rot: jax.Array,
    offsets: jax.Array,
    temperature: float,
    block_rows: int,
) -> jax.Array:
    """Row-blocked per-element InfoNCE: same values as
    :func:`_infonce_per_elem`, O(block) live transients.

    Every access pattern in the loss is a cyclic shift of a table, so
    each table is extended with a wrap copy of its first ``block_rows``
    rows and every block becomes a contiguous ``dynamic_slice`` (start
    always < num, length block <= wrap margin). The backward is then
    ``dynamic_update_slice`` accumulation into the extended cotangent --
    contiguous, never a scatter -- preserving the engine's scatter-free
    property at any scale. Blocks run in a remat'd ``lax.scan``: live
    memory is the 3 extended tables + their cotangents + one block's
    transients, vs ~12-17 whole-table buffers for the unblocked form.
    Slots past ``num`` in the last block compute garbage from real rows;
    their outputs are sliced off, so their cotangents are exactly zero.
    """
    num, _ = e0.shape
    block = block_rows
    nb = -(-num // block)
    e0x = jnp.concatenate([e0, e0[:block]], axis=0)
    e1x = jnp.concatenate([e1, e1[:block]], axis=0)
    p1x = jnp.concatenate([permuted_1, permuted_1[:block]], axis=0)
    qx = jnp.concatenate([q, q[:block]])
    n_cols = offsets.shape[0]

    def body(_, s):
        a = _l2_normalize(
            jax.lax.dynamic_slice_in_dim(e0x, (s + rot) % num, block))
        p = _l2_normalize(
            jax.lax.dynamic_slice_in_dim(e1x, (s + rot) % num, block))
        pos_sim = jnp.sum(a * p, axis=1) / temperature
        anchor_ids = (s + jnp.arange(block, dtype=jnp.int32) + rot) % num
        cols = []
        for c in range(n_cols):
            st = (s + offsets[c]) % num
            nrm = _l2_normalize(
                jax.lax.dynamic_slice_in_dim(p1x, st, block))
            sim = jnp.sum(a * nrm, axis=1) / temperature
            neg_rows = jax.lax.dynamic_slice_in_dim(qx, st, block)
            cols.append(jnp.where(neg_rows != anchor_ids, sim, -jnp.inf))
        logits = jnp.stack([pos_sim] + cols, axis=1)
        return None, -jax.nn.log_softmax(logits, axis=1)[:, 0]

    starts = jnp.arange(nb, dtype=jnp.int32) * block
    _, pe = jax.lax.scan(jax.checkpoint(body), None, starts)
    return pe.reshape(-1)[:num]


def infonce(
    key: jax.Array,
    embeds_0: jax.Array,
    embeds_1: jax.Array,
    n_neg: int = 8,
    temperature: float = 0.5,
    group_size: int = 1000,
    block_rows: int | None = None,
) -> jax.Array:
    """Cross-modal InfoNCE alignment (reference impl/model.py:364-394).

    Paired rows are positives; ``n_neg + 1`` negatives per anchor with
    anchor-index collisions masked to -inf. The reference averages per
    1000-element groups of a fresh random permutation and then averages
    the group means -- reproduced with a padded fixed-shape permutation
    so the last (short) group carries the same weight.

    TPU notes (deviations whose marginals match the reference's; its own
    sampling is randomized, so parity is statistical, SURVEY.md §4):

    * negatives are drawn as rotations of one random permutation
      (negative of anchor slot i in column c is q[(i + off_c) % num])
      instead of iid uniform -- the backward becomes permutation/roll
      reindexing instead of a scatter-add (ops/scatter_free.py);
    * anchors/positives stay in row order rotated by one random offset
      instead of fully permuted. The permutation only determines the
      GROUPING for the mean-of-group-means (full groups of equal size
      contribute exactly the global mean either way); the rotation
      makes the short last group hit every row uniformly, matching the
      reference's random upweighting marginals while replacing two
      (num, D) gathers + their backward with cheap contiguous rolls.

    Returns the scalar loss (directional: anchors from ``embeds_0``).
    """
    from .scatter_free import permutation_gather, random_permutation_pair

    num = min(embeds_0.shape[0], embeds_1.shape[0])
    if num == 0:
        return jnp.float32(0.0)
    num_groups = -(-num // group_size)
    padded = num_groups * group_size

    key_rot, key_negperm, key_off = jax.random.split(key, 3)
    pad_mask = jnp.arange(padded) < num

    if num % group_size == 0:
        # Every group is full: mean-of-group-means == global mean for
        # ANY ordering -- no rotation needed (static shape, free check).
        rot = jnp.int32(0)
    else:
        rot = jax.random.randint(key_rot, (), 0, num)

    q, q_inv = random_permutation_pair(key_negperm, num)
    permuted_1 = permutation_gather(embeds_1[:num], q, q_inv)
    offsets = jax.random.randint(key_off, (n_neg + 1,), 0, num)

    if block_rows is None:
        block_rows = _INFONCE_BLOCK_ROWS
    per_fn = (_infonce_per_elem_blocked if num > block_rows
              else _infonce_per_elem)
    per_elem = per_fn(
        embeds_0[:num], embeds_1[:num], permuted_1, q, rot, offsets,
        temperature, block_rows,
    )

    per_elem = jnp.concatenate(
        [per_elem, jnp.zeros(padded - num, dtype=per_elem.dtype)]
    )
    per_elem = per_elem.reshape(num_groups, group_size)
    grp_mask = pad_mask.reshape(num_groups, group_size)
    grp_counts = jnp.maximum(jnp.sum(grp_mask, axis=1), 1)
    grp_means = jnp.sum(jnp.where(grp_mask, per_elem, 0.0), axis=1) / grp_counts
    return jnp.mean(grp_means)
