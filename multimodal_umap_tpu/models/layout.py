"""Layout optimizer: the embeddings themselves are the parameters.

Re-designs the reference's Python training loop
(reference impl/model.py:396-481) as a single jit-compiled epoch step
scanned over epochs. Semantics preserved exactly (SURVEY.md §2.6,
§2.10b-c):

  * per epoch, each edge is kept by a Bernoulli draw with probability
    equal to its fuzzy weight (impl/model.py:432);
  * each kept edge contributes one attraction term plus ``num_rep``
    uniformly-sampled repulsion terms;
  * edges are grouped into row-index windows of ``batch_size``; the
    modality loss is the *mean over windows of per-window means*
    (mean-of-means, impl/model.py:423-453) -- realized here with
    segment sums over a static window id, no dynamic shapes;
  * in fit mode the symmetric InfoNCE loss is added with effective
    weight 2*alpha (impl/model.py:459-472);
  * Adam takes ONE step per epoch on the summed loss
    (impl/model.py:474-476) -- full-batch Adam, which is why a single
    fused kernel per epoch is semantically exact.

Variable-size edge batches become weight-0 masked contributions; the
Bernoulli keep is a mask, never a gather, so every shape is static.
"""

from __future__ import annotations

import functools
import typing

import jax
import jax.numpy as jnp
import optax

from ..ops import losses as L
from ..ops.graph import EdgeGraph


class LayoutTask(typing.NamedTuple):
    """Per-modality dynamic state for the layout optimizer (a pytree).

    ``ref`` is None in fit mode (both edge endpoints are parameters),
    the frozen reference embeddings in transform mode, and the frozen
    training *data* in invert mode. ``sigmas``/``rhos`` are the fit-time
    bandwidths of the target modality, used only in invert mode.
    """

    rows: jax.Array
    cols: jax.Array
    weights: jax.Array
    valid: jax.Array
    ref: jax.Array | None
    sigmas: jax.Array | None
    rhos: jax.Array | None


class TaskStatic(typing.NamedTuple):
    """Static (compile-time) companions of a LayoutTask."""

    num_rows: int
    num_windows: int
    rep_count: int


def task_from_graph(
    graph: EdgeGraph,
    batch_size: int,
    ref: jax.Array | None = None,
    sigmas: jax.Array | None = None,
    rhos: jax.Array | None = None,
) -> tuple[LayoutTask, TaskStatic]:
    rep_count = int(ref.shape[0]) if ref is not None else graph.num_rows
    return (
        LayoutTask(
            rows=graph.rows,
            cols=graph.cols,
            weights=graph.weights,
            valid=graph.valid,
            ref=ref,
            sigmas=sigmas,
            rhos=rhos,
        ),
        TaskStatic(
            num_rows=graph.num_rows,
            num_windows=max(1, -(-graph.num_rows // batch_size)),
            rep_count=rep_count,
        ),
    )


def _modality_loss(
    embed: jax.Array,
    task: LayoutTask,
    static: TaskStatic,
    key: jax.Array,
    *,
    mode: str,
    a: jax.Array,
    b: jax.Array,
    num_rep: int,
    batch_size: int,
) -> jax.Array:
    """Mean-over-windows of per-window (attract + repel) means."""
    key_keep, key_neg = jax.random.split(key)
    num_edges = task.rows.shape[0]
    window = (task.rows // batch_size).astype(jnp.int32)

    keep = (
        jax.random.uniform(key_keep, (num_edges,)) < task.weights
    ) & task.valid
    keep_f = keep.astype(jnp.float32)
    cnt = jax.ops.segment_sum(keep_f, window, num_segments=static.num_windows)

    x_i = embed[task.rows]
    target = task.ref if task.ref is not None else embed
    y_j = target[task.cols]

    if mode == "invert":
        attr_e = L.inv_attr(x_i, y_j, a, b, task.sigmas[task.cols])
    else:
        attr_e = L.umap_attr(x_i, y_j, a, b)

    # num_rep negatives per edge, folded to keep live memory at
    # O(E * D); remat keeps autodiff from saving each iteration's
    # gathered rows (8 x 244 MB at flickr scale).
    neg_keys = jax.random.split(key_neg, num_rep)

    @jax.checkpoint
    def fold_neg(acc, nk):
        neg_idx = jax.random.randint(nk, (num_edges,), 0, static.rep_count)
        y_neg = target[neg_idx]
        if mode == "invert":
            rep = L.inv_rep(x_i, y_neg, task.sigmas[neg_idx], task.rhos[neg_idx])
        else:
            rep = L.umap_rep(x_i, y_neg, a, b)
        return acc + rep, None

    rep_sum, _ = jax.lax.scan(
        fold_neg, jnp.zeros(num_edges, dtype=jnp.float32), neg_keys
    )
    rep_mean = rep_sum / num_rep

    per_edge = keep_f * (attr_e + rep_mean)
    win_sum = jax.ops.segment_sum(
        per_edge, window, num_segments=static.num_windows
    )
    win_mean = jnp.where(cnt > 0, win_sum / jnp.maximum(cnt, 1.0), 0.0)
    return jnp.mean(win_mean)


def make_loss_fn(
    statics: typing.Sequence[TaskStatic],
    *,
    mode: str,
    num_rep: int,
    alpha: float,
    batch_size: int,
    n_neg_infonce: int = 8,
    infonce_temperature: float = 0.5,
):
    """Builds the total-loss function for one epoch.

    Signature of the returned fn: ``loss(params, tasks, ab, key)`` where
    ``params`` is a tuple of per-modality embedding arrays, ``tasks`` a
    tuple of LayoutTask pytrees, and ``ab`` the (a, b) curve pair.
    """
    num_modes = len(statics)

    def loss_fn(params, tasks, ab, key):
        a, b = ab
        keys = jax.random.split(key, num_modes + 1)
        total = jnp.float32(0.0)
        for i in range(num_modes):
            total = total + _modality_loss(
                params[i],
                tasks[i],
                statics[i],
                keys[i],
                mode=mode,
                a=a,
                b=b,
                num_rep=num_rep,
                batch_size=batch_size,
            )
        if mode == "fit" and num_modes > 1 and alpha != 0.0:
            # Symmetric InfoNCE added to both modality buckets => 2*alpha
            # effective weight (SURVEY.md §2.10c).
            pair_key = keys[-1]
            for i in range(num_modes):
                for j in range(i + 1, num_modes):
                    pair_key, k_ij, k_ji = jax.random.split(pair_key, 3)
                    l_ij = L.infonce(
                        k_ij, params[i], params[j],
                        n_neg=n_neg_infonce, temperature=infonce_temperature,
                    )
                    l_ji = L.infonce(
                        k_ji, params[j], params[i],
                        n_neg=n_neg_infonce, temperature=infonce_temperature,
                    )
                    total = total + alpha * (l_ij + l_ji)
        return total

    return loss_fn


def train_layout(
    init_embeds: typing.Sequence[jax.Array],
    tasks: typing.Sequence[LayoutTask],
    statics: typing.Sequence[TaskStatic],
    *,
    mode: str,
    epochs: int,
    num_rep: int,
    lr: float,
    alpha: float,
    batch_size: int,
    a: float,
    b: float,
    key: jax.Array,
    epoch_chunk: int = 100,
    chunk_callback=None,
) -> tuple[list[jax.Array], jax.Array]:
    """Runs the full-batch Adam layout optimization.

    Epochs are scanned in fixed ``epoch_chunk`` chunks inside one jit:
    any epoch count reuses at most two compiled programs (chunk +
    remainder) instead of one per scan length, and chunk boundaries are
    host sync points -- ``chunk_callback(epoch_idx, params, losses)``
    fires there for periodic checkpointing / loss streaming (the
    preemption-recovery hook, SURVEY.md §5.3).

    Returns (final embeddings per modality, per-epoch loss history).
    """
    if mode not in ("fit", "transform", "invert"):
        raise ValueError(f"invalid mode: {mode}")

    loss_fn = make_loss_fn(
        statics, mode=mode, num_rep=num_rep, alpha=alpha, batch_size=batch_size
    )
    # torch.optim.Adam defaults: betas=(0.9, 0.999), eps=1e-8, matching
    # optax.adam's bias-corrected update (reference impl/model.py:403).
    optimizer = optax.adam(lr)

    # Explicit copies: the chunk loop donates param buffers, and the
    # caller's init arrays must survive (donation would delete them).
    params = tuple(
        jnp.array(e, dtype=jnp.float32, copy=True) for e in init_embeds
    )
    opt_state = optimizer.init(params)
    tasks = tuple(tasks)
    ab = (jnp.float32(a), jnp.float32(b))

    @functools.partial(jax.jit, donate_argnames=("params", "opt_state"))
    def run_chunk(params, opt_state, tasks, ab, chunk_keys):
        def epoch_step(carry, ekey):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, tasks, ab, ekey)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), hist = jax.lax.scan(
            epoch_step, (params, opt_state), chunk_keys
        )
        return params, opt_state, hist

    epoch_keys = jax.random.split(key, epochs)
    history = []
    done = 0
    while done < epochs:
        take = min(epoch_chunk, epochs - done)
        params, opt_state, hist = run_chunk(
            params, opt_state, tasks, ab, epoch_keys[done : done + take]
        )
        done += take
        history.append(hist)
        if chunk_callback is not None:
            chunk_callback(done, params, hist)
    full_hist = (
        jnp.concatenate(history) if len(history) > 1 else history[0]
    )
    return list(params), full_hist
