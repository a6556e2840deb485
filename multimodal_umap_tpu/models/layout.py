"""Layout optimizer: the embeddings themselves are the parameters.

Re-designs the reference's Python training loop
(reference impl/model.py:396-481) as a single jit-compiled epoch step
scanned over epochs. Semantics preserved (SURVEY.md §2.6, §2.10b-c):

  * per epoch, each nonzero of the symmetric fuzzy matrix is kept by a
    Bernoulli draw with probability equal to its weight
    (impl/model.py:432) -- both directed copies of a pair are distinct
    draws, as in the reference's coalesced COO;
  * each kept entry contributes one attraction term plus ``num_rep``
    repulsion terms against uniform rows;
  * entries are grouped into row-index windows of ``batch_size``; the
    modality loss is the mean over windows of per-window means
    (mean-of-means, impl/model.py:423-453);
  * in fit mode the symmetric InfoNCE loss is added with effective
    weight 2*alpha (impl/model.py:459-472);
  * Adam takes ONE step per epoch on the summed loss
    (impl/model.py:474-476) -- full-batch Adam, which is why a single
    fused program per epoch is semantically exact.

TPU-native dense formulation (v3). XLA's scatter-add costs ~16 ms per
(1M, 64) aggregation on v5e and a naive autodiff epoch needs 10+ of
them; log-depth scan substitutes are no better. This engine removes
every edge-sized gradient aggregation:

  * the fit graph lives in its forward (N, k) kNN layout; the
    transposed copies are represented by per-slot Bernoulli masks and
    COEFFICIENTS (both copies of a pair share the same attraction value
    f(x_i, x_j), so the loss is sum over forward slots of
    (c_fwd + c_bwd) * f) -- the anchor-side gradient reduces over the k
    axis for free;
  * exactly one scatter-add per modality per epoch remains (the
    neighbor-gather backward, ~8 ms at flickr scale) -- measured cheaper
    than every scatter-free substitute tried (padded column-gather maps,
    transpose-ordered prefix scans);
  * fit-mode repulsion negatives are rolls of ONE randomly permuted
    copy of the embedding table (round r's negative for row i is
    permuted[(i + off_r) % n]), SHARED by the kept entries anchored at
    a row: per-entry marginals stay uniform and the expected loss
    matches the reference's iid draws, while gradients become dense
    (N, D) arithmetic plus one inverse-permutation reindex for all
    rounds. (Deviation from the reference's iid sampling: same-row
    entries share a round's negative and rounds share a permutation.
    The reference itself is randomized; parity gates are statistical,
    SURVEY.md §4.)
  * transform/invert keep the reference's iid negatives verbatim: their
    reference side is frozen, so no aggregation ever arises.

``deterministic=True`` replaces Bernoulli keeps with their expectation
(soft weights), making the loss a deterministic function -- used by
tests to compare this engine against a naive autodiff implementation.
"""

from __future__ import annotations

import functools
import os
import re
import time
import typing

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import losses as L
from ..ops.graph import DenseSymGraph
from ..ops.scatter_free import (
    permutation_gather,
    random_permutation_pair,
)


class LayoutTask(typing.NamedTuple):
    """Per-modality dynamic state for the layout optimizer (a pytree).

    Fit mode: ``nbrs/weights/bwd_valid`` from :class:`DenseSymGraph`,
    ``ref`` is None.
    Transform/invert: (Q, k) query graph arrays; ``ref`` holds the
    frozen reference table (embeddings / training data);
    ``sigmas``/``rhos`` are the fit-time bandwidths (invert only).
    """

    nbrs: jax.Array  # (Q, k) int32
    weights: jax.Array  # (Q, k) f32
    bwd_valid: jax.Array | None  # (N, k) bool, fit only
    ref: jax.Array | None
    sigmas: jax.Array | None
    rhos: jax.Array | None


class TaskStatic(typing.NamedTuple):
    """Static (compile-time) companions of a LayoutTask."""

    num_rows: int
    num_windows: int
    rep_count: int


def fit_task(
    dense: DenseSymGraph, batch_size: int
) -> tuple[LayoutTask, TaskStatic]:
    return (
        LayoutTask(
            nbrs=dense.nbrs,
            weights=dense.weights,
            bwd_valid=dense.bwd_valid,
            ref=None,
            sigmas=None,
            rhos=None,
        ),
        TaskStatic(
            num_rows=dense.num_rows,
            num_windows=max(1, -(-dense.num_rows // batch_size)),
            rep_count=dense.num_rows,
        ),
    )


def query_task(
    nbrs: jax.Array,
    weights: jax.Array,
    batch_size: int,
    ref: jax.Array,
    sigmas: jax.Array | None = None,
    rhos: jax.Array | None = None,
) -> tuple[LayoutTask, TaskStatic]:
    q = nbrs.shape[0]
    return (
        LayoutTask(
            nbrs=nbrs.astype(jnp.int32),
            weights=weights.astype(jnp.float32),
            bwd_valid=None,
            ref=ref,
            sigmas=sigmas,
            rhos=rhos,
        ),
        TaskStatic(
            num_rows=q,
            num_windows=max(1, -(-q // batch_size)),
            rep_count=int(ref.shape[0]),
        ),
    )


def _window_means_from_rows(
    row_vals: jax.Array,
    row_cnt: jax.Array,
    batch_size: int,
    num_windows: int,
) -> jax.Array:
    """Per-window mean of per-entry values given per-row sums/counts."""

    def wsum(x):
        n = x.shape[0]
        padded = num_windows * batch_size
        if padded != n:
            x = jnp.pad(x, (0, padded - n))
        return x.reshape(num_windows, batch_size).sum(axis=1)

    win_sum = wsum(row_vals)
    cnt = wsum(row_cnt)
    return jnp.where(cnt > 0, win_sum / jnp.maximum(cnt, 1.0), 0.0)


def _inv_window_coef(
    row_cnt: jax.Array, batch_size: int, num_windows: int
) -> jax.Array:
    """(N,) per-row coefficient 1/(cnt_window(row) * W), 0 on empty."""
    n = row_cnt.shape[0]
    padded = num_windows * batch_size
    x = jnp.pad(row_cnt, (0, padded - n)) if padded != n else row_cnt
    cnt_w = x.reshape(num_windows, batch_size).sum(axis=1)
    inv = jnp.where(cnt_w > 0, 1.0 / jnp.maximum(cnt_w, 1.0), 0.0)
    inv = inv / num_windows
    return jnp.repeat(inv, batch_size)[:n]


# Above this many bytes for the (N, k, D) attraction gather, the fit
# loss scans neighbor slots with remat instead (memory: O(N*D)).
_ATTR_SLOT_BYTES = 1 << 30

# Above this many rows, each modality's fit loss is wrapped in
# jax.checkpoint so the modalities' backward transients serialize
# (peak = max, not sum). The recompute is one extra forward of (N, k)
# elementwise work per modality -- noise next to its own backward.
_MODALITY_REMAT_ROWS = 1 << 18


def _fit_modality_loss(
    embed: jax.Array,
    task: LayoutTask,
    static: TaskStatic,
    key: jax.Array,
    *,
    a: jax.Array,
    b: jax.Array,
    num_rep: int,
    batch_size: int,
    deterministic: bool,
    part: str = "both",
) -> jax.Array:
    """``part`` selects the attraction ("attr"), repulsion ("rep") or
    full ("both") addend. The PRNG splits and the keep/row-count
    machinery are computed identically for every part (keys are drawn
    by index), so attr + rep == both exactly at draw level -- the
    beyond-HBM split engine dispatches the two halves as separate
    programs whose temps never co-reserve HBM (the 1M per-modality
    grad still carried ~4.6 GiB of fwd+bwd temps as ONE program)."""
    n, k = task.nbrs.shape
    key_f, key_b, key_neg = jax.random.split(key, 3)

    if deterministic:
        keep_f = task.weights
        keep_b = task.weights * task.bwd_valid.astype(jnp.float32)
    else:
        keep_f = (
            jax.random.uniform(key_f, (n, k)) < task.weights
        ).astype(jnp.float32)
        keep_b = (
            (jax.random.uniform(key_b, (n, k)) < task.weights)
            & task.bwd_valid
        ).astype(jnp.float32)

    # Kept-entry counts anchored at each row: forward slots directly,
    # transposed slots grouped by column (forward-only, no grad path --
    # a single (N*k,) scalar segment sum).
    bwd_cnt = jax.ops.segment_sum(
        keep_b.reshape(-1), task.nbrs.reshape(-1),
        num_segments=static.num_rows,
    )
    rowcnt = keep_f.sum(axis=1) + bwd_cnt
    inv_row = _inv_window_coef(rowcnt, batch_size, static.num_windows)

    if part == "rep":
        loss_attr = jnp.float32(0.0)
    else:
        loss_attr = _fit_attraction(embed, task, keep_f, keep_b,
                                    inv_row, a=a, b=b)
    if num_rep == 0 or part == "attr":
        return loss_attr

    loss_rep = _fit_repulsion(embed, static, key, rowcnt, inv_row,
                              a=a, b=b, num_rep=num_rep)
    if part == "rep":
        return loss_rep
    return loss_attr + loss_rep


def _fit_attraction(embed, task, keep_f, keep_b, inv_row, *, a, b):
    # Both copies of a pair share f(x_i, x_j); windows differ: the
    # forward copy is windowed by i, the transposed copy by j.
    coef = keep_f * inv_row[:, None] + keep_b * inv_row[task.nbrs]

    # Plain gather: its backward is ONE (N*k, D) scatter-add per
    # modality per epoch (~8 ms at flickr scale) -- measured cheaper
    # than every precomputed-transpose substitute tried, including a
    # cap-2k padded map + hub-overflow scatter (71 vs 36 ms/epoch bare
    # attraction at 31k; random row gathers cost like the scatter).
    # Past _ATTR_SLOT_BYTES the (N, k, D) gather + its autodiff
    # residuals no longer fit HBM next to the feature tables (at
    # N=1M/k=15/D=64 they are ~8 GB in a 16 GB chip already holding
    # 10 GB of bf16 features), so the attraction scans the k neighbor
    # slots with rematerialization: per-slot transients are (N, D) and
    # total traffic is unchanged.
    n, k = task.nbrs.shape
    if n * k * embed.shape[1] * 4 > _ATTR_SLOT_BYTES:
        def slot(acc, xs):
            nbrs_m, coef_m = xs  # (N,), (N,)
            y_m = embed[nbrs_m]  # (N, D)
            return acc + jnp.sum(
                coef_m * L.umap_attr(embed, y_m, a, b)), None

        loss_attr, _ = jax.lax.scan(
            jax.checkpoint(slot),
            jnp.float32(0.0),
            (task.nbrs.T, coef.T),
        )
    else:
        y = embed[task.nbrs]  # (N, k, D)
        attr = L.umap_attr(embed[:, None, :], y, a, b)  # (N, k)
        loss_attr = jnp.sum(coef * attr)
    return loss_attr


def _fit_repulsion(embed, static, key, rowcnt, inv_row, *, a, b, num_rep):
    # Row-level permutation negatives; each row's kept entries share the
    # round's negative (see module docstring). One permutation gather
    # serves all ``num_rep`` rounds: round r's negative for row i is
    # permuted[(i + off_r) % n], i.e. a contiguous roll of the permuted
    # table -- uniform marginals per round at 1/num_rep the irregular
    # traffic (and sorts) of fresh per-round permutations.
    n = embed.shape[0]
    # Key indices match _fit_modality_loss exactly: the repulsion only
    # ever consumes the key_neg lane.
    _, _, key_neg = jax.random.split(key, 3)
    rep_coef = rowcnt * inv_row  # (N,)

    key_negperm, key_base, key_negoff = jax.random.split(key_neg, 3)
    pi, pi_inv = random_permutation_pair(key_negperm, static.rep_count)
    permuted = permutation_gather(embed, pi, pi_inv)

    def fold_neg(acc, off):
        neg = jnp.roll(permuted, -off, axis=0)
        return acc + L.umap_rep(embed, neg, a, b), None

    # Remat: without it the scan saves each round's rolled (N, D) table
    # and elementwise residuals for the backward -- ~5.3 GiB of XLA
    # temps at N=524k (tools/probe_layout_memory.py ablation); with it
    # one round's transients are live at a time.
    fold_neg = jax.checkpoint(fold_neg)

    # Distinct per-round roll offsets via disjoint strata: round r draws
    # uniformly inside its own stride-s stratum, then a shared uniform
    # rotation makes every round's marginal uniform over [0, n). Two
    # rounds can never collide (ADVICE r2: with-replacement draws let
    # two rounds share one offset, doubling that round's variance).
    stride = max(1, static.rep_count // num_rep)
    base = jax.random.randint(key_base, (), 0, static.rep_count)
    intra = jax.random.randint(key_negoff, (num_rep,), 0, stride)
    offs = (
        base + jnp.arange(num_rep, dtype=jnp.int32) * stride + intra
    ) % static.rep_count
    rep_sum, _ = jax.lax.scan(
        fold_neg,
        jnp.zeros(n, dtype=jnp.float32),
        offs,
    )
    return jnp.sum(rep_coef * (rep_sum / num_rep))


def _query_modality_loss(
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
    deterministic: bool,
) -> jax.Array:
    """Transform/invert: queries attract to frozen reference rows and
    repel from iid-uniform reference rows (reference impl/model.py:
    399-449 with frozen refs). No gradient ever reaches ``ref``, so the
    whole loss is (Q, k)-dense with free anchor-side gradients."""
    q, k = task.nbrs.shape
    key_keep, key_neg = jax.random.split(key)

    if deterministic:
        keep = task.weights
    else:
        keep = (
            jax.random.uniform(key_keep, (q, k)) < task.weights
        ).astype(jnp.float32)

    y_j = task.ref[task.nbrs]  # (Q, k, D), frozen
    x = embed[:, None, :]
    if mode == "invert":
        attr = L.inv_attr(x, y_j, a, b, task.sigmas[task.nbrs])
    else:
        attr = L.umap_attr(x, y_j, a, b)

    if num_rep > 0:
        def fold_neg(acc, nk):
            neg_idx = jax.random.randint(
                nk, (q, k), 0, static.rep_count
            )
            y_neg = task.ref[neg_idx]
            if mode == "invert":
                rep = L.inv_rep(
                    x, y_neg, task.sigmas[neg_idx], task.rhos[neg_idx]
                )
            else:
                rep = L.umap_rep(x, y_neg, a, b)
            return acc + rep, None

        rep_sum, _ = jax.lax.scan(
            fold_neg,
            jnp.zeros((q, k), dtype=jnp.float32),
            jax.random.split(key_neg, num_rep),
        )
        per_slot = keep * (attr + rep_sum / num_rep)
    else:
        per_slot = keep * attr

    row_vals = per_slot.sum(axis=1)
    row_cnt = keep.sum(axis=1)
    win_mean = _window_means_from_rows(
        row_vals, row_cnt, batch_size, static.num_windows
    )
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
    deterministic: bool = False,
    terms: str = "all",
):
    """Builds the total-loss function for one epoch.

    Signature of the returned fn: ``loss(params, tasks, ab, key)`` where
    ``params`` is a tuple of per-modality embedding arrays, ``tasks`` a
    tuple of LayoutTask pytrees, and ``ab`` the (a, b) curve pair.

    ``terms`` selects which addends of the fit loss the function
    computes: ``"all"`` (the total), ``"modality"`` (every modality's
    attraction + repulsion), ``"modality_<i>"`` (ONE modality's),
    ``"infonce"`` (the symmetric InfoNCE alignment only) or
    ``"infonce_ij"``/``"infonce_ji"`` (one direction of every pair's
    InfoNCE). The single-term variants exist for the beyond-HBM split
    engine, which dispatches each addend as its own program so no two
    terms' fwd+bwd transients ever co-reserve HBM. The per-epoch key
    is split identically in every case (keys are drawn by INDEX, never
    sequentially consumed), so the sum of any complete partition of
    terms equals ``loss("all")`` up to float summation order,
    randomness included -- :func:`_split_chunk_runner` relies on this.
    """
    num_modes = len(statics)
    sel_mod = None
    sel_part = "both"
    if terms.startswith("modality_"):
        m = re.fullmatch(r"modality_(\d+)(?:_(attr|rep))?", terms)
        if m is None:
            raise ValueError(f"invalid terms: {terms}")
        sel_mod = int(m.group(1))
        sel_part = m.group(2) or "both"
        if not 0 <= sel_mod < num_modes:
            raise ValueError(f"invalid terms: {terms}")
    elif terms not in ("all", "modality", "infonce", "infonce_ij",
                       "infonce_ji"):
        raise ValueError(f"invalid terms: {terms}")

    def loss_fn(params, tasks, ab, key):
        a, b = ab
        keys = jax.random.split(key, num_modes + 1)
        total = jnp.float32(0.0)
        run_modalities = terms in ("all", "modality") or sel_mod is not None
        for i in range(num_modes if run_modalities else 0):
            if sel_mod is not None and i != sel_mod:
                continue
            if mode == "fit":
                def fit_loss(p, task, ab_, k, i=i):
                    return _fit_modality_loss(
                        p, task, statics[i], k,
                        a=ab_[0], b=ab_[1], num_rep=num_rep,
                        batch_size=batch_size,
                        deterministic=deterministic,
                        part=sel_part,
                    )

                if statics[i].num_rows > _MODALITY_REMAT_ROWS:
                    # Beyond-flickr N: remat each modality's loss so the
                    # two modalities' backward transients cannot be
                    # scheduled to overlap -- peak temp is the max of
                    # the per-modality costs instead of their sum.
                    fit_loss = jax.checkpoint(fit_loss)
                total = total + fit_loss(
                    params[i], tasks[i], (a, b), keys[i])
            else:
                total = total + _query_modality_loss(
                    params[i], tasks[i], statics[i], keys[i],
                    mode=mode, a=a, b=b, num_rep=num_rep,
                    batch_size=batch_size, deterministic=deterministic,
                )
        if (terms != "modality" and sel_mod is None and mode == "fit"
                and num_modes > 1 and alpha != 0.0):
            # Symmetric InfoNCE added to both modality buckets => 2*alpha
            # effective weight (SURVEY.md §2.10c). Memory at scale is
            # handled inside the loss itself: past 64k rows it streams
            # row blocks in a remat'd scan (ops/losses.py
            # _infonce_per_elem_blocked), so no outer checkpoint is
            # needed (an outer jax.checkpoint measured WORSE -- it
            # re-runs the whole forward in the backward while saving
            # buffers the blocked form never materializes).
            infonce_fn = functools.partial(
                L.infonce, n_neg=n_neg_infonce,
                temperature=infonce_temperature,
            )
            pair_key = keys[-1]
            for i in range(num_modes):
                for j in range(i + 1, num_modes):
                    # The key derivation below is IDENTICAL for every
                    # ``terms`` value (both directions' keys are always
                    # split off), so single-direction variants see the
                    # same randomness the fused loss does.
                    pair_key, k_ij, k_ji = jax.random.split(pair_key, 3)
                    if terms == "infonce_ij":
                        total = total + alpha * infonce_fn(
                            k_ij, params[i], params[j])
                    elif terms == "infonce_ji":
                        total = total + alpha * infonce_fn(
                            k_ji, params[j], params[i])
                    else:
                        l_ij = infonce_fn(k_ij, params[i], params[j])
                        l_ji = infonce_fn(k_ji, params[j], params[i])
                        total = total + alpha * (l_ij + l_ji)
        return total

    return loss_fn


@functools.lru_cache(maxsize=64)
def _chunk_runner(
    statics: tuple,
    mode: str,
    num_rep: int,
    lr: float,
    alpha: float,
    batch_size: int,
    param_shardings: tuple,
):
    """(optimizer, jitted chunk step), cached on the full static config.

    Hoisted out of :func:`train_layout` so repeated same-shape runs --
    the evaluation phase alone re-enters the transform/invert layout
    five times (similarity, kNN per pair, crossmodal embed + recon,
    SURVEY.md §2.10l) -- reuse ONE in-memory executable instead of
    re-tracing and re-loading a fresh jit cache entry per call
    (measured 17-27 s of the 31k e2e, VERDICT round 1 weak #2/#8).
    """
    loss_fn = make_loss_fn(
        statics, mode=mode, num_rep=num_rep, alpha=alpha,
        batch_size=batch_size,
    )
    # torch.optim.Adam defaults: betas=(0.9, 0.999), eps=1e-8, matching
    # optax.adam's bias-corrected update (reference impl/model.py:403).
    optimizer = optax.adam(lr)

    def pin(params):
        return tuple(
            jax.lax.with_sharding_constraint(p, s) if s is not None else p
            for p, s in zip(params, param_shardings)
        )

    @functools.partial(jax.jit, donate_argnames=("params", "opt_state"))
    def run_chunk(params, opt_state, tasks, ab, chunk_keys):
        def epoch_step(carry, ekey):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, tasks, ab, ekey)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = pin(optax.apply_updates(params, updates))
            return (params, opt_state), loss

        (params, opt_state), hist = jax.lax.scan(
            epoch_step, (params, opt_state), chunk_keys
        )
        return params, opt_state, hist

    return optimizer, run_chunk


def _split_grad_rows() -> int:
    """Row count past which single-device fits use the split-dispatch
    epoch engine (``MMUMAP_SPLIT_GRAD_ROWS`` overrides)."""
    return int(os.environ.get("MMUMAP_SPLIT_GRAD_ROWS", 600_000))


def call_with_oom_healing(fn, *args):
    """Call ``fn(*args)`` with in-process rest-and-retry on a clean
    device OOM.

    The tunneled worker's allocation ceiling DIPS after other sessions
    die (it reclaims their HBM asynchronously -- measured 2026-08-19:
    ~15 -> ~8 GiB across a string of process deaths, recovering with
    idle time). A clean RESOURCE_EXHAUSTED from a dispatch does NOT
    poison the client (unlike a worker crash), so the correct response
    is to REST IN-PROCESS (``MMUMAP_OOM_WAIT_S``, default 120 s) and
    retry the same call up to ``MMUMAP_OOM_RETRIES`` times: a process
    death here would itself add to the worker's reclamation debt and
    restart the run minutes behind, while a pause lets the ceiling
    recover. The OOM's exception TYPE varies with where it surfaces
    (JaxRuntimeError at the readback, ValueError at dispatch-time
    allocation), so the filter is on the backend's error string, not
    the type. Callers must NOT donate ``args``: a retry re-dispatches
    with the same buffers.
    """
    tries = int(os.environ.get("MMUMAP_OOM_RETRIES", 6))
    wait_s = float(os.environ.get("MMUMAP_OOM_WAIT_S", 120))
    for t in range(tries):
        try:
            return fn(*args)
        except Exception as e:  # noqa: BLE001 -- filtered below
            if "RESOURCE_EXHAUSTED" not in str(e) or t == tries - 1:
                raise
            print(f"[layout] RESOURCE_EXHAUSTED on grad dispatch; "
                  f"resting {wait_s:.0f}s for the worker to reclaim "
                  f"(retry {t + 1}/{tries - 1})", flush=True)
            time.sleep(wait_s)


@functools.lru_cache(maxsize=16)
def _split_chunk_runner(
    statics: tuple,
    num_rep: int,
    lr: float,
    alpha: float,
    batch_size: int,
):
    """One-dispatch-per-loss-term fit epoch for beyond-HBM scales.

    The fused epoch program at 1M rows needs 10.07 GiB of XLA temps:
    its parts account for only 7.44 (attraction 2.58 + repulsion 2.96 +
    InfoNCE 1.90) -- XLA schedules the InfoNCE and modality backward
    transients to OVERLAP, and neither remat nor donation changes that
    within one program (AOT ablation, tools/probe_layout_memory.py).
    Compiling the addends as SEPARATE dispatches is a scheduling
    barrier XLA cannot undo. Every weaker split was measured to still
    OOM on the real 1M run (round-4 3/3 fused; then at the apply
    enqueue with one sync; then inside the joint two-direction InfoNCE
    grad; then inside the joint two-modality grad on a
    partially-reclaimed worker -- .ladder forensics 2026-08-19, probe
    tools/probe_dispatch_overlap.py), so the epoch is maximally split:

      1. value_and_grad of EACH modality's attraction and repulsion
         losses SEPARATELY (terms="modality_<i>_attr"/"_rep");
      2. value_and_grad of EACH direction of every pair's InfoNCE
         (terms="infonce_ij"/"infonce_ji");
      3. after each grad dispatch: a scalar host readback (on axon
         only readback drains the queue -- enqueued-but-unexecuted
         programs hold their temp reservations), then a donated
         elementwise accumulate into one running grad tree;
      4. one Adam update on the accumulated grads (donates
         params/opt_state).

    Peak live bytes become residents + ONE term's fwd+bwd temps
    (~2.6 GiB modality / ~3.4 GiB InfoNCE-direction at 1M) + the
    single held grad tree (~0.5 GiB), vs the fused program's 11.85 GiB
    joint peak. All sub-losses split the epoch key exactly as the
    fused loss does (keys are drawn by index), so the trajectory
    matches the fused engine's up to float summation order
    (tests/test_layout_split.py). The f32 host adds of the loss
    scalars perform the same IEEE round-to-nearest the device adds
    would. Costs ~2 * terms dispatches + readbacks per epoch
    (~0.2-0.4 s of tunnel RPC against a ~10 s 1M epoch).

    Fit mode only: transform/invert have no InfoNCE term and their
    (Q, k)-dense losses never approach HBM.
    """
    optimizer = optax.adam(lr)
    # Finest partition: each modality's attraction and repulsion are
    # separate dispatches too (2026-08-20: at 1M even the single
    # joint-modality grad's ~4.6 GiB of temps OOM'd on a worker whose
    # ceiling was sunk by prior process deaths; the halves carry ~2.3
    # GiB each). Cost is ~2 extra dispatches+readbacks per modality per
    # epoch -- ~0.1 s of tunnel RPC against a ~10 s 1M epoch.
    term_names = []
    for i in range(len(statics)):
        term_names.append(f"modality_{i}_attr")
        if num_rep > 0:
            term_names.append(f"modality_{i}_rep")
    if len(statics) > 1 and alpha != 0.0:
        term_names += ["infonce_ij", "infonce_ji"]
    grad_terms = tuple(
        jax.jit(jax.value_and_grad(make_loss_fn(
            statics, mode="fit", num_rep=num_rep, alpha=alpha,
            batch_size=batch_size, terms=t,
        )))
        for t in term_names
    )

    @functools.partial(jax.jit, donate_argnames=("g_acc", "g_new"))
    def accumulate(g_acc, g_new):
        return jax.tree_util.tree_map(jnp.add, g_acc, g_new)

    @functools.partial(
        jax.jit, donate_argnames=("params", "opt_state", "grads")
    )
    def apply_update(params, opt_state, grads):
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    def grad_term_once(grad_term, params, tasks, ab, key):
        """One grad dispatch + its readback. The readback happens
        inside the healing retry scope (call_with_oom_healing) because
        enqueue succeeds optimistically -- the OOM surfaces at the
        sync. Nothing here is donated, so a retry re-dispatches the
        same buffers."""
        l_t, g_t = grad_term(params, tasks, ab, key)
        return np.float32(l_t), g_t

    def run_chunk(params, opt_state, tasks, ab, chunk_keys):
        losses = []
        for i in range(chunk_keys.shape[0]):
            key = chunk_keys[i]
            loss = np.float32(0.0)
            g_acc = None
            for grad_term in grad_terms:
                # The readback is a true host sync: it frees this
                # dispatch's temps before the next one enqueues (on
                # axon only readback drains the queue). float(f32) is
                # exact.
                l_t, g_t = call_with_oom_healing(
                    grad_term_once, grad_term, params, tasks, ab, key)
                loss = loss + l_t
                g_acc = g_t if g_acc is None else accumulate(g_acc, g_t)
            params, opt_state = apply_update(params, opt_state, g_acc)
            losses.append(loss)
        return params, opt_state, jnp.stack(losses)

    return optimizer, run_chunk


def default_epoch_chunk(num_rows: int) -> int:
    """N-adaptive scan length for the epoch chunks.

    One chunk is ONE device dispatch, and the tunneled worker dies
    under long single dispatches (~40 s survives, ~60+ s reproducibly
    faults -- the same duration limit that host-chunks the kNN sweep,
    ops/knn_stream.py). Measured epoch cost is ~1.6e-6 s/row on v5e
    (49.7 ms at 31k, 0.42 s at 262k, BASELINE.md), so the chunk targets
    <= ~25 s of device time per dispatch. Past ``_MODALITY_REMAT_ROWS``
    the per-epoch cost is a small multiple of that extrapolation (the
    remat'd backward recomputes each modality's forward and InfoNCE
    streams row blocks), and a 30-epoch chunk at 524k measured as a
    reproducible worker fault on the first dispatch -- the budget there
    drops to ~6 epochs at 524k / 3 at 1M. Floor 2, cap 100 (the cap
    keeps small-N runs on at most two compiled programs).
    ``MMUMAP_EPOCH_CHUNK`` overrides.
    """
    env = os.environ.get("MMUMAP_EPOCH_CHUNK")
    if env:
        return max(1, int(env))
    if num_rows > 600_000:
        # XLA double-buffers scan iterations: any chunk >= 2 keeps TWO
        # epochs' temps live (AOT-measured at 1M: 11.85 GiB peak at
        # chunk 1 vs 16.29 -- over HBM -- at chunk 2;
        # tools/probe_layout_memory.py). One epoch per dispatch is the
        # only configuration that fits past ~600k rows on one v5e.
        return 1
    if num_rows > _MODALITY_REMAT_ROWS:
        return max(2, min(100, int(3.2e6 / num_rows)))
    return max(4, min(100, int(1.6e7 / max(num_rows, 1))))


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
    epoch_chunk: int | None = None,
    chunk_callback=None,
    start_epoch: int = 0,
    init_opt_state=None,
    consume_inits: bool = False,
) -> tuple[list[jax.Array], jax.Array]:
    """Runs the full-batch Adam layout optimization.

    Epochs are scanned in fixed ``epoch_chunk`` chunks inside one jit
    (default: :func:`default_epoch_chunk` of the widest modality): any
    epoch count reuses at most two compiled programs (chunk +
    remainder) instead of one per scan length, and chunk boundaries are
    host sync points -- ``chunk_callback(epoch_idx, params, opt_state,
    losses)`` fires there for periodic checkpointing / loss streaming
    (the preemption-recovery hook, SURVEY.md §5.3).

    ``start_epoch``/``init_opt_state`` resume a preempted run: the
    per-epoch PRNG keys are the tail of the same stream, so a resumed
    run replays exactly the epochs the original would have run.

    Returns (final embeddings per modality, per-epoch loss history
    covering epochs [start_epoch, epochs)).
    """
    if mode not in ("fit", "transform", "invert"):
        raise ValueError(f"invalid mode: {mode}")
    if epoch_chunk is None:
        epoch_chunk = default_epoch_chunk(
            max(e.shape[0] for e in init_embeds))

    # Explicit copies: the chunk loop donates param buffers, and the
    # caller's init arrays must survive (donation would delete them).
    params = tuple(
        jnp.array(e, dtype=jnp.float32, copy=True) for e in init_embeds
    )
    if consume_inits and isinstance(init_embeds, list):
        # The caller handed over ownership: release the original init
        # buffers now that the working copies exist -- at 1M/D=64 the
        # spectral inits are 512 MB of HBM the epoch program needs.
        init_embeds.clear()

    # Pin mesh-sharded parameters to their input placement: at small
    # sizes GSPMD may otherwise resolve outputs to replicated.
    from jax.sharding import NamedSharding

    param_shardings = tuple(
        e.sharding if isinstance(e.sharding, NamedSharding) else None
        for e in params
    )

    # Mesh runs route through the explicit shard_map engine
    # (models/layout_sharded.py): one table all-gather forward + one
    # reduce-scatter backward per modality per epoch, vs the ~22x-table
    # collective volume GSPMD emitted for the same semantics (VERDICT
    # r2 next-step 3). Odd (mesh-indivisible) sizes keep the GSPMD
    # path, which handles them via replication.
    mesh = next(
        (s.mesh for s in param_shardings
         if s is not None and s.mesh.devices.size > 1),
        None,
    )
    if mesh is not None:
        from .layout_sharded import sharded_chunk_runner, sharded_compatible

        if sharded_compatible(params, tasks, statics, mesh):
            # Wide frozen reference tables (invert mode at feature
            # width) must not be all-gathered per chunk -- past the
            # threshold each device would materialize the full (N, D)
            # table (16 GB at 1M x 4096 f32). The ring engine keeps
            # them sharded (VERDICT r3 item 6).
            ref_gather = "full"
            if mode != "fit":
                thresh = float(os.environ.get(
                    "MMUMAP_REF_GATHER_BYTES", 1 << 30))
                if any(t.ref is not None
                       and t.ref.size * t.ref.dtype.itemsize > thresh
                       for t in tasks):
                    ref_gather = "ring"
            optimizer, run_chunk = sharded_chunk_runner(
                tuple(statics), mode, num_rep, lr, alpha, batch_size,
                mesh, ref_gather,
            )
        else:
            mesh = None
    if mesh is None:
        if (mode == "fit"
                and max(s.num_rows for s in statics) > _split_grad_rows()):
            # Beyond-HBM single-device fit: the fused epoch's scheduled
            # peak overcommits the chip (see _split_chunk_runner).
            optimizer, run_chunk = _split_chunk_runner(
                tuple(statics), num_rep, lr, alpha, batch_size,
            )
        else:
            optimizer, run_chunk = _chunk_runner(
                tuple(statics), mode, num_rep, lr, alpha, batch_size,
                param_shardings,
            )
    opt_state = (
        init_opt_state if init_opt_state is not None
        else optimizer.init(params)
    )
    tasks = tuple(tasks)
    ab = (jnp.float32(a), jnp.float32(b))

    epoch_keys = jax.random.split(key, epochs)
    history = []
    done = start_epoch
    while done < epochs:
        take = min(epoch_chunk, epochs - done)
        params, opt_state, hist = run_chunk(
            params, opt_state, tasks, ab, epoch_keys[done : done + take]
        )
        done += take
        history.append(hist)
        if chunk_callback is not None:
            chunk_callback(done, params, opt_state, hist)
    if not history:
        # start_epoch >= epochs: a snapshot already recorded the final
        # epoch (the callback fires at done == epochs); return the
        # loaded params untouched with an empty loss history.
        return list(params), jnp.zeros((0,), dtype=jnp.float32)
    full_hist = (
        jnp.concatenate(history) if len(history) > 1 else history[0]
    )
    return list(params), full_hist
