"""kNN roofline closure (VERDICT r4 item 2, carried from r3): a full
per-stage + per-knob accounting of the 31744^2 D=4096 exact-kNN sweep
in ONE process, so the BASELINE.md roofline section can be written from
measured numbers instead of reconciled folklore.

Extends tools/profile_knn_stages.py (stage decomposition) with the
tuning axes that decomposition cannot see:

  dispatch   -- an empty-output jitted no-op: the per-dispatch RPC +
                host-readback floor of the axon tunnel (every wall
                time below includes exactly one of these).
  matmul     -- the bf16 cross-term alone at the production block
                shape: the MXU ceiling for THIS shape (the bench MFU
                denominator, 197 TFLOP/s, is the chip peak; a
                (8192 x 4096) @ (4096 x 31744) matmul has its own
                achievable ceiling below that).
  select[b]  -- panel + hier_topk_smallest at bin_size b in {64, 128,
                256}: the selection pass whose sort width scales with
                (candidates + margin) * bin_size.
  rescore[c] -- exact f32 re-score of the candidate set at gather
                chunk c in {512, 2048}: 62 vs 16 sequential scan steps
                over the same 16.6 GB of gathered rows.
  rowblock[r]-- the full public knn() at row_block r in {8192, 16384,
                32768}: fewer/larger panels amortize per-block
                selection overhead against a bigger HBM transient
                (a 32768 x 31744 f32 panel is 4.2 GiB).
  pipelined  -- N chained knn() calls synced ONCE: steady-state
                throughput with the tunnel RTT amortized, i.e. the
                number a production pipeline (graph phase inside fit)
                actually sees, vs the per-call wall the bench reports.

Usage: python tools/profile_knn_roofline.py [n] [d] [k] [reps]
Prints one JSON line; every entry is best-of-reps with chained inputs
(the tunnel memoizes identical-input jit calls) and true host-readback
sync.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_umap_tpu.data.synthetic import clustered_modalities_device
from multimodal_umap_tpu.ops.knn import (
    _candidate_width,
    hier_topk_smallest,
    knn,
)
from multimodal_umap_tpu.ops.knn_stream import (
    _exact_rescore_sq,
    _panel_sq,
    knn_streamed,
)
from multimodal_umap_tpu.utils.cache import enable_compilation_cache


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0][..., :1])
    return x


def best_of(fn, x, reps):
    out = fn(x)
    sync(out)  # warm/compile
    best = float("inf")
    cur = x + 0.0 * x[:1]
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(cur)
        leaf = jax.tree_util.tree_leaves(out)[0]
        cur = cur + 0.0 * leaf[:1, :1].astype(cur.dtype).mean()
        sync(cur)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    enable_compilation_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 31744
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    row_block = 8192
    x = clustered_modalities_device(n, dims=(d, 8), n_clusters=64,
                                    seed=2)["texts"]
    n_rb = -(-n // row_block)
    pad = n_rb * row_block - n
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    flops = 2.0 * n * n * d
    sel_width = _candidate_width(k, n - 1)
    out = {"n": n, "d": d, "k": k, "sel_width": sel_width}

    def record(name, sec, with_tflops=True):
        out[name + "_s"] = round(sec, 4)
        if with_tflops:
            out[name + "_tflops"] = round(flops / sec / 1e12, 1)
            out[name + "_mfu_pct"] = round(100 * flops / sec / 197e12, 1)

    # --- dispatch floor: a no-op program returning one scalar.
    @jax.jit
    def nop(xq):
        return xq[:1, :1] * 1.0

    record("dispatch", best_of(nop, xp, reps), with_tflops=False)

    # --- MXU ceiling for the production shape: cross terms only.
    @jax.jit
    def stage_matmul_all(xq):
        blocks = xq.reshape(n_rb, row_block, xq.shape[1])

        def step(_, q):
            c = jnp.dot(q.astype(jnp.bfloat16),
                        xq.astype(jnp.bfloat16).T,
                        preferred_element_type=jnp.float32)
            return None, c[:, :1] + c[:, -1:]

        _, o = jax.lax.scan(step, None, blocks)
        return o

    record("matmul", best_of(stage_matmul_all, xp, reps))

    # --- selection at several bin sizes (panel included; subtract the
    # panel-only stage from profile_knn_stages.py to isolate).
    for bs in (64, 128, 256):
        @jax.jit
        def stage_select(xq, bs=bs):
            blocks = xq.reshape(n_rb, row_block, xq.shape[1])

            def step(_, q):
                p = _panel_sq(q, xq, bf16=True)
                dsel, ids = hier_topk_smallest(p, sel_width, bin_size=bs)
                return None, (dsel[:, :1], ids[:, :1])

            _, o = jax.lax.scan(step, None, blocks)
            return o

        record(f"panel_select_bin{bs}", best_of(stage_select, xp, reps))

    # --- rescore gather-chunk sweep (the (N, cand, D) exact re-score).
    ids = jnp.tile(jnp.arange(sel_width, dtype=jnp.int32)[None], (n, 1))
    for chunk in (512, 2048):
        def stage_rescore(xq, chunk=chunk):
            return _exact_rescore_sq(xq[:n], xq[:n], ids, chunk)

        record(f"rescore_chunk{chunk}", best_of(stage_rescore, xp, reps),
               with_tflops=False)

    # --- full engine at several row blocks.
    for rb in (8192, 16384, 32768):
        def stage_full(xq, rb=rb):
            return knn_streamed(xq[:n], xq[:n], k, exclude_self=True,
                                row_block=rb)

        record(f"full_rowblock{rb}", best_of(stage_full, xp, reps))

    # --- pipelined steady-state: chain PIPE calls, sync once; report
    # per-call time. This is what fit's graph phase sees (it dispatches
    # both modalities' sweeps back-to-back), with the tunnel RTT
    # amortized instead of paid per call.
    PIPE = 4

    def stage_pipelined(xq):
        cur = xq[:n]
        outs = []
        for _ in range(PIPE):
            dists, ids_ = knn(cur, xq[:n], k, exclude_self=True)
            cur = cur + 0.0 * dists[:1, :1].mean()
            outs.append(ids_)
        return cur

    t = best_of(stage_pipelined, xp, max(1, reps - 1))
    record("pipelined_per_call", t / PIPE)

    # --- the bench-equivalent single call for reference.
    record("full_default", best_of(
        lambda xq: knn(xq[:n], xq[:n], k, exclude_self=True), xp, reps))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
