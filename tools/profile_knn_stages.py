"""Per-stage roofline accounting of the streamed kNN sweep (VERDICT r3
next-step 4): where do the milliseconds of the 31744^2 D=4096 sweep go?

Stages timed independently at the production block shape (row_block
8192, col_block full width), best-of-reps with chained inputs (the axon
tunnel memoizes identical-input jit calls) and true host-readback sync:

  matmul    -- the bf16 cross-term alone (the MXU FLOP floor)
  panel     -- + norms, broadcast add, clamp, masks (VPU/HBM)
  select    -- + hier_topk_smallest at the bf16 candidate width
  sweep     -- the fused _stream_all scan (all row blocks)
  rescore   -- exact f32 re-score + final top-k of the candidates
  full      -- public knn() end to end

Prints one JSON line with seconds + achieved TFLOP/s per stage.

Usage: python tools/profile_knn_stages.py [n] [d] [k]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_umap_tpu.data.synthetic import clustered_modalities_device
from multimodal_umap_tpu.ops.knn import _candidate_width, hier_topk_smallest
from multimodal_umap_tpu.ops.knn_stream import _panel_sq, _stream_all
from multimodal_umap_tpu.utils.cache import enable_compilation_cache


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0][..., :1])
    return x


def best_of(fn, x, reps=3):
    """Best-of-reps wall time; chains the input through iterations so
    the tunnel cannot serve a memoized result."""
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
    row_block = 8192
    x = clustered_modalities_device(n, dims=(d, 8), n_clusters=64,
                                    seed=2)["texts"]
    n_rb = -(-n // row_block)
    pad = n_rb * row_block - n
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    flops = 2.0 * n * n * d
    sel_width = _candidate_width(k, n - 1)

    @jax.jit
    def stage_matmul(xq):
        q = xq[:row_block]
        return sum(
            jnp.dot(q.astype(jnp.bfloat16)[:, : d // 1],
                    xq.astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32)[:, :1]
            for _ in range(1)
        )

    @jax.jit
    def stage_matmul_all(xq):
        # All row blocks' cross terms, reduced to keep output tiny.
        blocks = xq.reshape(n_rb, row_block, xq.shape[1])

        def step(_, q):
            c = jnp.dot(q.astype(jnp.bfloat16),
                        xq.astype(jnp.bfloat16).T,
                        preferred_element_type=jnp.float32)
            return None, c[:, :1] + c[:, -1:]

        _, out = jax.lax.scan(step, None, blocks)
        return out

    @jax.jit
    def stage_panel_all(xq):
        blocks = xq.reshape(n_rb, row_block, xq.shape[1])

        def step(_, q):
            p = _panel_sq(q, xq, bf16=True)
            return None, p[:, :1] + p[:, -1:]

        _, out = jax.lax.scan(step, None, blocks)
        return out

    @jax.jit
    def stage_select_all(xq):
        blocks = xq.reshape(n_rb, row_block, xq.shape[1])

        def step(_, q):
            p = _panel_sq(q, xq, bf16=True)
            dsel, ids = hier_topk_smallest(p, sel_width)
            return None, (dsel[:, :1], ids[:, :1])

        _, out = jax.lax.scan(step, None, blocks)
        return out

    def stage_sweep(xq):
        return _stream_all(xq, xq, jnp.int32(n), jnp.int32(0), sel_width,
                           True, row_block, min(32768, xq.shape[0]), True)

    def stage_full(xq):
        from multimodal_umap_tpu.ops.knn import knn

        return knn(xq[:n], xq[:n], k, exclude_self=True)

    results = {}
    results["matmul_one_block_s"] = best_of(stage_matmul, xp)
    results["matmul_s"] = best_of(stage_matmul_all, xp)
    results["panel_s"] = best_of(stage_panel_all, xp)
    results["select_s"] = best_of(stage_select_all, xp)
    results["sweep_s"] = best_of(stage_sweep, xp)
    results["full_s"] = best_of(stage_full, xp)

    out = {"n": n, "d": d, "k": k, "sel_width": sel_width}
    for name, sec in results.items():
        out[name] = round(sec, 4)
        out[name.replace("_s", "_tflops")] = round(flops / sec / 1e12, 1)
    out["mfu_pct_full"] = round(100 * flops / results["full_s"] / 197e12, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
