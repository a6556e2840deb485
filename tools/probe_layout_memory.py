"""AOT memory diagnosis of the layout chunk program at beyond-flickr N.

The 524k scale-ladder rung reproducibly kills the tunneled TPU worker
in the FIRST layout chunk (4/4 attempts, including on a healthy
tunnel), with no RESOURCE_EXHAUSTED surfaced -- the axon worker dies
instead of raising. This probe compiles the exact chunk program fit
would run (same shapes, same epoch_chunk) WITHOUT executing it and
prints XLA's static buffer accounting (`compiled.memory_analysis()`),
so an HBM overcommit shows up as numbers instead of a dead worker.

Usage: python -u tools/probe_layout_memory.py <graphs.npz> [epoch_chunk]
           [alpha] [num_rep] [split]
       python -u tools/probe_layout_memory.py synth:<n>[,k,d,m]
           [epoch_chunk] [alpha] [num_rep] [split]

A trailing ``split`` probes the split-dispatch engine's three programs
(models/layout.py _split_chunk_runner) instead of the fused chunk.

``alpha``/``num_rep`` ablate the InfoNCE / repulsion terms to localize
which loss component owns the temp bytes. The ``synth:`` form probes a
scale with no cached graph state (shapes are all lowering needs).
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_umap_tpu.models import layout as LY
from multimodal_umap_tpu.utils import checkpoint as ckpt
from multimodal_umap_tpu.ops.graph import DenseSymGraph


def _synth_shapes(spec: str):
    parts = (spec.split(":", 1)[1]).split(",")
    n = int(parts[0])
    k = int(parts[1]) if len(parts) > 1 else 15
    d = int(parts[2]) if len(parts) > 2 else 64
    m = int(parts[3]) if len(parts) > 3 else 2
    denses = [
        DenseSymGraph(
            nbrs=jax.ShapeDtypeStruct((n, k), jnp.int32),
            weights=jax.ShapeDtypeStruct((n, k), jnp.float32),
            bwd_valid=jax.ShapeDtypeStruct((n, k), jnp.bool_),
            num_rows=n,
        )
        for _ in range(m)
    ]
    inits = [jax.ShapeDtypeStruct((n, d), jnp.float32) for _ in range(m)]
    return denses, inits


def main():
    split = "split" in sys.argv
    if split:
        sys.argv = [a for a in sys.argv if a != "split"]
    path = sys.argv[1]
    if path.startswith("synth:"):
        denses, inits = _synth_shapes(path)
    else:
        with np.load(path, allow_pickle=False) as z:
            import json

            meta = json.loads(str(z["meta"]))
            m = meta["num_encoders"]
            denses, inits = [], []
            for i in range(m):
                num_rows, _ = meta["graph_shapes"][i]
                # Host-side: shapes only matter for lowering.
                denses.append(DenseSymGraph(
                    nbrs=jax.ShapeDtypeStruct(z[f"dense_{i}_nbrs"].shape,
                                              jnp.int32),
                    weights=jax.ShapeDtypeStruct(
                        z[f"dense_{i}_weights"].shape, jnp.float32),
                    bwd_valid=jax.ShapeDtypeStruct(
                        z[f"dense_{i}_bwd_valid"].shape, jnp.bool_),
                    num_rows=int(num_rows),
                ))
                inits.append(jax.ShapeDtypeStruct(z[f"init_{i}"].shape,
                                                  jnp.float32))

    batch_size, lr = 256, 0.01
    alpha = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    num_rep = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    tasks, statics = zip(*(LY.fit_task(d, batch_size) for d in denses))
    n = max(i.shape[0] for i in inits)
    chunk = (int(sys.argv[2]) if len(sys.argv) > 2
             else LY.default_epoch_chunk(n))
    print(f"n={n} epoch_chunk={chunk} "
          f"edge_slots={[d.nbrs.shape for d in denses]}")

    params = tuple(jax.ShapeDtypeStruct(i.shape, jnp.float32)
                   for i in inits)
    ab = (jax.ShapeDtypeStruct((), jnp.float32),) * 2

    def report(compiled, label=""):
        ma = compiled.memory_analysis()
        if ma is None:
            print("memory_analysis unavailable on this backend")
            return
        gb = 1 / (1 << 30)
        if label:
            print(f"-- {label}")
        print(f"arguments : {ma.argument_size_in_bytes * gb:8.2f} GiB")
        print(f"outputs   : {ma.output_size_in_bytes * gb:8.2f} GiB")
        print(f"temps     : {ma.temp_size_in_bytes * gb:8.2f} GiB")
        print(f"aliased   : {ma.alias_size_in_bytes * gb:8.2f} GiB")
        print(f"code      : {ma.generated_code_size_in_bytes * gb:8.2f} GiB")
        peak = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
        print(f"peak (arg+out+temp-alias): {peak * gb:8.2f} GiB "
              f"of ~16 GiB HBM")

    if split:
        import optax

        key = jax.ShapeDtypeStruct((2,), jnp.uint32)
        grads = params
        opt_state = jax.eval_shape(optax.adam(lr).init, params)
        term_list = [(f"grad_{t}", t) for t in
                     [f"modality_{i}" for i in range(len(statics))]
                     + ["infonce_ij", "infonce_ji"]]
        # Legacy joint programs for comparison:
        term_list += [("grad_mod(joint)", "modality"),
                      ("grad_nce(joint)", "infonce")]
        for label, terms in term_list:
            loss = LY.make_loss_fn(
                tuple(statics), mode="fit", num_rep=num_rep, alpha=alpha,
                batch_size=batch_size, terms=terms)
            fn = jax.jit(jax.value_and_grad(loss))
            report(fn.lower(params, tuple(tasks), ab, key).compile(),
                   label)

        optimizer = optax.adam(lr)

        def apply_update(p, s, g1, g2):
            g = jax.tree_util.tree_map(jnp.add, g1, g2)
            updates, s = optimizer.update(g, s, p)
            return optax.apply_updates(p, updates), s

        fn = jax.jit(apply_update, donate_argnums=(0, 1, 2, 3))
        report(fn.lower(params, opt_state, grads, grads).compile(),
               "apply_update")
        return

    optimizer, run_chunk = LY._chunk_runner(
        tuple(statics), "fit", num_rep, lr, alpha, batch_size,
        tuple(None for _ in inits),
    )
    opt_state = jax.eval_shape(optimizer.init, params)
    keys = jax.ShapeDtypeStruct((chunk, 2), jnp.uint32)
    lowered = jax.jit(
        run_chunk.__wrapped__,  # unwrap the donation jit to re-jit AOT
        donate_argnums=(0, 1),
    ).lower(params, opt_state, tuple(tasks), ab, keys)
    report(lowered.compile())


if __name__ == "__main__":
    main()
