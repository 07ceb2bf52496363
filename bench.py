"""Benchmark: edges/s/chip for the 5-layer QA-GNN message-passing TRAIN step
(fwd + bwd over params and inputs + SGD update, train=True: BatchNorm batch
statistics and dropout active).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (its only perf instrumentation
is an ms/batch print, reference qagnn.py:282), so vs_baseline is reported
against a fixed nominal target of 1e8 edges/s/chip — an estimate of the
reference's CUDA PyG pipeline on a contemporary GPU for this model shape
(6k-edge subgraphs, dim 200, 4 heads, 5 layers).

Shapes mirror the CSQA paper config: 200-node subgraphs, 4096-edge budget,
dim 200, k=5, batch of 64 graphs (~13 questions x 5 choices).

Timing methodology (important on remote-tunneled runtimes): the step is
CHAINED — iteration i+1 consumes iteration i's updated params/inputs — and
the timed region ends with a host readback, so asynchronous dispatch,
result caching, or optimistic futures cannot shave real execution time.
Per-step time is the SLOPE between a short and a long run, cancelling
fixed dispatch/transfer overhead.

Usage: python bench.py [--backend onehot|scatter|pallas] [--iters N] [--small]
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default=None,
                    help="sparse backend (default: auto per platform)")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"],
                    help="GNN compute dtype (params stay fp32)")
    ap.add_argument("--iters", type=int, default=25,
                    help="long-run iteration count (short run = iters//5)")
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes for a quick smoke run")
    ap.add_argument("--eval", action="store_true",
                    help="bench train=False (no BN update / dropout)")
    args = ap.parse_args()

    import numpy as np
    import jax
    # persistent compile cache: repeat bench runs skip the (minutes-long)
    # remote TPU compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/qagnn_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import jax.tree_util as jtu
    from qagnn_tpu.models.gnn import QAGNNMessagePassing

    if args.small:
        G, N, E, D, K = 4, 16, 64, 32, 2
    else:
        G, N, E, D, K = 64, 200, 4096, 200, 5
    N_NTYPE, N_ETYPE = 4, 38

    rng = np.random.default_rng(0)
    H = jnp.asarray(rng.standard_normal((G, N, D)), jnp.float32)
    node_type = jnp.asarray(rng.integers(0, N_NTYPE, (G, N)), jnp.int32)
    node_score = jnp.asarray(rng.standard_normal((G, N)), jnp.float32)
    edge_src = jnp.asarray(rng.integers(0, N, (G, E)), jnp.int32)
    edge_dst = jnp.asarray(rng.integers(0, N, (G, E)), jnp.int32)
    edge_type = jnp.asarray(rng.integers(0, N_ETYPE, (G, E)), jnp.int32)
    edge_mask = jnp.ones((G, E), bool)

    train = not args.eval
    model = QAGNNMessagePassing(k=K, n_ntype=N_NTYPE, n_etype=N_ETYPE,
                                hidden_size=D,
                                dropout=0.2 if train else 0.0,
                                backend=args.backend,
                                dtype=getattr(jnp, args.dtype))
    variables = model.init(jax.random.PRNGKey(0), H, node_type, node_score,
                           edge_src, edge_dst, edge_type, edge_mask,
                           train=False)
    key = jax.random.PRNGKey(1)

    def loss_fn(params, H, batch_stats, dkey):
        v = {"params": params, "batch_stats": batch_stats}
        if train:
            out, upd = model.apply(
                v, H, node_type, node_score, edge_src, edge_dst,
                edge_type, edge_mask, train=True,
                rngs={"dropout": dkey}, mutable=["batch_stats"])
            return jnp.sum(out * out), upd["batch_stats"]
        out = model.apply(v, H, node_type, node_score, edge_src, edge_dst,
                          edge_type, edge_mask, train=False)
        return jnp.sum(out * out), batch_stats

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)

    @jax.jit
    def step(params, H, batch_stats, i):
        # a real (chained) train step: params/inputs/BN stats all advance,
        # so no two iterations are identical and every grad is consumed
        (loss, batch_stats), (gp, gH) = grad_fn(
            params, H, batch_stats, jax.random.fold_in(key, i))
        params = jtu.tree_map(lambda p, g: p - 1e-5 * g.astype(p.dtype),
                              params, gp)
        H = H + 1e-4 * gH
        return params, H, batch_stats, loss

    def run(n):
        p, x, bs = variables["params"], H, variables["batch_stats"]
        loss = None
        t0 = time.perf_counter()
        for i in range(n):
            p, x, bs, loss = step(p, x, bs, i)
        _ = float(loss)   # host readback: forces real completion
        return time.perf_counter() - t0

    run(2)   # compile + warm
    lo, hi = max(args.iters // 5, 2), args.iters
    t_lo = run(lo)
    t_hi = run(hi)
    dt = (t_hi - t_lo) / (hi - lo)

    edges_per_step = G * E * K  # edges aggregated per fwd(+bwd) pass
    value = edges_per_step / dt
    baseline = 1e8
    print(json.dumps({
        "metric": "gnn_5layer_train_step_edges_per_s_per_chip",
        "value": round(value, 1),
        "unit": "edges/s",
        "vs_baseline": round(value / baseline, 3),
    }))


if __name__ == "__main__":
    main()
