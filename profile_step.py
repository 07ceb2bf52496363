"""Capture a profiler trace of the bench train step on the TPU.

Usage: python profile_step.py [--backend onehot|scatter|pallas]
                              [--trace-dir DIR]
"""
import argparse
import numpy as np
import jax, jax.numpy as jnp
import jax.tree_util as jtu

jax.config.update("jax_compilation_cache_dir", "/tmp/qagnn_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qagnn_tpu.models.gnn import QAGNNMessagePassing

ap = argparse.ArgumentParser()
ap.add_argument("--backend", default="onehot")
ap.add_argument("--trace-dir", default="/tmp/qagnn_prof")
cli_args = ap.parse_args()

G, N, E, D, K = 64, 200, 4096, 200, 5
rng = np.random.default_rng(0)
H = jnp.asarray(rng.standard_normal((G, N, D)), jnp.float32)
node_type = jnp.asarray(rng.integers(0, 4, (G, N)), jnp.int32)
node_score = jnp.asarray(rng.standard_normal((G, N)), jnp.float32)
edge_src = jnp.asarray(rng.integers(0, N, (G, E)), jnp.int32)
edge_dst = jnp.asarray(rng.integers(0, N, (G, E)), jnp.int32)
edge_type = jnp.asarray(rng.integers(0, 38, (G, E)), jnp.int32)
edge_mask = jnp.ones((G, E), bool)

model = QAGNNMessagePassing(k=K, n_ntype=4, n_etype=38, hidden_size=D,
                            dropout=0.2, backend=cli_args.backend,
                            dtype=jnp.bfloat16)
from qagnn_tpu.utils.initialization import init_variables
variables = init_variables(model, jax.random.PRNGKey(0), H, node_type,
                           node_score, edge_src, edge_dst, edge_type,
                           edge_mask, train=False)
key = jax.random.PRNGKey(1)

def loss_fn(params, H, batch_stats, dkey):
    out, upd = model.apply(
        {"params": params, "batch_stats": batch_stats}, H, node_type,
        node_score, edge_src, edge_dst, edge_type, edge_mask, train=True,
        rngs={"dropout": dkey}, mutable=["batch_stats"])
    return jnp.sum(out * out), upd["batch_stats"]

grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)

import functools
from qagnn_tpu.utils.tpu import tpu_compiler_options

@functools.partial(jax.jit, compiler_options=tpu_compiler_options())
def step(params, H, batch_stats, i):
    (loss, batch_stats), (gp, gH) = grad_fn(params, H, batch_stats,
                                            jax.random.fold_in(key, i))
    params = jtu.tree_map(lambda p, g: p - 1e-5 * g.astype(p.dtype),
                          params, gp)
    H = H + 1e-4 * gH
    return params, H, batch_stats, loss

p, x, bs = variables["params"], H, variables["batch_stats"]
p, x, bs, loss = step(p, x, bs, 0)
print("warm", float(loss), flush=True)

jax.profiler.start_trace(cli_args.trace_dir, create_perfetto_trace=True)
for i in range(1, 4):
    p, x, bs, loss = step(p, x, bs, i)
print("traced", float(loss), flush=True)
jax.profiler.stop_trace()
print("done", flush=True)
