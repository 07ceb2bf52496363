"""Parameter initialization decoupled from the fused Pallas kernels.

model.init is a forward-only computation: when it runs the pallas backend
it compiles the Mosaic forward kernels under whatever VMEM cap the
enclosing jit carries — and an EAGER or un-tuned init carries only the
16 MiB default, which is why the forward kernels were pinned to
TILE_E=2048 (qagnn_tpu/ops/pallas_gat.py). The param/batch_stats TREES are
backend-independent by construction (the fused path's _ProjParams mirror
nn.Dense's {kernel, bias} exactly — qagnn_tpu/models/gnn.py), and flax
derives per-param RNG streams from the module path, not from execution
order — so initializing under the pure-XLA "scatter" backend produces
IDENTICAL variables (tested in tests/test_gnn.py) without ever touching
Mosaic. Benefits:

  * the forward kernels only compile inside jits that carry the raised
    scoped-vmem cap (qagnn_tpu.utils.tpu.tpu_compiler_options), freeing
    the tile-size choice from the 16 MiB init constraint;
  * cold-start cost drops: init compiles a plain XLA program instead of
    the (remote-tunneled, minutes-long) Mosaic pipeline.

Reference analog: torch modules initialize parameters eagerly with no
kernel involvement at all (reference modeling/modeling_qagnn.py:99-251);
this restores that property for the TPU stack.
"""

from __future__ import annotations

import jax


def init_variables(model, rng, *args, **kwargs):
    """model.init with the GNN backend forced to the XLA scatter oracle.

    Works for any model exposing a `gnn_backend` (LMQAGNN / QAGNN) or
    `backend` (QAGNNMessagePassing / GATConvE) attribute; other models
    init unchanged. The init runs under jit (fast on TPU — eager dispatch
    over the axon tunnel is per-op slow); non-array kwargs like train=
    are closed over statically.
    """
    attr = ("gnn_backend" if hasattr(model, "gnn_backend")
            else "backend" if hasattr(model, "backend") else None)
    init_model = model.clone(**{attr: "scatter"}) if attr else model

    def do_init(rng, *a):
        return init_model.init(rng, *a, **kwargs)

    return jax.jit(do_init)(rng, *args)
