"""Device mesh + sharding rules.

The reference's only multi-device mode is a serial 2-GPU encoder/decoder split
(reference qagnn.py:132-140,168-169; utils/data_utils.py:58-68). On TPU that
split is pointless — everything lives in ONE jitted program — so parallelism
is expressed as shardings over a jax Mesh instead:

  * axis "data": batch/graph dimension. LM inputs (B, C, L), graph node arrays
    (G, N, ...) and edge arrays (G, E) all shard their leading axis here. XLA
    inserts the gradient psum over ICI automatically.
  * axis "model": optional second axis for sharding the big frozen entity
    table (799k x 1024 — reference qagnn.py:124-125) and, if ever needed,
    RoBERTa weight matrices.

Run on any (n_data, n_model) factorization of the available chips; tests use
an 8-device CPU mesh via --xla_force_host_platform_device_count.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Create a (data, model) mesh. Defaults to all devices on `data`."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
        f"have {len(devices)}")
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/graph) axis across `data`."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device_put every leaf with its leading axis on the data axis.

    Scalar leaves (ndim 0) are replicated.
    """
    data = batch_sharding(mesh)
    rep = replicated(mesh)

    def place(x):
        x = jax.numpy.asarray(x)
        return jax.device_put(x, rep if x.ndim == 0 else data)
    return jax.tree.map(place, batch)


def param_shardings(params: Any, mesh: Mesh,
                    shard_entity_table: bool = True) -> Any:
    """Sharding tree for params: replicate everything except the entity
    embedding table, which is row-sharded over `model` when that axis > 1.

    The 799k x 1024 fp32 table is ~3.3 GB — sharding its rows keeps HBM
    headroom on small-memory chips; the lookup becomes a collective gather
    XLA handles from the sharding annotation alone.
    """
    rep = replicated(mesh)
    if mesh.shape[MODEL_AXIS] == 1 or not shard_entity_table:
        return jax.tree.map(lambda _: rep, params)

    table = NamedSharding(mesh, P(MODEL_AXIS, None))

    def decide(path, leaf):
        keys = [getattr(k, "key", str(k)) for k in path]
        if "emb" in keys and "embedding" in keys and leaf.ndim == 2:
            return table
        return rep
    return jax.tree_util.tree_map_with_path(decide, params)
