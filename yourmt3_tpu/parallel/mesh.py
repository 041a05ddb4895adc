"""Device mesh + sharding layout (SURVEY.md §2.3, §5.8).

The reference's entire distributed story is Lightning DDP (NCCL
all-reduce). The TPU-native equivalent: a `jax.sharding.Mesh` with a
`data` axis (batch-sharded train/eval — collectives ride ICI, inserted by
XLA under jit) and a `model` axis reserved so tensor-parallel becomes a
config change, not a rewrite (SURVEY.md §2.3 TP row). Chunk-parallel
full-song streaming shards the segment axis over `data` the same way.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(use, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over data, rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with batch-axis sharding."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


# ---------------------------------------------------------------------------
# Tensor-parallel parameter layout over the reserved `model` axis
# (SURVEY.md §2.3: "leave a model mesh axis so TP is a config change").
# Megatron-style: column-parallel up-projections / QKV (shard output dim),
# row-parallel down-projections / O (shard input dim); XLA GSPMD inserts
# the psums.
# ---------------------------------------------------------------------------

def _param_spec(path_str: str, ndim: int) -> P:
    if ndim < 2:
        return P()  # norms/biases replicated
    if path_str.endswith("/kernel"):
        parent = path_str.split("/")[-2]
        if parent in ("q", "k", "v", "wi", "wi_0", "wi_1", "lm_head",
                      "pointwise_in"):
            return P(None, MODEL_AXIS)  # column parallel
        if parent in ("o", "wo", "pointwise_out"):
            return P(MODEL_AXIS, None)  # row parallel
        return P()
    if path_str.endswith("/embedding"):
        return P(None, MODEL_AXIS)  # shard d_model of the embedding
    if path_str.endswith("/wi") or path_str.endswith("/wo"):
        # MoE expert tensors (E, d, f) / (E, f, d): shard the expert axis
        return P(MODEL_AXIS)
    return P()


def shard_params(mesh: Mesh, params):
    """Place a param tree with TP sharding on `model` (+ replication on
    `data`). With n_model == 1 this is plain replication."""

    def place(path, x):
        path_str = "/".join(str(getattr(k, "key", k)) for k in path)
        spec = _param_spec(path_str, getattr(x, "ndim", 0))
        # drop specs that don't divide evenly — replicate those params
        try:
            s = NamedSharding(mesh, spec)
            for dim, name in enumerate(spec):
                if name is not None and x.shape[dim] % mesh.shape[name]:
                    s = NamedSharding(mesh, P())
                    break
            return jax.device_put(x, s)
        except Exception:
            return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, params)
