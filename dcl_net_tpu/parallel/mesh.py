"""Device-mesh data parallelism (pjit/GSPMD).

TPU-native replacement for the reference's only multi-device strategy,
single-process torch.nn.DataParallel (reference tools/train_YCBV_stage1.py:
251-252): a 1-D `data` mesh, batch sharded over it, parameters replicated.
Gradient all-reduce happens as XLA-inserted psums over ICI — no explicit
collectives needed (SURVEY.md §2.3). The same entry points scale from 1 chip
to a full slice by changing the mesh size only.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    devices = list(devices or jax.devices())
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device_put every leaf with its leading axis split over the mesh."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def make_parallel_train_step(train_step, mesh: Mesh):
    """Jit the train step with EXPLICIT state/batch shardings.

    state: replicated; batch: leading axis sharded over the `data` mesh axis
    (sharding pytree prefixes — every leaf of each argument inherits the
    spec). XLA/GSPMD partitions the forward and inserts the gradient psum
    over ICI. Outputs (new state, scalar metrics) are pinned replicated so an
    unplaced or mis-placed batch fails loudly at dispatch instead of silently
    running replicated. State buffers are donated so params/opt-state update
    in place.
    """
    repl = replicated_sharding(mesh)
    shard = batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(repl, shard),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
