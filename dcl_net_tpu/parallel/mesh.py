"""Device-mesh data parallelism (pjit/GSPMD), single- and multi-host.

TPU-native replacement for the reference's only multi-device strategy,
single-process torch.nn.DataParallel (reference tools/train_YCBV_stage1.py:
251-252): a 1-D `data` mesh, batch sharded over it, parameters replicated.
Gradient all-reduce happens as XLA-inserted psums over ICI — no explicit
collectives needed (SURVEY.md §2.3). The same entry points scale from 1 chip
to a full slice by changing the mesh size only.

Multi-host (pod-slice) support: :func:`init_distributed` wires
``jax.distributed`` (coordinator handshake, global device discovery), after
which ``make_mesh()`` spans ALL hosts' devices and :func:`shard_batch` /
:func:`replicate` assemble global arrays from each process's local shard via
``jax.make_array_from_process_local_data``. Each host feeds its own batch
block (BatchLoader process striding, data/loader.py) and GSPMD inserts the
cross-host collectives. Validated by a 2-process x 4-virtual-CPU-device
dryrun reproducing single-process 8-device losses exactly
(tests/test_multihost.py, tools/dryrun_multihost.py).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def init_distributed(
    coordinator: str,
    num_processes: int,
    process_id: int,
    initialization_timeout: int = 120,
) -> tuple:
    """Initialize jax.distributed for a multi-host run (SURVEY.md §2.3 TPU
    plan: "jax.distributed init + GSPMD mesh").

    Must be called before any JAX computation (backends initialize on first
    use). On Cloud TPU pods the three arguments are auto-detected and callers
    can pass coordinator only; this explicit form also drives multi-process
    CPU runs (Gloo collectives), which is how the multi-host path is tested
    without a pod (tests/test_multihost.py).

    Returns (process_index, process_count) after the handshake.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        initialization_timeout=initialization_timeout,
    )
    return jax.process_index(), jax.process_count()


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    devices = list(devices or jax.devices())  # GLOBAL devices (all hosts)
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
    """Place every leaf with its leading axis split over the `data` axis.

    Single-process: a plain device_put. Multi-host: each process holds its
    OWN contiguous block of the global batch (1/process_count of it — the
    BatchLoader's process striding emits exactly that block), and the global
    array is assembled with jax.make_array_from_process_local_data."""
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    # make_array_from_process_local_data needs process-local HOST data: fetch
    # any device-resident leaves (e.g. a DevicePreprocessor batch) in ONE
    # bundled transfer instead of a per-leaf np.asarray round-trip (per-leaf
    # fetches serialize ms-scale attach latencies; numpy leaves pass through
    # device_get untouched).
    batch = jax.device_get(batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        batch,
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree onto every device of the mesh (params/opt-state).

    Multi-host: every process holds the full value (states are initialized
    identically from the same PRNG key on every host), so the local data IS
    the global data under the fully-replicated sharding."""
    sharding = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
    tree = jax.device_get(tree)  # one bundled host fetch (see shard_batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        tree,
    )


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
