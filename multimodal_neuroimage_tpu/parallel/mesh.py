"""Device mesh construction and data-parallel sharding helpers.

TPU-native replacement for the reference's distributed layer:

 * rendezvous / process-group init (reference utils.py:15-93, ``_get_sync_file`` +
   ``dist.init_process_group('nccl', ...)``) -> ``jax.distributed.initialize()``
   driven by TPU pod env vars; nothing to configure on a single host.
 * DDP gradient all-reduce hooks (reference trainer.py:269-296) -> GSPMD: the batch
   is sharded over a 1-D ``data`` mesh axis, params are replicated, and XLA inserts
   the gradient mean collectives over ICI/DCN inside the single jitted train step.
 * ``DistributedSampler`` per-rank data sharding (reference dataloaders.py:74-81) ->
   ``local_batch_slice`` keyed on ``jax.process_index()``.
 * the reference computes metrics per-rank only (trainer.py:756-778, see SURVEY §5.8);
   ``process_allgather`` makes subject-level metrics global.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed(distributed: bool = False) -> None:
    """Initialise JAX's multi-process runtime when running on a pod slice.

    Safe to call unconditionally: no-ops on a single host. Replaces the
    reference's slurm/torchrun env-var parsing and sync-file rendezvous
    (utils.py:37-93).
    """
    if not distributed:
        return
    if jax.process_count() > 1:
        return  # already initialised
    try:
        jax.distributed.initialize()
    except (ValueError, RuntimeError):
        # single-process environment (no coordinator configured)
        pass


def build_mesh(
    mesh_shape: Optional[Sequence[int]] = None,
    axis_names: Tuple[str, ...] = ("data",),
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Build a device mesh; defaults to all devices on one ``data`` axis.

    The models here are small (<100M params) so pure data parallelism is the
    right decomposition (SURVEY §2.2); extra axes ('model', 'seq') are accepted
    for forward-compatible sharding experiments.
    """
    devices = list(devices if devices is not None else jax.devices())
    if mesh_shape is None:
        mesh_shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(mesh_shape)
    return Mesh(dev_array, axis_names)


def mesh_for_batch(cfg) -> Mesh:
    """Mesh honouring ``cfg.mesh_shape``/``cfg.mesh_axes``, shrunk so the
    data axis divides the per-host batch (e.g. batch 4 on 8 chips -> 4-chip
    mesh). Shared by Trainer and Predictor."""
    import math

    n_local = jax.local_device_count()
    usable = math.gcd(cfg.batch_size, n_local)
    if (cfg.mesh_shape is None and usable != n_local
            and len(cfg.mesh_axes) == 1):
        print(f"[mesh] batch_size {cfg.batch_size} not divisible by "
              f"{n_local} local devices; using {usable}")
        return build_mesh((usable,), cfg.mesh_axes,
                          devices=jax.devices()[:usable])
    return build_mesh(cfg.mesh_shape, cfg.mesh_axes)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for a batch-leading array: dim 0 split across ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Device-put a host batch pytree with dim-0 sharded across the mesh.

    Single-host: plain ``device_put``. Multi-host: the pytree holds this
    process's LOCAL batch slice (``DataPipeline`` loads per-host shards,
    data/loader.py:112), so the global array is assembled with
    ``jax.make_array_from_process_local_data`` — the GSPMD replacement for
    the reference's DistributedSampler rank slicing (dataloaders.py:74-81).
    """
    sharding = batch_sharding(mesh, axis)
    multi = jax.process_count() > 1

    def _put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            if multi:
                return jax.make_array_from_process_local_data(
                    replicated_sharding(mesh), x[None])[0]
            return jax.device_put(x, replicated_sharding(mesh))
        if multi:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(_put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/opt state) across every mesh device."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def local_batch_slice(n_items: int) -> slice:
    """This process's contiguous shard of a global batch (multi-host input).

    Replaces DistributedSampler rank slicing (reference dataloaders.py:74-81).
    """
    pc, pi = jax.process_count(), jax.process_index()
    per = n_items // pc
    return slice(pi * per, (pi + 1) * per)


def host_local_rows(arr) -> np.ndarray:
    """This process's rows of a batch-dim-sharded GLOBAL array.

    Multi-host, a data-sharded jax.Array is not fully addressable —
    ``jax.device_get`` raises. Each host's valid rows are exactly its
    addressable shards (the loader feeds host ``pi`` rows
    ``[pi*bs, (pi+1)*bs)`` via ``make_array_from_process_local_data``, so
    shard order by global row offset reconstructs the host slice).
    Single-process (or non-jax input): plain device_get."""
    if jax.process_count() == 1 or not hasattr(arr, "addressable_shards"):
        return np.asarray(jax.device_get(arr))
    shards = sorted(arr.addressable_shards,
                    key=lambda s: (s.index[0].start or 0))
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def process_allgather(x: np.ndarray) -> np.ndarray:
    """Gather host arrays from every process (identity on one process).

    Used to make subject-level metric aggregation global — the reference only
    ever aggregated rank-locally (SURVEY §5.8, trainer.py:756-778).
    """
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(np.asarray(x)))


def visible_chip_count() -> int:
    return jax.local_device_count()


def force_host_devices(n: int = 8) -> None:
    """Test helper: present ``n`` virtual CPU devices (call before importing jax)."""
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + f" --xla_force_host_platform_device_count={n}"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
