"""Multi-process (multi-host) helpers: the device mesh and host-side object
gather.

The reference runs evaluation rank-sharded and merges prediction lists with
torch.distributed gather (reference cubercnn/evaluation/omni3d_evaluation.py
:633-639 `comm.gather(predictions, dst=0)` over detectron2's NCCL/Gloo
group). The TPU-native equivalent rides JAX's cross-process collectives:
arbitrary python objects are pickled to padded uint8 arrays and all-gathered
via `multihost_utils.process_allgather`, so every process ends up with the
full prediction list (a superset of the reference's gather-to-rank-0, and
what SPMD eval wants anyway).
"""
from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D data-parallel mesh — the single parallelism strategy this workload
    needs (SURVEY §2.4: convnet detector, params fit per chip)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("data",))


def globalize_batch(batch: dict, mesh: Mesh | None, *,
                    process_count: int | None = None,
                    from_local_fn=None) -> dict:
    """Turn a process-LOCAL host batch into the GLOBAL batch-sharded arrays
    the jitted train step expects.

    The reference's DDP contract makes this implicit: each rank feeds its own
    GPU (train_net.py:178,451-454). Under SPMD jit with
    in_shardings=P("data"), a multi-process run must instead assemble one
    global jax.Array whose process-local shards are this host's loader slice
    — `jax.make_array_from_process_local_data` does exactly that hop. All
    batch leaves are batch-major, so one NamedSharding(P('data')) covers
    every rank. Single-process: a sharded device_put (no cross-host
    semantics needed).

    `process_count`/`from_local_fn` are injectable for tests.
    """
    if mesh is None:
        return {k: jnp.asarray(v) for k, v in batch.items()}
    sharding = NamedSharding(mesh, PartitionSpec("data"))
    nproc = jax.process_count() if process_count is None else process_count
    if nproc == 1:
        return {k: jax.device_put(jnp.asarray(v), sharding)
                for k, v in batch.items()}
    make = from_local_fn or jax.make_array_from_process_local_data
    return {k: make(sharding, np.asarray(v)) for k, v in batch.items()}


def _encode(objs: list, pad_to: int) -> np.ndarray:
    """Pickle a python list to a fixed-size uint8 row: [8-byte length | data]."""
    raw = pickle.dumps(objs)
    if 8 + len(raw) > pad_to:
        raise ValueError(f"encoded objects ({8 + len(raw)}B) exceed pad {pad_to}B")
    row = np.zeros(pad_to, np.uint8)
    row[:8] = np.frombuffer(len(raw).to_bytes(8, "little"), np.uint8)
    row[8:8 + len(raw)] = np.frombuffer(raw, np.uint8)
    return row


def _decode(rows: np.ndarray) -> list:
    """Inverse of _encode over stacked (P, pad) rows -> concatenated list."""
    out = []
    for row in np.atleast_2d(rows):
        n = int.from_bytes(bytes(row[:8]), "little")
        out.extend(pickle.loads(bytes(row[8:8 + n])))
    return out


def _local_len(objs: list) -> int:
    """Encoded byte length of a list (length header + pickle payload)."""
    return 8 + len(pickle.dumps(objs))


def gather_objects(objs: list, allgather_fn=None) -> list:
    """All-gather a python list across JAX processes (process-rank order).

    Single-process: returns `objs` unchanged without touching the device.
    Multi-process: every process must call this (it is a collective). The
    pad size is negotiated with a first all-gather of the local byte length.
    `allgather_fn` is injectable for tests; defaults to
    multihost_utils.process_allgather.
    """
    if jax.process_count() == 1 and allgather_fn is None:
        return list(objs)
    if allgather_fn is None:
        from jax.experimental import multihost_utils

        allgather_fn = multihost_utils.process_allgather
    pad = int(np.max(allgather_fn(np.asarray(_local_len(objs), np.int64))))
    rows = allgather_fn(_encode(objs, pad))
    return _decode(np.asarray(rows))
