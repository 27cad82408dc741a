"""Device mesh and sharding helpers.

The reference's distributed runtime (slowfast/utils/{multiprocessing,
distributed}.py) spawns one process per GPU and wraps the model in DDP over
NCCL. The TPU-native equivalent is a single-controller SPMD program: one
`jax.sharding.Mesh` over all chips with a ``data`` axis; the batch is
sharded over ``data`` inside the jitted train step, and XLA inserts the
gradient reductions (the DDP allreduce) automatically. Multi-host (the
reference's ``--num_shards``) maps to `jax.distributed.initialize` +
the same global mesh.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(cfg):
    """Multi-host bring-up (reference mpu.run, multiprocessing.py:9-62)."""
    if cfg.NUM_SHARDS > 1:
        coord = cfg.get("INIT_METHOD", "tcp://localhost:9999")
        address = coord.replace("tcp://", "")
        jax.distributed.initialize(
            coordinator_address=address,
            num_processes=cfg.NUM_SHARDS,
            process_id=cfg.SHARD_ID,
        )


def create_mesh(cfg=None, devices=None) -> Mesh:
    """Device mesh: 1-D ``(data,)`` by default; 2-D ``(data, spatial)``
    when ``TPU.SPATIAL_PARTITIONS > 1`` (clip H axis sharded, XLA inserts
    conv halo exchanges)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if cfg is not None and cfg.TPU.MESH_DATA not in (-1, 0, None):
        n = min(n, cfg.TPU.MESH_DATA)
        devices = devices[:n]
    sp = int(cfg.TPU.SPATIAL_PARTITIONS) if cfg is not None else 1
    sq = int(cfg.TPU.SEQ_PARTITIONS) if cfg is not None else 1
    tp = int(cfg.TPU.TENSOR_PARTITIONS) if cfg is not None else 1
    if cfg is not None and int(cfg.TPU.PIPELINE_PARTITIONS) > 1:
        # Pipeline mode does not run on a single GSPMD mesh: stages are
        # PLACED on disjoint device groups by parallel/pipeline.MViTPipeline
        # (per-stage params/optimizer, GPipe microbatch schedule). The
        # standard trainer drives one jitted step over one mesh, so the
        # knob must not silently degrade to plain data parallelism here.
        raise NotImplementedError(
            "TPU.PIPELINE_PARTITIONS > 1: the epoch trainer drives a "
            "single-mesh jitted step; pipeline training uses "
            "parallel.pipeline.MViTPipeline (see docs/SCALING.md)"
        )
    active = [
        (size, axis)
        for size, axis in ((sp, "spatial"), (sq, "seq"), (tp, "model"))
        if size > 1
    ]
    if len(active) > 1:
        raise ValueError(
            "TPU.SPATIAL_PARTITIONS, TPU.SEQ_PARTITIONS and "
            "TPU.TENSOR_PARTITIONS are mutually exclusive "
            "(one model-parallel axis per mesh)"
        )
    if tp > 1:
        # Validate the promise in defaults.py/docs at startup: tensor
        # partitioning is head parallelism for the MViT family, so tp must
        # divide the head count of every block — otherwise channel shards
        # cross head boundaries and the "communication-free" pool-conv/LN
        # path silently degrades into cross-chip traffic.
        name = cfg.MODEL.MODEL_NAME
        is_mvit_family = name in ("MViT", "MaskMViT") or (
            # ContrastiveModel wraps a backbone chosen by MODEL.ARCH; its
            # constraint sites exist iff that backbone is an MViT
            # (ssl_steps.make_ssl_train_step activates tp_partitioning).
            name == "ContrastiveModel"
            and cfg.MODEL.ARCH == "mvit"
        )
        if not is_mvit_family:
            raise ValueError(
                f"TPU.TENSOR_PARTITIONS shards MViT-family heads; model "
                f"{name!r} has no constraint sites and would waste a mesh "
                f"axis (use SPATIAL_PARTITIONS for conv nets)"
            )
        from slowfast_tpu.models.mvit import mvit_block_schedule

        bad = {
            b["num_heads"]
            for b in mvit_block_schedule(cfg)
            if b["num_heads"] % tp
        }
        if bad:
            raise ValueError(
                f"TPU.TENSOR_PARTITIONS={tp} must divide the head count of "
                f"every block; offending head counts: {sorted(bad)}"
            )
    if active:
        size, axis = active[0]
        if n % size:
            raise ValueError(
                f"{axis} partitions={size} does not divide {n} devices"
            )
        return Mesh(
            np.asarray(devices).reshape(n // size, size),
            axis_names=("data", axis),
        )
    return Mesh(np.asarray(devices).reshape(n), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def clip_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (B, T, H, W, C) clip tensors: batch over ``data``,
    H over ``spatial`` when the mesh has that axis."""
    if "spatial" in mesh.axis_names:
        return NamedSharding(mesh, P("data", None, "spatial"))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# --- Sequence (token-axis) partitioning --------------------------------------
#
# The MViT family's activations are (B, N, C) token tensors; under a
# (data, seq) mesh the N axis is sharded so LN/MLP/projection compute is
# token-parallel and GSPMD inserts the attention K/V all-gathers. The mesh
# is communicated to model code via this trace-time context (model modules
# have no mesh argument; the step builders activate it around apply()).

_ACTIVE_MESH = {}  # axis name ("seq" / "model") -> Mesh, set while tracing


class _axis_partitioning:
    """Context manager: activate sharding constraints for one mesh axis
    (trace-time; model modules have no mesh argument, the step builders
    wrap apply() in these). No-op when the mesh lacks the axis."""

    axis: str = ""

    def __init__(self, mesh: Optional[Mesh]):
        self.mesh = (
            mesh if mesh is not None and self.axis in mesh.axis_names else None
        )

    def __enter__(self):
        self._prev = _ACTIVE_MESH.get(self.axis)
        if self.mesh is not None:
            _ACTIVE_MESH[self.axis] = self.mesh
        return self

    def __exit__(self, *exc):
        if self._prev is None:
            _ACTIVE_MESH.pop(self.axis, None)
        else:
            _ACTIVE_MESH[self.axis] = self._prev
        return False


class token_partitioning(_axis_partitioning):
    """Token-axis (seq) sharding for the MViT family."""

    axis = "seq"


def _constrain_axis(x, axis, spec):
    mesh = _ACTIVE_MESH.get(axis)
    if mesh is None or x.ndim != 3:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def constrain_tokens(x):
    """Pin a (B, N, C) token activation to P(data, seq, None) when token
    partitioning is active; identity otherwise (single-chip, data-only or
    spatial meshes)."""
    return _constrain_axis(x, "seq", P("data", "seq", None))


# --- Tensor (head/hidden) partitioning ---------------------------------------
#
# Megatron-style compute split for the MViT family on a (data, model) mesh:
# q/k/v channels are head-major (attention.py), so pinning the channel axis
# to the "model" axis splits heads across chips; attention, the per-head
# pool convs and pool LNs then run head-parallel with no communication, and
# GSPMD inserts the single psum after the row-parallel proj/fc2 matmuls.
# Params stay replicated (weights are sliced where needed by the
# partitioner), keeping checkpoints and multigrid rebuilds sharding-
# agnostic; parameter-memory scaling comes from remat/Rev-MViT instead.


class tp_partitioning(_axis_partitioning):
    """Channel-axis (head/hidden) sharding for the MViT family."""

    axis = "model"


def constrain_channels(x):
    """Pin the channel axis of a (B, N, C) activation to P(data, None,
    model) when tensor partitioning is active; identity otherwise. Call
    sites: q/k/v after the qkv projection and the MLP hidden activation."""
    return _constrain_axis(x, "model", P("data", None, "model"))


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with the leading axis sharded over data.

    Scalar leaves (e.g. epoch_exact) are replicated. Multi-host: each
    process contributes its local slice of the global batch
    (make_array_from_process_local_data assembles the global array)."""
    sharding = batch_sharding(mesh)
    clips = clip_sharding(mesh)
    repl = replicated(mesh)
    multihost = jax.process_count() > 1

    def put(x):
        if np.ndim(x) < 1:
            return jax.device_put(x, repl)
        # Rank-5 (B, T, H, W, C) clips additionally shard H over the
        # spatial axis (no-op on a 1-D mesh).
        s = clips if np.ndim(x) == 5 else sharding
        if multihost:
            return jax.make_array_from_process_local_data(s, np.asarray(x))
        return jax.device_put(x, s)

    return jax.tree.map(put, batch)


def commit_state(state, mesh: Optional[Mesh] = None):
    """device_put a train state with explicit (replicated) placement.

    Eagerly-created (or checkpoint-loaded) state is UNCOMMITTED; a jitted
    step's output state is COMMITTED, so the step's second call misses the
    jit cache and recompiles the whole graph (~60s for the flagship R50
    through the tunneled runtime). Committing up front gives call 1 and
    call 2 the same cache entry. Multi-host processes skip it (device_put
    to a cross-process sharding is not supported) and pay the one
    recompile instead.
    """
    if jax.process_count() > 1:
        return state
    if mesh is not None:
        return jax.device_put(state, replicated(mesh))
    return jax.device_put(state, jax.devices()[0])


def pad_batch_for_mesh(batch, mesh: Mesh):
    """Pad every array's leading axis to a multiple of the mesh size by
    repeating the last row (eval loaders keep partial batches,
    drop_last=False). Returns (padded_batch, real_rows) so callers trim
    predictions back before metering."""
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    arrays = [x for x in jax.tree.leaves(batch) if np.ndim(x) >= 1]
    n = arrays[0].shape[0] if arrays else 0
    pad = (-n) % n_dev
    if pad == 0:
        return batch, n

    def p(x):
        if np.ndim(x) < 1:
            return x
        x = np.asarray(x)
        return np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)

    return jax.tree.map(p, batch), n


def is_master_proc() -> bool:
    """True on the host that should log/checkpoint
    (reference distributed.py:103-110)."""
    return jax.process_index() == 0


def get_world_size() -> int:
    return jax.device_count()
