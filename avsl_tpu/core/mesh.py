"""Device mesh and sharding helpers.

The reference scales with PyTorch-Lightning DDP + NCCL
(avsl/whisper_flamingo_ft_ami.py:928 in /root/reference); the TPU-native
equivalent is a `jax.sharding.Mesh` with a ``data`` axis (and an optional
``model`` axis reserved for future tensor parallelism) over which train
steps are jit-compiled with NamedSharding constraints. XLA then inserts
the gradient `psum` and metric collectives over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """Create a (data, model) mesh.

    ``model_parallel`` devices are grouped on the model axis (contiguous, so
    model-axis collectives ride the fastest ICI links); the rest go to data.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = list(devices)[:n_devices]
    if n_devices % model_parallel != 0:
        raise ValueError(
            f"n_devices={n_devices} not divisible by model_parallel={model_parallel}"
        )
    grid = np.array(devices).reshape(n_devices // model_parallel, model_parallel)
    return Mesh(grid, axis_names)


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard dim 0 over the data axis, replicate the rest. 0-d leaves
    (scalar batch fields) replicate — a rank-1 spec on a scalar would
    make device_put raise."""
    if ndim <= 0:
        return NamedSharding(mesh, P())
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree onto the mesh, batch-dim sharded on
    `data`. Leaves whose dim 0 does not divide the data axis (a final
    partial batch) replicate instead of raising — matching the train
    step's with_sharding_constraint tolerance."""
    n_data = mesh.shape[DATA_AXIS]

    def _put(x):
        x = np.asarray(x)
        if x.ndim == 0 or (x.shape[0] % max(n_data, 1)):
            return jax.device_put(x, replicated_sharding(mesh))
        return jax.device_put(x, data_sharding(mesh, x.ndim))

    return jax.tree_util.tree_map(_put, batch)


def local_batch_size(global_batch_size: int, mesh: Mesh) -> int:
    n_data = mesh.shape[DATA_AXIS]
    if global_batch_size % n_data != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by data-axis size {n_data}"
        )
    return global_batch_size // n_data


# ---------------------------------------------------------------------------
# Activation sharding (sequence parallelism)
# ---------------------------------------------------------------------------
#
# Megatron-style sequence parallelism: between transformer blocks the
# activations [B, T, D] are sharded over BOTH the data axis (batch) and the
# model axis (time), so the layernorm/MLP/residual work and the activation
# memory split T-ways across the model group; XLA's SPMD partitioner
# inserts the all-gathers that attention (which needs the full sequence)
# requires. Models opt in by calling :func:`constrain_activation` at block
# boundaries — a no-op unless tracing happens inside
# :func:`activation_sharding_scope`, so single-device runs and tests are
# untouched.

_ACTIVATION_MESH: Optional[Mesh] = None


class activation_sharding_scope:
    """Context manager enabling activation sharding constraints while a
    jit/pjit traces model code.

    .. warning:: constraints are recorded at TRACE time and the scope is
       NOT part of the jit cache key: a step function first called
       OUTSIDE the scope caches a constraint-free trace that is silently
       reused inside it (and vice versa). For the training/eval steps
       this is solved structurally: ``train.loop.make_train_step`` /
       ``make_eval_step`` enter the scope INSIDE the traced step body
       (``sequence_parallel`` arg, auto-on when the mesh has a model axis
       > 1), so every trace carries the intent and callers must NOT wrap
       step calls themselves. Only hand-rolled jits outside those
       builders need to make their first call under the scope they
       intend. The scope is a module global and not thread-safe."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def __enter__(self):
        global _ACTIVATION_MESH
        self._prev = _ACTIVATION_MESH
        _ACTIVATION_MESH = self.mesh
        return self.mesh

    def __exit__(self, *exc):
        global _ACTIVATION_MESH
        _ACTIVATION_MESH = self._prev
        return False


def constrain_activation(x, *spec):
    """``with_sharding_constraint(x, P(*spec))`` under the active scope.

    Axes that do not divide the corresponding mesh axis are dropped from
    the spec (falls back to replication on that dim), keeping tiny test
    shapes valid on any mesh."""
    mesh = _ACTIVATION_MESH
    if mesh is None:
        return x
    fixed = []
    for dim, name in enumerate(spec):
        if name is None:
            fixed.append(None)
            continue
        size = mesh.shape.get(name, 1)
        if size <= 1 or x.shape[dim] % size != 0:
            fixed.append(None)
        else:
            fixed.append(name)
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*fixed))
    )
