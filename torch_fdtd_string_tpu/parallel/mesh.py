"""Device-mesh parallelism for dataset generation and training.

The reference's only multi-device strategies are (a) batched simulation on
one device and (b) DDP gradient all-reduce via Lightning/NCCL
(reference trainer.py:62-78).  TPU-native equivalents:

  * dataset generation: shard the simulation batch across the mesh with
    ``NamedSharding(P("data"))`` — the engine is pure batched ops, so XLA
    runs it SPMD with zero collectives (embarrassingly data-parallel);
  * DMSP training: data-parallel gradients via ``psum`` over the same mesh
    axis (see tasks/trainer.py), riding ICI instead of NCCL.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices=None, devices=None):
    """1-D data-parallel mesh over the available chips."""
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def shard_batch(tree, mesh):
    """Place every array leaf with a leading batch axis on the mesh.

    Arrays whose leading dimension is divisible by the mesh size get
    ``P("data", None, ...)``; everything else is replicated.
    """
    n = mesh.devices.size

    def _put(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] > 0:
            spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(_put, tree)


def replicate(tree, mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
