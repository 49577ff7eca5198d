"""Device mesh construction and multi-host bootstrap.

The TPU-native communication layer (SURVEY §2.3): there is no user-space
comm library — collectives are XLA ops compiled onto ICI/DCN links, and this
module's job is only to (a) bootstrap multi-host processes and (b) lay out
the logical mesh so that the heavily-communicating axes ("model", "sp") map
to ICI while "data" spans DCN (mesh_utils handles the physical layout).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

__all__ = ["make_mesh", "initialize_distributed", "local_mesh"]


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bootstrap (one process per host on TPU pods).

    Thin wrapper over ``jax.distributed.initialize``; on single-host (or
    already-initialized) environments it is a no-op.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        # already initialized, or single-process run
        pass


def make_mesh(axes: Dict[str, int], devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh from named axis sizes, e.g. {'data': 2, 'model': 4}.

    Axis order matters for physical layout: later axes are placed on
    faster/closer links by mesh_utils, so put the most communication-heavy
    axis ("model") last.
    """
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    if devices is None:
        n = int(np.prod(shape))
        if n > len(jax.devices()):
            raise ValueError(
                f"mesh {axes} needs {n} devices, have {len(jax.devices())}"
            )
        device_array = mesh_utils.create_device_mesh(
            shape, devices=jax.devices()[:n])
    else:
        device_array = np.asarray(devices).reshape(shape)
    return Mesh(device_array, names)


def local_mesh(model_parallel: Optional[int] = None) -> Mesh:
    """Default single-host mesh: all local devices on the 'model' axis,
    remaining factor on 'data'."""
    n = len(jax.devices())
    tp = model_parallel or n
    if n % tp:
        raise ValueError(f"{n} devices not divisible by model_parallel={tp}")
    return make_mesh({"data": n // tp, "model": tp})
