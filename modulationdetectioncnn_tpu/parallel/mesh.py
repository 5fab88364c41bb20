"""Device mesh + sharding rules (SURVEY.md N14/N15/T4).

Replaces the reference's single-board "distribution" (there was none —
SURVEY.md §2a: the Avalon/AXI bus was its only interconnect) with a
jax.sharding Mesh over three logical axes:

- ``data``  — DP over frames/batch (N14)
- ``model`` — channel sharding, the TP-analog (N15): conv1's 256 output
  filters and Dense1's columns are sharded; Dense2's rows are sharded so
  GSPMD inserts the psum over ICI.
- ``time``  — time-block sharding for streaming (N16, parallel/halo.py)

All shardings are compiler-driven (jit + NamedSharding); the only explicit
collectives in the framework are the halo exchange in halo.py.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from modulationdetectioncnn_tpu.config import MeshConfig


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    """Build a (data, model, time) mesh; missing axes get size 1."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    cfg = cfg or MeshConfig(data=len(devices))
    n = cfg.data * cfg.model * cfg.time
    if n > len(devices):
        raise ValueError(f"mesh {cfg} needs {n} devices, have {len(devices)}")
    grid = devices[:n].reshape(cfg.data, cfg.model, cfg.time)
    return Mesh(grid, axis_names=("data", "model", "time"))


# Partition rules for the VT-CNN2 parameter tree (Flax param names).
# Conv kernels are (kh, kw, Cin, Cout); Dense kernels are (in, out).
_VTCNN2_RULES = {
    ("Conv1", "kernel"): P(None, None, None, "model"),
    ("Conv1", "bias"): P("model"),
    # conv2 contracts over conv1's (sharded) output channels -> psum by GSPMD
    ("Conv2", "kernel"): P(None, None, "model", None),
    ("Conv2", "bias"): P(),
    # Dense1 input dim is 124*f2 (replicated); shard output columns.
    ("Dense1", "kernel"): P(None, "model"),
    ("Dense1", "bias"): P("model"),
    # Dense2 contracts over Dense1's sharded features -> psum by GSPMD.
    ("Dense2", "kernel"): P("model", None),
    ("Dense2", "bias"): P(),
}


def param_spec(params) -> dict:
    """PartitionSpec tree for a VTCNN2 param pytree."""

    def spec_for(path) -> P:
        names = tuple(
            getattr(k, "key", getattr(k, "name", None)) for k in path
        )
        for (layer, leaf), spec in _VTCNN2_RULES.items():
            if layer in names and leaf in names:
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(lambda path, _: spec_for(path), params)


def shard_params(params, mesh: Mesh):
    """Place a param tree on the mesh per the VT-CNN2 rules."""
    specs = param_spec(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(("data",)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
