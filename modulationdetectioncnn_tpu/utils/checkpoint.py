"""Orbax checkpoint/resume (SURVEY.md N21, §5).

The reference's only persistence is a one-way Keras->fixed-point ROM export
[ARCHETYPE]; here training state (params + opt state + step) round-trips via
Orbax, and the int8 deployment artifact (quantized params + scales — the
analog of the reference's ROM images) is saved as a separate tree.
"""
from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


def make_manager(directory: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    return ocp.CheckpointManager(
        directory, options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep)
    )


def save(mgr: ocp.CheckpointManager, step: int, params: Any, opt_state: Any):
    mgr.save(
        step,
        args=ocp.args.Composite(
            params=ocp.args.StandardSave(params),
            opt_state=ocp.args.StandardSave(opt_state),
        ),
    )


def restore(
    mgr: ocp.CheckpointManager,
    step: int | None = None,
    params_like: Any | None = None,
    opt_state_like: Any | None = None,
):
    """Restore (params, opt_state, step). step=None -> latest.

    Pass ``opt_state_like`` (e.g. ``tx.init(params)``) to get the optimizer
    state back as its original optax NamedTuple structure — without a
    template Orbax returns plain nested dicts, which optax rejects.
    """
    step = step if step is not None else mgr.latest_step()
    if step is None:
        return None
    restored = mgr.restore(
        step,
        args=ocp.args.Composite(
            params=ocp.args.StandardRestore(params_like),
            opt_state=ocp.args.StandardRestore(opt_state_like),
        ),
    )
    return restored["params"], restored["opt_state"], step


def save_tree(directory: str, tree: Any):
    """One-shot save of an arbitrary pytree (e.g. the int8 artifact)."""
    directory = os.path.abspath(directory)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(directory, tree, force=True)
    ckptr.wait_until_finished()


def load_tree(directory: str, like: Any | None = None) -> Any:
    directory = os.path.abspath(directory)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(directory, like) if like is not None else ckptr.restore(directory)
