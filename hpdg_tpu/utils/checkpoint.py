"""Solver/state checkpointing, including SHARDED arrays via orbax.

The reference's only persistence is adaptation-time state transfer
(functionspacebases/gridadaptor.hh, buildingblocks/persistentbasis.hh) —
``blocks.persist`` covers that (plus npz snapshots) for single-host
arrays.  This module adds production checkpoint/resume for *distributed*
solver state: bucketed coefficient dicts whose leaves are
``jax.Array``s sharded over a device mesh are written/restored with
orbax (each chip writes its own shards; restore re-applies the target
``NamedSharding``s), together with the host-side metadata needed to
rebuild the problem (degree map, mesh cells, iteration counters).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import jax


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def save_sharded(path, x: dict, meta: dict | None = None):
    """Checkpoint a bucketed (possibly sharded) vector dict + JSON-able
    metadata.  Keys of ``x`` may be ints (degrees) — stored stringified."""
    ocp = _ocp()
    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckpt:
        ckpt.save(path / "state", {str(k): v for k, v in x.items()},
                  force=True)
    if meta is not None:
        (path / "meta.json").write_text(json.dumps(meta))


def load_sharded(path, shardings: dict | None = None):
    """Restore a checkpoint written by :func:`save_sharded`.

    ``shardings``: optional {degree: jax.sharding.Sharding} — when given
    (e.g. ``HPSharded.shardings``), leaves restore directly into that
    placement (each chip reads only its shards); otherwise arrays land
    on the default device.  Returns ``(x, meta)``.
    """
    ocp = _ocp()
    path = Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckpt:
        if shardings is not None:
            # build restore args from target shardings
            tree = ckpt.metadata(path / "state").item_metadata.tree
            restore_args = {}
            for k, s in shardings.items():
                m = tree[str(k)]
                restore_args[str(k)] = ocp.ArrayRestoreArgs(
                    sharding=s, global_shape=tuple(m.shape),
                    dtype=m.dtype)
            restored = ckpt.restore(
                path / "state",
                restore_args=restore_args)
        else:
            restored = ckpt.restore(path / "state")
    x = {}
    for k, v in restored.items():
        try:
            key = int(k)
        except ValueError:
            key = k
        x[key] = v
    meta = None
    mf = path / "meta.json"
    if mf.exists():
        meta = json.loads(mf.read_text())
    return x, meta


def save_solver_state(path, x: dict, degrees, iteration: int = 0,
                      cells=None, extra: dict | None = None):
    """Checkpoint a solver iterate with the metadata needed to resume:
    degree map, mesh cells, iteration counter."""
    meta = {"iteration": int(iteration),
            "degrees": np.asarray(degrees).tolist(),
            "cells": list(cells) if cells is not None else None}
    if extra:
        meta.update(extra)
    save_sharded(path, x, meta)


class SolverCheckpointManager:
    """Rotating checkpoints for long iterative/adaptive runs: keep the
    last ``max_to_keep`` iterates, save every ``save_every`` steps
    (orbax CheckpointManager under the hood; sharded leaves write their
    own shards)."""

    def __init__(self, path, max_to_keep: int = 3, save_every: int = 1):
        ocp = _ocp()
        self._ocp = ocp
        opts = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                            save_interval_steps=save_every)
        self._mgr = ocp.CheckpointManager(Path(path).absolute(),
                                          options=opts)

    def save(self, step: int, x: dict) -> bool:
        ok = self._mgr.save(step, args=self._ocp.args.StandardSave(
            {str(k): v for k, v in x.items()}))
        return bool(ok)

    def steps(self):
        return list(self._mgr.all_steps())

    def latest_step(self):
        return self._mgr.latest_step()

    def restore(self, step: int | None = None, shardings: dict | None = None):
        ocp = self._ocp
        step = self._mgr.latest_step() if step is None else step
        if shardings is not None:
            import jax as _jax
            meta = self._mgr.item_metadata(step)
            tree = getattr(meta, "tree", meta)
            tpl = {str(k): _jax.ShapeDtypeStruct(
                tuple(tree[str(k)].shape), tree[str(k)].dtype, sharding=s)
                for k, s in shardings.items()}
            out = self._mgr.restore(step,
                                    args=ocp.args.StandardRestore(tpl))
        else:
            out = self._mgr.restore(step)
        res = {}
        for k, v in out.items():
            try:
                res[int(k)] = v
            except ValueError:
                res[k] = v
        return res

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
