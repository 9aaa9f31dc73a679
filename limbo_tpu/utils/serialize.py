"""Model serialization: save/load GP state to disk.

Reference: src/limbo/serialize/{text_archive,binary_archive}.hpp — limbo
stores kernel+mean hyperparams, samples, observations, matrixL and alpha (one
file per object in a directory) and GP::load(archive, recompute) optionally
rebuilds the factorization from data (model/gp.hpp:440-511).

Here an archive is a directory with:
  meta.json          — shapes, dtype, n, pytree structure info
  arrays.npz         — every array leaf of the GP pytree

Both a text (npz is binary; TextArchive writes .txt full precision) and a
binary flavour are provided for parity.  `load(..., recompute=True)` rebuilds
L/alpha from the stored data (matching gp.hpp:475).
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from limbo_tpu.models import gp as gp_mod


def _flatten_with_paths(tree):
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in leaves_with_paths:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out


class BinaryArchive:
    """Raw array archive (serialize/binary_archive.hpp:63)."""

    suffix = ".npy"

    @staticmethod
    def write(path: str, arr: np.ndarray):
        np.save(path + BinaryArchive.suffix, arr)

    @staticmethod
    def read(path: str) -> np.ndarray:
        return np.load(path + BinaryArchive.suffix)


class TextArchive:
    """Full-precision text archive (serialize/text_archive.hpp:63)."""

    suffix = ".txt"

    @staticmethod
    def write(path: str, arr: np.ndarray):
        a = np.atleast_2d(np.asarray(arr))
        np.savetxt(path + TextArchive.suffix, a, fmt="%.18e",
                   header=json.dumps({"shape": list(np.shape(arr))}))

    @staticmethod
    def read(path: str) -> np.ndarray:
        with open(path + TextArchive.suffix) as fh:
            header = fh.readline().lstrip("# ").strip()
        shape = tuple(json.loads(header)["shape"])
        if int(np.prod(shape)) == 0:      # loadtxt warns on empty payloads
            return np.zeros(shape)
        a = np.loadtxt(path + TextArchive.suffix)
        return np.reshape(a, shape)


def save_gp(gp: gp_mod.GP, directory: str, archive=BinaryArchive) -> None:
    """Persist every array leaf of the GP pytree, one file per leaf."""
    os.makedirs(directory, exist_ok=True)
    leaves = _flatten_with_paths(gp)
    meta = {"leaves": [], "archive": archive.__name__}
    for i, (key, arr) in enumerate(sorted(leaves.items())):
        fname = f"leaf_{i:03d}"
        archive.write(os.path.join(directory, fname), arr)
        meta["leaves"].append({"key": key, "file": fname,
                               "dtype": str(arr.dtype)})
    with open(os.path.join(directory, "meta.json"), "w") as fh:
        json.dump(meta, fh, indent=1)


def load_gp(template: gp_mod.GP, directory: str, archive=None,
            recompute: bool = False) -> gp_mod.GP:
    """Load into the structure of `template` (shapes/statics must match the
    saved model, like limbo's load into a constructed GP type).

    recompute=True rebuilds L/alpha from data instead of trusting the stored
    factorization (gp.hpp:466-511).
    """
    with open(os.path.join(directory, "meta.json")) as fh:
        meta = json.load(fh)
    if archive is None:
        archive = {"BinaryArchive": BinaryArchive,
                   "TextArchive": TextArchive}[meta["archive"]]
    by_key = {e["key"]: (e["file"], e["dtype"]) for e in meta["leaves"]}

    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path, leaf in paths_and_leaves:
        key = "/".join(str(p) for p in path)
        fname, dtype = by_key[key]
        arr = archive.read(os.path.join(directory, fname)).astype(dtype)
        arr = np.reshape(arr, np.shape(leaf))
        new_leaves.append(jnp.asarray(arr))
    gp = jax.tree_util.tree_unflatten(treedef, new_leaves)
    if recompute:
        gp = gp_mod.recompute(gp)
    return gp
