"""IMGPO: Bayesian optimization with exponential convergence (NIPS 2015,
Kawaguchi, Kaelbling, Lozano-Perez).

Reference: src/limbo/experimental/bayes_opt/imgpo.hpp:86 (~420 LoC) — a
hierarchical 3-way partition tree (SOO-style) whose candidate evaluations are
screened by GP-UCB bounds: a cell center is only *really* evaluated when its
GP upper confidence bound beats the incumbent; otherwise the GP mean stands
in (samp=false), giving the algorithm its exponential-convergence guarantee
without wasting evaluations.

Design split: the tree bookkeeping (irregular, data-dependent) lives on host
in numpy; every GP fit/query is a jitted padded-buffer program on device —
batched over all candidate centers of a round (the reference queries one
point at a time, imgpo.hpp:246-263).
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from limbo_tpu.kernels import MaternFiveHalves
from limbo_tpu.means import DataMean
from limbo_tpu.models import gp as gp_mod


class _Cell:
    __slots__ = ("lo", "hi", "x", "f", "leaf", "sampled")

    def __init__(self, lo, hi, x, f, leaf=True, sampled=False):
        self.lo, self.hi, self.x, self.f = lo, hi, x, f
        self.leaf, self.sampled = leaf, sampled


class IMGPO:
    """GP-guided hierarchical partition search on [0,1]^dim (maximization)."""

    def __init__(self, kernel=None, mean=None, max_evals: int = 60,
                 ucb_beta: float = 2.0, max_depth: int = 20,
                 dtype=jnp.float64):
        self.kernel = kernel
        self.mean = mean
        self.max_evals = max_evals
        self.ucb_beta = ucb_beta
        self.max_depth = max_depth
        self.dtype = dtype
        self.X: List[np.ndarray] = []
        self.Y: List[float] = []
        self._query_jit = None

    # -- GP helpers ----------------------------------------------------------

    def _fit_gp(self, capacity: int):
        kern = (self.kernel if self.kernel is not None
                else MaternFiveHalves.create(dtype=self.dtype))
        mean = (self.mean if self.mean is not None
                else DataMean.create(dim_out=1, dtype=self.dtype))
        X = jnp.asarray(np.stack(self.X), dtype=self.dtype)
        Y = jnp.asarray(np.asarray(self.Y, dtype=np.float64)[:, None],
                        dtype=self.dtype)
        return gp_mod.fit(kern, mean, X, Y, capacity=capacity)

    def _moments(self, gp, X: np.ndarray):
        if self._query_jit is None:
            self._query_jit = jax.jit(gp_mod.query)
        mu, var = self._query_jit(gp, jnp.asarray(X, dtype=self.dtype))
        return np.asarray(mu)[:, 0], np.asarray(var)

    def _ucb(self, gp, X: np.ndarray) -> np.ndarray:
        mu, var = self._moments(gp, X)
        return mu + self.ucb_beta * np.sqrt(var)

    # -- the main loop -------------------------------------------------------

    def optimize(self, f: Callable, dim: int, key=None) -> "IMGPO":
        evals = 0

        def evaluate(x) -> float:
            nonlocal evals
            y = float(np.atleast_1d(np.asarray(f(x)))[0])
            self.X.append(np.asarray(x, dtype=np.float64))
            self.Y.append(y)
            evals += 1
            return y

        root_x = np.full(dim, 0.5)
        root = _Cell(np.zeros(dim), np.ones(dim), root_x, evaluate(root_x),
                     sampled=True)
        tree: List[List[_Cell]] = [[root]]
        capacity = max(64, -(-(self.max_evals * 2) // 64) * 64)
        LB = root.f

        while evals < self.max_evals:
            gp = self._fit_gp(capacity) if len(self.X) >= 2 else None
            depth_T = len(tree) - 1
            # steps (i)-(ii): per-depth best leaf; realize GP-estimated cells
            i_max: List[Optional[int]] = []
            for h in range(depth_T + 1):
                leaves = [(i, c) for i, c in enumerate(tree[h]) if c.leaf]
                if not leaves:
                    i_max.append(None)
                    continue
                i_best, c_best = max(leaves, key=lambda ic: ic[1].f)
                if not c_best.sampled and evals < self.max_evals:
                    # the selected cell only had a GP estimate — sample it
                    c_best.f = evaluate(c_best.x)
                    c_best.sampled = True
                    LB = max(LB, c_best.f)
                i_max.append(i_best)
            # steps (iii)-(iv): split, from shallow to deep, cells that beat
            # every deeper candidate (SOO rule) — with GP-UCB screening of
            # the new children (imgpo.hpp:246-263)
            nu_max = -math.inf
            split_any = False
            for h in range(min(depth_T + 1, self.max_depth)):
                i = i_max[h]
                if i is None:
                    continue
                cell = tree[h][i]
                if cell.f <= nu_max:
                    continue
                nu_max = cell.f
                if evals >= self.max_evals:
                    break
                # 3-way split along the widest dimension
                width = cell.hi - cell.lo
                d_split = int(np.argmax(width))
                lo, hi = cell.lo.copy(), cell.hi.copy()
                third = width[d_split] / 3.0
                children = []
                for k in range(3):
                    c_lo, c_hi = lo.copy(), hi.copy()
                    c_lo[d_split] = lo[d_split] + k * third
                    c_hi[d_split] = lo[d_split] + (k + 1) * third
                    x = cell.x.copy()
                    x[d_split] = 0.5 * (c_lo[d_split] + c_hi[d_split])
                    children.append((c_lo, c_hi, x))
                cell.leaf = False
                if h + 1 > depth_T:
                    tree.append([])
                    depth_T += 1
                # batched GP-UCB screen of the three centers
                centers = np.stack([c[2] for c in children])
                if gp is not None:
                    ucb = self._ucb(gp, centers)
                else:
                    ucb = np.full(3, math.inf)
                for (c_lo, c_hi, x), u in zip(children, ucb):
                    if np.allclose(x, cell.x):
                        # center child inherits the parent's evaluation
                        child = _Cell(c_lo, c_hi, x, cell.f, sampled=cell.sampled)
                    elif u >= LB and evals < self.max_evals:
                        child = _Cell(c_lo, c_hi, x, evaluate(x), sampled=True)
                        LB = max(LB, child.f)
                    else:
                        # GP screen failed: stand in with the posterior mean
                        est = (float(self._moments(gp, x[None])[0][0])
                               if gp is not None else -math.inf)
                        child = _Cell(c_lo, c_hi, x, est, sampled=False)
                    tree[h + 1].append(child)
                split_any = True
            if not split_any:
                break
        return self

    @property
    def best_value(self) -> float:
        return float(np.max(self.Y))

    @property
    def best_sample(self) -> np.ndarray:
        return self.X[int(np.argmax(self.Y))]
