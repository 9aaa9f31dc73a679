"""DIRECT-L(-RAND): deterministic Lipschitzian global optimization.

The reference's default acquisition optimizer is NLOpt's DIRECT-L-RAND
(boptimizer.hpp:120-127: `GN_DIRECT_L_RAND` when NLOpt is available) — a
DIviding-RECTangles search (Jones et al. 1993; locally-biased variant of
Gablonsky & Kelley 2001) whose systematic space coverage is what limbo's
BO quality rests on.  Earlier rounds replaced it with a random sweep +
multi-start ascent; the benchmark A/B (benchmark_results/acqopt_ab.json)
shows that replacement losing the multimodal half of the suite to CMA-ES,
and CMA-ES losing the smooth half — the missing piece is exactly DIRECT's
deterministic global phase.

TPU-first formulation: the classic algorithm is a sequential loop over
rectangle subdivisions; here one *round* selects up to `splits_per_round`
potentially-optimal rectangles at once (the pairwise Lipschitz-slope test
over all rectangles is one (R, R) fused mask computation) and trisects
them along their longest side, evaluating ALL new centers as one batched
call — the objective evaluation (a GP posterior query) is where the time
goes, and it lands on the MXU as a single batch.  Buffers are padded to
the final rectangle count, so the whole search is one `lax.fori_loop`
under jit.

The -RAND flavour: ties between equal longest sides are broken by a keyed
random perturbation, matching NLOpt's randomized variant (deterministic
given the key).  Minimization internally; the optimizer protocol
maximizes.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

from limbo_tpu.opt.base import OptResult

_BIG = 1e30


@struct.dataclass
class DirectL:
    """Locally-biased DIRECT with batched rounds.

    rounds x splits_per_round bounds the evaluation budget at
    1 + 2 * rounds * splits_per_round center evaluations (default 1 + 2 *
    64 * 16 = 2049, the same order as the sweep+ascent default's 2064).
    epsilon is the standard nontrivial-improvement parameter.
    """

    rounds: int = struct.field(pytree_node=False, default=64)
    splits_per_round: int = struct.field(pytree_node=False, default=16)
    epsilon: float = struct.field(pytree_node=False, default=1e-4)

    def __call__(self, fun: Callable, init: jax.Array, key,
                 bounded: bool = True) -> OptResult:
        if not bounded:
            raise ValueError("DirectL needs a bounded [0,1]^d domain "
                             "(limbo's acquisition optimizers are bounded; "
                             "use an unbounded optimizer otherwise)")
        d = init.shape[0]
        dtype = init.dtype
        S = self.splits_per_round
        # +1: the last row is a permanent trash slot for masked-out writes
        # (scatter with duplicate indices has no write order to rely on)
        R = 2 + 2 * S * self.rounds              # rectangle capacity
        eps = self.epsilon

        fmin_neg = lambda x: -fun(x)             # minimization inside

        c0 = jnp.full((1, d), 0.5, dtype)
        f0 = jax.vmap(fmin_neg)(c0)
        c = jnp.zeros((R, d), dtype).at[0].set(c0[0])
        side = jnp.zeros((R, d), dtype).at[0].set(1.0)
        f = jnp.full((R,), _BIG, dtype).at[0].set(f0[0])
        valid = jnp.zeros((R,), bool).at[0].set(True)

        # every side length is 3^-k, so rectangles group into at most
        # `rounds`+2 diameter levels — the potentially-optimal test runs on
        # the per-level minima (L x L), not pairwise over all R rectangles
        # (the classic bucketed implementation; O(R + L^2) per round)
        L = self.rounds + 2
        log3 = jnp.log(jnp.asarray(3.0, dtype))

        def round_body(r, carry):
            c, side, f, valid, count, key = carry
            key, k_tie = jax.random.split(key)
            diam = jnp.max(side, axis=1)                       # (R,)
            fv = jnp.where(valid, f, _BIG)
            fmin = jnp.min(fv)
            # ---- per-diameter-level minima ----
            level = jnp.where(
                valid,
                jnp.round(-jnp.log(jnp.maximum(diam, 1e-30)) / log3)
                .astype(jnp.int32), L - 1)                     # pad level
            lev_min = jax.ops.segment_min(fv, level, num_segments=L)
            lev_has = jax.ops.segment_max(valid.astype(jnp.int32), level,
                                          num_segments=L) > 0
            lev_diam = jnp.exp(-jnp.arange(L, dtype=dtype) * log3)
            lev_f = jnp.where(lev_has, lev_min, _BIG)
            # ---- potentially-optimal levels (L x L Lipschitz slopes) ----
            dd = lev_diam[None, :] - lev_diam[:, None]         # d_j - d_i
            df = lev_f[None, :] - lev_f[:, None]               # f_j - f_i
            both = lev_has[:, None] & lev_has[None, :]
            smaller = both & (dd < 0)
            k_lo = jnp.max(jnp.where(smaller, df / dd, 0.0), axis=1)
            larger = both & (dd > 0)
            k_hi = jnp.min(jnp.where(larger, df / dd, _BIG), axis=1)
            po_lev = (lev_has & (k_lo <= k_hi)
                      & (lev_f - k_hi * lev_diam
                         <= fmin - eps * jnp.abs(fmin)))
            po = valid & po_lev[level] & (fv <= lev_f[level])
            # ---- select up to S potentially-optimal rects, largest first
            score = jnp.where(po, diam - 1e-9 * fv, -_BIG)
            sel_score, sel = jax.lax.top_k(score, S)           # (S,)
            live = sel_score > -_BIG
            sel = jnp.where(live, sel, R - 1)     # dead picks -> trash row
            # ---- trisect each along its longest side (RAND tie-break) ----
            s_sel = side[sel]                                  # (S, d)
            tie = 1.0 + 1e-6 * jax.random.uniform(k_tie, (S, d), dtype=dtype)
            jstar = jnp.argmax(s_sel * tie, axis=1)            # (S,)
            delta = jnp.take_along_axis(
                s_sel, jstar[:, None], axis=1)[:, 0] / 3.0     # (S,)
            e = jax.nn.one_hot(jstar, d, dtype=dtype)          # (S, d)
            c_sel = c[sel]
            kids = jnp.concatenate([c_sel + delta[:, None] * e,
                                    c_sel - delta[:, None] * e])  # (2S, d)
            fk = jax.vmap(fmin_neg)(kids)                      # (2S,)
            live2 = jnp.concatenate([live, live])
            # parent keeps its center; its split side shrinks to a third —
            # children inherit the shrunken sides
            s_new = s_sel * (1.0 - (2.0 / 3.0) * e)
            side = side.at[sel].set(s_new)        # dead rows hit the trash
            kid_sides = jnp.concatenate([s_new, s_new])
            # compacted slots: no gaps, so rounds never collide; dead
            # entries write the trash row (stays invalid)
            pos = jnp.cumsum(live2.astype(jnp.int32)) - 1
            slot = jnp.where(live2, count + pos, R - 1)
            c = c.at[slot].set(kids)
            side = side.at[slot].set(kid_sides)
            f = f.at[slot].set(fk)
            valid = valid.at[slot].set(live2)     # trash row stays invalid
            count = count + jnp.sum(live2).astype(count.dtype)
            return (c, side, f, valid, count, key)

        count = jnp.asarray(1, jnp.int32)
        c, side, f, valid, count, key = jax.lax.fori_loop(
            0, self.rounds, round_body, (c, side, f, valid, count, key))
        fv = jnp.where(valid, f, _BIG)
        i = jnp.argmin(fv)
        return OptResult(x=c[i], value=-fv[i])
