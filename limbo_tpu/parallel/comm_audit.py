"""Static collective-traffic audit for the sharded pipeline.

On one real chip nothing multi-device can be *timed*, but the collective
volume a sharded program moves per iteration is statically derivable: this
module walks a function's jaxpr (recursing through pjit/scan/cond/
shard_map sub-jaxprs) and accounts every communication primitive's payload
bytes.  Scan-repeated collectives are multiplied by the trip count; of a
cond's branches only the heaviest is counted (one branch executes per
call); while-loop bodies count once (a lower bound).

The numbers are per-device payloads per CALL of the audited function:
a `psum` of a (B, q) f32 block counts 4*B*q bytes (the reduced operand
each device contributes and receives — the standard cost model under
which a ring all-reduce moves 2*(D-1)/D * payload over ICI), an
`all_gather` counts its gathered output.  docs/BENCHMARKS.md tabulates
the audited volumes for sharded_chol/sharded_acq/sharded_big as functions
of (n, D, block); tests/test_comm_audit.py pins them to closed forms.
"""

from __future__ import annotations

from typing import Dict

import jax

_COLLECTIVES = ("psum", "all_gather", "ppermute", "all_to_all",
                "reduce_scatter", "pmax", "pmin")


def _payload_bytes(eqn) -> int:
    total = 0
    for v in eqn.outvars:
        aval = v.aval
        n = 1
        for s in aval.shape:
            n *= int(s)
        total += n * aval.dtype.itemsize
    return total


def _merge(into: Dict[str, Dict[str, int]], frm: Dict[str, Dict[str, int]],
           mult: int = 1):
    for k, e in frm.items():
        ent = into.setdefault(k, {"count": 0, "bytes": 0})
        ent["count"] += mult * e["count"]
        ent["bytes"] += mult * e["bytes"]


def _walk(jaxpr, mult: int, stats: Dict[str, Dict[str, int]]):
    from jax.extend.core import ClosedJaxpr

    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        for coll in _COLLECTIVES:
            if name == coll or name.startswith(coll + "_"):
                ent = stats.setdefault(coll, {"count": 0, "bytes": 0})
                ent["count"] += mult
                ent["bytes"] += mult * _payload_bytes(eqn)
                break
        if name == "cond":
            # exactly one branch executes per call: account the
            # heaviest branch (worst case per call), not the sum
            branches = eqn.params.get("branches", ())
            per = []
            for br in branches:
                s: Dict[str, Dict[str, int]] = {}
                _walk(br.jaxpr if isinstance(br, ClosedJaxpr) else br, 1, s)
                per.append(s)
            if per:
                worst = max(per, key=lambda s: sum(e["bytes"]
                                                   for e in s.values()))
                _merge(stats, worst, mult)
            continue
        sub_mult = mult
        if name == "scan":
            sub_mult = mult * int(eqn.params.get("length", 1))
        elif name == "while":
            # trip count is dynamic; count the body once (lower bound)
            sub_mult = mult
        for p in eqn.params.values():
            if isinstance(p, ClosedJaxpr):
                _walk(p.jaxpr, sub_mult, stats)
            elif hasattr(p, "eqns"):
                _walk(p, sub_mult, stats)
            elif isinstance(p, (list, tuple)):
                for q in p:
                    if isinstance(q, ClosedJaxpr):
                        _walk(q.jaxpr, sub_mult, stats)


def collective_volume(fn, *args, **kwargs) -> Dict[str, Dict[str, int]]:
    """Per-device collective payloads of one `fn(*args)` call.

    Returns {primitive: {"count": n_calls, "bytes": payload_bytes}} with
    scan-repeated collectives multiplied by their trip counts (while-loop
    bodies are counted once — a lower bound).
    """
    jaxpr = jax.make_jaxpr(fn, **kwargs)(*args)
    stats: Dict[str, Dict[str, int]] = {}
    _walk(jaxpr.jaxpr, 1, stats)
    return stats


def total_bytes(stats: Dict[str, Dict[str, int]]) -> int:
    return sum(e["bytes"] for e in stats.values())
