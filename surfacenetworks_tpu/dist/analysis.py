"""Structural analysis of the partitioned applies: overlap readiness.

The BASELINE north star asks for halo exchange *overlapped* with local
aggregation.  On TPU, XLA's latency-hiding scheduler overlaps an async
``collective-permute-start/done`` pair with any compute that does not depend
on the permuted data — so the property the kernel author owes is a DATAFLOW
property: the interior aggregation must be independent of the halo exchange.
This module verifies that property on the traced jaxpr (backend-independent;
the CPU backend lowers ppermute synchronously, so HLO text can't show it).

``check_overlap_structure`` returns, for a partitioned apply:

* ``n_ppermute``       — halo-exchange collectives found,
* ``interior_indep``   — #contraction/reduction eqns NOT (transitively)
  depending on any ppermute output (the overlappable interior work),
* ``boundary_dep``     — #eqns that do depend (the boundary rows that must
  wait for the halo),
* ``output_depends_on_halo`` — the final result consumes the halo (sanity:
  the exchange is not dead code).

Used by ``tests/test_overlap_structure.py`` and dumped next to the measured
exposed-comm fractions by ``benchmarks/scaling.py``.
"""

from __future__ import annotations

from typing import Any

import jax

# primitives that constitute "aggregation work" worth overlapping
# (the Dirac applies aggregate via row gathers + Hamilton products, the
# ELL/BSR paths via contractions/reductions)
_WORK_PRIMS = {"dot_general", "reduce_sum", "scatter-add", "scatter_add", "gather"}
_PERMUTE_PRIMS = {"ppermute"}


def _walk(jaxpr) -> dict[str, Any]:
    """Analyze a jaxpr: tag each eqn with transitive halo dependence.

    Nested jaxprs (pjit / custom_vjp / scan bodies) are entered recursively
    with taint linked positionally: consts lead the inner invar list, so the
    outer call's operands align with the inner invars from the END; outer
    outvars align with inner outvars one-to-one."""
    stats = {"n_ppermute": 0, "interior_indep": 0, "boundary_dep": 0}

    def walk(jp, taint_in: list[bool], count: bool = True) -> list[bool]:
        taint: dict[int, bool] = {}
        for v, t in zip(reversed(jp.invars), reversed(taint_in)):
            taint[id(v)] = t

        def is_t(v) -> bool:
            return bool(taint.get(id(v), False)) if hasattr(v, "aval") else False

        for e in jp.eqns:
            dep = any(is_t(v) for v in e.invars)
            name = e.primitive.name
            if name in _PERMUTE_PRIMS:
                if count:
                    stats["n_ppermute"] += 1
                dep = True  # downstream of the permute waits on it
            # collect EVERY nested jaxpr this eqn carries: single-jaxpr params
            # (pjit/custom_vjp fun_jaxpr/scan body) and list/tuple params
            # (cond `branches`) alike — descending into only the first would
            # drop taint flowing through later branches/sub-jaxprs
            subs = []
            for p in e.params.values():
                for cand in (p if isinstance(p, (list, tuple)) else (p,)):
                    inner = getattr(cand, "jaxpr", cand)
                    if hasattr(inner, "eqns"):
                        subs.append(inner)
            if subs:
                in_t = [is_t(v) for v in e.invars]
                if name == "scan":
                    # loop carries feed outvars back into invars across
                    # iterations — propagate to a fixed point (taint only,
                    # stats suppressed) so halo taint reaching a carry on
                    # iteration k also taints its consumers on k+1
                    nc = e.params.get("num_consts", 0)
                    ncar = e.params.get("num_carry", 0)
                    for _ in range(max(ncar, 1)):
                        out_t = walk(subs[0], in_t, count=False)
                        fed = list(in_t)
                        for i in range(ncar):
                            fed[nc + i] = fed[nc + i] or out_t[i]
                        if fed == in_t:
                            break
                        in_t = fed
                # OR the outvar taints across all sub-jaxprs (cond: either
                # branch may execute, so an output is tainted if tainted in
                # ANY branch; eqn outvars align with inner outvars from the
                # start in cond/pjit/scan/custom_vjp alike).  If an inner
                # jaxpr yields MORE outvars than the eqn exposes (alignment
                # assumption broken by a new primitive), any tainted surplus
                # conservatively taints every output — over-counting
                # boundary_dep is safe, silently dropping taint is not.
                out_t = [False] * len(e.outvars)
                surplus_taint = False
                for sub in subs:
                    for i, t in enumerate(walk(sub, in_t, count=count)):
                        if i < len(out_t):
                            out_t[i] = out_t[i] or t
                        else:
                            surplus_taint = surplus_taint or t
                if surplus_taint:
                    out_t = [True] * len(out_t)
                for v, t in zip(e.outvars, out_t):
                    taint[id(v)] = t or dep
                continue
            if dep:
                for v in e.outvars:
                    taint[id(v)] = True
            if count and (name in _WORK_PRIMS or name == "scatter"):
                stats["boundary_dep" if dep else "interior_indep"] += 1
        return [is_t(v) for v in jp.outvars]

    out_t = walk(jaxpr, [False] * len(jaxpr.invars))
    return {**stats, "output_depends_on_halo": any(out_t)}


def check_overlap_structure(fn, *example_args) -> dict[str, Any]:
    """Trace ``fn`` (typically a ``shard_map``-wrapped partitioned apply)
    and report the interior/boundary dataflow split around its halo
    exchanges.  ``fn`` must be traceable with the given example args inside
    an active mesh context.  The walk recurses into every nested jaxpr
    (shard_map/pjit/custom_vjp/scan bodies), so no fragile descent into a
    particular top-level eqn is needed."""
    jaxpr = jax.make_jaxpr(fn)(*example_args)
    return _walk(jaxpr.jaxpr)
