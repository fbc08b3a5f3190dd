"""Cost-based access-path selection — the reference's one optimization.

Mirrors ``Store::using_index`` (``src/lib.rs:98-120``):

1. candidate conditions are those on indexed columns (``src/lib.rs:103-105``)
   whose comparison the index supports — in the reference literally only
   ``Equal(Const)`` (``src/lib.rs:106-112``); a column=column compare can
   never use an index (``src/cmp.rs:12-14``). We additionally let a btree
   index serve ``between`` (SURVEY §2 note).
2. pick the candidate whose index has the minimum ``estimate()`` — expected
   rows per key (``src/lib.rs:113``, ``src/idx.rs:71-78``).
3. no candidate → full scan (``src/lib.rs:119``).

The chosen path yields a *superset* of matching files; ``Store.find``
re-applies every condition on the surviving scan (``src/lib.rs:89-91,133``),
so index choice affects only performance, never results.

Everything here runs *before* Catalyst: the pruning selects which parquet
files even enter the plan. Inside the plan, Catalyst still does predicate
pushdown / row-group pruning / column pruning on the pruned scan — the two
layers compose.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from ..cmp import Condition
from ..idx import IndexSpec

__all__ = ["AccessPath", "choose_access_path"]


@dataclass
class AccessPath:
    """Either a full scan (``index is None``), an index lookup driven by
    one condition, or a composite lookup driven by the conjunction subset
    covering every member column (``conds``)."""

    index: IndexSpec | None = None
    cond: Condition | None = None
    conds: tuple[Condition, ...] = ()  # COMPOSITE only: one per member column

    @property
    def is_full_scan(self) -> bool:
        return self.index is None

    def describe(self) -> str:
        if self.index is None:
            return "FullScan"
        if self.conds:
            return (
                f"IndexLookup(columns={self.index.column}, kind={self.index.kind}, "
                f"estimate={self.index.estimate():.2f}, "
                f"conds=[{', '.join(str(c) for c in self.conds)}])"
            )
        return (
            f"IndexLookup(column={self.index.column}, kind={self.index.kind}, "
            f"estimate={self.index.estimate():.2f}, cond={self.cond})"
        )


def choose_access_path(
    conds: Sequence[Condition],
    indices: dict[str, IndexSpec],
    colnames: Sequence[str],
) -> AccessPath:
    best: AccessPath = AccessPath()
    best_est = float("inf")
    for cond in conds:
        name = cond.resolve(colnames)
        spec = indices.get(name)
        if spec is None or not spec.supports(cond.cmp):
            continue
        est = spec.estimate()
        if est < best_est:
            best = AccessPath(spec, cond)
            best_est = est
    # composite candidates: usable only when the conjunction carries a
    # const-equality on EVERY member column (tuple postings serve no
    # prefix). Their estimate is rows / ndv(tuple) — for correlated
    # columns far below any single-column candidate, so the reference's
    # min-estimate rule (src/lib.rs:113) picks them exactly when they help.
    by_name: dict[str, Condition] = {}
    for cond in conds:
        if cond.cmp.is_const_eq:
            by_name.setdefault(cond.resolve(colnames), cond)
    for spec in indices.values():
        if not spec.columns:
            continue
        covering = [by_name.get(c) for c in spec.columns]
        if any(c is None for c in covering):
            continue
        est = spec.estimate()
        if est < best_est:
            best = AccessPath(spec, None, tuple(covering))
            best_est = est
    return best
