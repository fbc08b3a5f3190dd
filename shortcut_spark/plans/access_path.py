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
    """Either a full scan (``index is None``) or an index lookup driven by
    one condition."""

    index: IndexSpec | None = None
    cond: Condition | None = None

    @property
    def is_full_scan(self) -> bool:
        return self.index is None

    def describe(self) -> str:
        if self.index is None:
            return "FullScan"
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
    return best
