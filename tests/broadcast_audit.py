"""Hinted-broadcast governance: find every F.broadcast() build side and
classify whether its subtree is bounded by construction.

The round-8 window audit (`test_scale_patterns.py`) closed the
single-task-window bug class by re-deriving offenders from optimized
plans; this module is the twin for the OTHER unbounded-in-one-place
class: `F.broadcast()` of a table that grows with the corpus. The
round-8 instance (`mmr_diversified_topk` broadcasting the full
embeddings projection, fixed round 9) motivated it.

Planner-chosen broadcasts are size-gated by Spark itself (at 100 TB the
estimate crosses `autoBroadcastJoinThreshold` and the planner falls back
to a shuffle join), so the audit targets only HINT-forced broadcasts —
`leftHint=(strategy=broadcast)` / `rightHint=...` in the optimized
logical plan — which override the size gate unconditionally.

A hinted build side counts as bounded when its subtree contains, on
every path to a leaf, one of:

- an ``Aggregate`` (grain collapses to group keys — bucket/centroid/
  decile/histogram tables),
- a ``GlobalLimit``/``LocalLimit`` (TakeOrdered pools, top-k heaps),
- a ``LocalRelation``/``OneRowRelation`` (literal constants),
- a literal ``Range`` spine of <= ``RANGE_CAP`` rows (date/digit/dim
  spines),
- a ``LogicalRDD`` leaf (localCheckpoint output: the checkpointed
  lineage was itself audited when built — every checkpoint in query
  code sits above a limit or aggregate),
- a single-key equality filter directly over a leaf relation
  (``vec_id = 0``-style probe rows).

Anything else needs the query to carry the ``bounded_broadcast`` tag —
a human adjudication recorded next to the query, exactly like the
``bounded_window`` tag for single-task windows.
"""

from __future__ import annotations

import re

RANGE_CAP = 100_000  # literal spines above this are not "small"

_PREFIX_CHUNKS = {":  ", "   ", "+- ", ":- "}


def parse_plan(plan: str) -> list[tuple[int, str]]:
    """Indent-parse a Spark plan string into (depth, node_text) rows.

    Spark prints one node per line; each tree level contributes exactly
    one 3-char prefix chunk drawn from ``:  `` / three spaces / ``+- ``
    / ``:- ``."""
    out = []
    for line in plan.splitlines():
        if not line.strip():
            continue
        i = 0
        while line[i : i + 3] in _PREFIX_CHUNKS:
            i += 3
        out.append((i // 3, line[i:]))
    return out


def _subtree(nodes: list[tuple[int, str]], idx: int) -> list[tuple[int, str]]:
    d = nodes[idx][0]
    j = idx + 1
    while j < len(nodes) and nodes[j][0] > d:
        j += 1
    return nodes[idx:j]


def _children(nodes: list[tuple[int, str]], idx: int) -> list[int]:
    d = nodes[idx][0]
    kids = []
    j = idx + 1
    while j < len(nodes) and nodes[j][0] > d:
        if nodes[j][0] == d + 1:
            kids.append(j)
        j += 1
    return kids


_RANGE_RE = re.compile(r"^Range \((-?\d+), (-?\d+), step=(-?\d+)")

# TPC-H fixes nation at 25 rows and region at 5 at EVERY scale factor —
# they are the only tables whose cardinality is independent of the
# corpus, so a broadcast whose leaves are all nation/region scans is
# bounded by the data model itself.
_CONSTANT_DIM_LEAVES = ("Relation [n_nationkey", "Relation [r_regionkey")


def _node_bounds(text: str) -> bool:
    """Does this single node cap the cardinality flowing up through it?"""
    # long expression lists can be elided entirely, leaving a bare node
    if text == "Aggregate" or text.startswith(("Aggregate ", "Aggregate[")):
        return True
    if text.startswith(("GlobalLimit", "LocalLimit")):
        return True
    if text.startswith(("LocalRelation", "OneRowRelation")):
        return True
    if text.startswith("LogicalRDD"):
        return True
    if text.startswith(_CONSTANT_DIM_LEAVES):
        return True
    m = _RANGE_RE.match(text)
    if m:
        lo, hi, step = (int(g) for g in m.groups())
        return step != 0 and abs((hi - lo) // step) <= RANGE_CAP
    return False


# Selective key-probe filters: equality to a literal, or a range cap
# `key < N` / `key <= N` with a small literal N (dense-id probe sets
# like `vec_id < 8` — the fixed query batch of the ANN suite). Only
# KEY-LIKE columns count: an equality on a category column
# (`p_brand = 'X'`) selects a linear corpus fraction, not a probe row.
_EQ_FILTER_RE = re.compile(
    r"^Filter .*?\(\w*(?:key|_id|\bid)#\d+L? = [^)=<>]+\)"
)
_RANGE_FILTER_RE = re.compile(
    r"^Filter .*?\(\w*(?:key|_id|\bid)#\d+L? <=? (\d+)\)"
)
PROBE_CAP = 4096


def _probe_filter(text: str) -> bool:
    if _EQ_FILTER_RE.match(text):
        return True
    m = _RANGE_FILTER_RE.match(text)
    return bool(m) and int(m.group(1)) <= PROBE_CAP


def _bounded(nodes: list[tuple[int, str]], idx: int) -> bool:
    """True iff every leaf under ``idx`` sits below a bounding node.

    Walks top-down: a bounding node certifies its whole subtree; a
    probe filter (key equality or small dense-id range cap) over a
    plain leaf pipeline certifies its subtree; otherwise recurse into
    children, and a childless non-bounding leaf (a raw Relation)
    fails."""
    if _node_bounds(nodes[idx][1]):
        return True
    kids = _children(nodes, idx)
    if _probe_filter(nodes[idx][1]) and all(
        t.startswith(("Relation", "Project", "Filter", "LogicalRDD"))
        for _, t in _subtree(nodes, idx)[1:]
    ):
        return True
    if not kids:
        return False
    return all(_bounded(nodes, k) for k in kids)


def unbounded_hinted_broadcasts(plan: str) -> list[str]:
    """Node texts of hint-forced broadcast build sides whose subtree is
    NOT bounded by construction (empty list == plan is governed)."""
    nodes = parse_plan(plan)
    bad = []
    for i, (_, text) in enumerate(nodes):
        if not text.startswith("Join "):
            continue
        kids = _children(nodes, i)
        if len(kids) != 2:
            continue
        for hint, kid in (("leftHint", kids[0]), ("rightHint", kids[1])):
            if f"{hint}=(strategy=broadcast" in text and not _bounded(
                nodes, kid
            ):
                bad.append(nodes[kid][1][:120])
    return bad


def unbounded_cross_joins(plan: str) -> list[str]:
    """Node texts of Cartesian (``Join Cross``) joins where NEITHER
    side's subtree is bounded by construction — the quadratic-blowup
    class (empty list == plan is governed).

    A cross join with one bounded side is a scan decorated with
    constants/aggregates (linear); with BOTH sides corpus-grain it is
    quadratic at 100 TB no matter how it executes. Same bounded-ness
    rules as the hinted-broadcast audit; queries with a cross join
    that is bounded for reasons structural rules cannot see carry the
    ``bounded_cross`` tag."""
    nodes = parse_plan(plan)
    bad = []
    for i, (_, text) in enumerate(nodes):
        if not text.startswith("Join Cross"):
            continue
        kids = _children(nodes, i)
        if len(kids) != 2:
            continue
        if not (_bounded(nodes, kids[0]) or _bounded(nodes, kids[1])):
            bad.append(text[:120])
    return bad
