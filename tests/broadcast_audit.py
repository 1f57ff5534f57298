"""Back-compat shim: the plan-governance auditors moved into the
package (``beam_pyspark_runner_spark.plans.audit``) in round 10 so
query code can run them at ``localCheckpoint`` construction time
(``checkpoint_audited``) — a checkpoint cuts lineage, so post-hoc
plan audits cannot see inside pinned segments. Tests keep importing
from here; the package module is the single source of truth."""

from beam_pyspark_runner_spark.plans.audit import (  # noqa: F401
    PROBE_CAP,
    RANGE_CAP,
    _bounded,
    _node_bounds,
    _probe_filter,
    checkpoint_audited,
    parse_plan,
    unbounded_cross_joins,
    unbounded_hinted_broadcasts,
    unpartitioned_ordered_windows,
)
