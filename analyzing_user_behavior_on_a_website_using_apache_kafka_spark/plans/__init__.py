"""Plan inspection: assert the physical plan is the one we designed for.

`.explain("formatted")` output is the contract with Catalyst — these
helpers turn the interesting plan properties (filter pushdown, column
pruning, join strategy, codegen coverage) into testable predicates, so a
regression that silently de-optimizes a query (e.g. a cast blocking
pushdown, a join falling back to BNLJ) fails CI instead of shipping a
100 TB slowdown. See tests/test_plans.py and SCALE.md.
"""

from .inspect import (  # noqa: F401
    broadcast_hash_join_count,
    formatted_plan,
    pushed_filters,
    read_schema_columns,
    unpartitioned_window_count,
    unreduced_fact_broadcast_hints,
    uses_operator,
    wholestage_codegen_spans,
)
