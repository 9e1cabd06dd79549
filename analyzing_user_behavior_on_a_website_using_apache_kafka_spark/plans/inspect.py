"""Physical-plan predicates over `.explain("formatted")` output."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (what `.explain("formatted")` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter expressions pushed into the (parquet) scan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each scan (column-pruning check)."""
    plan = formatted_plan(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [
            f.split(":")[0].strip() for f in m.group(1).split(",") if f.strip()
        ]
        schemas.append(cols)
    return schemas


def broadcast_hash_join_count(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin", formatted_plan(df)))


def uses_operator(df: DataFrame, op: str) -> bool:
    """Does the physical plan contain the named operator (e.g.
    'SortMergeJoin', 'BroadcastNestedLoopJoin', 'HashAggregate')?"""
    return op in formatted_plan(df)


def unpartitioned_window_count(df: DataFrame) -> int:
    """How many Window nodes in the optimized logical plan have an EMPTY
    partition spec over UNAGGREGATED input — the
    move-everything-to-one-reducer shape that stalls at scale.

    A logical Window prints its NON-EMPTY spec lists as top-level bracket
    groups: ``Window [exprs], [partitionExprs], [orderExprs]`` when both
    are present, and omits an empty list entirely — so a partitioned
    UNORDERED window (per-group min/max over the whole partition) and an
    unpartitioned ORDERED one both print two groups. Order expressions
    always carry a sort direction (``ASC``/``DESC``), partition
    expressions never do, which disambiguates the two-group case. An
    unpartitioned window whose subtree contains an Aggregate is NOT
    flagged: its input is O(groups) rows (e.g. share-of-total over a
    histogram), a legitimate pattern.
    """
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.splitlines()

    def _indent(raw: str) -> int:
        return len(raw) - len(raw.lstrip(" +-:"))

    bad = 0
    for i, raw in enumerate(lines):
        s = raw.strip().lstrip("+-: ").strip()
        if not s.startswith("Window ["):
            continue
        depth = 0
        groups: list[str] = []
        for ch in s[len("Window ") :]:
            if ch == "[":
                if depth == 0:
                    groups.append("")
                depth += 1
            elif ch == "]":
                depth -= 1
            elif depth >= 1:
                groups[-1] += ch
        if len(groups) >= 3:
            continue
        if len(groups) == 2 and not (
            " ASC" in groups[1] or " DESC" in groups[1]
        ):
            # second group has no sort direction -> it IS the partition
            # spec (partitioned, unordered window): fine at scale
            continue
        # unpartitioned: inspect this node's subtree (deeper-indented
        # lines until a sibling at the same or shallower indent)
        my_indent = _indent(raw)
        subtree_has_agg = False
        for below in lines[i + 1 :]:
            if below.strip() and _indent(below) <= my_indent:
                break
            if below.strip().lstrip("+-: ").startswith("Aggregate "):
                subtree_has_agg = True
                break
        if not subtree_has_agg:
            bad += 1
    return bad


# First column of every table whose row count scales with the data.
# nation (25) / region (5) are constant at any sf and excluded.
_FACT_SIGNATURE_COLS = (
    "l_orderkey#",  # lineitem
    "o_orderkey#",  # orders
    "c_custkey#",  # customer
    "p_partkey#",  # part
    "s_suppkey#",  # supplier
    "event_id#",  # events
    "doc_id#",  # documents
    "vec_id#",  # embeddings
)

# Logical nodes that reduce a fact-scaled input to a bounded O(limit)
# build side, making a broadcast hint safe. Aggregate and Deduplicate
# are deliberately NOT here: they reduce to O(groups)/O(distinct keys),
# which is bounded only if their KEYS are — see _grouped_node_is_bounded.
_REDUCING_NODES = ("GlobalLimit ",)

# Grouping-key column names with a BOUNDED domain: enum-like fixture
# columns (a handful of distinct values at ANY corpus size) and derived
# keys whose cardinality is a code constant (hash-mod bucket ids, PQ
# subspace/codeword ids, LSH table ids, range-join bands). An Aggregate
# grouped only on these yields an O(domain)-row build side — hintable.
# A DATA-DERIVED key (token, word, gram, doc_id, …) is absent on
# purpose: its cardinality grows with the corpus (Heaps' law for
# vocabulary keys), so an Aggregate over it does NOT legalize a
# broadcast hint (VERDICT r5 item 3 — the loophole the vocabulary-sized
# freq broadcast slipped through in the dedup prefix-filter joins).
#
# WARNING (ADVICE r6): several entries below are generic bare names
# (m, k, band, tbl, salt, source, city). NEVER reuse one of these for a
# DATA-DERIVED column in a new query — a corpus-cardinality column
# named e.g. `k` would silently legalize a fact-table broadcast hint
# through this allowlist. When adding a derived key, prefer a prefixed
# name (pq_m-style) unless it must match an existing fixture column;
# tests/test_plans.py::test_bounded_group_keys_stay_constant_card
# cross-checks the fixture-enum entries against the actual data.
_BOUNDED_GROUP_KEYS = frozenset(
    {
        # fixture enum columns
        "event_type",
        "page_url",
        "device",
        "country",
        "lang",
        "source",
        "o_orderpriority",
        "o_orderstatus",
        "l_returnflag",
        "l_linestatus",
        "l_shipmode",
        "gender",
        "city",
        "service",
        # constant-cardinality derived keys
        "bkt",  # hash-mod bucket id, modulus is a code constant
        "cell",  # IVF cell id, |cells| = _IVF_K
        "m",  # PQ subspace id, |m| = code constant
        "k",  # PQ codeword id, |k| = code constant
        "tbl",  # LSH table id
        "band",  # range-join band / LSH band id
        "salt",  # skew salt, modulus is a code constant
    }
)

_GROUPED_RE = re.compile(r"^(Aggregate|Deduplicate) \[")
_COL_RE = re.compile(r"(\w+)#\d+")


def _grouped_node_is_bounded(node: str) -> bool:
    """True if an ``Aggregate``/``Deduplicate`` node's grouping/dedup
    keys are all bounded-domain. A GROUPED aggregate renders as
    ``Aggregate [keys], [exprs]``; a GLOBAL one (1 output row, always
    bounded) renders with a single list — ``Aggregate [exprs]``.
    ``Deduplicate [keys]`` always lists its keys first. Keys must all
    be names from _BOUNDED_GROUP_KEYS; any unrecognized column name in
    the key list (token#…, word#…, gram#…, doc_id#…) counts as
    unbounded — a corpus-wide ``distinct()`` over a data-derived key
    is O(vocabulary) and does not legalize a broadcast hint any more
    than the equivalent groupBy does."""
    m = _GROUPED_RE.match(node)
    if not m:
        return False
    # bracket-match the FIRST [...] group
    start = node.index("[")
    depth, end = 0, start
    for j in range(start, len(node)):
        if node[j] == "[":
            depth += 1
        elif node[j] == "]":
            depth -= 1
            if depth == 0:
                end = j
                break
    if m.group(1) == "Aggregate" and not node[end + 1 :].lstrip().startswith(
        ", ["
    ):
        return True  # single list — global aggregate, one row
    keys = node[start + 1 : end]
    if not keys.strip():
        return True
    names = _COL_RE.findall(keys)
    # no column refs at all (grouping on literals) is bounded; any
    # non-allowlisted name is not
    return all(n in _BOUNDED_GROUP_KEYS for n in names)



def unreduced_fact_broadcast_hints(df: DataFrame) -> list[str]:
    """Broadcast-hint subtrees that scan a fact-SCALED table with no
    cardinality-BOUNDING node in between.

    A forced ``F.broadcast`` over a table that grows with the data
    (customer is ~150 M rows at sf1000) OOMs every executor at scale no
    matter what the optimizer thinks — only hints over constant-size
    dims (nation, region, literal tables) or BOUNDED derivations are
    scale-safe. Bounding nodes: GlobalLimit, plus Aggregate/Deduplicate
    whose grouping/dedup keys all have bounded domains (global
    aggregates, enum columns, constant-modulus bucket ids — see
    _BOUNDED_GROUP_KEYS). An Aggregate or distinct() keyed on a
    data-derived column (token, word, gram, doc_id …) does NOT legalize
    the hint: its O(groups) output is vocabulary/corpus-sized and still
    OOMs at 100 TB.
    Returns the offending hint subtree headers; empty list = clean.
    Inspects the ANALYZED logical plan, where ``ResolvedHint`` is still
    an explicit node (the optimizer folds it into join-node hints
    later).
    """
    plan = df._jdf.queryExecution().analyzed().toString()
    lines = plan.splitlines()

    def _indent(raw: str) -> int:
        return len(raw) - len(raw.lstrip(" +-:"))

    offending: list[str] = []
    for i, raw in enumerate(lines):
        s = raw.strip().lstrip("+-: ").strip()
        if not s.startswith("ResolvedHint"):
            continue
        my_indent = _indent(raw)
        subtree: list[str] = []
        for below in lines[i + 1 :]:
            if below.strip() and _indent(below) <= my_indent:
                break
            subtree.append(below.strip().lstrip("+-: ").strip())
        has_fact = any(
            sig in node for node in subtree for sig in _FACT_SIGNATURE_COLS
        )
        has_reducer = any(
            node.startswith(red)
            for node in subtree
            for red in _REDUCING_NODES
        ) or any(_grouped_node_is_bounded(node) for node in subtree)
        if has_fact and not has_reducer:
            offending.append(s)
    return offending


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen regions — wider/fewer is better.

    The `codegen` explain mode compiles the plan upfront and reports
    "Found N WholeStageCodegen subtrees". NOTE: under AQE the whole plan
    hides behind AdaptiveSparkPlan until execution and this reports 0 —
    build the DataFrame with ``spark.sql.adaptive.enabled=false`` (a
    runtime conf, scoped per query construction) for this check.
    """
    cg = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), "codegen"
    )
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", cg)
    return int(m.group(1)) if m else 0
