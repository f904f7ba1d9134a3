"""Catalyst-behavior helpers shared by operators.

One entry so far: :func:`nd_guard`, the filter-pushdown pin for
expensive post-join expressions.  Catalyst duplicates expression trees
per reference (no plan-level sharing — see CLAUDE.md), and predicate
pushdown SUBSTITUTES a filtered alias with its defining expression.
For a similarity verify of the shape

    join(...).select(expensive(a, b).alias("x")).where(f(x) >= t)

the filter is folded into the JOIN CONDITION with ``expensive``
inlined — evaluated once per probed row in the condition (twice when
``f`` references x twice) AND again in the projection above: measured
3 ``array_intersect`` evaluations per candidate pair in the PPJoin
verify (plan-confirmed on Spark 4.1), ~2x the stage.  An unused
nondeterministic barrier column does NOT fix it: column pruning
removes the unused column first and the projection becomes pushable
again.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def nd_guard(col: Column) -> Column:
    """Pin an expensive computed column against filter-pushdown alias
    inlining by wrapping it in a value-preserving NONDETERMINISTIC
    branch: ``monotonically_increasing_id() >= 0`` is always true, so
    the value is bit-for-bit ``col``, but the expression is
    nondeterministic and Catalyst may not push, duplicate, or
    constant-fold through it (optimization guide §4.4 — the same
    mechanism as ``udf.asNondeterministic``, without a UDF).  Apply to
    the expensive column itself, never blanket: nondeterminism also
    blocks legitimate reorderings of OTHER filters past the
    projection."""
    return F.when(F.monotonically_increasing_id() >= 0, col)
