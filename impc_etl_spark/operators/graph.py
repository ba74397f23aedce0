"""Graph closure operators — the ontology-hierarchy pattern, distributed.

The reference computes MP/MA/EMAPA term closures (every ancestor /
top-level / intermediate term per node) on the DRIVER with pronto
(jobs/extract/ontology_hierarchy_extractor.py:193-367) — fine for a
50k-term ontology, not for a general engine. Here the closure is an
iterative DataFrame join (doubling reachability each round, so depth-d
DAGs converge in ceil(log2 d) + 1 rounds), with the same outputs the
reference materializes: the (node, ancestor) pair table and per-node
ancestor arrays.

Scale: state is the reachability pair set, shuffled on the frontier key
each round; localCheckpoint per round keeps lineage flat. Cyclic inputs
converge too (reachability is a fixpoint) — max_iterations bounds the
damage of an unexpectedly deep graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    max_iterations: int = 12,
) -> DataFrame:
    """All (node, ancestor) pairs reachable via ``child → parent`` edges.

    Path-doubling: each round joins the current closure with itself, so
    reachable depth doubles per round (12 rounds covers depth 4096).
    """
    closure = edges.select(
        F.col(child_col).alias("node"), F.col(parent_col).alias("anc")
    ).distinct().localCheckpoint(eager=True)
    for _ in range(max_iterations):
        hop = (
            closure.alias("a")
            .join(closure.alias("b"), F.col("a.anc") == F.col("b.node"))
            .select(F.col("a.node").alias("node"), F.col("b.anc").alias("anc"))
        )
        new_closure = closure.union(hop).distinct().localCheckpoint(eager=True)
        if new_closure.count() == closure.count():
            closure = new_closure
            break
        closure = new_closure
    return closure


def ancestor_arrays(closure: DataFrame) -> DataFrame:
    """Per-node sorted ancestor id array (the reference's
    *_term_id list columns) from the closure pair table."""
    return closure.groupBy("node").agg(
        F.sort_array(F.collect_set("anc")).alias("ancestors")
    )
