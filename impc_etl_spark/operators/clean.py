"""Cleaning operators: normalization maps, drops, blocklists, priority dedup.

The reference implements these with Python scalar UDFs (dict lookups —
shared/utils.py:94-101), `where` chains (experiment_cleaner.py:234-338), and
a self-join for source-priority dedup (specimen_cleaner.py:235-252). All are
re-expressed JVM-side:

- dict lookups  → ``F.create_map`` literal maps (whole-stage codegen, no
  Python round-trip),
- priority dedup → window ``row_number``,
- null/blocklist filters → plain Column predicates (pushed to the scan by
  Catalyst when possible).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence
from itertools import chain

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def map_normalize(
    df: DataFrame,
    column: str,
    mapping: dict[str, str],
    default_keep: bool = True,
) -> DataFrame:
    """Rewrite values of ``column`` via a literal map.

    Replaces the reference's ``udf(lambda x: MAP.get(x, x))`` pattern
    (shared/utils.py:94-101, experiment_cleaner.py:160-182) with a
    ``create_map`` lookup: stays in codegen, broadcast-free, null-safe.
    ``default_keep`` keeps unmapped values (the reference semantics).
    """
    if not mapping:
        return df
    lit_map = F.create_map(*[F.lit(x) for x in chain.from_iterable(mapping.items())])
    looked_up = lit_map[F.col(column)]
    value = F.coalesce(looked_up, F.col(column)) if default_keep else looked_up
    return df.withColumn(column, value)


def drop_null_rows(df: DataFrame, required: Sequence[str]) -> DataFrame:
    """Drop rows where any required column is null (experiment_cleaner.py:291-338)."""
    pred = None
    for c in required:
        p = F.col(c).isNotNull()
        pred = p if pred is None else (pred & p)
    return df.where(pred) if pred is not None else df


def blocklist_filter(df: DataFrame, column: str, blocked: Iterable) -> DataFrame:
    """Drop rows whose ``column`` is in a constant blocklist
    (experiment_cleaner.py:234-263). Null values are kept (isin is
    null-rejecting, matching the reference's ``~isin`` + null survival)."""
    blocked = list(blocked)
    if not blocked:
        return df
    return df.where(~F.col(column).isin(blocked) | F.col(column).isNull())


def allowlist_filter(df: DataFrame, column: str, allowed: Iterable) -> DataFrame:
    """Keep only rows whose ``column`` is in a constant allowlist."""
    return df.where(F.col(column).isin(list(allowed)))


def conditional_rewrite(df: DataFrame, column: str, rules: Sequence[tuple[Column, Column]],
                        otherwise: Column | None = None) -> DataFrame:
    """Build a ``when/otherwise`` chain from (condition, value) rules —
    the P4 centre/zygosity normalization pattern
    (specimen_experiment_cross_ref.py:142-162)."""
    expr = None
    for cond, value in rules:
        expr = F.when(cond, value) if expr is None else expr.when(cond, value)
    if expr is None:
        return df
    expr = expr.otherwise(otherwise if otherwise is not None else F.col(column))
    return df.withColumn(column, expr)


def dedup_by_priority(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """Keep one row per key tuple, picking the first under ``order_by``.

    Replaces the reference's self-left-outer-join + null-or-priority filter
    (specimen_cleaner.py:235-252 — prefer non-3i source per specimen) with a
    single window pass: one shuffle on ``keys`` instead of a join's two.
    ``order_by`` must be a total order for determinism — include a
    tie-breaker column.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def regex_clean(df: DataFrame, column: str, pattern: str, replacement: str) -> DataFrame:
    """regexp_replace in place (specimen_cleaner.py:225-233 `MGI:` strip,
    HTML-entity unescape)."""
    return df.withColumn(column, F.regexp_replace(F.col(column), pattern, replacement))


#: Path separator for flattened dict-tree keys (unit separator — never
#: appears in real key strings).
_TREE_SEP = "\x1f"


def _flatten_tree(tree: dict, path: tuple = ()):
    """Leaf paths of a nested dict: yields (key_path_tuple, leaf_value)."""
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten_tree(v, path + (str(k),))
        else:
            yield path + (str(k),), v


def dict_tree_lookup(
    tree: dict, keys: Sequence[Column], default: Column | None = None
) -> Column:
    """Deep-nested dict chooser (§2.10 — the mp_chooser pattern,
    stats_results_mapper.py:453-487, 2659-2666: a broadcast JSON tree
    indexed by a key path inside a row UDF), re-expressed as a row-local
    literal-map lookup: the tree is flattened to leaf paths once on the
    driver and inlined as a ``create_map`` literal keyed on the joined
    path. No Python in the hot path, no join, and Catalyst constant-folds
    the map. For trees too large to inline (≳10⁴ leaves of plan bloat) use
    `nested_dict_lookup_join`.
    """
    entries: list[Column] = []
    for path, v in _flatten_tree(tree):
        entries += [F.lit(_TREE_SEP.join(path)), F.lit(v)]
    m = F.create_map(*entries)
    # a NULL key anywhere on the path means NO match (the reference dict
    # UDF raises KeyError -> None): concat_ws SKIPS nulls, so without the
    # guard ('a', NULL, 'c') would collide with the 2-level path 'a/c'
    # and fabricate a confident wrong answer
    all_present = None
    for k in keys:
        p = k.isNotNull()
        all_present = p if all_present is None else (all_present & p)
    got = F.when(
        all_present, F.try_element_at(m, F.concat_ws(_TREE_SEP, *keys))
    )
    return F.coalesce(got, default) if default is not None else got


def nested_dict_lookup_join(
    df: DataFrame, tree: dict, key_cols: Sequence[str], out: str
) -> DataFrame:
    """Broadcast-join variant of `dict_tree_lookup` for big dict trees:
    leaf paths become a small DataFrame broadcast-left-joined on the key
    columns. All paths must share the depth of ``key_cols``."""
    rows = [tuple(path) + (v,) for path, v in _flatten_tree(tree)]
    depth = len(key_cols)
    if any(len(r) - 1 != depth for r in rows):
        raise ValueError("tree leaf depth must equal len(key_cols)")
    names = [f"__k{i}" for i in range(depth)] + [out]
    dim = df.sparkSession.createDataFrame(rows, names)
    cond = None
    for i, kc in enumerate(key_cols):
        c = df[kc] == dim[f"__k{i}"]
        cond = c if cond is None else cond & c
    return df.join(F.broadcast(dim), cond, "left_outer").drop(
        *[f"__k{i}" for i in range(depth)]
    )


def collapse_struct_array(arr: Column, overrides: dict[str, Column]) -> Column:
    """Keep-one collapse of an ``array<struct>`` — the chooser's return
    shape (_select_collapsed_mp_term, stats_results_mapper.py:2639-2691:
    first entry kept, selected fields overridden — sex → not_considered,
    term → chosen — re-wrapped as a single-entry array). Null and empty
    arrays pass through, like the reference's early return."""
    entry = F.try_element_at(arr, F.lit(1))
    for name, c in overrides.items():
        entry = entry.withField(name, c)
    return F.when(arr.isNull() | (F.size(arr) == 0), arr).otherwise(F.array(entry))
