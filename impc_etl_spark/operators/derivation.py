"""Derivation mini-DSL → Spark Column compiler.

The reference evaluates derived-parameter formulas like
``mul(div(sub('P1','P2'),'P1'),100)`` through an external JVM UDF
(shared/utils.py:64-68, lib/phenodcc-derived-parameters JAR; grammar
evidenced in config/constants.py:571-632 EUROPHENOME_DERIVATIONS).

Here the same grammar compiles directly to Catalyst ``Column`` expressions —
whole-stage-codegen'd arithmetic instead of a JVM-UDF black box, and the
optimizer can constant-fold / push through it.

Grammar (recursive):
    expr   := func '(' expr (',' expr)* ')' | quoted | number
    func   := mul | div | sub | sum | min | max | sqrt | abs | neg
              | meanOfIncrements | areaUnderCurve | ifElse | gt | lt | eq
    quoted := "'" name "'"          → column reference via the resolver
    number := integer or decimal literal

Aggregating forms (meanOfIncrements, areaUnderCurve) operate on an array
column of (increment, value) structs — the engine's time-series shape — via
higher-order ``aggregate``/``zip_with`` expressions, still UDF-free.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN = re.compile(r"\s*(?:(?P<func>[A-Za-z_][A-Za-z0-9_]*)\s*\(|(?P<close>\))|(?P<comma>,)|'(?P<quoted>[^']*)'|(?P<number>-?\d+(?:\.\d+)?))")


class DerivationError(ValueError):
    pass


def _parse(text: str) -> tuple:
    """Parse to nested tuples: ('call', name, [args]) | ('col', name) | ('lit', float)."""
    pos = 0
    stack: list[list] = []
    root: list = []

    def emit(node):
        (stack[-1][2] if stack else root).append(node)

    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m:
            if text[pos:].strip():
                raise DerivationError(f"parse error at {pos}: {text[pos:pos+20]!r}")
            break
        pos = m.end()
        if m.group("func"):
            stack.append(["call", m.group("func"), []])
        elif m.group("close"):
            if not stack:
                raise DerivationError("unbalanced ')'")
            node = stack.pop()
            emit((node[0], node[1], tuple(node[2])))
        elif m.group("quoted") is not None:
            emit(("col", m.group("quoted")))
        elif m.group("number"):
            emit(("lit", float(m.group("number"))))
    if stack:
        raise DerivationError("unbalanced '('")
    if len(root) != 1:
        raise DerivationError(f"expected one root expression, got {len(root)}")
    return root[0]


def _fold(args: list[Column], op: Callable[[Column, Column], Column]) -> Column:
    acc = args[0]
    for a in args[1:]:
        acc = op(acc, a)
    return acc


def _compile(node: tuple, resolver: Callable[[str], Column]) -> Column:
    kind = node[0]
    if kind == "col":
        return resolver(node[1]).cast("double")
    if kind == "lit":
        return F.lit(node[1])
    name, raw_args = node[1], node[2]
    args = [_compile(a, resolver) for a in raw_args]
    n = name.lower()
    if n == "mul":
        return _fold(args, lambda a, b: a * b)
    if n == "div":
        # try_divide: a zero denominator yields NULL like the reference's
        # JVM evaluator — plain '/' ABORTS the job under Spark 4's
        # default ANSI mode the first time any experiment divides by 0
        return _fold(args, lambda a, b: F.try_divide(a, b))
    if n == "sub":
        return _fold(args, lambda a, b: a - b)
    if n in ("sum", "add"):
        return _fold(args, lambda a, b: a + b)
    if n == "min":
        return F.least(*args)
    if n == "max":
        return F.greatest(*args)
    if n == "sqrt":
        return F.sqrt(args[0])
    if n == "abs":
        return F.abs(args[0])
    if n == "neg":
        return -args[0]
    if n == "gt":
        return args[0] > args[1]
    if n == "lt":
        return args[0] < args[1]
    if n == "eq":
        return args[0] == args[1]
    if n == "ifelse":
        return F.when(args[0].cast("boolean"), args[1]).otherwise(args[2])
    if n == "meanofincrements":
        # arg: array<struct<increment,value>> column → mean of values
        arr = _compile_array(raw_args[0], resolver)
        total = F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x["value"].cast("double"))
        # try_divide: an EMPTY series yields NULL instead of an ANSI
        # DIVIDE_BY_ZERO job abort
        return F.try_divide(total, F.size(arr))
    if n == "areaundercurve":
        # trapezoid over (increment, value) sorted by increment
        arr = F.array_sort(_compile_array(raw_args[0], resolver))
        pairs = F.zip_with(
            F.slice(arr, 1, F.size(arr) - 1),
            F.slice(arr, 2, F.size(arr) - 1),
            lambda a, b: (b["increment"].cast("double") - a["increment"].cast("double"))
            * (a["value"].cast("double") + b["value"].cast("double")) / 2.0,
        )
        # guard the EMPTY series: slice(size-1) is NEGATIVE-LENGTH for
        # size 0 (runtime abort) — NULL there; a single point folds over
        # zero trapezoids to 0.0, same as the SQL oracle
        return F.when(
            F.size(arr) >= 1,
            F.aggregate(pairs, F.lit(0.0), lambda acc, x: acc + x),
        )
    raise DerivationError(f"unknown function {name!r}")


def _compile_array(node: tuple, resolver: Callable[[str], Column]) -> Column:
    if node[0] != "col":
        raise DerivationError("aggregating derivation needs a column argument")
    return resolver(node[1])


def compile_derivation(
    formula: str,
    resolver: Callable[[str], Column] | None = None,
) -> Column:
    """Compile a derivation formula to a Spark Column.

    ``resolver`` maps a quoted parameter name to a Column; defaults to
    ``F.col``. Example::

        df.withColumn("pct_change",
                      compile_derivation("mul(div(sub('P1','P2'),'P1'),100)"))
    """
    resolver = resolver or F.col
    return _compile(_parse(formula), resolver)


def merge_struct_array(arr: Column, updates: Column, key_field: str) -> Column:
    """Key-matched overwrite of entries in an ``array<struct>`` — the
    native form of the reference's ``_merge_simple_parameters`` row UDF
    (experiment_parameter_derivator.py:114-149), used there to merge
    derived parameter values back into an experiment's parameter array.

    Semantics (exactly the reference's): entries of ``arr`` whose
    ``key_field`` appears in ``updates`` are replaced in place (last update
    with that key wins, like the reference's dict build); other entries
    keep their position; updates with keys not present in ``arr`` are
    appended in update order — ALL of them, duplicates included, exactly
    as the reference's ``for result in results`` append loop does (it
    guards only against keys present in ``simple_parameters``, not against
    duplicate keys within ``results``). Null handling mirrors the
    reference's caller: null ``arr`` → ``updates``; null ``updates`` →
    ``arr``. Keys must be non-null.

    Pure higher-order Column algebra (transform/filter/exists) — row-local,
    codegen'd, no UDF and no ``map_from_entries``/mapKeyDedupPolicy
    dependence. Both sides must share the struct type, as in the reference
    (it reuses the column's own schema for the UDF return type).
    """
    replaced = F.transform(
        arr,
        lambda e: F.coalesce(
            F.try_element_at(
                F.filter(updates, lambda u: u[key_field] == e[key_field]), F.lit(-1)
            ),
            e,
        ),
    )
    fresh = F.filter(
        updates, lambda u: ~F.exists(arr, lambda e: e[key_field] == u[key_field])
    )
    return (
        F.when(arr.isNull(), updates)
        .when(updates.isNull(), arr)
        .otherwise(F.concat(replaced, fresh))
    )


def extract_parameters(formula: str) -> list[str]:
    """All quoted parameter names referenced by a formula (mirrors the
    reference's extract_parameters_from_derivation, shared/utils.py:71-72)."""
    return re.findall(r"'([^']*)'", formula)
