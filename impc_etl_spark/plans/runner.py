"""Checkpointed DAG runner — the engine's orchestration layer.

The reference orchestrates ~80 Luigi ``PySparkTask``s whose only contract
is "read parquet inputs → DataFrame transform → write parquet output", with
task completion witnessed by the output target existing
(workflow/config.py ``get_target``; SURVEY.md §3). That is 90% of Luigi's
value for this pipeline, so the engine replaces it with a ~100-line runner:

- a ``Task`` is (name, fn(spark, *input_DFs) -> DF, inputs=[task names])
- targets are ``<root>/<name>.parquet``; an existing target memoizes the
  task (delete the directory to force a rerun — same operational model as
  deleting a Luigi target)
- execution is a topological walk; each task reads its parents' PARQUET
  output (not their in-memory DataFrames), so every stage is a
  materialization barrier — lineage stays short, failures resume at the
  last completed stage, and independent subtrees can run from different
  driver processes concurrently (parquet is the coordination layer).

At 100 TB the per-stage parquet checkpoint is not overhead, it IS the
resumability/caching model (the reference's too). Stages that would
benefit from fusion belong in one task body.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Task:
    name: str
    fn: Callable[..., DataFrame]
    inputs: Sequence[str] = field(default_factory=tuple)


class Pipeline:
    """A named DAG of parquet-checkpointed Spark tasks."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._tasks: dict[str, Task] = {}

    def task(self, name: str, inputs: Sequence[str] = ()):
        """Decorator registering ``fn(spark, *input_dfs) -> DataFrame``."""
        def deco(fn: Callable[..., DataFrame]) -> Callable[..., DataFrame]:
            if name in self._tasks:
                raise ValueError(f"duplicate task {name!r}")
            self._tasks[name] = Task(name, fn, tuple(inputs))
            return fn

        return deco

    def sql_task(self, name: str, sql: str, inputs: Sequence[str] = ()) -> None:
        """Register a task whose body is a SQL statement over its parents
        (each parent task is visible as a temp view under its own name) —
        the config-driven task form; see ``pipeline_from_spec``."""
        if name in self._tasks:  # same contract as the task() decorator —
            raise ValueError(f"duplicate task {name!r}")  # no silent overwrite
        def fn(spark: SparkSession, *parents: DataFrame) -> DataFrame:
            for pname, pdf in zip(inputs, parents):
                pdf.createOrReplaceTempView(pname)
            return spark.sql(sql)

        self._tasks[name] = Task(name, fn, tuple(inputs))

    def target(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.parquet")

    def is_complete(self, name: str) -> bool:
        return os.path.exists(os.path.join(self.target(name), "_SUCCESS"))

    def _toposort(self, goals: Sequence[str]) -> list[str]:
        order: list[str] = []
        seen: dict[str, int] = {}  # 0=visiting, 1=done

        def visit(n: str) -> None:
            if n not in self._tasks:
                raise KeyError(f"unknown task {n!r}")
            state = seen.get(n)
            if state == 1:
                return
            if state == 0:
                raise ValueError(f"cycle through task {n!r}")
            seen[n] = 0
            for dep in self._tasks[n].inputs:
                visit(dep)
            seen[n] = 1
            order.append(n)

        for g in goals:
            visit(g)
        return order

    def run(self, *goals: str, force: Sequence[str] = ()) -> dict[str, str]:
        """Run ``goals`` (and everything they require). Returns
        {task: 'cached'|'ran'}. ``force`` reruns those tasks even if their
        target exists."""
        statuses: dict[str, str] = {}
        for name in self._toposort(goals or tuple(self._tasks)):
            if self.is_complete(name) and name not in force:
                statuses[name] = "cached"
                continue
            t = self._tasks[name]
            parents = [self.spark.read.parquet(self.target(i)) for i in t.inputs]
            out = t.fn(self.spark, *parents)
            out.write.mode("overwrite").parquet(self.target(name))
            statuses[name] = "ran"
        return statuses

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.target(name))


def pipeline_from_spec(spark: SparkSession, root: str, spec: dict) -> Pipeline:
    """Build a Pipeline from a declarative spec (dict or parsed JSON/YAML):

    ``{"tasks": [{"name": ..., "sql": ..., "inputs": [...]}
                 | {"name": ..., "source": "<parquet path>"}]}``

    ``source`` tasks read external parquet; ``sql`` tasks compute over
    their parents. This is the whole orchestration config surface — a
    release pipeline is data, reviewable and diffable, not code.
    """
    p = Pipeline(spark, root)
    for t in spec["tasks"]:
        name = t["name"]
        if "source" in t:
            if name in p._tasks:
                raise ValueError(f"duplicate task {name!r}")
            path = t["source"]

            def mk_src(pth):
                return lambda s: s.read.parquet(pth)

            p._tasks[name] = Task(name, mk_src(path), ())
        else:
            p.sql_task(name, t["sql"], t.get("inputs", ()))
    return p
