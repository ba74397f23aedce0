"""Checkpointed pipeline runner — the engine's orchestration layer.

The reference uses Luigi: each PySparkTask's parquet output target is both
the stage boundary and the memo (re-runs skip completed targets). This
module reproduces that contract without the Luigi dependency or the
spark-submit-per-task process boundary: a `Stage` is read→ops→write with a
parquet target; `Pipeline.run` executes stages topologically, skipping
stages whose target already exists (idempotent resume).

Single-session execution means Catalyst can still fuse within a stage while
the parquet boundary caps lineage depth between stages (the reference's
write-then-reread lineage cut, stats_pipeline_input_mapper.py:63-66, made
structural).
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Stage:
    name: str
    fn: Callable[..., DataFrame]  # (spark, *input_dfs) -> DataFrame
    inputs: Sequence[str] = field(default_factory=tuple)  # upstream stage names
    target: str | None = None  # parquet path; None = in-memory passthrough


class Pipeline:
    def __init__(self, spark: SparkSession, stages: Sequence[Stage], base_dir: str | None = None):
        self.spark = spark
        self.stages = {s.name: s for s in stages}
        self.base_dir = base_dir
        self._order = self._toposort(stages)
        self._cache: dict[str, DataFrame] = {}

    @staticmethod
    def _toposort(stages: Sequence[Stage]) -> list[str]:
        names = {s.name for s in stages}
        for s in stages:
            missing = set(s.inputs) - names
            if missing:
                raise ValueError(f"stage {s.name}: unknown inputs {sorted(missing)}")
        done: list[str] = []
        seen: set[str] = set()

        def visit(name: str, path: tuple[str, ...]):
            if name in seen:
                return
            if name in path:
                raise ValueError(f"cycle at {name}")
            st = next(s for s in stages if s.name == name)
            for dep in st.inputs:
                visit(dep, path + (name,))
            seen.add(name)
            done.append(name)

        for s in stages:
            visit(s.name, ())
        return done

    def _target_path(self, stage: Stage) -> str | None:
        if stage.target is None:
            return None
        if self.base_dir and not os.path.isabs(stage.target):
            return os.path.join(self.base_dir, stage.target)
        return stage.target

    def run(self, force: bool = False) -> dict[str, DataFrame]:
        """Execute all stages; returns name → DataFrame (reading back from
        targets, so downstream lineage starts at the checkpoint)."""
        for name in self._order:
            stage = self.stages[name]
            path = self._target_path(stage)
            if path and not force and os.path.exists(os.path.join(path, "_SUCCESS")):
                self._cache[name] = self.spark.read.parquet(path)
                continue
            inputs = [self._cache[i] for i in stage.inputs]
            df = stage.fn(self.spark, *inputs)
            if path:
                df.write.mode("overwrite").parquet(path)
                df = self.spark.read.parquet(path)
            self._cache[name] = df
        return dict(self._cache)
