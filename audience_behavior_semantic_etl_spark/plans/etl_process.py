"""ETL DAG machinery — the reference's ETLStep/ETLProcess
(SURVEY.md §2.11), as plain dataclasses over lazy DataFrames.

Reference:
- ``ETLStep`` (name, description, output DF, inputSteps, persistResult,
  partitionByColumns) — etl/src/main/scala/org/sparkline/etl/ETLProcess.scala:38-43
- ``ETLStep.run`` memoize + cache (:100-109), ``persist`` = partitioned
  parquet append + temp-table registration (:111-128)
- ``ETLProcess.run`` walks final steps in topological (inputs-first)
  order (:176-236)

Differences by design (scale):
- NO ``coalesce(1)`` on write (the reference's single-file-per-cube
  convenience, ETLProcess.scala:118-120, kills parallelism at scale);
  writers emit one file per task and rely on table-level compaction.
- caching is opt-in per step (``cache=True``) rather than always-on —
  at 100 TB caching every intermediate would evict itself.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame


@dataclass
class ETLStep:
    name: str
    description: str
    build: Callable[[dict[str, DataFrame]], DataFrame]
    inputs: Sequence[str] = ()
    persist_path: str | None = None
    partition_by: Sequence[str] = ()
    register_as: str | None = None
    cache: bool = False
    _df: DataFrame | None = field(default=None, repr=False)

    def run(self, resolved: dict[str, DataFrame]) -> DataFrame:
        if self._df is None:
            df = self.build({k: resolved[k] for k in self.inputs})
            if self.cache:
                df = df.cache()
            self._df = df
        return self._df


class ETLProcess:
    """Topologically executes a step DAG; persisted steps are written as
    partitioned parquet and registered as temp views (reference
    ETLProcess.scala:176-236)."""

    def __init__(self, steps: Sequence[ETLStep]):
        self.steps = {s.name: s for s in steps}
        if len(self.steps) != len(steps):
            raise ValueError("duplicate step names")
        for s in steps:
            for dep in s.inputs:
                if dep not in self.steps:
                    raise ValueError(f"step {s.name!r} depends on unknown {dep!r}")

    def topo_order(self) -> list[str]:
        order: list[str] = []
        seen: set[str] = set()
        visiting: set[str] = set()

        def visit(n: str) -> None:
            if n in seen:
                return
            if n in visiting:
                raise ValueError(f"cycle at {n!r}")
            visiting.add(n)
            for dep in self.steps[n].inputs:
                visit(dep)
            visiting.discard(n)
            seen.add(n)
            order.append(n)

        for n in self.steps:
            visit(n)
        return order

    def run(self) -> dict[str, DataFrame]:
        resolved: dict[str, DataFrame] = {}
        for name in self.topo_order():
            step = self.steps[name]
            df = step.run(resolved)
            resolved[name] = df
            if step.persist_path:
                w = df.write.mode("append")
                if step.partition_by:
                    w = w.partitionBy(*step.partition_by)
                w.parquet(step.persist_path)
            if step.register_as:
                df.createOrReplaceTempView(step.register_as)
        return resolved

    def describe(self) -> str:
        """Step tree printout (reference ETLProcess.describe, :60-76)."""
        lines = []
        for name in self.topo_order():
            s = self.steps[name]
            lines.append(f"{name} <- {list(s.inputs)} persist={bool(s.persist_path)}")
        return "\n".join(lines)

    def show_plan(self, mode: str = "formatted") -> str:
        """Per-step physical plan printout — the reference's
        ``showETLPlan`` (M4, ETLProcess.scala). Builds every step
        (lazily, no actions) and renders each DataFrame's plan in the
        given explain mode, so the DAG's shuffle/pushdown story is
        inspectable before any job runs."""
        resolved: dict[str, DataFrame] = {}
        out = []
        for name in self.topo_order():
            step = self.steps[name]
            df = step.run(resolved)
            resolved[name] = df
            spark = df.sparkSession
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
            )
            out.append(f"== step: {name} ==\n{plan}")
        return "\n".join(out)
