"""Fluent pipeline API: the reference's dataflow surface over DataFrames.

Capability parity with the reference's six evaluated primitives plus its
composite closure (SURVEY.md §2.1–2.3), re-expressed Spark-first:

| reference (file:line)                               | here            |
|-----------------------------------------------------|-----------------|
| Create (transform_evaluators.py:15-20)              | Pipeline.create |
| ReadFromText (transform_evaluators.py:22-26)        | Pipeline.read_text |
| ParDo/Map/FlatMap/Filter (transform_evaluators.py:28-79) | map / flat_map / filter / par_do |
| Flatten (transform_evaluators.py:81-82)             | PCol.flatten    |
| GroupByKey (transform_evaluators.py:84-87)          | PCol.group_by_key |
| CombinePerKey (transform_evaluators.py:89-100)      | PCol.combine_per_key |
| side-input views (transform_evaluators.py:34-48)    | as_singleton/as_list/as_dict |
| multi-output ParDo — reference bug §2.5#4           | PCol.partition (works) |

Elements are rows: a PCollection of scalars is a one-column DataFrame
(column ``value``), KV pairs are ``(key, value)`` columns. Expression
ops (Column lambdas) stay in whole-stage codegen; Python callables take
the Arrow ``mapInPandas`` path with an explicit output schema — never
row-at-a-time pickling.

Divergences from reference semantics (deliberate, SURVEY.md §2.5):
 - a Python flat_map yielding None emits nothing (bug #1: reference
   emits a literal None);
 - unsupported ops raise at plan time (bug #2/#5: silent NoOp);
 - WindowInto has real semantics — fixed/sliding/session windows that
   downstream grouping honors (bug #2 made it a NoOp, silently producing
   globally-windowed results);
 - multi-output works (bug #4).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from beam_pyspark_runner_spark.operators.combiners import (
    BUILTIN_COMBINERS,
    CombineFn,
    combine_globally,
    combine_per_key,
)
from beam_pyspark_runner_spark.operators.metrics import (
    Counter,
    Distribution,
    MetricsRegistry,
)
from beam_pyspark_runner_spark.plans.dag import Node, PlanContext


def _n_fields(schema: str) -> int:
    """Field count of a simple 'name type, name type' DDL schema string."""
    depth = 0
    n = 1
    for ch in schema:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            n += 1
    return n


class Pipeline:
    """Builds a DAG of logical Nodes; lowering is memoized with fan-out
    persist (plans/dag.py). Pipelines are cheap objects — one per query."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self.ctx = PlanContext()
        self.metrics = MetricsRegistry(spark)

    # --- metrics (reference stub: pyspark_runner.py:30-31) ---------------
    def counter(self, namespace: str, name: str) -> Counter:
        """Beam Metrics.counter: accumulator-backed, safe to capture in
        par_do / map_rows kernels (see operators/metrics.py)."""
        return self.metrics.counter(namespace, name)

    def distribution(self, namespace: str, name: str) -> Distribution:
        return self.metrics.distribution(namespace, name)

    # --- sources --------------------------------------------------------
    def create(self, data: Iterable[Any], schema: str | None = None) -> "PCol":
        """In-memory source. Scalars become a ``value`` column; tuples
        become ``(key, value)`` when 2-wide unless a schema names them.
        Partitioning is left to AQE (supersedes the reference's
        sqrt-heuristic, transform_evaluators.py:18)."""
        data = list(data)
        if schema is None:
            if data and isinstance(data[0], tuple):
                schema = None  # let Spark infer struct fields _1.._n
                df = self.spark.createDataFrame(data)
                df = df.toDF(*(["key", "value"] if len(df.columns) == 2 else df.columns))
            else:
                df = self.spark.createDataFrame([(x,) for x in data], ["value"])
        else:
            rows = [x if isinstance(x, tuple) else (x,) for x in data]
            df = self.spark.createDataFrame(rows, schema)
        node = Node(build=lambda _ins, _df=df: _df, label="Create")
        return PCol(self, node)

    def read_text(self, path: str) -> "PCol":
        """Line source (reference: ReadFromText) — one ``value`` row per line."""
        node = Node(
            build=lambda _ins: self.spark.read.text(path), label=f"ReadText({path})"
        )
        return PCol(self, node)

    def read_parquet(self, path: str) -> "PCol":
        node = Node(
            build=lambda _ins: self.spark.read.parquet(path),
            label=f"ReadParquet({path})",
        )
        return PCol(self, node)

    def from_df(self, df: DataFrame, label: str = "FromDF") -> "PCol":
        return PCol(self, Node(build=lambda _ins, _df=df: _df, label=label))

    def create_opaque(self, objs: Iterable[Any]) -> "PCol":
        """Escape hatch for genuinely opaque Python elements (SURVEY.md
        §1.3 / §7 hard part 2): any picklable object rides a single
        BinaryType ``blob`` column — the reference's default element
        representation, made an EXPLICIT boundary here. Opaque blobs get
        no pushdown, pruning, or codegen; use schema-ful ``create`` for
        anything with structure, and cross back via ``map_opaque`` →
        schema-ful ``par_do`` once the shape is known."""
        import pickle

        data = [(pickle.dumps(o),) for o in objs]
        df = self.spark.createDataFrame(data, "blob binary")
        return PCol(self, Node(build=lambda _ins, _df=df: _df, label="CreateOpaque"))


class PCol:
    """Handle to a logical dataset node inside a Pipeline DAG."""

    def __init__(
        self,
        pipeline: Pipeline,
        node: Node,
        session_window: tuple[str, str] | None = None,
    ) -> None:
        self.pipeline = pipeline
        self.node = node
        # (ts_col, gap) when window_into(gap=...) deferred a session-window
        # assignment to grouping time; propagated through derivations.
        self._session_window = session_window

    # --- lowering -------------------------------------------------------
    def to_df(self) -> DataFrame:
        """Lower this node's lineage (memoized; fan-out nodes persisted)."""
        return self.pipeline.ctx.lower(self.node)[0]

    def collect(self) -> list:
        return self.to_df().collect()

    def _derive(self, label: str, build: Callable[[list[DataFrame]], DataFrame],
                extra_inputs: list[Node] | None = None) -> "PCol":
        node = Node(build=build, inputs=[self.node, *(extra_inputs or [])], label=label)
        return PCol(self.pipeline, node, session_window=self._session_window)

    # --- expression ops (codegen path) ----------------------------------
    def select(self, *cols: Column | str) -> "PCol":
        return self._derive("Select", lambda ins: ins[0].select(*cols))

    def apply(self, transform: "Callable[[PCol], PCol]") -> "PCol":
        """Composite-PTransform application — Beam's ``pcoll | MyXform()``
        (reference: PTransform.expand composition runs through
        ``overrides.py``): any callable PCol→PCol is a reusable named
        stage. Pure call-time composition, so Catalyst still sees ONE
        flat plan across composite boundaries — composites cost
        nothing at runtime."""
        out = transform(self)
        if not isinstance(out, PCol):
            raise TypeError(
                f"composite transform must return a PCol, got {type(out).__name__}"
            )
        return out

    __or__ = apply  # Beam muscle-memory: pcol | transform

    def map(self, expr: Column, out: str = "value") -> "PCol":
        """Map via a Column expression — stays in whole-stage codegen."""
        return self._derive("Map", lambda ins: ins[0].select(expr.alias(out)))

    def map_kv(self, key_expr: Column, value_expr: Column) -> "PCol":
        return self._derive(
            "MapKV",
            lambda ins: ins[0].select(key_expr.alias("key"), value_expr.alias("value")),
        )

    def filter(self, cond: Column) -> "PCol":
        return self._derive("Filter", lambda ins: ins[0].filter(cond))

    def flat_map(self, array_expr: Column, out: str = "value") -> "PCol":
        """FlatMap via an array expression + explode (codegen path)."""
        return self._derive(
            "FlatMap", lambda ins: ins[0].select(F.explode(array_expr).alias(out))
        )

    # --- Python ops (Arrow path) ----------------------------------------
    def par_do(
        self,
        fn: Callable[[Iterator], Iterator],
        schema: str,
        setup: Callable[[], Any] | None = None,
        teardown: Callable[[Any], None] | None = None,
        start_bundle: Callable[[Any], None] | None = None,
        finish_bundle: Callable[[Any], None] | None = None,
    ) -> "PCol":
        """ParDo with the full DoFn lifecycle over Arrow batches.

        ``fn(batches)`` receives an iterator of pandas DataFrames and
        yields output DataFrames matching ``schema``. Lifecycle mapping
        of the reference's setup/start_bundle/finish_bundle/teardown
        (transform_evaluators.py:57-75): ``setup`` runs once per task
        before the first batch and its return value is the state handed
        to the other hooks; each Arrow batch is one *bundle* —
        ``start_bundle(state)`` runs as ``fn`` pulls the batch from the
        iterator, ``finish_bundle(state)`` when it advances past it (or
        exhausts the iterator); ``teardown(state)`` runs after ``fn``
        finishes, even on error. If ``fn`` abandons the iterator early,
        the final ``finish_bundle`` is skipped (matching Beam, where a
        failed bundle is not finished) but ``teardown`` still runs.
        """

        def kernel(batches):
            state = setup() if setup else None

            def bundled():
                for pdf in batches:
                    if start_bundle:
                        start_bundle(state)
                    yield pdf
                    if finish_bundle:
                        finish_bundle(state)

            try:
                yield from fn(bundled() if (start_bundle or finish_bundle) else batches)
            finally:
                if teardown:
                    teardown(state)

        return self._derive(
            "ParDo", lambda ins: ins[0].mapInPandas(kernel, schema)
        )

    def map_rows(self, fn: Callable[[Any], Any], schema: str) -> "PCol":
        """Per-element Python map (reference Map with a callable). Runs
        batched over Arrow; prefer expression ``map`` whenever possible."""

        def kernel(batches):
            import pandas as pd

            for pdf in batches:
                out = [fn(row) for row in pdf.itertuples(index=False, name=None)]
                out = [x if isinstance(x, tuple) else (x,) for x in out]
                yield pd.DataFrame(out)

        return self._derive("MapRows", lambda ins: ins[0].mapInPandas(kernel, schema))

    def map_rows_with_exception_handling(
        self, fn: Callable[[Any], Any], schema: str
    ) -> tuple["PCol", "PCol"]:
        """Beam's ``ParDo(...).with_exception_handling()``: per-element
        map whose raising elements are routed to a dead-letter output
        instead of failing the job — returns ``(ok, errors)`` where
        ``errors`` rows carry (element repr, "ExcType: message"). One
        Python pass produces a tagged union; the two outputs are filter
        branches over the shared fan-out node (persisted once, same as
        ``partition``), so the kernel never re-runs per branch. The
        declarative twin for parse-shaped failures is the try_-function
        family (queries/events.py:dead_letter_split) — this form is for
        arbitrary Python where no try_ builtin exists."""

        def kernel(batches):
            import pandas as pd

            for pdf in batches:
                out = []
                n_fields = _n_fields(schema)
                for row in pdf.itertuples(index=False, name=None):
                    try:
                        res = fn(row)
                        res = res if isinstance(res, tuple) else (res,)
                        if len(res) != n_fields:
                            # A wrong-arity (or list) return would mis-shape
                            # pd.DataFrame(out) and fail the WHOLE Arrow batch
                            # with an opaque column-count error; raise inside
                            # the try so only THIS element dead-letters.
                            raise ValueError(
                                f"fn returned {len(res)} fields, schema "
                                f"declares {n_fields}"
                            )
                        out.append(res + (None, None))
                    except Exception as e:  # noqa: BLE001 — dead-letter by design
                        res = tuple(None for _ in range(_n_fields(schema)))
                        out.append(
                            res + (repr(row), f"{type(e).__name__}: {e}")
                        )
                yield pd.DataFrame(out)

        tagged = self._derive(
            "MapRowsWithExceptions",
            lambda ins: ins[0].mapInPandas(
                kernel, schema + ", __element string, __error string"
            ),
        )
        ok = tagged._derive(
            "MapRowsOk",
            lambda ins: ins[0]
            .filter(F.col("__error").isNull())
            .drop("__element", "__error"),
        )
        errors = tagged._derive(
            "MapRowsDeadLetter",
            lambda ins: ins[0]
            .filter(F.col("__error").isNotNull())
            .select(
                F.col("__element").alias("element"),
                F.col("__error").alias("error"),
            ),
        )
        return ok, errors

    def flat_map_rows(self, fn: Callable[[Any], Iterable[Any]], schema: str) -> "PCol":
        """Per-element Python flatMap; yielding None emits nothing
        (fixes reference bug SURVEY.md §2.5#1)."""

        def kernel(batches):
            import pandas as pd

            for pdf in batches:
                out = []
                for row in pdf.itertuples(index=False, name=None):
                    for x in fn(row):
                        if x is None:
                            continue
                        out.append(x if isinstance(x, tuple) else (x,))
                yield pd.DataFrame(out, columns=None)

        return self._derive(
            "FlatMapRows", lambda ins: ins[0].mapInPandas(kernel, schema)
        )

    # --- opaque-element escape hatch (SURVEY.md §7 hard part 2) ---------
    def map_opaque(self, fn: Callable[[Any], Any]) -> "PCol":
        """object → object over a pickled ``blob`` column, Arrow-batched
        (unpickle → fn → repickle per element; never row-at-a-time
        serialization of the whole frame). Stays opaque — chain
        ``map_opaque`` calls, or land back in schema-ful land with
        ``map_rows``/``par_do`` after extracting structure."""

        def kernel(batches):
            import pandas as pd
            import pickle

            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "blob": pdf["blob"].map(
                            lambda b: pickle.dumps(fn(pickle.loads(bytes(b))))
                        )
                    }
                )

        return self._derive(
            "MapOpaque", lambda ins: ins[0].mapInPandas(kernel, "blob binary")
        )

    def flat_map_opaque(self, fn: Callable[[Any], Iterable[Any]]) -> "PCol":
        """object → objects (1→N) over the pickled column; None is
        skipped (same contract as flat_map_rows)."""

        def kernel(batches):
            import pandas as pd
            import pickle

            for pdf in batches:
                out = []
                for b in pdf["blob"]:
                    for x in fn(pickle.loads(bytes(b))):
                        if x is None:
                            continue
                        out.append(pickle.dumps(x))
                yield pd.DataFrame({"blob": out})

        return self._derive(
            "FlatMapOpaque", lambda ins: ins[0].mapInPandas(kernel, "blob binary")
        )

    def collect_opaque(self) -> list:
        """Unpickle the blob column back to Python objects (driver-side;
        bounded results only, like any collect)."""
        import pickle

        return [pickle.loads(bytes(r[0])) for r in self.to_df().collect()]

    # --- windowing (Beam WindowInto, done properly) ---------------------
    def window_into(
        self,
        size: str | None = None,
        ts: str = "ts",
        slide: str | None = None,
        gap: str | None = None,
    ) -> "PCol":
        """Real ``WindowInto`` — the reference lowers it to NoOp, silently
        producing globally-windowed results (SURVEY.md §2.5 bug #2); here
        it has actual semantics.

        Fixed (``size``) and sliding (``size`` + ``slide``) windows assign
        ``window_start``/``window_end`` columns immediately — sliding
        multiplies rows, one per covering window, which is Beam's element
        model. Downstream ``group_by_key``/``combine_per_key`` detect the
        columns and group per (key, window) automatically. Session windows
        (``gap``) merge at aggregation time in Spark, so assignment is
        deferred: the PCol carries the spec and grouping injects
        ``F.session_window``.
        """
        if gap is not None:
            return PCol(self.pipeline, self.node, session_window=(ts, gap))
        if size is None:
            raise ValueError("window_into needs size= (fixed/sliding) or gap= (session)")
        w = F.window(ts, size, slide) if slide else F.window(ts, size)

        def build(ins: list[DataFrame]) -> DataFrame:
            return (
                # Re-windowing replaces any prior assignment: drop stale
                # window columns first (no-op when absent) or the new
                # ones would collide as ambiguous duplicates.
                ins[0]
                .drop("window_start", "window_end")
                .select("*", w.alias("__w"))
                .select(
                    "*",
                    F.col("__w.start").alias("window_start"),
                    F.col("__w.end").alias("window_end"),
                )
                .drop("__w")
            )

        derived = self._derive("WindowInto", build)
        derived._session_window = None  # re-windowing replaces any prior spec
        return derived

    def global_windows(self) -> "PCol":
        """Drop windowing: subsequent grouping is global again."""

        def build(ins: list[DataFrame]) -> DataFrame:
            df = ins[0]
            return df.drop("window_start", "window_end")

        derived = self._derive("GlobalWindows", build)
        derived._session_window = None
        return derived

    def _group_cols(self, df: DataFrame, key: str) -> list:
        """Grouping keys for the current windowing: (key [, window])."""
        cols = [key]
        if self._session_window is not None:
            ts, gap = self._session_window
            cols.append(F.session_window(F.col(ts), gap))
        else:
            cols += [c for c in ("window_start", "window_end") if c in df.columns]
        return cols

    @staticmethod
    def _flatten_session(df: DataFrame) -> DataFrame:
        if "session_window" in df.columns:
            df = df.select(
                "*",
                F.col("session_window.start").alias("window_start"),
                F.col("session_window.end").alias("window_end"),
            ).drop("session_window")
        return df

    @staticmethod
    def _assign_sessions(df: DataFrame, key: str, ts: str, gap: str) -> DataFrame:
        """Materialize merged session windows as element-level
        ``window_start``/``window_end`` columns.

        ``F.session_window`` only exists inside ``groupBy().agg()``, so a
        custom CombineFn (which folds via applyInPandas, not agg) can't
        use it. Equivalent batch construction: a gap-threshold flag over
        (key ORDER BY ts) marks session starts, its running sum numbers
        the sessions, and min/max-over-session gives the same
        [first_ts, last_ts + gap) bounds session_window produces. Cost:
        one shuffle on key + an in-partition sort — the same shuffle the
        agg itself needs; no extra exchange at scale."""
        from pyspark.sql import Window as W

        gap_i = F.expr(f"INTERVAL {gap}")
        w = W.partitionBy(key).orderBy(ts)
        prev = F.lag(ts).over(w)
        new_s = F.when(prev.isNull() | (F.col(ts) > prev + gap_i), 1).otherwise(0)
        sess = W.partitionBy(key, "__sid")
        return (
            df.withColumn("__new", new_s)
            .withColumn(
                "__sid",
                F.sum("__new").over(w.rowsBetween(W.unboundedPreceding, 0)),
            )
            .withColumn("window_start", F.min(ts).over(sess))
            .withColumn("window_end", F.max(ts).over(sess) + gap_i)
            .drop("__new", "__sid")
        )

    # --- grouping / combining ------------------------------------------
    def group_by_key(self, key: str = "key", value: str = "value") -> "PCol":
        """(K, V) → (K, list[V]). Values arrive unordered (multiset
        semantics, like the reference transform_evaluators.py:84-87).
        Under window_into, groups are per (key, window)."""

        def build(ins: list[DataFrame]) -> DataFrame:
            df = ins[0]
            grouped = df.groupBy(*self._group_cols(df, key)).agg(
                F.collect_list(value).alias("values")
            )
            return self._flatten_session(grouped)

        derived = self._derive("GroupByKey", build)
        # The session (if any) is materialized into window_start/window_end
        # by the grouping; the aggregated output no longer carries the ts
        # column, so propagating the spec would break (or silently
        # re-sessionize) a second grouping.
        derived._session_window = None
        return derived

    def combine_per_key(
        self, fn: str | CombineFn, key: str = "key", value: str = "value",
        out: str = "value",
    ) -> "PCol":
        """Keyed combine, window-aware. Builtin names lower to Catalyst
        aggregates (per (key [, window])); a custom ``CombineFn`` folds
        via applyInPandas over the same grouping — under session windows
        the merged sessions are materialized first (``_assign_sessions``),
        since ``F.session_window`` exists only inside ``agg``. Reference
        composes WindowInto + CombinePerKey(custom fn) freely
        (overrides.py:58-75 + transform_evaluators.py:89-100); this is
        that composition without the NoOp-window bug."""

        def build(ins: list[DataFrame]) -> DataFrame:
            df = ins[0]
            if not isinstance(fn, str):
                if self._session_window is not None:
                    ts, gap = self._session_window
                    df = self._assign_sessions(df, key, ts, gap)
                wcols = [
                    c for c in ("window_start", "window_end") if c in df.columns
                ]
                return combine_per_key(df, key, value, fn, out, extra_keys=wcols)
            cols = self._group_cols(df, key)
            if len(cols) == 1:
                return combine_per_key(df, key, value, fn, out)
            agg = BUILTIN_COMBINERS[fn]
            return self._flatten_session(
                df.groupBy(*cols).agg(agg(value).alias(out))
            )

        derived = self._derive("CombinePerKey", build)
        derived._session_window = None  # materialized into window cols (see above)
        return derived

    def combine_globally(
        self, fn: str | CombineFn, value: str = "value", out: str = "value"
    ) -> "PCol":
        """Global combine; under windowing, "global" means per-window
        (Beam: CombineGlobally on a windowed PCollection emits one value
        per window)."""

        def build(ins: list[DataFrame]) -> DataFrame:
            df = ins[0]
            if self._session_window is not None:
                ts, gap = self._session_window
                df = self._assign_sessions(
                    df.withColumn("__gk", F.lit(0)), "__gk", ts, gap
                ).drop("__gk")
            wcols = [c for c in ("window_start", "window_end") if c in df.columns]
            if not wcols:
                return combine_globally(df, value, fn, out)
            if isinstance(fn, str):
                return df.groupBy(*wcols).agg(
                    BUILTIN_COMBINERS[fn](value).alias(out)
                )
            return combine_per_key(
                df, wcols[0], value, fn, out, extra_keys=wcols[1:]
            )

        derived = self._derive("CombineGlobally", build)
        derived._session_window = None
        return derived

    def count_per_element(self, value: str = "value") -> "PCol":
        return self._derive(
            "CountPerElement",
            lambda ins: ins[0].groupBy(F.col(value).alias("key")).agg(
                F.count("*").alias("value")
            ),
        )

    def distinct(self) -> "PCol":
        return self._derive("Distinct", lambda ins: ins[0].distinct())

    def top(self, n: int, by: str = "value", ascending: bool = False) -> "PCol":
        order = F.col(by).asc() if ascending else F.col(by).desc()
        return self._derive(
            "Top", lambda ins: ins[0].orderBy(order).limit(n)
        )

    # --- multi-input ----------------------------------------------------
    def flatten(self, *others: "PCol") -> "PCol":
        """Bag union (UNION ALL), reference eval_Flatten."""
        def build(ins: list[DataFrame]) -> DataFrame:
            out = ins[0]
            for df in ins[1:]:
                out = out.unionByName(df, allowMissingColumns=True)
            return out

        return self._derive("Flatten", build, extra_inputs=[o.node for o in others])

    def join(self, other: "PCol", on, how: str = "inner") -> "PCol":
        return self._derive(
            "Join",
            lambda ins: ins[0].join(ins[1], on, how),
            extra_inputs=[other.node],
        )

    def co_group_by_key(self, other: "PCol", key: str = "key") -> "PCol":
        """CoGroupByKey: per-side grouped lists full-outer joined on key
        (the Beam expansion shuffles raw tagged rows instead —
        SURVEY.md §2.3)."""

        def build(ins: list[DataFrame]) -> DataFrame:
            left = ins[0].groupBy(key).agg(F.collect_list("value").alias("left_values"))
            right = ins[1].groupBy(key).agg(F.collect_list("value").alias("right_values"))
            return (
                left.join(right, key, "full_outer")
                .select(
                    key,
                    F.coalesce("left_values", F.array()).alias("left_values"),
                    F.coalesce("right_values", F.array()).alias("right_values"),
                )
            )

        return self._derive("CoGroupByKey", build, extra_inputs=[other.node])

    # --- multi-output (fixes reference bug §2.5#4) ----------------------
    def partition(self, *conds: Column) -> list["PCol"]:
        """Split into N+1 outputs: one per predicate (first match wins) plus
        a remainder. The shared input is a fan-out node, so the lowering
        persists it once rather than rescanning per output."""
        outs: list[PCol] = []
        taken: Column | None = None
        for cond in conds:
            eff = cond if taken is None else cond & ~taken
            outs.append(self._derive("PartitionBranch", lambda ins, c=eff: ins[0].filter(c)))
            taken = cond if taken is None else taken | cond
        outs.append(
            self._derive(
                "PartitionRest",
                lambda ins, c=taken: ins[0] if c is None else ins[0].filter(~c),
            )
        )
        return outs

    def reshuffle(self) -> "PCol":
        """Beam Reshuffle: break fusion / redistribute for parallelism.
        Lowered to a round-robin repartition to default parallelism
        (sources.readers.spread), skipped when the input is already wide
        — at scale this is the escape hatch for unsplittable sources or
        pre-expansion fan-out, not a default stage."""
        from beam_pyspark_runner_spark.sources.readers import spread

        return self._derive("Reshuffle", lambda ins: spread(ins[0]))

    # --- side-input views (reference transform_evaluators.py:34-48) -----
    def as_singleton(self):
        """First element of a 1-element dataset (driver scalar)."""
        rows = self.to_df().take(2)
        if len(rows) != 1:
            raise ValueError(f"as_singleton on non-singleton PCollection ({len(rows)}+ rows)")
        return rows[0][0]

    def as_list(self) -> list:
        """Collected single-column list for closure capture / broadcast.
        Side inputs are small by contract — same collect-then-broadcast
        shape as the reference (pyspark_runner.py:86-90)."""
        return [r[0] for r in self.to_df().collect()]

    def as_dict(self) -> dict:
        """Collected 2-column KV dict."""
        return {r[0]: r[1] for r in self.to_df().collect()}

    def as_multimap(self) -> dict:
        """Collected 2-column key → list-of-values multimap (Beam's
        AsMultimap — a view the reference rejects outright with
        NotImplementedError, transform_evaluators.py:48; strict-superset
        here). Duplicate keys accumulate in first-seen collect order;
        like the other driver views, small-by-contract — the scalable
        form is broadcast_join against the grouped table."""
        out: dict = {}
        for r in self.to_df().collect():
            out.setdefault(r[0], []).append(r[1])
        return out

    def broadcast_join(self, other: "PCol", on, how: str = "inner") -> "PCol":
        """The scalable side-input form: broadcast hash join instead of a
        driver round-trip — preferred at 100 TB over as_dict closures."""
        return self._derive(
            "BroadcastJoin",
            lambda ins: ins[0].join(F.broadcast(ins[1]), on, how),
            extra_inputs=[other.node],
        )

    # --- metrics --------------------------------------------------------
    def observe(self, namespace: str, name: str, *exprs: Column) -> "PCol":
        """Declarative metrics on the codegen path: named aggregates
        piggyback on the next action over this dataset (zero extra jobs,
        JVM-side) — the scale-preferred counter channel. Values appear in
        ``pipeline.metrics.query()`` after an action."""
        reg = self.pipeline.metrics
        return self._derive(
            f"Observe({namespace}/{name})",
            lambda ins: reg.observe(ins[0], namespace, name, *exprs),
        )

    # --- sinks ----------------------------------------------------------
    def write_text(self, path: str, mode: str = "overwrite") -> None:
        df = self.to_df()
        cols = df.columns
        if len(cols) != 1:
            df = df.select(
                F.concat_ws(",", *[F.col(c).cast("string") for c in cols]).alias("value")
            )
        else:
            df = df.select(F.col(cols[0]).cast("string").alias("value"))
        df.write.mode(mode).text(path)

    def write_parquet(self, path: str, mode: str = "overwrite",
                      partition_by: list[str] | None = None) -> None:
        w = self.to_df().write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
