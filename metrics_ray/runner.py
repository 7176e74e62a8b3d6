"""Suite runner — builds the Ray Data pipelines, merges partials, assembles
per-partition verdicts, and handles checkpoint/resume.

Execution shape (SURVEY.md §7.3):
  1. ONE streaming map_batches pass over the clip table runs every row-local
     check (stateless predicates + decode work + sketch partials +
     broadcast-join referential) — the input is scanned once, violations and
     tiny tagged partial rows are the only output that materializes.
  2. Keyed checks (exact uniqueness, content dedup) run as separate
     column-pruned pipelines CONCURRENTLY with the batch pass — each
     shuffles only key columns.
  3. Driver-side reduce: counters sum per (check, partition); sketch blobs
     merge associatively; finalize produces metric rows + verdicts. (With
     a violations_sink, violation rows bypass the driver entirely.)

The tagged-row trick: a map_batches stage has one output stream, so
violations ('v') and per-batch partials ('p') share one schema and are
split after collection; the collected stream is O(violations + batches),
never O(input).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, NamedTuple

import numpy as np
import pandas as pd
import pyarrow as pa

from .checks.base import BatchCheck, CheckContext
from .schema import METRIC_SCHEMA, VIOLATION_SCHEMA
from .collect import arrow_refs

TAGGED_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),  # 'v' violation | 'p' partial
        ("check_id", pa.string()),
        ("partition", pa.int32()),
        ("clip_id", pa.string()),
        ("code", pa.string()),
        ("actual", pa.string()),
        ("expected", pa.string()),
        ("detail", pa.string()),
        ("scanned", pa.int64()),
        ("violating", pa.int64()),
        ("payload", pa.binary()),
    ]
)

_EMPTY_TAGGED = TAGGED_SCHEMA.empty_table()


def _breaker_counter_cls():
    """Global violation counter for the circuit breaker — the one piece of
    genuinely shared mutable state in the engine, so it is a raw Ray actor
    (the Dataset API cannot express cross-task mutation; SURVEY.md §2.6
    'circuit breaker / error budget': the reference fail-fasts after N
    strikes to stop burning compute on garbage input). Defined lazily so
    importing the module never touches ray."""
    import ray

    @ray.remote(num_cpus=0)
    class _BreakerCounter:
        def __init__(self):
            self.total = 0

        def incr(self, n: int) -> int:
            self.total += int(n)
            return self.total

        def get(self) -> int:
            return self.total

    return _BreakerCounter


class SuiteExecutor:
    """The per-worker check-graph executor. Check graph built + setup() run
    once per __init__ (SURVEY.md §2.1: Check.setup() ≈
    ComplexQualityMetric.before()); per-batch work in __call__.

    Instantiated once per (worker process, pipeline) via the task-path
    executor cache below — the default — or once per actor when
    ``run_batch_checks(use_actors=True)``.

    ``breaker=(counter_actor_handle, budget)`` arms the circuit breaker:
    each violating batch reports its violation count to the shared
    counter (one cheap RPC, only on violating batches); once the global
    total exceeds the budget every executor that observes it skips ALL
    remaining batches (returns empty) — the N-strikes fail-fast. The trip
    point is inherently racy (in-flight batches finish), which is the
    nature of a breaker: it bounds wasted work, it does not define the
    result set."""

    def __init__(self, checks: list[BatchCheck], ctx: CheckContext,
                 breaker: tuple | None = None):
        self.checks = checks
        self.report_problems = getattr(ctx, "require_problem_report", True)
        self.breaker = breaker
        self._tripped = False
        for c in self.checks:
            c.setup(ctx)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._tripped:
            return _EMPTY_TAGGED
        out: list[pa.Table] = []
        batch_violations = 0
        for check in self.checks:
            o = check.evaluate(batch)
            if o.violations is not None:
                batch_violations += o.violations.num_rows
            n_v = (o.violations.num_rows
                   if o.violations is not None and self.report_problems
                   else 0)
            if n_v:
                v = o.violations
                out.append(pa.table({
                    "kind": pa.array(["v"] * n_v),
                    "check_id": pa.array([check.check_id] * n_v),
                    "partition": v.column("partition"),
                    "clip_id": v.column("clip_id"),
                    "code": v.column("code"),
                    "actual": v.column("actual"),
                    "expected": v.column("expected"),
                    "detail": v.column("detail"),
                    "scanned": pa.array([0] * n_v, pa.int64()),
                    "violating": pa.array([0] * n_v, pa.int64()),
                    "payload": pa.array([None] * n_v, pa.binary()),
                }))
            if o.keys is not None and o.keys.num_rows:
                k = o.keys
                n_k = k.num_rows
                out.append(pa.table({
                    "kind": pa.array(["k"] * n_k),
                    "check_id": pa.array([check.check_id] * n_k),
                    "partition": k.column("partition"),
                    "clip_id": k.column("clip_id"),
                    "code": pa.array([None] * n_k, pa.string()),
                    "actual": k.column("key"),  # the content key
                    "expected": pa.array([None] * n_k, pa.string()),
                    "detail": pa.array([None] * n_k, pa.string()),
                    "scanned": pa.array([0] * n_k, pa.int64()),
                    "violating": pa.array([0] * n_k, pa.int64()),
                    "payload": pa.array([None] * n_k, pa.binary()),
                }))
            parts = list(o.counters.keys())
            if o.partials:
                # a per-partition blob with no counter row must still ship:
                # count 0/0 for partitions only the sketch saw
                parts += [p for p in o.partials if p not in o.counters]
            n_p = len(parts)
            if n_p or o.partial is not None:
                payloads: list[bytes | None] = [None] * n_p
                if o.partials:
                    payloads = [o.partials.get(p) for p in parts]
                elif o.partial is not None:
                    if n_p == 0:
                        parts, payloads = [-1], [None]
                        n_p = 1
                    payloads[0] = o.partial  # one sketch blob per batch
                counts = [o.counters.get(p, (0, 0)) for p in parts]
                out.append(pa.table({
                    "kind": pa.array(["p"] * n_p),
                    "check_id": pa.array([check.check_id] * n_p),
                    "partition": pa.array(np.asarray(parts, np.int32)),
                    "clip_id": pa.array([None] * n_p, pa.string()),
                    "code": pa.array([None] * n_p, pa.string()),
                    "actual": pa.array([None] * n_p, pa.string()),
                    "expected": pa.array([None] * n_p, pa.string()),
                    "detail": pa.array([None] * n_p, pa.string()),
                    "scanned": pa.array(
                        [c[0] for c in counts], pa.int64()),
                    "violating": pa.array(
                        [c[1] for c in counts], pa.int64()),
                    "payload": pa.array(payloads, pa.binary()),
                }))
        if self.breaker is not None and batch_violations:
            import ray

            handle, budget = self.breaker
            total = ray.get(handle.incr.remote(batch_violations))
            if total > budget:
                self._tripped = True
        if not out:
            return _EMPTY_TAGGED
        return pa.concat_tables(out).cast(TAGGED_SCHEMA)


@dataclass
class SuiteReport:
    metrics: pa.Table
    violations: pa.Table
    verdicts: pa.Table
    manifest: dict[str, Any] = field(default_factory=dict)

    def metric(self, check_id: str, partition: int = -1) -> dict | None:
        df = self.metrics.to_pandas()
        m = df[(df.check_id == check_id) & (df.partition == partition)]
        return None if m.empty else m.iloc[0].to_dict()

    def write(self, out_dir: str) -> str:
        """Persist the report as partitioned parquet + manifest JSON — the
        ProblemCollection serializer analog (TestLoader.java:133-150), laid
        out resumably: violations under partition=N/ dirs so a consumer can
        read or re-process any partition independently."""
        import pyarrow.parquet as pq

        os.makedirs(out_dir, exist_ok=True)
        pq.write_table(self.metrics, os.path.join(out_dir, "metrics.parquet"))
        pq.write_table(self.verdicts, os.path.join(out_dir, "verdicts.parquet"))
        vdir = os.path.join(out_dir, "violations")
        vdf = self.violations.to_pandas()
        for p, sub in vdf.groupby("partition"):
            pdir = os.path.join(vdir, f"partition={int(p)}")
            os.makedirs(pdir, exist_ok=True)
            pq.write_table(
                pa.Table.from_pandas(sub.drop(columns="partition"),
                                     preserve_index=False),
                os.path.join(pdir, "violations.parquet"))
        with open(os.path.join(out_dir, "manifest.json"), "w") as f:
            json.dump(self.manifest, f, indent=1, default=str)
        return out_dir

    def problem_models(self, max_members: int = 1000) -> pa.Table:
        """Model-granularity problem collection — the analog of the
        reference's ``ProblemCollection<Model>`` payloads (20 metrics emit
        these, e.g. ValidIFPUsage.java:80-104: one problem node per violated
        constraint carrying a Bag of ALL violating subjects) as opposed to
        the flat per-offender rows (``ProblemCollection<Quad>``, this
        report's ``violations`` table): one row per
        (check_id, partition, code) with the offender count and the
        canonically ordered member Bag. Bags are capped at ``max_members``
        (sorted head, count preserved) so a hot constraint can't blow up
        the report row.

        Operates on the driver-resident violations table; a sink-mode run
        (``violations_sink=...``, where violation rows stream to parquet
        and never materialize here) should apply the same groupby to
        ``ray.data.read_parquet(sink_dir)`` instead."""
        df = self.violations.to_pandas()
        if df.empty:
            return pa.table({
                "check_id": pa.array([], pa.string()),
                "partition": pa.array([], pa.int32()),
                "code": pa.array([], pa.string()),
                "n_offenders": pa.array([], pa.int64()),
                "members": pa.array([], pa.list_(pa.string()))})
        g = (df.sort_values("clip_id", kind="stable")
               .groupby(["check_id", "partition", "code"], sort=True)
               ["clip_id"]
               .agg(n_offenders="size",
                    members=lambda s: list(s.head(max_members)))
               .reset_index())
        return pa.table({
            "check_id": pa.array(g["check_id"], pa.string()),
            "partition": pa.array(g["partition"].astype("int32")),
            "code": pa.array(g["code"], pa.string()),
            "n_offenders": pa.array(g["n_offenders"].astype("int64")),
            "members": pa.array(g["members"], pa.list_(pa.string())),
        })

    def problem_resources(self) -> pa.Table:
        """Resource-granularity problem collection — the analog of
        ``ProblemCollection<Resource>`` (HumanReadableLabelling.java: the
        problem element is just the offending resource): one row per
        distinct offender with the sorted set of problem codes it
        triggered across all checks. The inverse index of the flat rows:
        'what is wrong with THIS clip'."""
        df = self.violations.to_pandas()
        if df.empty:
            return pa.table({
                "clip_id": pa.array([], pa.string()),
                "n_problems": pa.array([], pa.int64()),
                "codes": pa.array([], pa.list_(pa.string()))})
        g = (df.groupby("clip_id", sort=True)["code"]
               .agg(n_problems="size",
                    codes=lambda s: sorted(set(s)))
               .reset_index())
        return pa.table({
            "clip_id": pa.array(g["clip_id"], pa.string()),
            "n_problems": pa.array(g["n_problems"].astype("int64")),
            "codes": pa.array(g["codes"], pa.list_(pa.string())),
        })


# Per-worker-process executor cache for the task-based path: Ray tasks run
# in REUSED worker processes, so the check graph (setup(): regex compile,
# broadcast ray.get, profile load) builds once per (process, pipeline) —
# the actor-pool benefit without paying actor-process startup per pipeline.
_EXECUTOR_CACHE: dict[str, SuiteExecutor] = {}


def _suite_task(batch: pa.Table, *, cache_key: str,
                checks: list[BatchCheck], ctx: CheckContext,
                breaker: tuple | None = None) -> pa.Table:
    ex = _EXECUTOR_CACHE.pop(cache_key, None)
    if ex is None:
        ex = SuiteExecutor(checks, ctx, breaker)
    # re-insert on every call (LRU, not FIFO): with >8 concurrent
    # pipelines a hit must refresh recency, or an ACTIVE pipeline's
    # executor gets evicted and rebuilt (setup() + breaker state) every
    # batch while idle entries survive
    _EXECUTOR_CACHE[cache_key] = ex
    if len(_EXECUTOR_CACHE) > 8:  # bound per-process memory
        for k in list(_EXECUTOR_CACHE)[:-4]:
            del _EXECUTOR_CACHE[k]
    return ex(batch)


def _filter_kinds_task(kinds: tuple[str, ...], *blocks) -> pa.Table:
    """Filter a group of tagged blocks to the driver-bound row kinds."""
    import pyarrow.compute as pc

    t = pa.concat_tables(blocks)
    return t.filter(pc.is_in(t.column("kind"),
                             value_set=pa.array(list(kinds), pa.string())))


def _collect_kinds(tagged, kinds: tuple[str, ...],
                   group_width: int = 8) -> list[pa.Table]:
    """Driver collection of the tagged stream's small rows as one task
    wave over the already-materialized block refs (to_arrow_refs on a
    materialized dataset is pure enumeration — no job)."""
    import math

    import ray

    refs = tagged.to_arrow_refs()
    if not refs:
        return []
    task = ray.remote(_filter_kinds_task)
    G = max(1, math.ceil(len(refs) / group_width))
    futs = [task.remote(tuple(kinds), *refs[i::G]) for i in range(G)
            if refs[i::G]]
    return [t for t in ray.get(futs) if t.num_rows]


class KeyStream(NamedTuple):
    """Fused key rows handed to keyed stages: ``dataset`` is the lazy
    kind=='k' view (the Dataset-plan input); ``tagged`` is the
    MATERIALIZED full tagged stream whose block refs let a task-graph
    exchange start without paying a separate filter job."""
    dataset: Any
    tagged: Any = None


def run_batch_checks(ds, checks: list[BatchCheck],
                     ctx: CheckContext | None = None,
                     batch_size: int = 4096,
                     concurrency: int | tuple[int, int] | None = None,
                     num_cpus: float = 1.0,
                     use_actors: bool = False,
                     violations_sink: str | None = None,
                     return_keys: bool = False,
                     error_budget: int | None = None,
                     on_keys=None):
    """Single streaming pass → (violations, counters_df, partials dict).

    Default execution is TASK-based (reused worker processes + per-process
    executor cache); ``use_actors=True`` switches to an actor pool — worth
    it only when a check's setup() is genuinely expensive (model weights),
    since actor pools pay fresh process startup per pipeline.

    ``violations_sink``: at production violation volumes (a 1% rate over
    10^12 rows is 10^10 rows) the violation stream must NOT pass through
    the driver — with a sink dir, violation rows are written straight to
    partitioned parquet from the executing tasks and the returned
    ``violations`` table is EMPTY (counters still carry per-partition
    violation totals; the sink path is the report of record)."""
    import uuid

    ctx = ctx or CheckContext()
    breaker = None
    breaker_handle = None
    if error_budget is not None:
        breaker_handle = _breaker_counter_cls().remote()
        breaker = (breaker_handle, int(error_budget))
    if use_actors:
        if concurrency is None:
            import ray

            concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
        tagged = ds.map_batches(
            SuiteExecutor,
            fn_constructor_args=(checks, ctx, breaker),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=num_cpus,
        )
    else:
        from functools import partial as _partial

        fn = _partial(_suite_task, cache_key=uuid.uuid4().hex,
                      checks=checks, ctx=ctx, breaker=breaker)
        kwargs = {} if concurrency is None else {"concurrency": concurrency}
        tagged = ds.map_batches(
            fn,
            batch_format="pyarrow",
            batch_size=batch_size,
            num_cpus=num_cpus,
            **kwargs,
        )
    keys_ds = None
    if violations_sink is not None or return_keys:
        # keep bulk rows off the driver: the tagged stream materializes in
        # the object store (spillable); violation rows go to the sink as
        # partitioned parquet (if requested), key rows stay a distributed
        # Dataset for the fused keyed stage, and only the tiny 'p' rows
        # (plus violations, when no sink) come back to the driver
        tagged = tagged.materialize()
        if return_keys:
            keys_ds = KeyStream(dataset=tagged.filter(expr='kind == "k"'),
                                tagged=tagged)
            if on_keys is not None:
                # hand the key stream to the caller the moment the pass
                # materializes, so fused keyed shuffles overlap the
                # driver-side counter/violation collection below
                on_keys(keys_ds)
        if violations_sink is not None:
            (tagged.filter(expr='kind == "v"')
                   .select_columns(VIOLATION_SCHEMA.names)
                   .write_parquet(violations_sink,
                                  partition_cols=["partition"]))
            keep_kinds = ("p",)
        else:
            keep_kinds = ("p", "v")
        # ONE task wave over the existing materialized block refs instead
        # of a filter Dataset job (~1.3-1.6 s of fixed mini-stage latency
        # at 8 cpus on the suite's critical path): each task filters its
        # group of blocks to the driver-bound kinds; bulk 'k' (and sinked
        # 'v') rows never leave the object store
        tables = _collect_kinds(tagged, keep_kinds)
        all_rows = (pa.concat_tables(tables).cast(TAGGED_SCHEMA)
                    if tables else _EMPTY_TAGGED)
        kinds = all_rows.column("kind").to_numpy(zero_copy_only=False)
        if violations_sink is not None:
            viol = None
            part_rows = all_rows
        else:
            viol = (all_rows.filter(pa.array(kinds == "v"))
                    .select(VIOLATION_SCHEMA.names).cast(VIOLATION_SCHEMA)
                    if (kinds == "v").any() else None)
            part_rows = all_rows.filter(pa.array(kinds == "p"))
    else:
        # the tagged stream is small (violations + O(batches) partial rows):
        # stream it to the driver without materializing the input
        batches = list(tagged.iter_batches(batch_size=65536, batch_format="pyarrow"))
        all_rows = (pa.concat_tables([pa.table(b) for b in batches]).cast(TAGGED_SCHEMA)
                    if batches else _EMPTY_TAGGED)
        kinds = all_rows.column("kind").to_numpy(zero_copy_only=False)
        viol = (all_rows.filter(pa.array(kinds == "v"))
                .select(VIOLATION_SCHEMA.names).cast(VIOLATION_SCHEMA)
                if (kinds == "v").any() else None)
        part_rows = all_rows.filter(pa.array(kinds == "p"))
    if os.environ.get("METRICS_RAY_PRINT_STATS"):
        # operator knob: per-stage wall/cpu/row stats of the executed pass
        # (Ray Data's ds.stats()) for tuning batch_size / concurrency
        print(tagged.stats())
    pdf = part_rows.select(["check_id", "partition", "scanned", "violating"]).to_pandas()
    counters = (pdf.groupby(["check_id", "partition"], sort=True)
                .sum().reset_index())
    # partials carry the partition of the batch that produced them — when the
    # input layout is partition-pure (hive dirs), this attributes every
    # sketch blob to its partition for checkpointing; merges stay global.
    # Iterate the THREE needed columns straight from Arrow: a second full
    # to_pandas here would box every sketch payload blob for no reason
    # (pdf above is already the projected counter conversion).
    partials: dict[str, list[tuple[int, bytes]]] = {}
    for cid, part_val, blob in zip(
            part_rows.column("check_id").to_pylist(),
            part_rows.column("partition").to_pylist(),
            part_rows.column("payload").to_pylist()):
        if blob is not None:
            partials.setdefault(cid, []).append((int(part_val), blob))
    if viol is None:
        viol = VIOLATION_SCHEMA.empty_table()
    if breaker_handle is not None:
        # record the breaker outcome as a synthetic counter row so the
        # existing return shape carries it: scanned = total violations the
        # counter saw, violating = 1 iff the budget was exceeded
        import ray

        total = int(ray.get(breaker_handle.get.remote()))
        ray.kill(breaker_handle)
        counters = pd.concat([counters, pd.DataFrame([{
            "check_id": "__circuit__", "partition": -1,
            "scanned": total,
            "violating": int(total > error_budget)}])],
            ignore_index=True)
    if return_keys:
        return viol, counters, partials, keys_ds
    return viol, counters, partials


def assemble_metrics(checks: list[BatchCheck], counters: pd.DataFrame,
                     partials: dict[str, list[tuple[int, bytes]]],
                     ctx: CheckContext | None = None) -> pa.Table:
    """Counters + merged sketches → METRIC_SCHEMA rows: per-partition rows
    for exact checks, a global (partition = -1) row for every check.

    ``finalize_value`` runs on these driver-side check objects, so their
    setup() (baseline profiles, thresholds) must run here too — worker-side
    setup happened on pickled COPIES inside the executor."""
    if ctx is not None:
        for c in checks:
            c.setup(ctx)
    rows = []
    for check in checks:
        sub = counters[counters.check_id == check.check_id]
        blobs = partials.get(check.check_id, [])
        g_scanned = int(sub["scanned"].sum())
        g_viol = int(sub["violating"].sum())
        if not blobs:  # exact check → per-partition verdict rows
            merged = check.merge([])
            for _, r in sub.iterrows():
                v, ok, _ = check.finalize_value(int(r.scanned), int(r.violating), None)
                rows.append((check.check_id, int(r.partition), v,
                             int(r.scanned), int(r.violating),
                             check.is_estimate, ok))
        elif getattr(check, "per_partition_sketch", True):
            # sketch check → per-partition rows from partition-attributed
            # blobs (a batch never spans partitions in the hive layout; in
            # the flat layout attribution is per source batch, still a
            # faithful per-partition estimate). The GLOBAL sketch is the
            # merge OF the per-partition merges (associative) — every raw
            # blob is unpickled exactly once, not once per tier.
            by_part: dict[int, list[bytes]] = {}
            for part_val, blob in blobs:
                by_part.setdefault(part_val, []).append(blob)
            part_merged: list[bytes] = []
            for part_val in sorted(by_part):
                pm = check.merge(by_part[part_val])
                if pm is not None:
                    part_merged.append(pm)
                if part_val < 0:
                    continue
                psub = sub[sub.partition == part_val]
                ps = int(psub["scanned"].sum())
                pv = int(psub["violating"].sum())
                v, ok, _ = check.finalize_value(ps, pv, pm)
                rows.append((check.check_id, int(part_val), v, ps, pv,
                             check.is_estimate, ok))
            merged = check.merge(part_merged)
        else:
            merged = check.merge([b for _, b in blobs])
        value, passed, detail = check.finalize_value(g_scanned, g_viol, merged)
        rows.append((check.check_id, -1, value, g_scanned, g_viol,
                     check.is_estimate, passed))
    return _metric_rows(rows)


def scanned_totals(counters: pd.DataFrame) -> tuple[int, pd.Series]:
    """(global rows, per-partition rows) for keyed-check denominators: the
    MAX scanned across checks per partition — robust to a sampling check
    (whose counters reflect sampled rows only, e.g. DecodeCheck with
    sample_fraction) sitting anywhere in the suite, including first; the
    old checks[0] convention made total_rows ≈ fraction·N whenever a
    sampled check led the (user-controlled) suite order."""
    real = counters[counters.check_id != "__circuit__"]
    if not len(real):
        return 0, pd.Series(dtype="int64")
    per = (real.groupby(["check_id", "partition"])["scanned"].sum()
           .groupby("partition").max())
    return int(per.sum()), per


def _metric_rows(rows) -> pa.Table:
    cols = list(zip(*rows)) if rows else [[] for _ in range(7)]
    return pa.table({f.name: pa.array(list(c), f.type)
                     for f, c in zip(METRIC_SCHEMA, cols)})


def compare_reports(current: SuiteReport, baseline: SuiteReport,
                    tolerance: float = 0.01) -> pa.Table:
    """Metric-level regression check between two runs of the same suite:
    one row per (check_id, partition) present in either report, with both
    values, the delta, and ``regressed`` = current metric dropped more than
    ``tolerance`` below baseline. The run-over-run analog of DriftCheck
    (which compares data distributions; this compares metric outcomes)."""
    cur = current.metrics.to_pandas().set_index(["check_id", "partition"])
    base = baseline.metrics.to_pandas().set_index(["check_id", "partition"])
    idx = cur.index.union(base.index)
    rows = []
    for key in sorted(idx):
        c = cur["metric_value"].get(key, float("nan"))
        b = base["metric_value"].get(key, float("nan"))
        delta = c - b
        regressed = bool(pd.notna(c) and pd.notna(b)
                         and delta < -tolerance)
        rows.append((key[0], int(key[1]), float(b), float(c),
                     float(delta), regressed))
    return pa.table({
        "check_id": pa.array([r[0] for r in rows], pa.string()),
        "partition": pa.array([r[1] for r in rows], pa.int32()),
        "baseline_value": pa.array([r[2] for r in rows], pa.float64()),
        "current_value": pa.array([r[3] for r in rows], pa.float64()),
        "delta": pa.array([r[4] for r in rows], pa.float64()),
        "regressed": pa.array([r[5] for r in rows], pa.bool_()),
    })


def assemble_verdicts(metrics: pa.Table, violations: pa.Table) -> pa.Table:
    """Per-partition verdict: pass iff every per-partition check passed and
    the partition produced no violation rows from global/keyed checks."""
    mdf = metrics.to_pandas()
    vdf = violations.to_pandas()
    parts = sorted(set(mdf[mdf.partition >= 0].partition) |
                   set(vdf[vdf.partition >= 0].partition))
    rows = []
    for p in parts:
        msub = mdf[mdf.partition == p]
        nviol = int((vdf.partition == p).sum())
        ok = bool(msub.passed.all()) and nviol == 0
        rows.append((int(p), int(msub.rows_scanned.max()) if len(msub) else 0,
                     nviol, ok))
    return pa.table({
        "partition": pa.array([r[0] for r in rows], pa.int32()),
        "rows_scanned": pa.array([r[1] for r in rows], pa.int64()),
        "n_violations": pa.array([r[2] for r in rows], pa.int64()),
        "passed": pa.array([r[3] for r in rows], pa.bool_()),
    })


def run_suite(ds_factory: Callable[[list[str] | None], Any],
              checks: list[BatchCheck],
              ctx: CheckContext | None = None,
              keyed: dict[str, Callable[[Any], Any]] | None = None,
              batch_size: int = 4096,
              concurrency=None,
              keyed_from_keys: dict[str, tuple[Any, Callable]] | None = None,
              keyed_composite: tuple[list[Any], Callable, list[str]] | None = None,
              error_budget: int | None = None,
              violations_sink: str | None = None,
              ) -> SuiteReport:
    """Full suite: batch checks (one pass) + keyed shuffle checks.

    ``ds_factory(columns)`` returns the clip Dataset with optional projection
    pruning — each keyed pipeline re-reads only the columns it shuffles.
    ``keyed`` maps check_id → fn(ds) returning a violations Dataset.

    ``keyed_from_keys`` maps check_id → (key_emitter_check, fn(keys_ds)):
    the FUSED keyed path — the emitter runs inside the shared batch pass
    (payload read once), its key rows stay a distributed Dataset, and fn
    shuffles those instead of re-reading the table.

    ``keyed_composite`` = (emitter_checks, plan_fn, check_ids): the
    COMPOSITE fused path — several keyed checks share ONE exchange.
    plan_fn(keys_ds) returns a violations Dataset with a leading
    check_id column (COMPOSITE_KEYED_SCHEMA); the runner splits it back
    into per-check results. Halves the per-exchange fixed latencies vs
    one keyed_from_keys entry per check (the round-3 suite-efficiency
    tail, BASELINE.md trials 14-17)."""
    from concurrent.futures import ThreadPoolExecutor

    import ray

    t0 = time.time()
    ctx = ctx or CheckContext()
    # a CALLABLE baseline_profile is a deferred side input (e.g. the
    # profile pass running concurrently with this suite): ship the pass a
    # stripped copy — DriftCheck bins on declared-domain edges and only
    # consumes baseline COUNTS at driver-side finalize — and resolve the
    # callable just before assembly, by which time the concurrent build
    # has long finished under the main pass.
    deferred_profile = (ctx.baseline_profile
                        if callable(ctx.baseline_profile) else None)
    if deferred_profile is not None:
        import dataclasses

        ctx = dataclasses.replace(ctx, baseline_profile={})
    keyed_from_keys = keyed_from_keys or {}
    emitters = [em for em, _ in keyed_from_keys.values()]
    if keyed_composite is not None:
        emitters = emitters + list(keyed_composite[0])
    pass_checks = checks + emitters
    cols = set()
    for c in pass_checks:
        cols.update(c.columns)
    projected = sorted(cols) if cols else None
    if projected is not None:
        # tell projection-aware checks (SchemaCheck) which columns the
        # pass actually reads — an expected column absent from the BATCH
        # because pruning excluded it is not a schema violation
        import dataclasses as _dc

        ctx = _dc.replace(
            ctx, params={**ctx.params, "projected_columns": projected})
    ds = ds_factory(projected)

    # The batch pass and every keyed shuffle are INDEPENDENT pipelines —
    # run them concurrently from driver threads so the wall time is
    # max(pipeline) not sum(pipeline). Ray's streaming executor interleaves
    # their tasks; per-pipeline fixed costs (stage startup, scheduling,
    # driver-side collection) overlap instead of stacking — this is what
    # keeps scaling efficiency high when each individual pipeline is short.
    from .checks.keyed import KEYED_VIOLATION_SCHEMA as keyed_schema

    keyed_wall: dict[str, float] = {}

    def collect_keyed(kv_ds, kid: str = ""):
        tk = time.time()
        if violations_sink is None:
            tables = [t.cast(keyed_schema)
                      for t in ray.get(arrow_refs(kv_ds))
                      if t.num_rows]
            out = (pa.concat_tables(tables) if tables
                   else keyed_schema.empty_table())
        else:
            # sink mode: the driver holds ONE block at a time — each is
            # written to the sink and reduced to per-partition counts;
            # only the counts (not the rows) reach metric assembly
            import pyarrow.parquet as _pq

            n_v, bad = 0, {}
            os.makedirs(violations_sink, exist_ok=True)
            for i, ref in enumerate(arrow_refs(kv_ds)):
                t = ray.get(ref)
                if not t.num_rows:
                    continue
                t = t.cast(keyed_schema)
                t = t.add_column(0, "check_id", pa.array(
                    [kid or "keyed"] * t.num_rows, pa.string())).cast(
                        VIOLATION_SCHEMA)
                # SAME hive layout as the batch pass's write_parquet
                # (partition stripped into the path) — a flat root file
                # with a physical partition column would make the sink
                # unreadable as one dataset
                _pq.write_to_dataset(
                    t, violations_sink, partition_cols=["partition"],
                    basename_template=(
                        f"keyed_{kid or 'k'}_{i:06d}_{{i}}.parquet"))
                vp = t.column("partition").to_numpy(zero_copy_only=False)
                uniq, cnt = np.unique(vp, return_counts=True)
                for p, c in zip(uniq.tolist(), cnt.tolist()):
                    bad[int(p)] = bad.get(int(p), 0) + int(c)
                n_v += t.num_rows
            out = (n_v, bad)
        if kid:
            keyed_wall[kid] = round(time.time() - tk, 3)
        return out

    def collect_composite(kv_ds, kids: list[str]):
        """Collect a composite keyed plan — a Dataset (leading check_id
        column) or a list of task-graph reduce ObjectRefs — and split it
        back into the per-check shapes collect_keyed produces — a table
        per check, or (n_violations, per-partition counts) in sink
        mode."""
        import pyarrow.compute as pc

        from .checks.keyed import COMPOSITE_KEYED_SCHEMA

        tk = time.time()
        out: dict[str, Any] = {}
        kv_refs = (kv_ds if isinstance(kv_ds, list)
                   else None)
        if violations_sink is None:
            tables = [t.cast(COMPOSITE_KEYED_SCHEMA)
                      for t in ray.get(kv_refs if kv_refs is not None
                                       else arrow_refs(kv_ds))
                      if t.num_rows]
            full = (pa.concat_tables(tables) if tables
                    else COMPOSITE_KEYED_SCHEMA.empty_table())
            for kid in kids:
                out[kid] = (full.filter(pc.equal(full.column("check_id"),
                                                 kid))
                            .drop_columns(["check_id"]).cast(keyed_schema))
        else:
            import pyarrow.parquet as _pq

            os.makedirs(violations_sink, exist_ok=True)
            counts = {kid: (0, {}) for kid in kids}
            for i, ref in enumerate(kv_refs if kv_refs is not None
                                    else arrow_refs(kv_ds)):
                t = ray.get(ref)
                if not t.num_rows:
                    continue
                t = t.cast(COMPOSITE_KEYED_SCHEMA)
                for kid in kids:
                    sub = t.filter(pc.equal(t.column("check_id"), kid))
                    if not sub.num_rows:
                        continue
                    sub = sub.cast(VIOLATION_SCHEMA)
                    # hive layout, matching the batch pass (see
                    # collect_keyed)
                    _pq.write_to_dataset(
                        sub, violations_sink, partition_cols=["partition"],
                        basename_template=(
                            f"keyed_{kid}_{i:06d}_{{i}}.parquet"))
                    n_v, bad = counts[kid]
                    vp = sub.column("partition").to_numpy(
                        zero_copy_only=False)
                    uniq, cnt = np.unique(vp, return_counts=True)
                    for p, c in zip(uniq.tolist(), cnt.tolist()):
                        bad[int(p)] = bad.get(int(p), 0) + int(c)
                    counts[kid] = (n_v + sub.num_rows, bad)
            out = counts
        wall = round(time.time() - tk, 3)
        for kid in kids:
            keyed_wall[kid] = wall
        return out

    # build every dataset plan serially (read_parquet path resolution is
    # not thread-safe when optional fs backends are missing); only the
    # EXECUTION runs concurrently
    def _composite_plan(plan_fn, ks, kids):
        """Pick the composite exchange's physical plan: the two-wave
        task-graph hash shuffle when the tagged stream is already
        materialized and the G×B fan-out is bounded (it starts from the
        existing block refs — no filter job, ~5x lower fixed latency);
        the Dataset sort exchange otherwise (the large-cluster default,
        see COMPOSITE_TASK_MAX_FANOUT)."""
        refs_variant = getattr(plan_fn, "refs_variant", None)
        tagged_src = getattr(ks, "tagged", None)
        if refs_variant is not None and tagged_src is not None:
            from .checks.keyed import (COMPOSITE_TASK_MAX_FANOUT,
                                       shuffle_blocks)

            refs = arrow_refs(tagged_src)  # materialized: enumeration only
            B = shuffle_blocks()
            if len(refs) * B <= COMPOSITE_TASK_MAX_FANOUT:
                return refs_variant(refs, tuple(kids), B)
        return plan_fn(ks.dataset if isinstance(ks, KeyStream) else ks)

    def _fused_plan(keys_ds, kid):
        if isinstance(keys_ds, KeyStream):
            keys_ds = keys_ds.dataset
        # fused keyed stages shuffle the already-computed key rows
        # (kind='k': key in 'actual'); the payload was read exactly once.
        # NOTE (measured, do not "optimize"): forcing a batch_size here to
        # coalesce the tiny key blocks is ~7% SLOWER (interleaved A/B at
        # 8 cpus staged, 3 reps) — the fused stages launch against the
        # materializing stream (on_keys) and block-granular maps preserve
        # that overlap, same effect as the grouped_apply bundling note
        return (keys_ds.filter(expr=f'check_id == "{kid}"')
                .map_batches(lambda b: pa.table({
                    "key": b.column("actual"),
                    "partition": b.column("partition"),
                    "clip_id": b.column("clip_id"),
                }), batch_format="pyarrow"))

    def timed_batch(on_keys=None):
        tb = time.time()
        out = run_batch_checks(ds, pass_checks, ctx, batch_size=batch_size,
                               concurrency=concurrency,
                               return_keys=bool(emitters),
                               error_budget=error_budget,
                               violations_sink=violations_sink,
                               on_keys=on_keys)
        return out, time.time() - tb

    keyed_plans = [(kid, fn(ds_factory)) for kid, fn in (keyed or {}).items()]
    fused_futs: dict[str, Any] = {}
    if os.environ.get("METRICS_RAY_SEQUENTIAL_PIPELINES"):
        # deterministic sequencing knob: on few contended cores the
        # interleaving of concurrent pipelines adds wall-time variance;
        # sequential execution trades peak overlap for stability
        batch_out, pass_wall_s = timed_batch()
        keyed_results = [(kid, collect_keyed(kv_ds, kid))
                         for kid, kv_ds in keyed_plans]
    else:
        pool = ThreadPoolExecutor(
            max_workers=1 + len(keyed_plans) + len(keyed_from_keys)
            + (1 if keyed_composite is not None else 0))

        def _launch_fused(keys_ds):
            # called from inside the batch pass the moment the tagged
            # stream materializes: the fused shuffles overlap the pass's
            # driver-side collection instead of queueing behind it
            for kid, (_em, fn) in keyed_from_keys.items():
                fused_futs[kid] = pool.submit(
                    collect_keyed, fn(_fused_plan(keys_ds, kid)), kid)
            if keyed_composite is not None:
                _ems, plan_fn, kids = keyed_composite
                fused_futs["__composite__"] = pool.submit(
                    collect_composite, _composite_plan(plan_fn, keys_ds,
                                                       kids), kids)

        with pool:
            fut_batch = pool.submit(
                timed_batch, _launch_fused if emitters else None)
            fut_keyed = [(kid, pool.submit(collect_keyed, kv_ds, kid))
                         for kid, kv_ds in keyed_plans]
            batch_out, pass_wall_s = fut_batch.result()
            keyed_results = [(kid, f.result()) for kid, f in fut_keyed]
            for kid, f in fused_futs.items():
                if kid == "__composite__":
                    keyed_results += list(f.result().items())
                else:
                    keyed_results.append((kid, f.result()))
    if emitters:
        viol, counters, partials, keys_ds = batch_out
        if not fused_futs:  # sequential mode: run fused stages inline
            for kid, (_em, fn) in keyed_from_keys.items():
                keyed_results.append(
                    (kid, collect_keyed(fn(_fused_plan(keys_ds, kid)), kid)))
            if keyed_composite is not None:
                _ems, plan_fn, kids = keyed_composite
                keyed_results += list(
                    collect_composite(_composite_plan(plan_fn, keys_ds,
                                                      kids), kids).items())
    else:
        viol, counters, partials = batch_out

    if deferred_profile is not None:
        import dataclasses

        from .schema import declared_histogram_edges

        prof = deferred_profile() or {}
        for col, p in prof.items():
            want = declared_histogram_edges(col)
            got = np.asarray(p["edges"], dtype=np.float64)
            if got.shape != want.shape or not np.allclose(got, want):
                raise ValueError(
                    f"deferred baseline profile for {col!r} was not built "
                    "on the declared-domain edges; the pass binned on "
                    "declared edges, so the comparison basis would differ")
        ctx = dataclasses.replace(ctx, baseline_profile=prof)
    metrics = assemble_metrics(checks, counters, partials, ctx=ctx)

    total_rows, part_scanned = (scanned_totals(counters) if checks
                                else (0, pd.Series(dtype="int64")))
    extra_metric_rows = []
    keyed_viols = []
    for kid, kvt in keyed_results:
        if isinstance(kvt, tuple):  # sink mode: (n_v, per-partition counts)
            n_v, bad = kvt
        else:
            n_v = kvt.num_rows
            kvt = kvt.add_column(0, "check_id",
                                 pa.array([kid] * n_v,
                                          pa.string())).cast(VIOLATION_SCHEMA)
            keyed_viols.append(kvt)
            if n_v:
                vp = kvt.column("partition").to_numpy(zero_copy_only=False)
                uniq, cnt = np.unique(vp, return_counts=True)
                bad = dict(zip(uniq.tolist(), cnt.tolist()))
            else:
                bad = {}
        value = 1.0 if total_rows == 0 else 1.0 - n_v / total_rows
        extra_metric_rows.append((kid, -1, value, total_rows, n_v, False, n_v == 0))
        # per-partition rows for keyed checks from violation partitions.
        # REAL data partitions only (p >= 0): the circuit breaker's
        # synthetic row and the legacy blob-only partial path both tag
        # partition -1, which would collide with the global -1 row above
        for p in sorted(set(
                counters.loc[counters.check_id != "__circuit__",
                             "partition"])):
            if p < 0:
                continue
            nv = int(bad.get(p, 0))
            sc = int(part_scanned.get(p, 0))
            val = 1.0 if sc == 0 else 1.0 - nv / sc
            extra_metric_rows.append((kid, int(p), val, sc, nv, False, nv == 0))
    if extra_metric_rows:
        metrics = pa.concat_tables([metrics, _metric_rows(extra_metric_rows)])
    if keyed_viols:
        viol = pa.concat_tables([viol, *keyed_viols])

    verdicts = assemble_verdicts(metrics, viol)
    manifest = {
        "rows_scanned": total_rows,
        "n_violations": int(viol.num_rows),
        "n_checks": (len(checks) + len(keyed or {}) + len(keyed_from_keys)
                     + (len(keyed_composite[2])
                        if keyed_composite is not None else 0)),
        "estimation": {c.check_id: c.is_estimate for c in checks},
        "wall_s": round(time.time() - t0, 3),
        # the streaming batch-check pass alone (concurrent with keyed
        # shuffles) — the component that dominates at production row counts
        "pass_wall_s": round(pass_wall_s, 3),
        # per-keyed-pipeline wall (thread-submit → collected); concurrent
        # with the pass EXCEPT the fused stages, which start after it
        "keyed_wall_s": keyed_wall,
    }
    if error_budget is not None:
        brk = counters[counters.check_id == "__circuit__"]
        if len(brk):
            manifest["circuit_open"] = bool(int(brk.iloc[0]["violating"]))
            manifest["circuit_violations_seen"] = int(brk.iloc[0]["scanned"])
    return SuiteReport(metrics=metrics, violations=viol, verdicts=verdicts,
                       manifest=manifest)
