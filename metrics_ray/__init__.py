"""metrics_ray — a Ray-Data-native schema + constraint validation engine.

Re-expresses the Luzzu/Metrics quality-metric framework (reference at
/root/reference: streaming per-quad ``compute()`` folds producing a scalar
metric value, a ProblemCollection of violations, and an observation-activity
profile) as vectorized per-batch checks over Arrow tables of audio
clip + transcript pairs, executed by Ray Data's streaming executor.

Architecture (SURVEY.md §7):
  - ``schema``     canonical Arrow schemas (clip table, violations, metrics)
  - ``audio``      deterministic PCM synthesis + fake codecs + SNR
  - ``synth``      clips-table derivation from the driver's documents table
                   (SQL-mirrored so DuckDB oracles can verify the checks)
  - ``sketches``   mergeable HLL / t-digest / histogram (KS, PSI) states
  - ``checks``     the Check protocol + implementations
  - ``runner``     single-pass suite execution, verdicts, checkpoint/resume
  - ``functions``  text analysis / dedup / similarity primitives
  - ``pipelines``  end-to-end pipelines exposed through __ray_entry__
"""

__version__ = "0.2.0"

# Ray 2.49's unify_schemas logs a harmless "Failed to hash the schemas (for
# deduplication): unhashable type: 'dict'" warning for pandas-block schemas
# produced by groupby/map_groups stages. It fires once per reduce task and
# floods bench/driver tails, hiding real warnings. This module is imported in
# every worker that deserializes our batch functions, so the level set here
# applies engine-wide.
import logging as _logging

class _KnownNoiseFilter(_logging.Filter):
    """Drops exactly two known-noise ray.data warnings, nothing else:

    - transform_pyarrow's "Failed to hash the schemas (for
      deduplication)" — fires once per reduce task on pandas-block
      schemas (unhashable), flooding bench/driver tails;
    - streaming_executor_state's schema-divergence warning (with a full
      multi-line schema dump) — routine for tagged-union co-group
      stages, where member and corpus rows legitimately interleave
      schemas before the groupby.

    A message-matching filter (not a level change) so every OTHER
    warning from those modules still surfaces."""

    _SUBSTRINGS = (
        "Failed to hash the schemas (for deduplication)",
        "produced a RefBundle with a different schema",
    )

    def filter(self, record: _logging.LogRecord) -> bool:
        msg = record.getMessage()
        return not any(s in msg for s in self._SUBSTRINGS)


_NOISE_FILTER = _KnownNoiseFilter()


def quiet_ray_logs() -> None:
    """Attach the known-noise filter to the two ray.data loggers
    (idempotent, cheap — safe to call per batch). Importing ray.data
    (and its per-dataset configure_logging) can reset logger state, so
    execution funnels and per-batch closures re-apply this."""
    for name in ("ray.data._internal.arrow_ops.transform_pyarrow",
                 "ray.data._internal.execution.streaming_executor_state"):
        lg = _logging.getLogger(name)
        if _NOISE_FILTER not in lg.filters:
            lg.addFilter(_NOISE_FILTER)


quiet_ray_logs()


# Bumped every time this module observes the is_initialized flag flip
# false→true, so the last-resort tag below is unique per init even if
# every session-identity API breaks (a constant fallback would let the
# ObjectRef memo caches serve refs from a dead object store — the exact
# failure the tag exists to prevent).
_SESSION_EPOCH = 0
_SESSION_WAS_UP = False


def ray_session_tag() -> str:
    """Identifier of the CURRENT Ray session ('none' when not
    initialized). Memo caches holding ObjectRefs key on this so a
    shutdown+re-init within one process can never serve refs from a dead
    object store. Fallback chain: session directory name (unique per
    ray.init — the job id is NOT: every local session reuses 01000000)
    → node id (new raylet per local init) → per-init epoch token."""
    global _SESSION_EPOCH, _SESSION_WAS_UP
    import ray

    if not ray.is_initialized():
        _SESSION_WAS_UP = False
        return "none"
    if not _SESSION_WAS_UP:
        _SESSION_WAS_UP = True
        _SESSION_EPOCH += 1
    try:
        # the timestamped session directory name — unique per ray.init
        return str(ray._private.worker._global_node.session_name)
    except Exception:
        try:
            return f"node-{ray.get_runtime_context().get_node_id()}"
        except Exception:
            # both session-identity APIs broke: bump EVERY call so the
            # degraded tag can never alias two sessions (the flip-based
            # epoch alone misses a shutdown+re-init with no intervening
            # call while down). Memo caches just miss — benign; serving
            # a dead session's ObjectRefs would not be.
            _SESSION_EPOCH += 1
            return f"epoch-{_SESSION_EPOCH}"


def harden_fsspec_race() -> None:
    """Make Ray Data's lazy fsspec-HTTP probe thread-safe (idempotent).

    ``ray.data.datasource.path_util._is_http_filesystem`` does
    ``from fsspec.implementations.http import HTTPFileSystem`` per call and
    catches only ModuleNotFoundError. When two driver threads build dataset
    plans concurrently (run_suite's concurrent pipelines, curate_sf's
    partition waves) and the http backend's dependency (aiohttp) is absent,
    the racing imports can surface as a plain ImportError ("cannot import
    name 'HTTPFileSystem' …"), which escapes and kills the plan build.
    Semantically an import failure of the HTTP backend simply means "not an
    HTTP filesystem", so wrap the probe to treat ANY ImportError as False."""
    try:
        import ray.data.datasource.path_util as _pu
    except Exception:  # pragma: no cover - ray layout change
        return
    orig = getattr(_pu, "_is_http_filesystem", None)
    if orig is None or getattr(orig, "_metrics_ray_hardened", False):
        return

    def _safe(fs):
        try:
            return orig(fs)
        except ImportError:
            return False

    _safe._metrics_ray_hardened = True
    _pu._is_http_filesystem = _safe
