"""Stateless per-batch predicate checks — zero-copy Arrow, pyarrow.compute.

The reference's stateless metric family (SURVEY.md §2.3): CompatibleDatatype
(type/lexical conformance), ShortURIs (format predicate with LRU dedup),
NoProlixRDF / DifferentSerialisationFormatsCount (closed-set membership),
UsageOfDeprecatedClassesOrProperties (deprecated-term set), BasicProvenance /
HumanReadableLabelling-degenerate (non-null presence).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import Codes
from .base import (
    BatchCheck,
    BatchOutcome,
    CheckContext,
    per_partition_counts,
    violations_table,
)


def _mask_outcome(batch: pa.Table, mask: np.ndarray, column: str, code: str,
                  expected: str, detail: str = "") -> BatchOutcome:
    part = batch.column("partition").to_numpy(zero_copy_only=False)
    counters = per_partition_counts(part, mask)
    viol = None
    if mask.any():
        idx = np.nonzero(mask)[0]
        actual = batch.column(column).take(pa.array(idx)).to_pylist()
        viol = violations_table(
            part[idx],
            batch.column("clip_id").take(pa.array(idx)).to_pylist(),
            code, actual, expected, detail,
        )
    return BatchOutcome(violations=viol, counters=counters)


class RangeCheck(BatchCheck):
    """Numeric range conformance (CompatibleDatatype.java:54-116 analog:
    the declared value must be a valid member of its type's domain)."""

    def __init__(self, check_id: str, column: str, lo: float, hi: float):
        self.check_id = check_id
        self.column = column
        self.lo, self.hi = lo, hi
        self.columns = (column, "clip_id", "partition")

    def evaluate(self, batch: pa.Table) -> BatchOutcome:
        col = batch.column(self.column)
        ok = pc.and_(pc.greater_equal(col, self.lo), pc.less_equal(col, self.hi))
        # null comparison yields null → fill as violating
        mask = ~pc.fill_null(ok, False).to_numpy(zero_copy_only=False).astype(bool)
        return _mask_outcome(batch, mask, self.column, Codes.OUT_OF_RANGE,
                             f"[{self.lo}, {self.hi}]")


class EnumCheck(BatchCheck):
    """Closed-set membership (DifferentSerialisationFormatsCount.java:58-83:
    23-format closed set; NoProlixRDF construct detection)."""

    def __init__(self, check_id: str, column: str, allowed: tuple,
                 code: str = Codes.BAD_ENUM_VALUE, invert: bool = False):
        self.check_id = check_id
        self.column = column
        self.allowed = allowed
        self.code = code
        self.invert = invert  # True → membership IS the violation (deprecated)
        self.columns = (column, "clip_id", "partition")

    def evaluate(self, batch: pa.Table) -> BatchOutcome:
        col = batch.column(self.column)
        member = pc.is_in(col, value_set=pa.array(list(self.allowed), col.type))
        m = pc.fill_null(member, False).to_numpy(zero_copy_only=False).astype(bool)
        mask = m if self.invert else ~m
        expected = (("not in " if self.invert else "one of ")
                    + ",".join(str(a) for a in self.allowed))
        return _mask_outcome(batch, mask, self.column, self.code, expected)


class NonNullCheck(BatchCheck):
    """Presence check (BasicProvenanceMetric.java:47-84 — dataset must carry
    creator/publisher; HumanReadableLabelling per-entity label presence)."""

    def __init__(self, check_id: str, column: str, reject_empty: bool = True):
        self.check_id = check_id
        self.column = column
        self.reject_empty = reject_empty
        self.columns = (column, "clip_id", "partition")

    def evaluate(self, batch: pa.Table) -> BatchOutcome:
        col = batch.column(self.column)
        mask = col.is_null().to_numpy(zero_copy_only=False).astype(bool)
        if self.reject_empty and pa.types.is_string(col.type):
            empty = pc.equal(pc.utf8_length(pc.fill_null(col, "x")), 0)
            mask |= empty.to_numpy(zero_copy_only=False).astype(bool)
        return _mask_outcome(batch, mask, self.column, Codes.NULL_OR_EMPTY,
                             "non-null, non-empty")


class RegexCheck(BatchCheck):
    """Format predicate (ShortURIs.java:41-149 — URI length/shape rules;
    uses pyarrow's compiled re2 kernel, no per-row python)."""

    def __init__(self, check_id: str, column: str, pattern: str):
        self.check_id = check_id
        self.column = column
        self.pattern = pattern
        self.columns = (column, "clip_id", "partition")

    def evaluate(self, batch: pa.Table) -> BatchOutcome:
        col = batch.column(self.column)
        ok = pc.match_substring_regex(pc.fill_null(col, ""), self.pattern)
        mask = ~ok.to_numpy(zero_copy_only=False).astype(bool)
        return _mask_outcome(batch, mask, self.column, Codes.BAD_ID_FORMAT,
                             self.pattern)


class SpeakingRateCheck(BatchCheck):
    """Transcript/audio alignment sanity — chars-per-second joint gate
    (the ASR analog of the reference's joint-coherence family,
    MisusedOwlDatatypeOrObjectProperties-style cross-column semantics):
    rows with a real transcript and positive duration whose
    len(transcript)·1000/dur_ms falls outside [lo, hi] violate. Null /
    empty transcripts and non-positive durations are the non-null and
    range checks' problems, not this one's. Row-local Arrow kernels."""

    def __init__(self, check_id: str = "speaking_rate",
                 lo: float | None = None, hi: float | None = None):
        from ..schema import SPEAK_RATE_HI, SPEAK_RATE_LO

        self.check_id = check_id
        self.lo = SPEAK_RATE_LO if lo is None else float(lo)
        self.hi = SPEAK_RATE_HI if hi is None else float(hi)
        self.columns = ("transcript", "dur_ms", "clip_id", "partition")

    def evaluate(self, batch: pa.Table) -> BatchOutcome:
        tr = batch.column("transcript")
        n_chars = pc.utf8_length(pc.fill_null(tr, "")).cast(pa.float64())
        dur = batch.column("dur_ms").cast(pa.float64())
        eligible = pc.and_(
            pc.and_(pc.is_valid(tr), pc.greater(n_chars, 0.0)),
            pc.greater(batch.column("dur_ms"), 0))
        rate = pc.divide(pc.multiply(n_chars, 1000.0), dur)
        bad = pc.and_(eligible, pc.or_(pc.less(rate, self.lo),
                                       pc.greater(rate, self.hi)))
        mask = pc.fill_null(bad, False).to_numpy(
            zero_copy_only=False).astype(bool)
        part = batch.column("partition").to_numpy(zero_copy_only=False)
        counters = per_partition_counts(part, mask)
        viol = None
        if mask.any():
            idx = np.nonzero(mask)[0]
            r = rate.to_numpy(zero_copy_only=False)[idx]
            viol = violations_table(
                part[idx],
                batch.column("clip_id").take(pa.array(idx)).to_pylist(),
                Codes.SPEAKING_RATE,
                [f"{v:.1f} chars/s" for v in r],
                f"[{self.lo}, {self.hi}] chars/s")
        return BatchOutcome(violations=viol, counters=counters)


class CtcFeasibilityCheck(BatchCheck):
    """CTC-alignability gate: a CTC loss over T feature frames can emit
    at most (T+1)//2 labels, so a clip whose 10 ms frame budget
    (dur_ms // hop) is below 2·tokens − 1 can NEVER align its transcript
    — a harder failure than an implausible speaking rate. Tokens via the
    corpus-standard re2 ``\\S+`` count. Row-local Arrow kernels."""

    def __init__(self, check_id: str = "ctc_feasible",
                 hop_ms: int | None = None):
        from ..schema import CTC_HOP_MS

        self.check_id = check_id
        self.hop_ms = CTC_HOP_MS if hop_ms is None else int(hop_ms)
        self.columns = ("transcript", "dur_ms", "clip_id", "partition")

    def evaluate(self, batch: pa.Table) -> BatchOutcome:
        tr = batch.column("transcript")
        toks = pc.count_substring_regex(
            pc.fill_null(tr, ""), r"\S+").cast(pa.int64())
        dur = batch.column("dur_ms").cast(pa.int64())
        frames = pc.divide(dur, self.hop_ms)  # int/int => floor division
        bad = pc.and_(
            pc.and_(pc.is_valid(tr), pc.greater(dur, 0)),
            pc.and_(pc.greater(toks, 0),
                    pc.less(frames, pc.subtract(pc.multiply(toks, 2), 1))))
        mask = pc.fill_null(bad, False).to_numpy(
            zero_copy_only=False).astype(bool)
        part = batch.column("partition").to_numpy(zero_copy_only=False)
        counters = per_partition_counts(part, mask)
        viol = None
        if mask.any():
            idx = np.nonzero(mask)[0]
            f = frames.to_numpy(zero_copy_only=False)[idx]
            t = toks.to_numpy(zero_copy_only=False)[idx]
            viol = violations_table(
                part[idx],
                batch.column("clip_id").take(pa.array(idx)).to_pylist(),
                Codes.CTC_INFEASIBLE,
                [f"{fi} frames < 2*{ti}-1" for fi, ti in zip(f, t)],
                "frames >= 2*tokens-1")
        return BatchOutcome(violations=viol, counters=counters)


class OwnershipCheck(BatchCheck):
    """Partition-authority predicate — the OntologyHijacking analog
    (OntologyHijacking.java:143-155: a document must not redefine terms
    whose authority belongs to another namespace). Here the authority of a
    clip is derived from its id: the partition that OWNS clip-NNNNNNNN is
    ``int(NNNNNNNN) % n_partitions``; a row stored under a different
    partition is a hijacked write (it claims an identity another
    partition is authoritative for — exactly how the duplicate-id
    corruption manifests: the k%101 rows copy a NEIGHBOR partition's id).

    Rows whose id does not match the format are skipped here (they are
    already flagged by RegexCheck); stateless, SQL-mirrorable."""

    def __init__(self, check_id: str, n_partitions: int = 8,
                 id_re: str | None = None):
        from ..schema import CLIP_ID_RE

        self.check_id = check_id
        self.n_partitions = n_partitions
        self.id_re = id_re or CLIP_ID_RE
        self.columns = ("clip_id", "partition")

    def evaluate(self, batch: pa.Table) -> BatchOutcome:
        import pandas as pd

        col = batch.column("clip_id")
        part = batch.column("partition").to_numpy(zero_copy_only=False)
        valid = pc.match_substring_regex(
            pc.fill_null(col, ""), self.id_re).to_numpy(
                zero_copy_only=False).astype(bool)
        ids = pd.Series(col.to_pylist(), dtype="object")
        # owner id = the trailing digit run, whatever the prefix — a
        # fixed slice(5) would silently mis-parse any custom id_re whose
        # prefix is not exactly 5 chars (e.g. "audio-00000003" → -3)
        num = pd.to_numeric(ids.str.extract(r"([0-9]+)$", expand=False),
                            errors="coerce")
        owner = (num % self.n_partitions).to_numpy()
        mask = valid & (owner != part)
        counters = per_partition_counts(part, mask)
        viol = None
        if mask.any():
            idx = np.nonzero(mask)[0]
            viol = violations_table(
                part[idx],
                [ids.iloc[i] for i in idx],
                Codes.WRONG_PARTITION,
                [f"partition {int(part[i])}" for i in idx],
                f"owner partition = id % {self.n_partitions}",
                "",
            )
        return BatchOutcome(violations=viol, counters=counters)


# declarative cross-column rule: (name, (col, op, value), (col, op, value))
# — violation when the WHEN predicate holds and the REQUIRE predicate fails
CrossRule = tuple[str, tuple, tuple]


def _col_pred(batch: pa.Table, spec: tuple) -> np.ndarray:
    """Vectorized single-column predicate → bool mask (null → False)."""
    col, op, val = spec
    c = batch.column(col)
    if op == "null_or_empty":
        out = c.is_null()
        if pa.types.is_string(c.type):
            out = pc.or_(out, pc.equal(pc.fill_null(c, "x"), ""))
        return out.to_numpy(zero_copy_only=False).astype(bool)
    cmp = {"==": pc.equal, "!=": pc.not_equal, ">": pc.greater,
           ">=": pc.greater_equal, "<": pc.less, "<=": pc.less_equal}
    if op in cmp:
        res = cmp[op](c, val)
    elif op == "in":
        res = pc.is_in(c, value_set=pa.array(list(val), c.type))
    elif op == "not_in":
        res = pc.invert(pc.is_in(c, value_set=pa.array(list(val), c.type)))
    else:
        raise ValueError(f"unknown cross-column op {op!r}")
    return pc.fill_null(res, False).to_numpy(zero_copy_only=False).astype(bool)


class CrossColumnCheck(BatchCheck):
    """Declarative column-pair coherence rules — the
    MisusedOwlDatatypeOrObjectProperties.java:59-123 /
    MisplacedClassesOrProperties.java:60-152 analog: a value must be of
    the KIND its paired declaration implies (an object property must not
    carry a literal; a positive duration must not pair with a zero sample
    rate; an empty codec declaration must not pair with content-bearing
    text). Each rule is data, not code: (name, when-pred, require-pred),
    evaluated as vectorized Arrow kernels; a row violates a rule when
    WHEN holds and REQUIRE does not."""

    def __init__(self, check_id: str, rules: list[CrossRule]):
        self.check_id = check_id
        self.rules = rules
        used = set()
        for _name, when, require in rules:
            used.add(when[0]); used.add(require[0])
        self.columns = (*sorted(used), "clip_id", "partition")

    def evaluate(self, batch: pa.Table) -> BatchOutcome:
        part = batch.column("partition").to_numpy(zero_copy_only=False)
        clip_ids = batch.column("clip_id").to_pylist()
        any_mask = np.zeros(len(batch), dtype=bool)
        tables = []
        for name, when, require in self.rules:
            bad = _col_pred(batch, when) & ~_col_pred(batch, require)
            if bad.any():
                idx = np.nonzero(bad)[0]
                req_vals = batch.column(require[0]).take(
                    pa.array(idx)).to_pylist()
                tables.append(violations_table(
                    part[idx], [clip_ids[i] for i in idx],
                    Codes.KIND_MISMATCH, req_vals,
                    f"{require[0]} {require[1]} {require[2]}"
                    f" when {when[0]} {when[1]} {when[2]}",
                    name,
                ))
            any_mask |= bad
        counters = per_partition_counts(part, any_mask)
        viol = pa.concat_tables(tables) if tables else None
        return BatchOutcome(violations=viol, counters=counters)


class SchemaCheck(BatchCheck):
    """Arrow-schema conformance — names and types of the batch must match the
    declared table schema (the engine-level CompatibleDatatype: data is never
    rejected, mismatches are counted and reported, VocabularyLoader
    'advisory schema' semantics)."""

    def __init__(self, check_id: str, expected: pa.Schema):
        self.check_id = check_id
        self.expected = expected
        self.columns = ()  # needs whatever arrives; participates in no pruning
        self._projected: set | None = None

    def setup(self, ctx) -> None:
        # projection awareness: when run_suite prunes the read to the
        # suite's column union, an expected column absent from the BATCH
        # may simply not have been read — judging it "missing" would
        # false-fail every row of a metadata-only suite. Columns outside
        # the projection are out of this run's evidence; presence is
        # asserted only for columns the pass actually reads.
        proj = ctx.params.get("projected_columns")
        self._projected = set(proj) if proj is not None else None

    def evaluate(self, batch: pa.Table) -> BatchOutcome:
        # the partition column itself may be the drifted/dropped column
        # this check exists to catch — report it (missing OR type-drifted
        # to something non-numeric), don't KeyError/ValueError
        part = np.full(len(batch), -1, dtype=np.int64)
        if "partition" in batch.column_names:
            pcol = batch.column("partition")
            if pa.types.is_integer(pcol.type) or pa.types.is_floating(pcol.type):
                part = pcol.to_numpy(zero_copy_only=False)
        problems = []
        for f in self.expected:
            if f.name not in batch.column_names:
                if (self._projected is not None
                        and f.name not in self._projected):
                    continue  # pruned away, not drifted
                problems.append((f.name, "missing", str(f.type)))
            elif batch.schema.field(f.name).type != f.type:
                problems.append(
                    (f.name, str(batch.schema.field(f.name).type), str(f.type)))
        counters = per_partition_counts(part, np.zeros(len(batch), bool))
        if problems:
            n = len(batch)
            for p in counters:
                counters[p] = (counters[p][0], counters[p][0])
            viol = violations_table(
                np.asarray([part[0] if len(part) else -1] * len(problems)),
                [f"<column:{name}>" for name, _, _ in problems],
                Codes.SCHEMA_MISMATCH,
                [a for _, a, _ in problems],
                "; ".join(e for _, _, e in problems),
                "schema mismatch",
            )
            return BatchOutcome(violations=viol, counters=counters)
        return BatchOutcome(counters=counters)
