"""Declarative suite assembly — build a check suite from YAML/JSON config
(SURVEY.md §2.9: the reference assembles its metric set from declarative
config, not code — ``VocabularyLoader.java:180-200`` loads local vocab
descriptors, the LuzzuSchedulerPOJO names metric classes to run; here a
config document names check TYPES + parameters and the registry
instantiates them).

Example (configs/full_suite.yaml mirrors suite.full_checks exactly):

    checks:
      - {type: enum, id: sr_enum, column: sr_hz,
         allowed: [8000, 16000, 22050, 44100, 48000], code: OutOfRange}
      - {type: range, id: dur_range, column: dur_ms, lo: 1, hi: 30000}
      - {type: cross, id: cross_kind, rules:
          - {name: dur_requires_sr, when: [dur_ms, ">", 0],
             require: [sr_hz, ">", 0]}}

Unknown types / parameters fail loudly at build time (config errors must
not surface as silent check absence mid-run)."""

from __future__ import annotations

import json
from typing import Any

from .checks.base import BatchCheck
from .checks.decode import DecodeCheck, PayloadSizeCheck
from .checks.referential import ReferentialCheck
from .checks.sketch_checks import (
    DistinctHLLCheck,
    DriftCheck,
    QuantileProfileCheck,
    ReservoirQuantileCheck,
)
from .checks.stateless import (
    CrossColumnCheck,
    CtcFeasibilityCheck,
    EnumCheck,
    NonNullCheck,
    OwnershipCheck,
    SpeakingRateCheck,
    RangeCheck,
    RegexCheck,
    SchemaCheck,
)
from .schema import CLIP_SCHEMA

# named Arrow schemas a config can reference (SchemaCheck target)
SCHEMAS = {"clips": CLIP_SCHEMA}


def _build_schema(c: dict) -> BatchCheck:
    return SchemaCheck(c["id"], SCHEMAS[c.get("schema", "clips")])


def _build_enum(c: dict) -> BatchCheck:
    kwargs: dict[str, Any] = {}
    if "code" in c:
        kwargs["code"] = c["code"]
    if "invert" in c:
        kwargs["invert"] = bool(c["invert"])
    return EnumCheck(c["id"], c["column"], tuple(c["allowed"]), **kwargs)


def _build_cross(c: dict) -> BatchCheck:
    rules = [(r["name"], tuple(r["when"]), tuple(r["require"]))
             for r in c["rules"]]
    return CrossColumnCheck(c["id"], rules)


CHECK_REGISTRY = {
    "schema": _build_schema,
    "enum": _build_enum,
    "range": lambda c: RangeCheck(c["id"], c["column"], c["lo"], c["hi"]),
    "nonnull": lambda c: NonNullCheck(c["id"], c["column"],
                                      c.get("reject_empty", True)),
    "regex": lambda c: RegexCheck(c["id"], c["column"], c["pattern"]),
    "ownership": lambda c: OwnershipCheck(
        c["id"], c.get("n_partitions", 8), c.get("id_re")),
    "cross": _build_cross,
    "speaking_rate": lambda c: SpeakingRateCheck(
        c["id"], c.get("lo"), c.get("hi")),
    "ctc": lambda c: CtcFeasibilityCheck(c["id"], c.get("hop_ms")),
    "hll_distinct": lambda c: DistinctHLLCheck(
        c["id"], c["column"], c.get("tolerance", 0.02)),
    "quantile_profile": lambda c: QuantileProfileCheck(c["id"], c["column"]),
    "reservoir": lambda c: ReservoirQuantileCheck(
        c["id"], c["column"], c.get("k", 1024)),
    "drift": lambda c: DriftCheck(c["id"], c["column"],
                                  c.get("psi_threshold", 0.2)),
    "referential": lambda c: ReferentialCheck(
        c.get("id", "referential_transcript"),
        c.get("check_equality", True)),
    "payload_size": lambda c: PayloadSizeCheck(c.get("id", "payload_size")),
    "decode": lambda c: DecodeCheck(
        c.get("id", "decode_invariants"),
        sample_fraction=c.get("sample_fraction"),
        **({"snr_threshold": c["snr_threshold"]}
           if "snr_threshold" in c else {})),
}


# every key each type may carry ("type" itself is implicit) — a misspelled
# parameter (psi_treshold) must fail the BUILD, not silently run with the
# default (the module contract in the header)
ALLOWED_KEYS = {
    "schema": {"id", "schema"},
    "enum": {"id", "column", "allowed", "code", "invert"},
    "range": {"id", "column", "lo", "hi"},
    "nonnull": {"id", "column", "reject_empty"},
    "regex": {"id", "column", "pattern"},
    "ownership": {"id", "n_partitions", "id_re"},
    "cross": {"id", "rules"},
    "speaking_rate": {"id", "lo", "hi"},
    "ctc": {"id", "hop_ms"},
    "hll_distinct": {"id", "column", "tolerance"},
    "quantile_profile": {"id", "column"},
    "reservoir": {"id", "column", "k"},
    "drift": {"id", "column", "psi_threshold"},
    "referential": {"id", "check_equality"},
    "payload_size": {"id"},
    "decode": {"id", "sample_fraction", "snr_threshold"},
}
assert set(ALLOWED_KEYS) == set(CHECK_REGISTRY)


# ------------------------- keyed (global-audit) section -------------------
# The ``keyed:`` list names the checkpointed global audits (the ``keyed``
# dict the validate surfaces pass to state.checkpoint.checkpointed_validate).
# Builders return fn(factory) closures; audits needing the transcript index
# receive it through the ``transcript_index_ds`` zero-arg callable.

def _k_unique(c: dict, env: dict):
    from .checks.keyed import exact_duplicate_keys

    col = c.get("column", "clip_id")
    return lambda f: exact_duplicate_keys(f([col, "partition"]), column=col)


def _k_content_dedup(c: dict, env: dict):
    from .checks.keyed import content_duplicates

    return lambda f: content_duplicates(
        f(["bytes", "transcript", "clip_id", "partition"]))


def _k_referential_dist(c: dict, env: dict):
    from .checks.referential import referential_violations_dist

    eq = c.get("check_equality", True)
    return lambda f: referential_violations_dist(
        f(["clip_id", "transcript", "partition"]),
        env["transcript_index_ds"](), check_equality=eq)


def _k_editdist(c: dict, env: dict):
    from .checks.referential import transcript_editdist_violations

    cap = c.get("cap", 8)
    return lambda f: transcript_editdist_violations(
        f(["clip_id", "transcript", "partition"]),
        env["transcript_index_ds"](), cap=cap)


KEYED_REGISTRY = {
    "unique_key": _k_unique,
    "content_dedup": _k_content_dedup,
    "referential_dist": _k_referential_dist,
    "transcript_editdist": _k_editdist,
}

KEYED_ALLOWED_KEYS = {
    "unique_key": {"id", "column"},
    "content_dedup": {"id"},
    "referential_dist": {"id", "check_equality"},
    "transcript_editdist": {"id", "cap"},
}
assert set(KEYED_ALLOWED_KEYS) == set(KEYED_REGISTRY)

_NEEDS_INDEX = {"referential_dist", "transcript_editdist"}


def keyed_from_config(cfg: dict | str,
                      transcript_index_ds=None) -> dict:
    """Build the keyed-audit dict (check_id → fn(factory) → violations
    Dataset) from the config's ``keyed:`` list. Same loud-failure
    contract as checks_from_config; audits that join the transcript
    index require the ``transcript_index_ds`` callable."""
    cfg = _load_cfg(cfg)
    out: dict = {}
    if transcript_index_ds is not None:
        # memoize: a config listing BOTH referential_dist and
        # transcript_editdist would otherwise derive the transcript
        # index dataset once per audit instead of once per run
        _orig, _memo = transcript_index_ds, []

        def transcript_index_ds():
            if not _memo:
                _memo.append(_orig())
            return _memo[0]
    env = {"transcript_index_ds": transcript_index_ds}
    for i, entry in enumerate(cfg.get("keyed", [])):
        t = entry.get("type")
        if t not in KEYED_REGISTRY:
            raise ValueError(
                f"keyed[{i}]: unknown keyed audit type {t!r} "
                f"(known: {sorted(KEYED_REGISTRY)})")
        unknown = set(entry) - KEYED_ALLOWED_KEYS[t] - {"type"}
        if unknown:
            raise ValueError(
                f"keyed[{i}] (type={t}): unknown parameter(s) "
                f"{sorted(unknown)} (allowed: "
                f"{sorted(KEYED_ALLOWED_KEYS[t])})")
        if t in _NEEDS_INDEX and transcript_index_ds is None:
            raise ValueError(
                f"keyed[{i}] (type={t}): requires transcript_index_ds")
        kid = entry.get("id", t)
        if kid in out:
            raise ValueError(f"keyed[{i}]: duplicate audit id {kid!r}")
        out[kid] = KEYED_REGISTRY[t](entry, env)
    return out


def _load_cfg(cfg: dict | str) -> dict:
    if isinstance(cfg, str):
        with open(cfg) as f:
            if cfg.endswith((".yaml", ".yml")):
                import yaml  # ships with ray

                return yaml.safe_load(f)
            return json.load(f)
    return cfg


def checks_from_config(cfg: dict | str) -> list[BatchCheck]:
    """Build a check list from a config dict or a path to a .yaml/.json
    file. Every entry needs ``type`` (registry key) and, for most types,
    ``id``; remaining keys are type-specific parameters."""
    cfg = _load_cfg(cfg)
    if not isinstance(cfg, dict) or "checks" not in cfg:
        raise ValueError("suite config must be a mapping with a 'checks' list")
    out: list[BatchCheck] = []
    for i, entry in enumerate(cfg["checks"]):
        t = entry.get("type")
        if t not in CHECK_REGISTRY:
            raise ValueError(
                f"checks[{i}]: unknown check type {t!r} "
                f"(known: {sorted(CHECK_REGISTRY)})")
        unknown = set(entry) - ALLOWED_KEYS[t] - {"type"}
        if unknown:
            raise ValueError(
                f"checks[{i}] (type={t}): unknown parameter(s) "
                f"{sorted(unknown)} (allowed: {sorted(ALLOWED_KEYS[t])})")
        try:
            out.append(CHECK_REGISTRY[t](entry))
        except KeyError as e:
            raise ValueError(
                f"checks[{i}] (type={t}): missing parameter {e}") from e
    return out
