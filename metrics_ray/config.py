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


def checks_from_config(cfg: dict | str) -> list[BatchCheck]:
    """Build a check list from a config dict or a path to a .yaml/.json
    file. Every entry needs ``type`` (registry key) and, for most types,
    ``id``; remaining keys are type-specific parameters."""
    if isinstance(cfg, str):
        with open(cfg) as f:
            if cfg.endswith((".yaml", ".yml")):
                import yaml  # ships with ray

                cfg = yaml.safe_load(f)
            else:
                cfg = json.load(f)
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
