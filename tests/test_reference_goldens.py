"""Reference golden-value mirrors (SURVEY.md §5): the Luzzu test suite
asserts hand-computed metric constants on tiny fixtures; these tests build
batches with the SAME pass/fail proportions and assert our checks produce
the reference's exact golden values — proving the metric arithmetic
(value = 1 − violating/scanned, NaN→1.0) matches the reference formulas.

Golden sources (reference repo, file:line → constant):
  CompatibleDatatypeTest.java:56                  16 literals, 3 bad → 0.8125
  HumanReadableLabellingTest.java:27              3 entities, 1 bare → 0.66667
  UsageOfDeprecatedClassesOrPropertiesTest.java:49  7 terms, 2 depr → 0.71428571428
  EntitiesAsMembersOfDisjointClassesTest.java:43  2 of 4 violate   → 0.5
  CompatibleDatatype NaN rule (CompatibleDatatype.java:83-92): 0 assessed → 1.0
"""

import numpy as np
import pyarrow as pa
import pytest

from metrics_ray.checks.base import CheckContext
from metrics_ray.checks.stateless import EnumCheck, NonNullCheck, RangeCheck


def _batch(values, column="v", typ=pa.string()):
    n = len(values)
    return pa.table({
        column: pa.array(values, typ),
        "clip_id": pa.array([f"c{i}" for i in range(n)], pa.string()),
        "partition": pa.array([0] * n, pa.int32()),
    })


def _value(check, batch):
    check.setup(CheckContext())
    o = check.evaluate(batch)
    scanned = sum(s for s, _ in o.counters.values())
    violating = sum(v for _, v in o.counters.values())
    value, _, _ = check.finalize_value(scanned, violating, None)
    return value


def test_compatible_datatype_golden():
    """16 typed literals, 3 invalid → 0.8125 (CompatibleDatatypeTest)."""
    vals = [100] * 13 + [-1, -2, -3]  # 3 out of declared range
    v = _value(RangeCheck("r", "v", 0, 1000), _batch(vals, typ=pa.int32()))
    assert v == pytest.approx(0.8125, abs=1e-9)


def test_human_readable_labelling_golden():
    """3 entities, 1 without a label → 0.66667 (HumanReadableLabellingTest,
    tolerance 1e-5 in the reference)."""
    v = _value(NonNullCheck("l", "v"), _batch(["a", "b", None]))
    assert v == pytest.approx(0.66667, abs=1e-4)


def test_deprecated_terms_golden():
    """7 used terms, 2 deprecated → 0.71428571428
    (UsageOfDeprecatedClassesOrPropertiesTest, tolerance 1e-5)."""
    vals = ["ok"] * 5 + ["old1", "old2"]
    v = _value(EnumCheck("d", "v", ("old1", "old2"), invert=True),
               _batch(vals))
    assert v == pytest.approx(0.71428571428, abs=1e-5)


def test_disjoint_membership_golden():
    """4 resources, 2 violating → 0.5 (EntitiesAsMembersOfDisjointClasses:
    mutually-exclusive flag combination per row)."""
    vals = ["a", "b", "both", "both"]  # 'both' = disjoint-set intersection
    v = _value(EnumCheck("dj", "v", ("both",), invert=True), _batch(vals))
    assert v == pytest.approx(0.5, abs=1e-9)


def test_nan_rule_golden():
    """0 rows assessed → metric 1.0 (CompatibleDatatype.java:83-92 NaN→1.0
    rule, encoded in BatchCheck.finalize_value)."""
    c = RangeCheck("r", "v", 0, 1)
    value, passed, _ = c.finalize_value(0, 0, None)
    assert value == 1.0 and passed
