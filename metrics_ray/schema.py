"""Canonical Arrow schemas for the validation engine.

The clip table mirrors BASELINE.json ``input_hint``; the violations table is
the analog of the reference's ProblemCollection rows
(``utilities/.../vocabulary/DQMPROB.java:26-241`` — closed enum of problem
codes attached to the offending node), and the metric rows mirror
``QualityMetric.metricValue()`` + ``getObservationActivity()`` counters
(``ShortURIs.java:126-167``).
"""

from __future__ import annotations

import pyarrow as pa

# BASELINE.json input_hint schema + explicit partition column (the analog of
# the reference's per-run dataset PLD identity, AbstractQualityMetric.java:12-25).
CLIP_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("bytes", pa.binary()),
        ("sr_hz", pa.int32()),
        ("dur_ms", pa.int32()),
        ("codec", pa.string()),
        ("transcript", pa.string()),
        ("partition", pa.int32()),
    ]
)

# Violation rows — ProblemCollectionQuad analog: one row per offending node,
# (check, partition, offender, problem code, actual vs expected, free detail).
VIOLATION_SCHEMA = pa.schema(
    [
        ("check_id", pa.string()),
        ("partition", pa.int32()),
        ("clip_id", pa.string()),
        ("code", pa.string()),
        ("actual", pa.string()),
        ("expected", pa.string()),
        ("detail", pa.string()),
    ]
)

# Per-(check, partition) metric rows; partition == -1 is the global roll-up.
METRIC_SCHEMA = pa.schema(
    [
        ("check_id", pa.string()),
        ("partition", pa.int32()),
        ("metric_value", pa.float64()),
        ("rows_scanned", pa.int64()),
        ("rows_violating", pa.int64()),
        ("is_estimate", pa.bool_()),
        ("passed", pa.bool_()),
    ]
)

# Closed problem-code vocabulary (DQMPROB analog).
class Codes:
    SCHEMA_MISMATCH = "SchemaMismatch"
    OUT_OF_RANGE = "OutOfRange"
    BAD_ENUM_VALUE = "BadEnumValue"
    DEPRECATED_VALUE = "DeprecatedValue"
    NULL_OR_EMPTY = "NullOrEmpty"
    BAD_ID_FORMAT = "BadIdFormat"
    DUPLICATE_KEY = "DuplicateKey"
    MISSING_REFERENCE = "MissingReference"
    DUPLICATE_CONTENT = "DuplicateContent"
    DECODE_ERROR = "DecodeError"
    CODEC_MISMATCH = "CodecMismatch"
    LOW_SNR = "LowSNR"
    DURATION_MISMATCH = "DurationMismatch"
    TRANSCRIPT_MISMATCH = "TranscriptMismatch"
    DISTRIBUTION_DRIFT = "DistributionDrift"
    LANG_MISMATCH = "LangMismatch"
    WRONG_PARTITION = "WrongPartition"
    KIND_MISMATCH = "KindMismatch"
    SPEAKING_RATE = "SpeakingRate"
    CTC_INFEASIBLE = "CtcInfeasible"
    SIZE_MISMATCH = "SizeMismatch"
    EDIT_DISTANCE = "EditDistance"


# Declared validity domains (the engine's "vocabulary", VocabularyLoader analog —
# a broadcast read-only constraint table instead of a singleton with LRU caches).
VALID_SR_HZ = (8000, 16000, 22050, 44100, 48000)
VALID_CODECS = ("pcm_s16le", "flac", "mp3", "opus")
DEPRECATED_CODECS = ("gsm", "amr", "g722")
MIN_DUR_MS = 1
MAX_DUR_MS = 30_000
# transcript/audio joint-quality domains (chars-per-second plausibility;
# CTC frame budget at the standard 10 ms feature hop)
SPEAK_RATE_LO = 80.0
SPEAK_RATE_HI = 1500.0
CTC_HOP_MS = 10
CLIP_ID_RE = r"^clip-[0-9]{8}$"
SNR_THRESHOLD_DB = 30.0


def declared_histogram_edges(column: str, n_bins: int = 30):
    """Histogram edges derived from a column's DECLARED domain (its schema
    range constraint), not from data. Shared by the baseline-profile build
    and DriftCheck so a clean-run profile and a later observed histogram are
    always on identical, mergeable edges — and so the drift check's
    per-batch binning needs NO side input (the baseline counts are consumed
    only at driver-side finalize). Log-spaced: duration/rate columns span
    orders of magnitude."""
    import numpy as np

    lo, hi = {"dur_ms": (float(MIN_DUR_MS), float(MAX_DUR_MS)),
              "sr_hz": (1.0, 192_000.0)}.get(column, (0.0, 1.0))
    return (np.geomspace(lo, hi, n_bins + 1) if lo > 0
            else np.linspace(lo, hi, n_bins + 1))
