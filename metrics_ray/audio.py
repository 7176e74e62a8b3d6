"""Deterministic PCM synthesis, fake codecs, and SNR.

The container has no real audio libraries, so the four codecs are
DETERMINISTIC FAKES (clearly marked): each produces a magic-tagged byte
payload that round-trips through numpy. The *plumbing* — per-row decode in an
actor pool, declared-codec-vs-actual detection, SNR invariant — is real and
mirrors the reference's "declared representation vs actual content" family
(``MisreportedContentType.java:118-174``: declared HTTP Content-Type vs what
the payload actually parses as; ``helper/ModelParser.java`` parse check).

Synthesis is a pure function of (seed, sample index) — NOT of sr_hz — so a
validator can recompute the reference signal for however many samples a
payload decodes to without trusting the row's declared metadata.
"""

from __future__ import annotations

import zlib

import numpy as np

# ---------------------------------------------------------------- synthesis

_TWO31 = 2147483648


def _lcg(seed: int) -> int:
    return (seed * 1103515245 + 12345) % _TWO31


def clip_seed(clip_id: str) -> int:
    """Stable cross-process seed for a clip (NOT python hash())."""
    return zlib.crc32(clip_id.encode("utf-8")) & 0x7FFFFFFF


# Derivation version: bump when synth_pcm's waveform changes so every
# derived-clips cache (pipelines/clips.py fingerprints) invalidates —
# a stale cache would hold payloads encoded from a DIFFERENT waveform
# than the SNR check re-synthesizes, failing every clean clip.
SYNTH_VERSION = 2


def synth_pcm(seed: int, n_samples: int) -> np.ndarray:
    """Deterministic float32 signal in [-1, 1]: sum of three sines whose
    per-sample phase increments derive from the seed.

    Computed entirely in float32 (v2): ~7x faster than the float64 sin
    path, and the dominant cost of the per-row decoded-PCM invariant
    (the reference profile's `compute(quad)` hot loop). Exactness is not
    required of the WAVEFORM — only determinism: the encoder
    (synth.derive_clips_batch) and the SNR re-synthesis share this one
    function, so both sides see bit-identical samples and the
    quantization-SNR invariants (>=30 dB clean, <30 dB corrupted) are
    unchanged."""
    h1 = _lcg(seed)
    h2 = _lcg(h1)
    h3 = _lcg(h2)
    w1 = np.float32(0.01 + (h1 % 1000) / 1000.0 * 0.5)
    w2 = np.float32(0.02 + (h2 % 1000) / 1000.0 * 0.8)
    w3 = np.float32(0.05 + (h3 % 1000) / 1000.0 * 1.1)
    i = np.arange(n_samples, dtype=np.float32)
    return (np.float32(0.4) * np.sin(w1 * i)
            + np.float32(0.3) * np.sin(w2 * i + np.float32(1.0))
            + np.float32(0.2) * np.sin(w3 * i))


def n_samples_for(sr_hz: int, dur_ms: int) -> int:
    return int(round(sr_hz * dur_ms / 1000.0))


# ---------------------------------------------------------------- fake codecs
# 4-byte magic prefixes let the decoder detect the ACTUAL codec of a payload
# independently of the declared `codec` column (MisreportedContentType's
# determineActualContentType analog).

MAGIC = {
    "pcm_s16le": b"PCM1",
    "flac": b"FLC1",
    "mp3": b"MP31",
    "opus": b"OPS1",
}
_MAGIC_REV = {v: k for k, v in MAGIC.items()}


def encode(pcm: np.ndarray, codec: str) -> bytes:
    """Encode float32 PCM [-1,1] into a deterministic fake-codec payload."""
    if codec == "pcm_s16le":
        q = np.clip(np.rint(pcm * 32767.0), -32768, 32767).astype("<i2")
        return MAGIC[codec] + q.tobytes()
    if codec == "flac":  # lossless: zlib over int16 samples
        q = np.clip(np.rint(pcm * 32767.0), -32768, 32767).astype("<i2")
        return MAGIC[codec] + zlib.compress(q.tobytes(), 6)
    if codec == "mp3":  # lossy: 12-bit quantization (~66 dB SNR)
        q = np.clip(np.rint(pcm * 2047.0), -2048, 2047).astype("<i2")
        return MAGIC[codec] + q.tobytes()
    if codec == "opus":  # lossy: 10-bit quantization + zlib (~54 dB SNR)
        q = np.clip(np.rint(pcm * 511.0), -512, 511).astype("<i2")
        return MAGIC[codec] + zlib.compress(q.tobytes(), 6)
    raise ValueError(f"unknown codec: {codec!r}")


def detect_codec(payload: bytes) -> str | None:
    """Return the actual codec of a payload by magic, or None. Accepts any
    buffer (bytes OR the zero-copy memoryviews the curation stage passes);
    the 4-byte magic copy makes the dict lookup hashable either way."""
    if payload is None or len(payload) < 4:
        return None
    return _MAGIC_REV.get(bytes(payload[:4]))


def decode(payload: bytes) -> tuple[str, np.ndarray]:
    """Decode a payload → (actual_codec, float32 PCM). Raises ValueError on
    undecodable input (the parse-failure path of ModelParser.hasRDFContent)."""
    actual = detect_codec(payload)
    if actual is None:
        raise ValueError("unrecognized payload magic")
    body = payload[4:]
    if actual in ("flac", "opus"):
        try:
            body = zlib.decompress(body)
        except zlib.error as e:  # truncated / garbled
            raise ValueError(f"corrupt {actual} stream: {e}") from e
    if len(body) % 2:
        raise ValueError("odd payload length")
    q = np.frombuffer(body, dtype="<i2").astype(np.float32)
    scale = {"pcm_s16le": 32767.0, "flac": 32767.0, "mp3": 2047.0, "opus": 511.0}[actual]
    return actual, q / scale


def snr_db(reference: np.ndarray, decoded: np.ndarray) -> float:
    """SNR of decoded vs reference in dB; -inf on length mismatch or silence."""
    if len(reference) != len(decoded) or len(reference) == 0:
        return float("-inf")
    r = reference.astype(np.float64, copy=False)
    err = r - decoded.astype(np.float64, copy=False)
    # dot-product power sums: one fused BLAS pass each instead of the
    # square-then-mean temporaries (this sits inside the per-row invariant)
    n = len(r)
    p_sig = float(np.dot(r, r)) / n
    p_err = float(np.dot(err, err)) / n
    if p_err == 0.0:
        return float("inf")
    if p_sig == 0.0:
        return float("-inf")
    return 10.0 * np.log10(p_sig / p_err)
