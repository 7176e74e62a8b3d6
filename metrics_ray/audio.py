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


# ---------------------------------------------------------------- codecs
# Pluggable codec registry: 4-byte magic prefixes let the decoder detect
# the ACTUAL codec of a payload independently of the declared `codec`
# column (MisreportedContentType's determineActualContentType analog).
# The four built-ins are DETERMINISTIC FAKES (no audio libraries in the
# container); a real deployment drops in ffmpeg/soundfile by calling
# ``register_codec`` with its own body codecs — DecodeCheck,
# PayloadSizeCheck, the transform stages and the curation pipeline all
# dispatch through this table and need zero edits.

from dataclasses import dataclass as _dataclass
from typing import Callable as _Callable


@_dataclass(frozen=True)
class Codec:
    """One registered codec.

    ``decode_body`` must return float32 PCM in [-1, 1] and raise
    ValueError on corrupt input. It receives an arbitrary BUFFER — bytes
    on the public decode() path, zero-copy ``memoryview`` slices inside
    the hot check stages — so it must accept both (zlib, np.frombuffer
    and every C buffer API do; call ``bytes(body)`` first if a wrapped
    library truly requires bytes). ``bytes_per_sample`` is set only for
    FIXED-RATE codecs (enables the pre-decode size-plausibility triage —
    compressed codecs have no closed-form size and stay decode-checked).

    The registry is PER-PROCESS: checks snapshot it on the driver at
    construction time and re-register it in each Ray worker via
    ``apply_codec_snapshot`` (Codec instances cloudpickle cleanly), so
    driver-side ``register_codec`` calls reach the distributed stages.
    """

    name: str
    magic: bytes
    encode_body: _Callable[[np.ndarray], bytes]
    decode_body: _Callable[[bytes], np.ndarray]
    bytes_per_sample: int | None = None


_CODECS: dict[str, Codec] = {}
_BY_MAGIC: dict[bytes, Codec] = {}


def register_codec(codec: Codec) -> None:
    """Add (or replace) a codec. Magic must be exactly 4 bytes and not
    collide with a DIFFERENT codec's magic — a silent collision would
    misattribute every payload of the loser."""
    if len(codec.magic) != 4:
        raise ValueError(f"codec {codec.name!r}: magic must be 4 bytes")
    claimed = _BY_MAGIC.get(codec.magic)
    if claimed is not None and claimed.name != codec.name:
        raise ValueError(
            f"codec {codec.name!r}: magic {codec.magic!r} already "
            f"registered by {claimed.name!r}")
    old = _CODECS.get(codec.name)
    if old is not None and old.magic != codec.magic:
        _BY_MAGIC.pop(old.magic, None)
    _CODECS[codec.name] = codec
    _BY_MAGIC[codec.magic] = codec


def unregister_codec(name: str) -> None:
    c = _CODECS.pop(name, None)
    if c is not None:
        _BY_MAGIC.pop(c.magic, None)


def codec_snapshot() -> tuple[Codec, ...]:
    """The current registry as a picklable tuple — checks capture this on
    the DRIVER (construction time) and replay it per worker, because the
    registry is process-local and a driver-side register_codec would
    otherwise be invisible inside map_batches tasks/actors."""
    return tuple(_CODECS.values())


def apply_codec_snapshot(snapshot: tuple[Codec, ...]) -> None:
    """Make THIS process's registry exactly equal the driver-captured
    snapshot (worker setup path). RESET semantics, not merge: reused Ray
    workers would otherwise accumulate codecs across pipelines/runs —
    a codec unregistered on the driver would survive in warm workers
    (worker-history-dependent violations), and a re-registered magic
    would raise the collision guard in warm workers only."""
    _CODECS.clear()
    _BY_MAGIC.clear()
    for c in snapshot:
        register_codec(c)


def fixed_rate_magics() -> list[bytes]:
    """Magics of codecs with a closed-form body size (the size-triage
    eligibility set), in registration order."""
    return [c.magic for c in _CODECS.values()
            if c.bytes_per_sample is not None]


def bytes_per_sample(magic: bytes) -> int | None:
    c = _BY_MAGIC.get(bytes(magic))
    return None if c is None else c.bytes_per_sample


def _q_encode(pcm: np.ndarray, full: float) -> bytes:
    q = np.clip(np.rint(pcm * full), -full - 1, full).astype("<i2")
    return q.tobytes()


def _q_decode(body: bytes, full: float) -> np.ndarray:
    if len(body) % 2:
        raise ValueError("odd payload length")
    return np.frombuffer(body, dtype="<i2").astype(np.float32) / full


def _z_decode(body: bytes, full: float, name: str) -> np.ndarray:
    try:
        body = zlib.decompress(body)
    except zlib.error as e:  # truncated / garbled
        raise ValueError(f"corrupt {name} stream: {e}") from e
    return _q_decode(body, full)


for _c in (
    Codec("pcm_s16le", b"PCM1",
          lambda p: _q_encode(p, 32767.0),
          lambda b: _q_decode(b, 32767.0), bytes_per_sample=2),
    # lossless: zlib over int16 samples
    Codec("flac", b"FLC1",
          lambda p: zlib.compress(_q_encode(p, 32767.0), 6),
          lambda b: _z_decode(b, 32767.0, "flac")),
    # lossy: 12-bit quantization (~66 dB SNR), fixed 2 B/sample
    Codec("mp3", b"MP31",
          lambda p: _q_encode(p, 2047.0),
          lambda b: _q_decode(b, 2047.0), bytes_per_sample=2),
    # lossy: 10-bit quantization + zlib (~54 dB SNR)
    Codec("opus", b"OPS1",
          lambda p: zlib.compress(_q_encode(p, 511.0), 6),
          lambda b: _z_decode(b, 511.0, "opus")),
):
    register_codec(_c)


from collections.abc import Mapping as _Mapping  # noqa: E402


class _MagicView(_Mapping):
    """Live name → magic view over the registry (kept as ``MAGIC`` for
    the existing callers/fixtures that read it as a dict). Built on
    collections.abc.Mapping — NOT a dict subclass, whose C fast paths
    (dict(MAGIC), {**MAGIC}, ==) would read stale concrete storage and
    bypass the registry — so every mapping idiom reflects codecs
    registered or removed after import."""

    def __getitem__(self, name):
        return _CODECS[name].magic

    def __iter__(self):
        return iter(_CODECS)

    def __len__(self):
        return len(_CODECS)

    def __repr__(self):
        return repr({n: c.magic for n, c in _CODECS.items()})


MAGIC = _MagicView()


def encode(pcm: np.ndarray, codec: str) -> bytes:
    """Encode float32 PCM [-1,1] into a magic-tagged payload via the
    registered codec."""
    c = _CODECS.get(codec)
    if c is None:
        raise ValueError(f"unknown codec: {codec!r}")
    return c.magic + c.encode_body(pcm)


def detect_codec(payload: bytes) -> str | None:
    """Return the actual codec of a payload by magic, or None. Accepts any
    buffer (bytes OR the zero-copy memoryviews the curation stage passes);
    the 4-byte magic copy makes the dict lookup hashable either way."""
    if payload is None or len(payload) < 4:
        return None
    c = _BY_MAGIC.get(bytes(payload[:4]))
    return None if c is None else c.name


def decode(payload: bytes) -> tuple[str, np.ndarray]:
    """Decode a payload → (actual_codec, float32 PCM). Raises ValueError on
    undecodable input (the parse-failure path of ModelParser.hasRDFContent).
    Dispatches on detected magic through the codec registry."""
    if payload is None or len(payload) < 4:
        raise ValueError("unrecognized payload magic")
    c = _BY_MAGIC.get(bytes(payload[:4]))
    if c is None:
        raise ValueError("unrecognized payload magic")
    return c.name, c.decode_body(payload[4:])


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
