"""Video container / frame-sampling stages — REAL parsing, pure numpy.

Completes the multimodal triple (audio: stages/audio_ops.py, image:
stages/image.py) without external libraries: a minimal length-prefixed
container holding PPM frames —

    b"VID0" | uint32 n_frames | uint32 fps_milli | uint32 w | uint32 h
    then per frame: uint32 blob_len | P6-PPM blob

The format is deliberately seekable: ``sample_frames`` walks the length
prefixes and DECODES ONLY the sampled frames — the property a real
frame-sample stage needs at scale (decode cost proportional to frames
kept, not frames stored). Payloads never leave the stage; per-video
feature rows are the only output.

Fixture (`derive_videos_batch`) mirrors stages/image.py: a pure function
of the documents table with a seeded corruption matrix —

    k % 53 ==  7 → header DECLARES one more frame than stored
                   (declared≠actual, the MisreportedContentType seed)
    k % 59 == 11 → payload truncated to half (tail frames lost)

Frame blobs have a fixed size (same w×h), so the number of COMPLETE
frames surviving truncation is pure integer arithmetic on doc_id — the
`vid_frame_mismatch` oracle recomputes in SQL what the engine reads from
real bytes (the same parse-vs-arithmetic pattern as img_format_mismatch).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from .image import decode_image, encode_ppm, synth_image

MAGIC = b"VID0"
HEADER_LEN = 4 + 4 * 4

VID_W = 16
VID_H = 12
VID_FPS_MILLI = 10_000  # 10 fps

_TWO31 = 2147483648


# ----------------------------------------------------------------- codec

def encode_video(frames: list[np.ndarray], fps_milli: int = VID_FPS_MILLI,
                 declared_frames: int | None = None) -> bytes:
    """Frames (each (H, W, 3) uint8) → container bytes. ``declared_frames``
    overrides the header count (corruption seeds only)."""
    h, w, _ = frames[0].shape
    blobs = [encode_ppm(f) for f in frames]
    head = MAGIC + struct.pack(
        "<IIII", declared_frames if declared_frames is not None
        else len(frames), fps_milli, w, h)
    body = b"".join(struct.pack("<I", len(b)) + b for b in blobs)
    return head + body


def parse_header(payload: bytes) -> tuple[int, int, int, int]:
    """→ (declared_frames, fps_milli, w, h); raises ValueError on a foreign
    or short payload."""
    if len(payload) < HEADER_LEN or payload[:4] != MAGIC:
        raise ValueError("not a VID0 container")
    return struct.unpack("<IIII", payload[4:HEADER_LEN])


def frame_offsets(payload: bytes) -> list[tuple[int, int]]:
    """(offset, length) of each COMPLETE frame blob (walks the length
    prefixes; stops at the first truncated entry)."""
    out = []
    pos = HEADER_LEN
    n = len(payload)
    while pos + 4 <= n:
        (flen,) = struct.unpack("<I", payload[pos:pos + 4])
        if pos + 4 + flen > n:
            break
        out.append((pos + 4, flen))
        pos += 4 + flen
    return out


def sample_frames(payload: bytes, stride: int = 2) -> list[np.ndarray]:
    """Decode every ``stride``-th complete frame — skipped frames are never
    decoded (offset walk only)."""
    return [decode_image(payload[off:off + ln])[1]
            for off, ln in frame_offsets(payload)[::stride]]


# ----------------------------------------------------- deterministic fixture

def synth_video_frames(seed: int, n_frames: int) -> list[np.ndarray]:
    return [synth_image(seed + 1000 * i, w=VID_W, h=VID_H)
            for i in range(n_frames)]


def n_frames_for(k: int) -> int:
    return 2 + k % 5


def derive_videos_batch(batch: pa.Table, n_docs: int) -> pa.Table:
    """documents batch → videos rows (vid_id, bytes, declared_frames,
    partition). Corruption matrix documented in the module docstring."""
    doc_id = batch.column("doc_id").to_numpy(
        zero_copy_only=False).astype(np.int64)
    ids, payloads, declared = [], [], []
    for k in doc_id:
        k = int(k)
        n = n_frames_for(k)
        decl = n + (1 if k % 53 == 7 else 0)
        payload = encode_video(synth_video_frames(k, n),
                               declared_frames=decl)
        if k % 59 == 11:
            payload = payload[: max(HEADER_LEN, len(payload) // 2)]
        ids.append(f"vid-{k:08d}")
        payloads.append(payload)
        declared.append(decl)
    return pa.table({
        "vid_id": pa.array(ids, pa.string()),
        "bytes": pa.array(payloads, pa.binary()),
        "declared_frames": pa.array(declared, pa.int64()),
        "partition": pa.array((doc_id % 8).astype(np.int32)),
    })


# frame blob size is a pure function of the fixed frame geometry; the SQL
# mirror recomputes complete-frame counts from it (bytes stay Ray-only)
_PPM_HEADER = len(f"P6\n{VID_W} {VID_H}\n255\n".encode())
FRAME_BLOB = 4 + _PPM_HEADER + VID_W * VID_H * 3  # len prefix + ppm

VIDEOS_SQL = f"""
videos AS (
    SELECT
        printf('vid-%08d', doc_id) AS vid_id,
        2 + doc_id % 5
            + CASE WHEN doc_id % 53 = 7 THEN 1 ELSE 0 END AS declared_frames,
        CASE WHEN doc_id % 59 = 11
             THEN GREATEST(
                 ({HEADER_LEN} + (2 + doc_id % 5) * {FRAME_BLOB}) // 2
                 - {HEADER_LEN}, 0) // {FRAME_BLOB}
             ELSE 2 + doc_id % 5 END AS actual_frames,
        CAST(doc_id % 8 AS INTEGER) AS partition
    FROM documents
)
"""


# ------------------------------------------------------------------ stages

STATS_SCHEMA = pa.schema([
    ("vid_id", pa.string()),
    ("declared_frames", pa.int64()),
    ("actual_frames", pa.int64()),
    ("n_sampled", pa.int64()),
    ("luma_mean", pa.float64()),
])


class VideoFrameSampler:
    """Actor-pool stage: video payloads → per-video frame stats from a
    strided frame sample. Only sampled frames are decoded; the payload
    never leaves the stage."""

    columns = ("vid_id", "bytes")

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {n: [] for n in STATS_SCHEMA.names}
        for vid, payload in zip(batch.column("vid_id").to_pylist(),
                                batch.column("bytes").to_pylist()):
            out["vid_id"].append(vid)
            try:
                decl, _fps, _w, _h = parse_header(payload)
            except (ValueError, TypeError):
                out["declared_frames"].append(-1)
                out["actual_frames"].append(0)
                out["n_sampled"].append(0)
                out["luma_mean"].append(float("nan"))
                continue
            offs = frame_offsets(payload)
            try:
                frames = sample_frames(payload, self.stride)
            except (ValueError, TypeError):
                # a complete-length but undecodable frame blob is the
                # decode CHECK's finding, not this stage's crash — emit
                # structural stats with no sampled frames
                frames = []
            if frames:
                luma = float(np.mean([
                    (0.2126 * f[..., 0].astype(np.float64)
                     + 0.7152 * f[..., 1] + 0.0722 * f[..., 2]).mean()
                    for f in frames]))
            else:
                luma = float("nan")
            out["declared_frames"].append(int(decl))
            out["actual_frames"].append(len(offs))
            out["n_sampled"].append(len(frames))
            out["luma_mean"].append(luma)
        return pa.table({n: pa.array(out[n], STATS_SCHEMA.field(n).type)
                         for n in STATS_SCHEMA.names})
