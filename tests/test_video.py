"""Video container / frame-sampling goldens (stages/video.py) — the
byte-level contracts the vid_frame_mismatch oracle arithmetic relies on."""

import numpy as np
import pyarrow as pa
import pytest

from metrics_ray.stages.video import (
    FRAME_BLOB,
    HEADER_LEN,
    VID_FPS_MILLI,
    VID_H,
    VID_W,
    VideoFrameSampler,
    derive_videos_batch,
    encode_video,
    frame_offsets,
    n_frames_for,
    parse_header,
    sample_frames,
    synth_video_frames,
)


def test_roundtrip_exact():
    frames = synth_video_frames(42, 4)
    payload = encode_video(frames)
    decl, fps, w, h = parse_header(payload)
    assert (decl, fps, w, h) == (4, VID_FPS_MILLI, VID_W, VID_H)
    got = sample_frames(payload, stride=1)
    assert len(got) == 4
    for a, b in zip(frames, got):
        assert np.array_equal(a, b)


def test_frame_blob_size_constant():
    # the SQL oracle's truncation arithmetic assumes every frame blob has
    # exactly FRAME_BLOB bytes (fixed geometry)
    payload = encode_video(synth_video_frames(7, 3))
    offs = frame_offsets(payload)
    assert len(payload) == HEADER_LEN + 3 * FRAME_BLOB
    assert all(ln + 4 == FRAME_BLOB for _, ln in offs)


def test_stride_sampling_picks_every_kth():
    frames = synth_video_frames(5, 6)
    payload = encode_video(frames)
    got = sample_frames(payload, stride=2)
    assert len(got) == 3
    for i, f in enumerate(got):
        assert np.array_equal(f, frames[2 * i])


def test_truncation_arithmetic_matches_parse():
    # engine parse of a truncated payload == the oracle's integer formula
    for k in (11, 70, 129, 247):  # k % 59 == 11 truncation seeds
        n = n_frames_for(k)
        payload = encode_video(synth_video_frames(k, n))
        trunc = payload[: max(HEADER_LEN, len(payload) // 2)]
        expected = max((len(trunc) - HEADER_LEN), 0) // FRAME_BLOB
        assert len(frame_offsets(trunc)) == expected
        assert expected < n  # truncation always loses at least one frame


def test_derive_corruption_matrix():
    doc_id = pa.array(list(range(0, 130)), pa.int64())
    t = derive_videos_batch(pa.table({"doc_id": doc_id}), n_docs=130)
    decl = t.column("declared_frames").to_pylist()
    for k, d in zip(range(130), decl):
        want = n_frames_for(k) + (1 if k % 53 == 7 else 0)
        assert d == want
    # k=7: over-declared header; k=11: truncated
    rows = {v: (p, d) for v, p, d in zip(
        t.column("vid_id").to_pylist(), t.column("bytes").to_pylist(),
        t.column("declared_frames").to_pylist())}
    p7, d7 = rows["vid-00000007"]
    assert parse_header(p7)[0] == d7 == n_frames_for(7) + 1
    assert len(frame_offsets(p7)) == n_frames_for(7)
    p11, _ = rows["vid-00000011"]
    assert len(frame_offsets(p11)) < n_frames_for(11)


def test_sampler_stage_batch():
    t = derive_videos_batch(
        pa.table({"doc_id": pa.array([3, 7, 11], pa.int64())}), n_docs=12)
    out = VideoFrameSampler(stride=2)(t)
    by_id = {r["vid_id"]: r for r in out.to_pylist()}
    r3 = by_id["vid-00000003"]  # clean: 2 + 3%5 = 5 frames, sampled 0,2,4
    assert r3["actual_frames"] == 5 and r3["n_sampled"] == 3
    assert r3["declared_frames"] == 5
    assert np.isfinite(r3["luma_mean"])
    r7 = by_id["vid-00000007"]  # over-declared
    assert r7["declared_frames"] == r7["actual_frames"] + 1
    r11 = by_id["vid-00000011"]  # truncated
    assert r11["actual_frames"] < n_frames_for(11)


def test_foreign_payload_is_flagged_not_fatal():
    t = pa.table({"vid_id": pa.array(["x"], pa.string()),
                  "bytes": pa.array([b"JUNKJUNKJUNKJUNKJUNK"], pa.binary())})
    out = VideoFrameSampler()(t).to_pylist()[0]
    assert out["declared_frames"] == -1
    assert out["actual_frames"] == 0
    assert np.isnan(out["luma_mean"])


def test_corrupt_frame_body_does_not_kill_sampler():
    """A complete-length but undecodable frame blob is the decode check's
    finding — the sampler emits structural stats instead of raising."""
    frames = synth_video_frames(3, 2)
    payload = bytearray(encode_video(frames))
    off, ln = frame_offsets(bytes(payload))[0]
    payload[off:off + 4] = b"XXXX"  # clobber the PPM magic, keep length
    batch = pa.table({"vid_id": ["v0"],
                      "bytes": pa.array([bytes(payload)], pa.binary())})
    out = VideoFrameSampler(stride=1)(batch).to_pandas()
    assert out.loc[0, "actual_frames"] == 2  # structure still parses
    assert out.loc[0, "n_sampled"] == 0
    assert np.isnan(out.loc[0, "luma_mean"])
