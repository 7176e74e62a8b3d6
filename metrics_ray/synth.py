"""Deterministic clips-table derivation (the fixture generator).

Mirrors the reference's hand-authored corruption fixtures (SURVEY.md §5:
tiny TTL files seeding a known number of violations, e.g.
``SampleInput_ValidIFPUsage_Minimal.ttl`` with 2 duplicated jabberIDs;
``SampleInput_CompatibleDatatype.ttl`` with 3 invalid literals) — but as a
PURE FUNCTION of the driver's ``documents`` table, with every metadata
derivation expressible in both numpy and ANSI SQL. That lets DuckDB recompute
the same clips table from the ``documents`` view and act as the oracle for
the metadata checks; only the ``bytes`` column (audio payload) is Ray-only.

Derivation is row-pure: clip rows for document k depend only on (k, text_k),
so it can run inside ``map_batches`` at any batch size. Rows with
k % 139 == 41 additionally emit a second row (id ``clip-9%07d``) that copies
every column of the base row except ``clip_id`` — the content-duplicate pair.

Corruption matrix (seeded by row key k = doc_id + n_docs * replica):
  k % 101 ==  7  → duplicate clip_id (uses k-1's id)         [uniqueness]
  k %  97 == 13  → sr_hz 7999;  k % 97 == 50 → sr_hz 0       [range]
  k % 103 == 11  → dur_ms -5;   k % 103 == 60 → dur_ms 40000 [range]
  k % 107 ==  3  → codec 'wav?'; == 71 → ''; == 40 → 'PCM'   [enum]
  k % 109 ==  9  → codec 'gsm' (deprecated)                  [deprecated]
  k %  89 ==  5  → transcript NULL; == 44 → ''               [non-null]
  k % 113 == 29  → clip_id absent from transcript_index      [referential]
  k % 137 == 31  → transcript differs from index reference   [equality]
  k % 111 == 21  → bytes encoded with a different codec      [codec-vs-bytes]
  k % 127 == 17  → bytes truncated (undecodable)             [decodability]
  k % 131 == 23  → loud additive noise before encode         [SNR >= 30 dB]
  k % 139 == 41  → extra row: same (bytes, transcript), new id [content dedup]

Known interactions (all deterministic; asserted in tests): rows with
corrupted sr/dur also fail the duration-consistency invariant (bytes were
synthesized from the uncorrupted base values); the k%139 duplicate row fails
the SNR invariant (its payload was synthesized from the BASE row's clip_id —
a duplicated clip genuinely is not the signal its own id claims).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import audio
from .schema import VALID_CODECS, VALID_SR_HZ

_TWO31 = 2147483648
N_PARTITIONS = 8

_SR_CHOICES = np.asarray(VALID_SR_HZ, dtype=np.int64)
_CODEC_CHOICES = list(VALID_CODECS)


def _h(k: np.ndarray) -> np.ndarray:
    return (k * 1103515245 + 12345) % _TWO31


def derive_clips_batch(batch: pa.Table, n_docs: int, replica: int = 0,
                       with_audio: bool = True,
                       dur_scale: float = 1.0) -> pa.Table:
    """documents batch (doc_id, text) → clips batch (base rows then the
    k%139==41 duplicate rows). Vectorized metadata; per-row numpy synthesis
    for the audio payload. ``dur_scale`` shrinks synthesized durations for
    large-scale benches (metadata stays unscaled only when dur_scale==1;
    scaled tables are for throughput measurement, not the SQL oracle)."""
    doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    text = batch.column("text").to_pylist()
    k = doc_id + np.int64(n_docs) * np.int64(replica)
    h = _h(k)

    base_sr = _SR_CHOICES[(h % 5).astype(np.int64)]
    base_dur = 200 + (h % 1800)
    if dur_scale != 1.0:
        base_dur = np.maximum(20, (base_dur * dur_scale).astype(np.int64))
    codec_idx = ((h // 5) % 4).astype(np.int64)

    sr = base_sr.copy()
    sr[k % 97 == 13] = 7999
    sr[k % 97 == 50] = 0

    dur = base_dur.copy()
    dur[k % 103 == 11] = -5
    dur[k % 103 == 60] = 40000

    codec = np.array([_CODEC_CHOICES[i] for i in codec_idx], dtype=object)
    codec[k % 107 == 3] = "wav?"
    codec[k % 107 == 71] = ""
    codec[k % 107 == 40] = "PCM"
    codec[(k % 109 == 9) & (k % 107 != 3) & (k % 107 != 71) & (k % 107 != 40)] = "gsm"

    transcript = np.array(text, dtype=object)
    mism = k % 137 == 31
    transcript[mism] = [t + " X" for t in transcript[mism]]
    transcript[k % 89 == 5] = None
    transcript[k % 89 == 44] = ""

    clip_ids = [
        f"clip-{int(kk) - 1:08d}" if (kk % 101 == 7 and kk > 0) else f"clip-{int(kk):08d}"
        for kk in k
    ]

    payloads: list[bytes | None]
    if with_audio:
        payloads = []
        for i in range(len(k)):
            ki = int(k[i])
            n = audio.n_samples_for(int(base_sr[i]), int(base_dur[i]))
            pcm = audio.synth_pcm(audio.clip_seed(clip_ids[i]), n)
            if ki % 131 == 23:  # loud deterministic noise → SNR << 30 dB
                idx = np.arange(n, dtype=np.float64)
                pcm = pcm + (0.2 * np.sin(2.0 * idx + ki)).astype(np.float32)
            enc_codec = _CODEC_CHOICES[int(codec_idx[i])]
            if ki % 111 == 21:  # encode with the wrong codec
                enc_codec = _CODEC_CHOICES[(int(codec_idx[i]) + 1) % 4]
            payload = audio.encode(pcm, enc_codec)
            if ki % 127 == 17:  # truncate to an odd-length body → undecodable
                body_len = max(3, (len(payload) - 4) // 2)
                if body_len % 2 == 0:
                    body_len -= 1
                payload = payload[: 4 + body_len]
            payloads.append(payload)
    else:
        payloads = [None] * len(k)

    # the content-duplicate extra rows: copy everything, re-key the id
    dup_mask = (k % 139 == 41) & (k > 0)
    dup_idx = np.nonzero(dup_mask)[0]
    all_ids = clip_ids + [f"clip-9{int(k[i]) % 10_000_000:07d}" for i in dup_idx]
    all_payloads = payloads + [payloads[i] for i in dup_idx]
    all_sr = np.concatenate([sr, sr[dup_idx]])
    all_dur = np.concatenate([dur, dur[dup_idx]])
    all_codec = list(codec) + [codec[i] for i in dup_idx]
    all_transcript = list(transcript) + [transcript[i] for i in dup_idx]
    all_k = np.concatenate([k, k[dup_idx]])

    return pa.table(
        {
            "clip_id": pa.array(all_ids, pa.string()),
            "bytes": pa.array(all_payloads, pa.binary()),
            "sr_hz": pa.array(all_sr.astype(np.int32)),
            "dur_ms": pa.array(all_dur.astype(np.int32)),
            "codec": pa.array(all_codec, pa.string()),
            "transcript": pa.array(all_transcript, pa.string()),
            "partition": pa.array((all_k % N_PARTITIONS).astype(np.int32)),
        }
    )


def derive_transcript_index_batch(batch: pa.Table, n_docs: int,
                                  replica: int = 0) -> pa.Table:
    """documents batch → transcript_index rows (the gold-standard side,
    DataCubePopulationCompleteness.java:152-221 analog). Drops the seeded
    missing set k % 113 == 29; holds the UNCORRUPTED reference transcript.
    The k%139 duplicate rows are indexed too (same reference text)."""
    doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    text = batch.column("text").to_pylist()
    k = doc_id + np.int64(n_docs) * np.int64(replica)
    keep = np.nonzero(k % 113 != 29)[0]
    ids = [f"clip-{int(k[i]):08d}" for i in keep]
    txt = [text[i] for i in keep]
    dup = [i for i in keep if k[i] % 139 == 41 and k[i] > 0]
    ids += [f"clip-9{int(k[i]) % 10_000_000:07d}" for i in dup]
    txt += [text[i] for i in dup]
    return pa.table({"clip_id": pa.array(ids, pa.string()),
                     "ref_transcript": pa.array(txt, pa.string())})


# --------------------------------------------------------------- SQL mirror
# DuckDB CTEs producing identical metadata columns from the `documents` view
# (replica 0; `bytes` is Ray-only). Every metadata-check oracle starts here.

CLIPS_SQL = """
clip_base AS (
    SELECT
        doc_id,
        CASE WHEN doc_id % 101 = 7 AND doc_id > 0
             THEN printf('clip-%08d', doc_id - 1)
             ELSE printf('clip-%08d', doc_id) END AS clip_id,
        CAST(CASE WHEN doc_id % 97 = 13 THEN 7999
             WHEN doc_id % 97 = 50 THEN 0
             ELSE CASE ((doc_id * 1103515245 + 12345) % 2147483648) % 5
                  WHEN 0 THEN 8000 WHEN 1 THEN 16000 WHEN 2 THEN 22050
                  WHEN 3 THEN 44100 ELSE 48000 END
        END AS INTEGER) AS sr_hz,
        CAST(CASE WHEN doc_id % 103 = 11 THEN -5
             WHEN doc_id % 103 = 60 THEN 40000
             ELSE 200 + ((doc_id * 1103515245 + 12345) % 2147483648) % 1800
        END AS INTEGER) AS dur_ms,
        CASE WHEN doc_id % 107 = 3 THEN 'wav?'
             WHEN doc_id % 107 = 71 THEN ''
             WHEN doc_id % 107 = 40 THEN 'PCM'
             WHEN doc_id % 109 = 9 THEN 'gsm'
             ELSE CASE ((((doc_id * 1103515245 + 12345) % 2147483648) // 5) % 4)
                  WHEN 0 THEN 'pcm_s16le' WHEN 1 THEN 'flac'
                  WHEN 2 THEN 'mp3' ELSE 'opus' END
        END AS codec,
        CASE WHEN doc_id % 89 = 5 THEN NULL
             WHEN doc_id % 89 = 44 THEN ''
             WHEN doc_id % 137 = 31 THEN text || ' X'
             ELSE text END AS transcript,
        CAST(doc_id % 8 AS INTEGER) AS partition
    FROM documents
),
clips AS (
    SELECT clip_id, sr_hz, dur_ms, codec, transcript, partition FROM clip_base
    UNION ALL
    SELECT printf('clip-9%07d', doc_id % 10000000), sr_hz, dur_ms, codec,
           transcript, partition
    FROM clip_base WHERE doc_id % 139 = 41 AND doc_id > 0
),
transcript_index AS (
    SELECT printf('clip-%08d', doc_id) AS clip_id, text AS ref_transcript
    FROM documents WHERE doc_id % 113 != 29
    UNION ALL
    SELECT printf('clip-9%07d', doc_id % 10000000), text
    FROM documents WHERE doc_id % 113 != 29 AND doc_id % 139 = 41 AND doc_id > 0
)
"""
