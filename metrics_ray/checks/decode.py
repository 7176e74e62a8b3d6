"""Decode-vs-declared + SNR invariant check — the actor-pool stage.

The reference's "declared representation vs actual content" family
(SURVEY.md §2.5): MisreportedContentType.java:118-174 (declared HTTP
Content-Type vs actual parseability), Dereferenceability's parse check
(helper/ModelParser.java), CompatibleDatatype's isValid lexical test.

Per row: decode ``bytes`` (actual codec detected by payload magic), then
  DECODE_ERROR        payload undecodable
  CODEC_MISMATCH      declared codec valid but != actual codec
  DURATION_MISMATCH   n_samples != round(sr_hz * dur_ms / 1000)
  LOW_SNR             SNR(decoded vs reference signal for clip_id) < 30 dB

This is the one genuinely per-row stage (variable-length payloads); it runs
in the shared suite executor, which the runner maps as an ACTOR POOL
(``map_batches(Cls, concurrency=N)``) so decode state and the check graph
build once per actor, mirroring the reference's one-time before() setup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import audio
from ..schema import SNR_THRESHOLD_DB, VALID_CODECS, Codes
from ..sketches import md5_lower64
from .base import BatchCheck, BatchOutcome, CheckContext


class DecodeCheck(BatchCheck):
    """``sample_fraction`` enables the reference's Estimated* execution
    mode (EstimatedMisreportedContentType.java:86-130,
    EstimatedDereferenceability.java:89-150): the expensive per-row work
    (decode + SNR) runs only on a deterministic hash-sample of the rows —
    seeded on clip_id, so the same clips are sampled on every worker, in
    every run, and at any batch size — and the metric value is the
    violation RATE on the sample (an unbiased estimator of the full-scan
    rate; counters reflect sampled rows only). ``is_estimate`` flips to
    True, mirroring the reference's isEstimate() contract. At 10^12 rows
    this turns the one genuinely payload-bound stage into a dialable
    cost: fraction × full cost, with sampling error ~1/sqrt(sampled)."""

    check_id = "decode_invariants"
    columns = ("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "partition")

    def __init__(self, check_id: str = "decode_invariants",
                 snr_threshold: float = SNR_THRESHOLD_DB,
                 sample_fraction: float | None = None):
        self.check_id = check_id
        self.snr_threshold = snr_threshold
        self.sample_fraction = sample_fraction
        self.is_estimate = (sample_fraction is not None
                            and sample_fraction < 1.0)
        # driver-side snapshot: the codec registry is per-process, so a
        # deployment's register_codec calls (made on the driver before
        # suite assembly) must travel WITH the check into every worker
        self._codecs = audio.codec_snapshot()
        # PUBLIC stable projection of the snapshot: joins the checkpoint
        # param digest (private attrs are excluded — they may embed
        # process-unique reprs), so a resume under a DIFFERENT codec
        # registry refuses instead of silently mixing per-partition
        # results decoded with different codec sets
        self.codec_config = [(c.name, c.magic.hex(), c.bytes_per_sample)
                             for c in self._codecs]

    def setup(self, ctx: CheckContext) -> None:
        audio.apply_codec_snapshot(self._codecs)  # worker process
        self._valid = set(VALID_CODECS)

    def _sample_batch(self, batch: pa.Table) -> pa.Table:
        """Deterministic per-clip inclusion: md5(clip_id) below the
        fraction threshold. Pure function of the row — independent of
        batch boundaries, worker count, and execution order — and equal
        to DuckDB md5_number_lower(clip_id), so the sampled-row universe
        is itself oracle-checkable (the hashing cost is noise next to
        the decode this sampling avoids)."""
        if not self.is_estimate:
            return batch
        pri = md5_lower64(batch.column("clip_id").to_pylist())
        thr = np.uint64(int(self.sample_fraction * float(2**64 - 1)))
        keep = np.nonzero(pri <= thr)[0]
        return batch.take(pa.array(keep))

    def evaluate(self, batch: pa.Table) -> BatchOutcome:
        from .keyed import _binary_views

        batch = self._sample_batch(batch)
        part = batch.column("partition").to_numpy(zero_copy_only=False)
        clip_ids = batch.column("clip_id").to_pylist()
        # zero-copy memoryview slices straight off the Arrow buffers —
        # the decode pass dominates suite CPU, so skipping to_pylist's
        # per-payload bytes copy is measurable; decode()/zlib/frombuffer
        # all accept memoryviews
        payloads = _binary_views(batch.column("bytes"))
        sr = batch.column("sr_hz").to_numpy(zero_copy_only=False)
        dur = batch.column("dur_ms").to_numpy(zero_copy_only=False)
        codecs = batch.column("codec").to_pylist()

        v_part, v_id, v_code, v_actual, v_expected, v_detail = [], [], [], [], [], []
        viol_mask = np.zeros(len(batch), dtype=bool)

        def emit(i: int, code: str, actual: str, expected: str, detail: str = ""):
            viol_mask[i] = True
            v_part.append(int(part[i])); v_id.append(clip_ids[i])
            v_code.append(code); v_actual.append(actual)
            v_expected.append(expected); v_detail.append(detail)

        for i in range(len(batch)):
            payload = payloads[i]
            if payload is None:
                emit(i, Codes.DECODE_ERROR, "null", "decodable payload")
                continue
            try:
                actual_codec, pcm = audio.decode(payload)
            except (ValueError, TypeError) as e:
                # TypeError included: payloads arrive as zero-copy
                # memoryviews, and a registered decode_body that chokes
                # on a buffer must surface as this row's DECODE_ERROR,
                # not crash the whole batch task
                emit(i, Codes.DECODE_ERROR, f"{len(payload)}B", "decodable payload",
                     str(e))
                continue
            if codecs[i] in self._valid and actual_codec != codecs[i]:
                emit(i, Codes.CODEC_MISMATCH, actual_codec, codecs[i])
            expected_n = audio.n_samples_for(int(sr[i]), int(dur[i]))
            if expected_n != len(pcm):
                emit(i, Codes.DURATION_MISMATCH, f"{len(pcm)} samples",
                     f"{expected_n} samples",
                     f"sr_hz={sr[i]} dur_ms={dur[i]}")
            ref = audio.synth_pcm(audio.clip_seed(clip_ids[i]), len(pcm))
            s = audio.snr_db(ref, pcm)
            if s < self.snr_threshold:
                emit(i, Codes.LOW_SNR, f"{s:.1f} dB",
                     f">= {self.snr_threshold:.1f} dB")

        from .base import per_partition_counts

        counters = per_partition_counts(part, viol_mask)
        viol = None
        if v_id:
            viol = pa.table(
                {
                    "partition": pa.array(np.asarray(v_part, dtype=np.int32)),
                    "clip_id": pa.array(v_id, pa.string()),
                    "code": pa.array(v_code, pa.string()),
                    "actual": pa.array(v_actual, pa.string()),
                    "expected": pa.array(v_expected, pa.string()),
                    "detail": pa.array(v_detail, pa.string()),
                }
            )
        return BatchOutcome(violations=viol, counters=counters)


class PayloadSizeCheck(BatchCheck):
    """Pre-decode size-plausibility triage — the O(1)-per-row gate that
    runs BEFORE the decode stage pays per-sample cost (the cheap half of
    MisreportedContentType.java's declared-vs-actual family; the
    standalone query q_payload_size shares these semantics and carries
    the SQL oracle): payloads whose magic declares a FIXED-RATE codec
    (``Codec.bytes_per_sample`` set in the audio codec registry) must
    satisfy ``body == bps * round(sr_hz * dur_ms / 1000)``. Reads only
    the Arrow offset buffer plus a 4-byte magic slice; compressed codecs
    have no closed-form size (the decode check's job); non-positive
    sr/dur belong to the range checks. Fully vectorized, row-local.
    Eligibility and the per-codec rate come from the registry, so a
    codec registered via ``audio.register_codec`` is triaged with no
    edits here."""

    check_id = "payload_size"
    columns = ("clip_id", "bytes", "sr_hz", "dur_ms", "partition")

    def __init__(self, check_id: str = "payload_size"):
        self.check_id = check_id
        # driver-side registry snapshot (see DecodeCheck.__init__)
        self._codecs = audio.codec_snapshot()
        self.codec_config = [(c.name, c.magic.hex(), c.bytes_per_sample)
                             for c in self._codecs]

    def setup(self, ctx: CheckContext) -> None:
        audio.apply_codec_snapshot(self._codecs)
        self._fixed = [(m, audio.bytes_per_sample(m))
                       for m in audio.fixed_rate_magics()]
        self._uncompressed = pa.array(
            [m for m, _ in self._fixed], pa.binary())

    def evaluate(self, batch: pa.Table) -> BatchOutcome:
        import pyarrow.compute as pc

        from .base import per_partition_counts

        by = batch.column("bytes")
        ln = pc.fill_null(pc.binary_length(by).cast(pa.int64()), 0)
        prefix = pc.binary_slice(by, 0, 4)
        eligible = pc.and_(
            pc.and_(pc.greater_equal(ln, 4),
                    pc.is_in(prefix, value_set=self._uncompressed)),
            pc.and_(pc.greater(batch.column("sr_hz"), 0),
                    pc.greater(batch.column("dur_ms"), 0)))
        elig = pc.fill_null(eligible, False).to_numpy(
            zero_copy_only=False).astype(bool)
        sr = batch.column("sr_hz").to_numpy(
            zero_copy_only=False).astype(np.int64)
        dur = batch.column("dur_ms").to_numpy(
            zero_copy_only=False).astype(np.int64)
        # per-row bytes/sample from the registry (one vectorized equality
        # per registered fixed-rate codec — the registry is tiny)
        bps = np.zeros(len(batch), dtype=np.int64)
        for m, b in self._fixed:
            hit = pc.fill_null(pc.equal(prefix, m), False).to_numpy(
                zero_copy_only=False).astype(bool)
            bps[hit] = b
        # np.rint == python round (banker's): the q_payload_size /
        # DurationMismatch rounding contract
        exp_body = bps * np.rint(sr * dur / 1000.0).astype(np.int64)
        act_body = ln.to_numpy(zero_copy_only=False) - 4
        mask = elig & (act_body != exp_body)
        part = batch.column("partition").to_numpy(zero_copy_only=False)
        counters = per_partition_counts(part, mask)
        viol = None
        if mask.any():
            idx = np.nonzero(mask)[0]
            n = len(idx)
            # per-ROW expected rate: a batch-aggregated string would make
            # a row's violation text depend on which other rows shared
            # its block — breaking the layout-invariance contract
            viol = pa.table({
                "partition": pa.array(
                    np.asarray(part[idx], dtype=np.int32)),
                "clip_id": pa.array(
                    batch.column("clip_id").take(pa.array(idx)).to_pylist(),
                    pa.string()),
                "code": pa.array([Codes.SIZE_MISMATCH] * n, pa.string()),
                "actual": pa.array(
                    [f"{int(a)} B body" for a in act_body[idx]],
                    pa.string()),
                "expected": pa.array(
                    [f"{int(b)} B/sample x round(sr_hz*dur_ms/1000)"
                     for b in bps[idx]], pa.string()),
                "detail": pa.array(
                    ["uncompressed payload size vs declared metadata"] * n,
                    pa.string()),
            })
        return BatchOutcome(violations=viol, counters=counters)
