"""Image decode / resize / feature stage — STUBBED decode, real plumbing.

The container ships no image libraries (TESTDATA has no image payloads
either), so the codec boundary is explicit:

  * ``decode_image_stub`` raises ``NotImplementedError`` — the clearly
    marked seam where a real decoder (PIL/turbojpeg/ffmpeg) plugs in;
  * ``ImageDecodeStub`` is the actor-pool stage with the REAL Ray-side
    contract — schema in (``id``, ``bytes`` + declared width/height),
    schema out (fixed-shape thumbnail tensor + validity flag), actor
    ``__init__`` holding the (stub) decoder context, small-batch sizing —
    exercised end-to-end in tests with ``deterministic_fake=True``, which
    synthesizes a reproducible pseudo-image from the payload hash instead
    of decoding.

This mirrors how the audio path is structured (audio.py fake codecs), so
swapping in a real decoder changes ONE function, not the pipeline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sketches import hash64

THUMB_W = 8
THUMB_H = 8


def decode_image_stub(payload: bytes) -> np.ndarray:
    """Placeholder for a real image decoder → (H, W, 3) uint8.

    STUB: no image codec is available in this environment."""
    raise NotImplementedError(
        "image decoding requires an image codec library; "
        "plug a real decoder in here (PIL.Image.open / turbojpeg)")


def _fake_thumbnail(payload: bytes) -> np.ndarray:
    """Deterministic pseudo-thumbnail from the payload hash (test path)."""
    seed = int(hash64(np.array([payload], dtype=object))[0] % (2**32))
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(THUMB_H, THUMB_W, 3), dtype=np.uint8)


class ImageDecodeStub:
    """Actor-pool stage: binary image payloads → fixed-shape thumbnails.

    ``deterministic_fake=True`` routes through the reproducible fake
    (plumbing tests); ``False`` hits the NotImplementedError seam."""

    columns = ("id", "bytes")

    def __init__(self, deterministic_fake: bool = False):
        self.decode = _fake_thumbnail if deterministic_fake else decode_image_stub

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_pylist()
        payloads = batch.column("bytes").to_pylist()
        ok, thumbs = [], []
        zero = np.zeros(THUMB_H * THUMB_W * 3, dtype=np.uint8)
        for payload in payloads:
            if payload is None:
                ok.append(False)
                thumbs.append(zero)
                continue
            try:
                t = self.decode(payload)
            except NotImplementedError:
                raise  # a misconfigured pipeline must fail loudly, not skip
            except (ValueError, OSError):
                ok.append(False)
                thumbs.append(zero)
                continue
            ok.append(True)
            thumbs.append(np.ascontiguousarray(t, dtype=np.uint8).ravel())
        return pa.table({
            "id": pa.array(ids),
            "decode_ok": pa.array(ok, pa.bool_()),
            "thumbnail": pa.array(
                [t.tolist() for t in thumbs],
                pa.list_(pa.uint8(), THUMB_H * THUMB_W * 3)),
        })
