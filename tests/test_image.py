"""Pure-numpy image codecs and stages (stages/image.py): byte-exact PPM/BMP
round-trips, magic detection, area resize, the fixture corruption matrix,
and the declared-vs-actual pipeline."""

import numpy as np
import pyarrow as pa
import pytest

from metrics_ray.stages.image import (
    IMG_H,
    IMG_W,
    decode_image,
    derive_images_batch,
    detect_format,
    encode_bmp,
    encode_ppm,
    resize_area,
    synth_image,
)


def test_ppm_roundtrip_exact():
    arr = synth_image(42)
    fmt, back = decode_image(encode_ppm(arr))
    assert fmt == "ppm"
    np.testing.assert_array_equal(arr, back)


def test_bmp_roundtrip_exact_with_row_padding():
    # width 3 → row bytes 9 → padded to 12: exercises the padding path
    arr = synth_image(7, w=3, h=5)
    fmt, back = decode_image(encode_bmp(arr))
    assert fmt == "bmp"
    np.testing.assert_array_equal(arr, back)


def test_ppm_header_comments_and_whitespace():
    arr = synth_image(3, w=4, h=2)
    raw = encode_ppm(arr)
    body = raw.split(b"\n", 3)[3]
    weird = b"P6\n# a comment\n 4\t2 # another\n255\n" + body
    fmt, back = decode_image(weird)
    assert fmt == "ppm"
    np.testing.assert_array_equal(arr, back)


def test_truncated_payloads_fail_with_magic_intact():
    arr = synth_image(11)
    for enc in (encode_ppm, encode_bmp):
        payload = enc(arr)
        cut = payload[: len(payload) // 2]
        assert detect_format(cut) in ("ppm", "bmp")
        with pytest.raises(ValueError, match="truncated"):
            decode_image(cut)


def test_compressed_magics_name_the_seam():
    with pytest.raises(ValueError, match="external codec"):
        decode_image(b"\xff\xd8\xff\xe0rest")
    with pytest.raises(ValueError, match="external codec"):
        decode_image(b"\x89PNG\r\n\x1a\nrest")


def test_resize_area_block_means():
    # 4x4 pixel-checkerboard of 0/255: every 2x2 output bin mixes two of
    # each → mean 127.5 → 128
    tile = np.array([[0, 255], [255, 0]], dtype=np.uint8)
    board = np.tile(tile, (2, 2))
    arr = np.stack([board * 1, board * 1, board * 1], axis=-1)
    out = resize_area(arr.astype(np.uint8), 2, 2)
    assert out.shape == (2, 2, 3)
    np.testing.assert_array_equal(
        out, np.full((2, 2, 3), 128, dtype=np.uint8))
    # identity resize is exact
    np.testing.assert_array_equal(resize_area(arr, 4, 4), arr)


def test_derive_images_corruption_matrix():
    n = 500
    docs = pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                     "text": pa.array(["t"] * n, pa.string())})
    t = derive_images_batch(docs, n_docs=n)
    assert t.num_rows == n
    ids = t.column("img_id").to_pylist()
    payloads = t.column("bytes").to_pylist()
    declared = t.column("declared_format").to_pylist()
    n_mismatch = n_undecodable = 0
    for k in range(n):
        actual = detect_format(payloads[k])
        assert actual is not None  # magic survives truncation
        if k % 67 == 13:
            assert actual != declared[k]
            n_mismatch += 1
        else:
            assert actual == declared[k]
        try:
            fmt, arr = decode_image(payloads[k])
        except ValueError:
            assert k % 61 == 9
            n_undecodable += 1
            continue
        assert k % 61 != 9
        assert arr.shape == (IMG_H, IMG_W, 3)
        np.testing.assert_array_equal(arr, synth_image(k))
    assert n_mismatch == sum(1 for k in range(n) if k % 67 == 13)
    assert n_undecodable == sum(1 for k in range(n) if k % 61 == 9)
    assert ids[3] == "img-00000003"


@pytest.mark.usefixtures("ray_session")
def test_img_queries_over_testdata():
    from metrics_ray.pipelines.queries import VALIDATION_QUERIES

    fn, _ = VALIDATION_QUERIES["img_features"]
    t = fn("/root/testdata/sf0.001").to_pandas()
    assert len(t) == 500
    bad = t[~t.decode_ok]
    ks = np.arange(500)
    assert len(bad) == int((ks % 61 == 9).sum())
    ok = t[t.decode_ok]
    assert ok.luma_mean.between(1, 255).all()
