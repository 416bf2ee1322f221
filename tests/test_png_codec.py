"""Pure-stdlib PNG codec (r10 — closes the image-decode env gap without
PIL): CRC-checked critical-chunk parse, zlib inflate, full five-filter
scanline reconstruction for 8-bit gray/RGB/RGBA."""

from __future__ import annotations

import pytest

from mycarely_saas_dbt_spark.operators.multimodal import (
    decode_image_real,
    png_decode,
    png_encode,
)


@pytest.mark.parametrize("ct,bpp", [(0, 1), (2, 3), (6, 4)])
def test_roundtrip_exercises_all_five_filters(ct, bpp):
    # height 11 > 5 => the encoder's y % 5 filter cycle covers
    # None/Sub/Up/Average/Paeth at least twice each
    w, h = 13, 11
    rows = [
        bytes(((x * 5 + y * 9 + c * 17) % 256) for x in range(w) for c in range(bpp))
        for y in range(h)
    ]
    img = png_decode(png_encode(w, h, rows, color_type=ct))
    assert (img["width"], img["height"], img["color_type"]) == (w, h, ct)
    assert img["rows"] == rows


def test_decode_image_real_unstubbed_for_png():
    rows = [bytes(range(y, y + 12)) for y in range(4)]
    blob = png_encode(4, 4, rows, color_type=2)
    assert decode_image_real(blob)["rows"] == rows


def test_crc_corruption_and_bad_signature_raise():
    blob = bytearray(png_encode(4, 4, [bytes(12)] * 4))
    blob[20] ^= 1
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(blob))
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"JFIF" + bytes(blob[4:]))


def test_unsupported_shapes_refuse_loudly():
    import struct
    import zlib

    from mycarely_saas_dbt_spark.operators.multimodal import PNG_SIG, _png_chunk

    # 16-bit depth: honest refusal, not silent garbage
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    blob = (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 26))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported"):
        png_decode(blob)


def test_mm_image_decode_matches_arithmetic_oracle(spark):
    import duckdb

    from tests.conftest import SF_DIR
    from mycarely_saas_dbt_spark.operators.multimodal import (
        O_MM_IMAGE,
        mm_image_decode,
    )

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    got = sorted(tuple(r) for r in mm_image_decode(spark, SF_DIR).collect())
    want = sorted(tuple(r) for r in con.sql(O_MM_IMAGE).fetchall())
    assert got == want
