"""Real multimodal header parsers + the synthesize->decode round trip."""

from __future__ import annotations

import struct

import pandas as pd
import pytest

from hadoop_bam_spark.operators.multimodal import parse_media_header


def _png(w, h):
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr
            + b"\x00" * 4 + struct.pack(">I", 0) + b"IEND" + b"\x00" * 4)


def _jpeg(w, h, progressive=False):
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    sof = b"\x08" + struct.pack(">HH", h, w) + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    return (b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
            + sof_marker + struct.pack(">H", 2 + len(sof)) + sof + b"\xff\xd9")


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00\x3b"


def _bmp(w, h):
    dib = struct.pack("<Iii", 40, w, h) + b"\x00" * 28
    return b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + dib


def _wav(data_size, byte_rate=16000, pad_extra_chunk=False):
    chunks = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, byte_rate, 2, 16)
    if pad_extra_chunk:
        chunks += b"LIST" + struct.pack("<I", 3) + b"odd"  # odd size -> pad byte
        chunks += b"\x00"
    chunks += b"data" + struct.pack("<I", data_size) + b"\x00" * data_size
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_png_dims():
    assert parse_media_header(_png(640, 480)) == ("png", 640, 480, None)


def test_jpeg_sof0_and_progressive_sof2():
    assert parse_media_header(_jpeg(123, 45)) == ("jpeg", 123, 45, None)
    assert parse_media_header(_jpeg(800, 600, progressive=True)) == (
        "jpeg", 800, 600, None)


def test_gif_and_bmp_dims():
    assert parse_media_header(_gif(12, 34)) == ("gif", 12, 34, None)
    assert parse_media_header(_bmp(320, 200)) == ("bmp", 320, 200, None)
    # BMP with bottom-up negative height stores abs dims
    assert parse_media_header(_bmp(320, -200)) == ("bmp", 320, 200, None)


def test_wav_duration_and_chunk_padding():
    # 16000 bytes at 16 kB/s = 1000 ms
    assert parse_media_header(_wav(16000)) == ("wav", None, None, 1000)
    assert parse_media_header(_wav(8000, pad_extra_chunk=True)) == (
        "wav", None, None, 500)


def test_unknown_magic_raises_notimplemented():
    with pytest.raises(NotImplementedError):
        parse_media_header(b"\x00\x01\x02\x03\x04\x05\x06\x07rubbish")


def test_truncated_known_container_raises_valueerror():
    with pytest.raises(ValueError):
        parse_media_header(b"\xff\xd8\xff\xe0\x00\x04\x00\x00\xff\xd9")  # no SOF
    with pytest.raises(ValueError):
        parse_media_header(b"RIFF\x04\x00\x00\x00WAVE")  # no fmt/data


def test_synthesize_decode_roundtrip_sparkless():
    """Drive the pandas internals of synthesize/decode without a session."""
    from hadoop_bam_spark.operators import multimodal as mm

    # replicate synthesize_media_payloads' builder logic via parse round trip
    for i in [0, 1, 2, 3, 17, 508, 509, 1000, 123457]:
        w, h = i * 7 % 509 + 1, i * 13 % 509 + 1
        kind = i % 4
        if kind == 0:
            fmt, gw, gh, d = parse_media_header(_png(w, h))
            assert (fmt, gw, gh, d) == ("png", w, h, None)
        elif kind == 1:
            fmt, gw, gh, d = parse_media_header(_jpeg(w, h))
            assert (fmt, gw, gh, d) == ("jpeg", w, h, None)
        elif kind == 2:
            fmt, gw, gh, d = parse_media_header(_gif(w, h))
            assert (fmt, gw, gh, d) == ("gif", w, h, None)
        else:
            ms = i % 1000 + 1
            fmt, gw, gh, d = parse_media_header(_wav(ms * 16))
            assert (fmt, gw, gh, d) == ("wav", None, None, ms)


def test_multimodal_decode_query(spark):
    """End-to-end: synthesized payloads through mapInPandas decode."""
    from tests.conftest import SF_SMOKE

    from hadoop_bam_spark.operators.multimodal import (
        decode_media_meta,
        synthesize_media_payloads,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50)
    out = decode_media_meta(synthesize_media_payloads(docs)).orderBy("doc_id")
    rows = out.collect()
    assert len(rows) == 50
    for r in rows:
        i = r.doc_id
        kind = i % 6
        assert r.format == ["png", "jpeg", "gif", "wav", "mp4", "avi"][kind]
        if kind in (3, 4):  # audio/video without dims
            assert r.width is None and r.height is None
        else:
            assert r.width == i * 7 % 509 + 1
            assert r.height == i * 13 % 509 + 1
        if kind in (3, 4, 5):
            assert r.duration_ms == i % 1000 + 1
        else:
            assert r.duration_ms is None
