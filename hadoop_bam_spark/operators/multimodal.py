"""Multimodal columns: image/audio/video as opaque binary columns.

Binary payloads travel through Arrow to vectorized Python batches via
``mapInPandas`` with typed metadata structs. Container-header decoding is
REAL and pure-stdlib — :func:`parse_media_header` reads PNG IHDR dims, JPEG
SOFn dims, GIF screen-descriptor dims, BMP dims, WAV fmt/data-chunk
duration, MP4 (ISO-BMFF) mvhd duration, and AVI avih dims+duration straight
from the public container specs. Only pixel/sample-level
decoding (which genuinely needs PIL/opencv/ffmpeg, absent in this
container) remains stubbed behind ``NotImplementedError``.

At 100 TB: binary payloads stay in parquet (never shuffled unless needed),
metadata extraction is a narrow mapInPandas over the scan, and feature
columns are written back columnar. Batch size is controlled by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("magic", T.LongType(), False),
        T.StructField("checksum", T.LongType(), False),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive a deterministic opaque binary column (stand-in for image bytes)."""
    return df.withColumn("payload", F.unhex(F.md5(F.col(text_col))))


def extract_media_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Vectorized metadata extraction over binary payloads via mapInPandas.

    This is the exact plumbing a real decoder plugs into: bytes arrive as
    Python ``bytes`` in Arrow-backed pandas batches; outputs are typed columns.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "magic": payloads.map(lambda b: b[0] if b else 0).astype("int64"),
                    "checksum": payloads.map(lambda b: sum(b) % 65536).astype("int64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(batches, MEDIA_META_SCHEMA)


# ---------------------------------------------------------------------------
# Real container-header parsers (pure stdlib, public format specs)
# ---------------------------------------------------------------------------

MEDIA_DIMS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

#: JPEG start-of-frame markers that carry dimensions (SOF0..SOF15 minus
#: DHT/JPG/DAC which share the 0xC0 nibble but aren't frames).
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def parse_media_header(b: bytes):
    """(format, width, height, duration_ms) from container header bytes.

    Pure-stdlib parsers for the public container specs:
    - PNG: 8-byte signature, IHDR width/height big-endian at offsets 16/20;
    - JPEG: segment walk to the first SOFn marker (height, width follow the
      3-byte segment header + precision byte);
    - GIF: 'GIF87a'/'GIF89a' + little-endian logical screen w/h;
    - BMP: 'BM' + BITMAPINFOHEADER signed dims at offsets 18/22;
    - WAV: RIFF/WAVE chunk walk — fmt byte_rate + data size -> duration.

    Raises ``ValueError`` on a recognized-but-truncated container and
    ``NotImplementedError`` for genuinely unknown magics (the only stub
    left: pixel/sample decode of formats beyond these).
    """
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n":
        if b[12:16] != b"IHDR":
            raise ValueError("PNG without leading IHDR chunk")
        w, h = struct.unpack_from(">II", b, 16)
        return "png", w, h, None
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        p = 2
        while p + 4 <= len(b):
            if b[p] != 0xFF:
                raise ValueError("JPEG segment desync")
            marker = b[p + 1]
            if marker in _JPEG_SOF:
                if p + 9 > len(b):
                    raise ValueError("truncated JPEG SOF")
                h, w = struct.unpack_from(">HH", b, p + 5)
                return "jpeg", w, h, None
            if marker == 0xD9:  # EOI before any SOF
                break
            (seglen,) = struct.unpack_from(">H", b, p + 2)
            p += 2 + seglen
        raise ValueError("JPEG without SOF dimensions")
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack_from("<HH", b, 6)
        return "gif", w, h, None
    if len(b) >= 26 and b[:2] == b"BM":
        w, h = struct.unpack_from("<ii", b, 18)
        return "bmp", w, abs(h), None
    if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        p = 12
        byte_rate = None
        data_size = None
        while p + 8 <= len(b):
            cid = b[p : p + 4]
            (csize,) = struct.unpack_from("<I", b, p + 4)
            if cid == b"fmt " and p + 24 <= len(b):
                (byte_rate,) = struct.unpack_from("<I", b, p + 16)
            elif cid == b"data":
                data_size = csize
            p += 8 + csize + (csize & 1)  # chunks are word-aligned
        if byte_rate and data_size is not None:
            return "wav", None, None, data_size * 1000 // byte_rate
        raise ValueError("WAV without fmt/data chunks")
    if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        # AVI main header: LIST/hdrl -> avih (56-byte AVIMAINHEADER):
        # dwMicroSecPerFrame@0, dwTotalFrames@16, dwWidth@32, dwHeight@36
        p = 12
        while p + 8 <= len(b):
            cid = b[p : p + 4]
            (csize,) = struct.unpack_from("<I", b, p + 4)
            if cid == b"LIST":
                p += 12  # descend past the list type fourcc
                continue
            if cid == b"avih":
                if p + 8 + 40 > len(b):
                    raise ValueError("truncated AVI avih header")
                usec_pf, = struct.unpack_from("<I", b, p + 8)
                frames, = struct.unpack_from("<I", b, p + 24)
                w, h = struct.unpack_from("<II", b, p + 40)
                return "avi", w, h, frames * usec_pf // 1000
            p += 8 + csize + (csize & 1)
        raise ValueError("AVI without avih header")
    if len(b) >= 12 and b[4:8] == b"ftyp":
        # ISO BMFF (MP4/MOV): walk top-level boxes to moov, then to mvhd;
        # duration = mvhd duration / timescale (v0 32-bit, v1 64-bit)
        p = 0
        while p + 8 <= len(b):
            (size,) = struct.unpack_from(">I", b, p)
            box = b[p + 4 : p + 8]
            if size < 8:
                raise ValueError("bad ISO-BMFF box size")
            if box == b"moov":
                q = p + 8
                end = min(p + size, len(b))
                while q + 8 <= end:
                    (s2,) = struct.unpack_from(">I", b, q)
                    if b[q + 4 : q + 8] == b"mvhd":
                        ver = b[q + 8]
                        if ver == 1:
                            (ts,) = struct.unpack_from(">I", b, q + 28)
                            (dur,) = struct.unpack_from(">Q", b, q + 32)
                        else:
                            ts, dur = struct.unpack_from(">II", b, q + 20)
                        if not ts:
                            raise ValueError("MP4 mvhd timescale 0")
                        return "mp4", None, None, dur * 1000 // ts
                    if s2 < 8:
                        raise ValueError("bad ISO-BMFF box size")
                    q += s2
                raise ValueError("MP4 moov without mvhd")
            p += size
        raise ValueError("MP4 without moov box")
    raise NotImplementedError(
        f"unknown media container (magic {b[:8]!r}); only PNG/JPEG/GIF/BMP/"
        "WAV/AVI/MP4 headers are parsed without external media libraries"
    )


def decode_media_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
    on_unknown: str = "null",
) -> DataFrame:
    """Vectorized REAL header decode over binary payloads via mapInPandas.

    ``on_unknown='null'`` maps unparseable payloads to a null row (the
    100 TB-friendly default — one bad object must not kill a stage);
    ``'error'`` re-raises, for strict pipelines.
    """
    if on_unknown not in ("null", "error"):
        raise ValueError("on_unknown must be 'null' or 'error'")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "format": [], "width": [], "height": [],
                   "duration_ms": []}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    fmt, w, h, dur = parse_media_header(bytes(payload))
                except (ValueError, NotImplementedError):
                    if on_unknown == "error":
                        raise
                    fmt = w = h = dur = None
                out["doc_id"].append(doc_id)
                out["format"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["duration_ms"].append(dur)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(batches, MEDIA_DIMS_SCHEMA)


def synthesize_media_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic VALID media containers derived from doc_id — PNG, JPEG,
    GIF, WAV, MP4, and AVI built byte-for-byte to their public specs (dims
    (id*7)%509+1 x (id*13)%509+1; durations (id%1000)+1 ms). Gives the real
    parsers true containers to decode without shipping media files, and
    gives the SQL oracle a closed-form expectation."""

    @F.pandas_udf(T.BinaryType())
    def build(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            w = i * 7 % 509 + 1
            h = i * 13 % 509 + 1
            kind = i % 6
            if kind == 0:  # PNG: signature + IHDR + empty IDAT + IEND
                ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
                out.append(
                    b"\x89PNG\r\n\x1a\n"
                    + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00" * 4
                    + struct.pack(">I", 0) + b"IDAT" + b"\x00" * 4
                    + struct.pack(">I", 0) + b"IEND" + b"\x00" * 4
                )
            elif kind == 1:  # JPEG: SOI + APP0(JFIF) + SOF0 + EOI
                app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
                sof = (b"\x08" + struct.pack(">HH", h, w)
                       + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01")
                out.append(
                    b"\xff\xd8"
                    + b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
                    + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
                    + b"\xff\xd9"
                )
            elif kind == 2:  # GIF89a: screen descriptor + trailer
                out.append(
                    b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00\x3b"
                )
            elif kind == 3:  # WAV: PCM mono 8 kHz 16-bit -> byte_rate 16000
                data_size = (i % 1000 + 1) * 16  # -> (i % 1000 + 1) ms
                out.append(
                    b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE"
                    + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
                    + b"data" + struct.pack("<I", data_size) + b"\x00" * data_size
                )
            elif kind == 4:  # MP4: ftyp + moov/mvhd v0, timescale 1000
                dur = i % 1000 + 1  # ms == mvhd units at timescale 1000
                mvhd = (
                    struct.pack(">I", 108) + b"mvhd" + b"\x00" * 4  # v0+flags
                    + struct.pack(">II", 0, 0)            # ctime/mtime
                    + struct.pack(">II", 1000, dur)       # timescale/duration
                    + b"\x00" * 80                        # rate..next_track
                )
                out.append(
                    struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4
                    + struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
                )
            else:  # AVI: LIST/hdrl with avih; 1000 us/frame, 1 frame == 1 ms
                frames = i % 1000 + 1
                avih = struct.pack(
                    "<IIIIIIIIII", 1000, 0, 0, 0, frames, 0, 1, 0, w, h
                ) + b"\x00" * 16
                hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
                out.append(
                    b"RIFF" + struct.pack("<I", 4 + 8 + len(hdrl)) + b"AVI "
                    + b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
                )
        return pd.Series(out)

    return df.withColumn("payload", build(F.col(id_col)))


def decode_image_batch(payloads: pd.Series, fake: bool = True) -> pd.DataFrame:
    """STUB image decode. ``fake=True`` yields deterministic pseudo-features
    (so pipelines are testable); a real decode needs PIL/opencv, absent here.
    """
    if not fake:
        raise NotImplementedError(
            "Real image decoding requires PIL/opencv, not available in this "
            "environment. Run with fake=True for deterministic pseudo-features."
        )
    return pd.DataFrame(
        {
            "width": payloads.map(lambda b: 1 + b[0] % 64 if b else 0),
            "height": payloads.map(lambda b: 1 + b[1] % 64 if len(b) > 1 else 0),
            "mean_px": payloads.map(lambda b: (sum(b) / len(b)) if b else 0.0),
        }
    )


def frame_sample_indices(n_frames: pd.Series, every: int = 10) -> pd.Series:
    """Deterministic frame-sampling plan for video payloads (indices only —
    decoding is stubbed)."""
    return n_frames.map(lambda n: list(range(0, int(n), every)))


def frame_sample_plan(
    df: DataFrame, every: int = 10, id_col: str = "doc_id"
) -> DataFrame:
    """Video frame-sampling plan over decoded container metadata: one row
    per VIDEO document with the deterministic every-``every`` frame index
    list (decode of the frames themselves is the PIL/av-gated stub; the
    Spark-side plumbing — schema, Arrow batch shape, per-partition
    mapInPandas — is real). AVI synth containers run at 1 frame/ms, so
    n_frames == duration_ms."""
    import pyspark.sql.types as T

    meta = decode_media_meta(df, id_col=id_col)
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_sampled", T.LongType()),
        T.StructField("first_idx", T.LongType()),
        T.StructField("last_idx", T.LongType()),
        T.StructField("sample_indices", T.ArrayType(T.LongType())),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vid = pdf[pdf["format"] == "avi"]
            n = vid["duration_ms"].astype("int64")  # 1 frame == 1 ms
            idx = frame_sample_indices(n, every=every)
            yield pd.DataFrame({
                id_col: vid[id_col].astype("int64"),
                "n_frames": n,
                "n_sampled": idx.map(len).astype("int64"),
                "first_idx": idx.map(lambda v: v[0] if v else -1).astype("int64"),
                "last_idx": idx.map(lambda v: v[-1] if v else -1).astype("int64"),
                "sample_indices": idx,
            })

    return meta.mapInPandas(batches, schema)


def resize_plan(
    df: DataFrame, box: int = 224, id_col: str = "doc_id"
) -> DataFrame:
    """Aspect-preserving fit-into-``box`` resize plan over decoded image
    metadata (integer math so engines agree bit-for-bit: out dims =
    dim * box // max(w, h), never upscaled; the pixel resample itself is
    the PIL-gated stub)."""
    import pyspark.sql.types as T

    meta = decode_media_meta(df, id_col=id_col)
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("downscaled", T.BooleanType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            img = pdf[pdf["format"].isin(["png", "jpeg", "gif"])]
            w = img["width"].astype("int64")
            h = img["height"].astype("int64")
            m = w.combine(h, max)
            scale_needed = m > box
            out_w = (w * box // m).where(scale_needed, w).clip(lower=1)
            out_h = (h * box // m).where(scale_needed, h).clip(lower=1)
            yield pd.DataFrame({
                id_col: img[id_col].astype("int64"),
                "format": img["format"],
                "width": w.astype("int32"),
                "height": h.astype("int32"),
                "out_w": out_w.astype("int32"),
                "out_h": out_h.astype("int32"),
                "downscaled": scale_needed,
            })

    return meta.mapInPandas(batches, schema)
