"""Real media container-header decoding — pure byte arithmetic, no
media libraries (none exist in this container; see multimodal.py).

What a 100 TB training-data pipeline actually needs from "decode" at
the *filtering* stage is container metadata — format, dimensions,
frame/sample counts — to size batches, drop corrupt rows, and route by
modality BEFORE paying for a full pixel/sample decode.  All of that
lives in fixed-layout headers parseable with ``struct``:

  * PNG  — IHDR chunk: width/height (big-endian u32s at bytes 16..24);
    animated PNG (acTL chunk) carries ``num_frames``.
  * JPEG — SOFn marker segment (C0/C1/C2/C3/C5..CF minus C4/C8/CC):
    height/width as big-endian u16s; baseline vs progressive from the
    marker id.
  * GIF  — logical screen descriptor: width/height little-endian u16s
    at bytes 6..10; frame count = number of image descriptors (0x2C
    introducer blocks walked via their LZW sub-block chain).
  * WAV  — RIFF fmt chunk: channels / sample rate / bits per sample;
    ``data`` chunk size → sample count ("n_frames" for audio).

The PIXEL decode (and resize / frame-sample) still requires a codec
library and stays behind the injection seam in multimodal.py — but
header parsing is the real thing, verified against byte-exact
fixtures built independently with ``struct.pack`` in
tests/test_mediahdr.py, and driver-verified end-to-end by the
``multimodal_header_roundtrip`` queries()/oracle pair below.
"""

from __future__ import annotations

import struct
from typing import NamedTuple


class MediaHeader(NamedTuple):
    fmt: str  # png | jpeg | gif | wav | unknown
    width: int  # pixels (wav: 0)
    height: int  # pixels (wav: 0)
    n_frames: int  # images: frame count; wav: sample frames


_JPEG_SOF = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}  # SOF0..SOF15 minus DHT/JPG/DAC


def parse_png(b: bytes) -> MediaHeader | None:
    # 8-byte signature, then the IHDR chunk MUST be first:
    # len(4) 'IHDR'(4) width(4,BE) height(4,BE) ...
    if len(b) < 24 or b[:8] != b"\x89PNG\r\n\x1a\n" or b[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", b[16:24])
    # APNG: an acTL chunk (before the first IDAT) carries num_frames;
    # chunk walk: [len u32][type 4][data len][crc 4]
    frames = 1
    off = 8
    while off + 8 <= len(b):
        (clen,) = struct.unpack(">I", b[off : off + 4])
        ctype = b[off + 4 : off + 8]
        if ctype == b"acTL" and off + 12 <= len(b):
            (frames,) = struct.unpack(">I", b[off + 8 : off + 12])
            break
        if ctype in (b"IDAT", b"IEND"):
            break
        off += 12 + clen
    return MediaHeader("png", w, h, max(1, frames))


def parse_jpeg(b: bytes) -> MediaHeader | None:
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    off = 2
    while off + 4 <= len(b):
        if b[off] != 0xFF:
            return None  # desynced — corrupt stream
        # runs of 0xFF are legal fill/padding between segments (ITU
        # T.81 §B.1.1.2): skip them, else the real marker byte would be
        # read as a segment length (ADVICE r4)
        while off + 4 <= len(b) and b[off + 1] == 0xFF:
            off += 1
        if off + 4 > len(b):
            return None
        marker = b[off + 1]
        if marker == 0xD9:  # EOI before any SOF
            return None
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # standalone RSTn/TEM
            off += 2
            continue
        (seglen,) = struct.unpack(">H", b[off + 2 : off + 4])
        if marker in _JPEG_SOF:
            if off + 9 > len(b):
                return None
            h, w = struct.unpack(">HH", b[off + 5 : off + 9])
            return MediaHeader("jpeg", w, h, 1)
        off += 2 + seglen
    return None


def parse_gif(b: bytes) -> MediaHeader | None:
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", b[6:10])
    # frame count: walk the block stream counting image descriptors.
    # Global color table size from the packed LSD byte.
    packed = b[10]
    off = 13
    if packed & 0x80:
        off += 3 * (2 << (packed & 0x07))
    frames = 0
    n = len(b)
    while off < n:
        intro = b[off]
        if intro == 0x3B:  # trailer
            break
        if intro == 0x21:  # extension: label + sub-blocks
            off += 2
            while off < n and b[off] != 0:
                off += 1 + b[off]
            off += 1
        elif intro == 0x2C:  # image descriptor
            frames += 1
            if off + 10 > n:
                break
            ipacked = b[off + 9]
            off += 10
            if ipacked & 0x80:
                off += 3 * (2 << (ipacked & 0x07))
            off += 1  # LZW min code size
            while off < n and b[off] != 0:
                off += 1 + b[off]
            off += 1
        else:
            break  # corrupt
    return MediaHeader("gif", w, h, max(1, frames))


def parse_wav(b: bytes) -> MediaHeader | None:
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    off = 12
    channels = bits = 0
    sample_frames = 0
    n = len(b)
    while off + 8 <= n:
        cid = b[off : off + 4]
        (clen,) = struct.unpack("<I", b[off + 4 : off + 8])
        if cid == b"fmt " and off + 24 <= n:
            channels, _rate = struct.unpack("<HI", b[off + 10 : off + 16])
            (bits,) = struct.unpack("<H", b[off + 22 : off + 24])
        elif cid == b"data" and channels and bits:
            sample_frames = clen // max(1, channels * (bits // 8))
        off += 8 + clen + (clen & 1)  # chunks are u16-aligned
    if not channels:
        return None
    return MediaHeader("wav", 0, 0, max(1, sample_frames))


_SNIFFERS = (parse_png, parse_jpeg, parse_gif, parse_wav)


def parse_media_header(b: bytes) -> MediaHeader | None:
    """Sniff + parse: returns None when the payload is none of the
    supported containers (caller decides the fallback — multimodal.py
    falls back to its labeled deterministic fake so non-media bytes
    keep flowing through the same plumbing)."""
    for p in _SNIFFERS:
        hdr = p(b)
        if hdr is not None:
            return hdr
    return None


def header_decode(payload: bytes, md5hex: str) -> tuple[int, int, int]:
    """Drop-in for multimodal.media_features' decoder seam: REAL header
    parse when the bytes are a recognized container, else the labeled
    deterministic fake (multimodal._fake_decode) so arbitrary binary
    payloads — like the html stand-in column — keep the plumbing
    verifiable end-to-end against the DuckDB oracle."""
    hdr = parse_media_header(payload)
    if hdr is not None:
        return hdr.width, hdr.height, hdr.n_frames
    from sagan_spark.datapipe.multimodal import _fake_decode

    return _fake_decode(payload, md5hex)


# ---------------------------------------------------------------------------
# Driver-verified round-trip: synthesize REAL container bytes from
# integer fields, parse them back through the media_features plumbing,
# and let the DuckDB oracle recompute the expected dimensions from the
# same fields.  The bytes cross synth → Arrow → parser; any offset /
# endianness / chunk-walk error in the REAL decoders breaks the match.
# ---------------------------------------------------------------------------

SYNTH_SCHEMA = "url string, html binary"


def _synth_one(doc_id: int) -> bytes:
    import struct as _s
    import zlib as _z

    w = 1 + doc_id % 1920
    h = 1 + (doc_id * 7) % 1080
    fr = 1 + doc_id % 24
    fmt = doc_id % 4
    if fmt == 0:  # APNG with fr frames
        def chunk(ctype: bytes, data: bytes) -> bytes:
            return (
                _s.pack(">I", len(data))
                + ctype
                + data
                + _s.pack(">I", _z.crc32(ctype + data) & 0xFFFFFFFF)
            )

        ihdr = _s.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"acTL", _s.pack(">II", fr, 0))
            + chunk(b"IDAT", b"\x00" * 8)
            + chunk(b"IEND", b"")
        )
    if fmt == 1:  # baseline JPEG
        app0 = b"\xff\xe0" + _s.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        sof = (
            b"\xff\xc0"
            + _s.pack(">H", 11)
            + b"\x08"
            + _s.pack(">HH", h, w)
            + b"\x01\x01\x11\x00"
        )
        return b"\xff\xd8" + app0 + sof + b"\xff\xd9"
    if fmt == 2:  # GIF with fr image descriptors
        out = b"GIF89a" + _s.pack("<HH", w, h) + b"\x00\x00\x00"
        for _ in range(fr):
            out += b"\x2c" + _s.pack("<HHHH", 0, 0, w, h) + b"\x00"
            out += b"\x02" + b"\x02\x4c\x01" + b"\x00"
        return out + b"\x3b"
    # WAV: stereo 16-bit, (1 + doc_id % 999) sample frames
    ns = 1 + doc_id % 999
    data_len = ns * 2 * 2
    fmtc = _s.pack("<HHIIHH", 1, 2, 8000, 8000 * 4, 4, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + _s.pack("<I", len(fmtc))
        + fmtc
        + b"data"
        + _s.pack("<I", data_len)
        + b"\x00" * data_len
    )
    return b"RIFF" + _s.pack("<I", len(body)) + body


def synth_media_df(docs):
    """documents → (url=doc_id, html=real container bytes); format
    cycles png/jpeg/gif/wav by ``doc_id % 4``.  mapInPandas keeps the
    synthesis Arrow-batched (same crossing discipline as the decoder)."""
    from collections.abc import Iterator

    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "url": ids.astype(str),
                    "html": [ _synth_one(int(i)) for i in ids ],
                }
            )

    return docs.select("doc_id").mapInPandas(batches, schema=SYNTH_SCHEMA)


def header_roundtrip(docs):
    """The queries() surface: synth real bytes → REAL header parse via
    the media_features seam → (url, width, height, n_frames)."""
    from sagan_spark.datapipe.multimodal import media_features

    return media_features(synth_media_df(docs), decoder=header_decode).select(
        "url", "width", "height", "n_frames"
    )


def header_roundtrip_sql() -> str:
    """Oracle twin: the dimensions the parsers MUST recover, computed
    arithmetically from doc_id (independent route — no byte parsing)."""
    return (
        "SELECT CAST(doc_id AS VARCHAR) AS url, "
        "CAST(CASE WHEN doc_id % 4 = 3 THEN 0 ELSE 1 + doc_id % 1920 END AS BIGINT) AS width, "
        "CAST(CASE WHEN doc_id % 4 = 3 THEN 0 ELSE 1 + (doc_id * 7) % 1080 END AS BIGINT) AS height, "
        "CAST(CASE doc_id % 4 WHEN 0 THEN 1 + doc_id % 24 WHEN 1 THEN 1 "
        "WHEN 2 THEN 1 + doc_id % 24 ELSE 1 + doc_id % 999 END AS BIGINT) AS n_frames "
        "FROM documents"
    )
