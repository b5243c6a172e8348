"""Byte-exact fixtures for the real container-header decoder
(datapipe/mediahdr.py) — built independently here with struct.pack so
the test cannot share the parser's offset arithmetic."""

from __future__ import annotations

import struct
import zlib

from sagan_spark.datapipe.mediahdr import (
    header_decode,
    parse_gif,
    parse_jpeg,
    parse_media_header,
    parse_png,
    parse_wav,
)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def make_png(w: int, h: int, frames: int | None = None) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if frames is not None:
        out += _png_chunk(b"acTL", struct.pack(">II", frames, 0))
    out += _png_chunk(b"IDAT", b"\x00" * 10) + _png_chunk(b"IEND", b"")
    return out


def make_jpeg(w: int, h: int, progressive: bool = False) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    sof = (
        sof_marker
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x01\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + dqt + sof + b"\xff\xd9"


def make_gif(w: int, h: int, frames: int) -> bytes:
    out = b"GIF89a" + struct.pack("<HH", w, h)
    out += bytes([0x80 | 0x00, 0, 0])  # packed: GCT present, size 2^(0+1)=2
    out += b"\x00" * (3 * 2)  # global color table, 2 entries
    for _ in range(frames):
        # graphic control extension (label 0xF9, one 4-byte sub-block)
        out += b"\x21\xf9\x04" + b"\x00" * 4 + b"\x00"
        # image descriptor, no local color table
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += b"\x02" + b"\x02\x4c\x01" + b"\x00"  # LZW min + one sub-block
    return out + b"\x3b"


def make_wav(channels: int, rate: int, bits: int, nsamples: int) -> bytes:
    data_len = nsamples * channels * (bits // 8)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * bits // 8,
                      channels * bits // 8, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", data_len) + b"\x00" * data_len
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_png_dimensions():
    assert parse_png(make_png(640, 480)) == ("png", 640, 480, 1)
    assert parse_png(make_png(1, 99999)) == ("png", 1, 99999, 1)


def test_png_apng_frames():
    assert parse_png(make_png(320, 240, frames=12)) == ("png", 320, 240, 12)


def test_jpeg_baseline_and_progressive():
    assert parse_jpeg(make_jpeg(800, 600)) == ("jpeg", 800, 600, 1)
    assert parse_jpeg(make_jpeg(31, 17, progressive=True)) == ("jpeg", 31, 17, 1)


def test_jpeg_skips_restart_markers():
    # RSTn between segments must not desync the marker walk
    raw = make_jpeg(64, 32)
    patched = raw[:2] + b"\xff\xd0" + raw[2:]
    assert parse_jpeg(patched) == ("jpeg", 64, 32, 1)


def test_jpeg_skips_fill_bytes():
    # runs of 0xFF between segments are legal padding (ITU T.81
    # §B.1.1.2); without the skip the real marker byte is read as the
    # segment-length high byte and the walk desyncs (ADVICE r4)
    raw = make_jpeg(120, 90)
    for pad in (b"\xff", b"\xff\xff\xff"):
        patched = raw[:2] + pad + raw[2:]  # before APP0
        assert parse_jpeg(patched) == ("jpeg", 120, 90, 1)
        sof_at = raw.index(b"\xff\xc0")
        patched = raw[:sof_at] + pad + raw[sof_at:]  # right before SOF0
        assert parse_jpeg(patched) == ("jpeg", 120, 90, 1)


def test_gif_frame_walk():
    assert parse_gif(make_gif(10, 20, frames=1)) == ("gif", 10, 20, 1)
    assert parse_gif(make_gif(500, 400, frames=7)) == ("gif", 500, 400, 7)


def test_wav_sample_frames():
    assert parse_wav(make_wav(2, 44100, 16, 44100)) == ("wav", 0, 0, 44100)
    assert parse_wav(make_wav(1, 8000, 8, 123)) == ("wav", 0, 0, 123)


def test_sniffer_dispatch_and_fallback():
    assert parse_media_header(make_gif(3, 4, 1)).fmt == "gif"
    assert parse_media_header(b"<html><body>hi</body></html>") is None
    # truncated/corrupt containers must not raise (None is fine)
    for blob in (make_png(9, 9)[:10], make_jpeg(5, 5)[:3], b"RIFF\x00\x00"):
        assert parse_media_header(blob) is None


def test_header_decode_seam_contract():
    # real container → real header numbers
    assert header_decode(make_png(111, 222), "00" * 16) == (111, 222, 1)
    # non-media bytes → the labeled deterministic fake (plumbing keeps
    # flowing; oracle-comparable)
    from sagan_spark.datapipe.multimodal import _fake_decode

    blob = b"not a container"
    assert header_decode(blob, "ab" * 16) == _fake_decode(blob, "ab" * 16)


def test_media_features_real_decode_end_to_end(spark):
    """Real container bytes through the FULL media_features plumbing
    (Arrow mapInPandas, pruned (url, html) scan) with the header
    decoder on the seam — dimensions come out of the actual bytes."""
    from sagan_spark.datapipe.multimodal import media_features

    rows = [
        ("u/png", make_png(640, 480)),
        ("u/apng", make_png(320, 240, frames=5)),
        ("u/gif", make_gif(12, 34, frames=3)),
        ("u/wav", make_wav(2, 44100, 16, 1000)),
        ("u/jpeg", make_jpeg(800, 600)),
        ("u/html", b"<html><body>not media</body></html>"),
    ]
    df = spark.createDataFrame(rows, schema="url string, html binary")
    got = {
        r["url"]: (r["width"], r["height"], r["n_frames"])
        for r in media_features(df, decoder=header_decode).collect()
    }
    assert got["u/png"] == (640, 480, 1)
    assert got["u/apng"] == (320, 240, 5)
    assert got["u/gif"] == (12, 34, 3)
    assert got["u/wav"] == (0, 0, 1000)
    assert got["u/jpeg"] == (800, 600, 1)
    # non-media payloads fall back to the labeled fake — same numbers
    # the DuckDB oracle computes for the pages-table query
    from sagan_spark.datapipe.multimodal import _fake_decode
    import hashlib

    blob = rows[5][1]
    assert got["u/html"] == _fake_decode(blob, hashlib.md5(blob).hexdigest())
