"""Multimodal columns: image/audio/video as opaque ``binary`` with
typed metadata, decode/feature-extract as Arrow-batched UDFs over
``mapInPandas``.

The pages table's ``html: binary`` column stands in for media bytes.
The Spark-side plumbing — binary column handling, Arrow batch shape,
schema contract, partition passthrough — is REAL and tested; the
*decoder itself* is a clearly-marked deterministic fake because no
image/audio libraries exist in this container (swap ``_fake_decode``
for PIL/ffmpeg in production).  The fake features are pure arithmetic
on (byte length, md5) so the DuckDB oracle can verify the plumbing
end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "url string, media_len long, media_md5 string, width long, height long, "
    "n_frames long"
)


def _fake_decode(payload: bytes, md5hex: str) -> tuple[int, int, int]:
    """STUB decoder (deterministic fake).  Production would be e.g.::

        img = PIL.Image.open(io.BytesIO(payload))   # not in container
        return img.width, img.height, getattr(img, "n_frames", 1)
    """
    n = len(payload)
    width = 64 + (n % 577)
    height = 64 + (int(md5hex[:4], 16) % 521)
    n_frames = 1 + (int(md5hex[4:6], 16) % 7)
    return width, height, n_frames


def media_features(pages: DataFrame, decoder=None) -> DataFrame:
    """mapInPandas over (url, html) → typed media metadata.  Arrow
    batches; only the two needed columns are scanned (column pruning —
    the wide binary column never leaves this stage).

    ``decoder`` is the injection seam: any ``(payload: bytes, md5hex:
    str) -> (width, height, n_frames)`` callable (e.g. a PIL/ffmpeg
    wrapper in production).  Defaults to the clearly-marked
    :func:`_fake_decode`.  The seam is what tests/test_multimodal_seam.py
    pins — the component's contract is the plumbing (schema, Arrow batch
    shape, pruned scan), not the arithmetic of the default stub."""
    decode = decoder or _fake_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            payloads = pdf["html"]
            md5s = payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            feats = [
                decode(bytes(b), h) for b, h in zip(payloads, md5s)
            ]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "media_len": payloads.map(len).astype("int64"),
                    "media_md5": md5s,
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_frames": [f[2] for f in feats],
                }
            )

    return pages.select("url", "html").mapInPandas(batches, schema=MEDIA_SCHEMA)


BATCH_STATS_SCHEMA = "n_rows long, total_bytes long, max_bytes long"


def media_batch_stats(pages: DataFrame) -> DataFrame:
    """One row per Arrow batch: (n_rows, total_bytes, max_bytes) — the
    observable batch-shape contract (rows per batch bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``; bytes are what a
    real decoder's memory footprint scales with)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            lens = pdf["html"].map(len)
            yield pd.DataFrame(
                {
                    "n_rows": [len(pdf)],
                    "total_bytes": [int(lens.sum()) if len(pdf) else 0],
                    "max_bytes": [int(lens.max()) if len(pdf) else 0],
                }
            )

    return pages.select("url", "html").mapInPandas(batches, schema=BATCH_STATS_SCHEMA)


def media_features_sql() -> str:
    """Oracle twin: the html synthesis is ASCII-safe only for byte
    length if we count via the blob — encode() gives the UTF-8 bytes,
    matching Spark's binary length for multi-byte text too."""
    blob = "encode('<html><body>' || text || '</body></html>')"
    # DuckDB md5 only takes VARCHAR; it hashes the UTF-8 bytes, which is
    # exactly Spark's md5(binary) over the encode()d column
    md5 = "md5('<html><body>' || text || '</body></html>')"
    return (
        f"SELECT url, octet_length({blob})::BIGINT AS media_len, {md5} AS media_md5, "
        f"(64 + octet_length({blob}) % 577)::BIGINT AS width, "
        f"(64 + ('0x' || substring({md5}, 1, 4))::BIGINT % 521)::BIGINT AS height, "
        f"(1 + ('0x' || substring({md5}, 5, 2))::BIGINT % 7)::BIGINT AS n_frames "
        "FROM pages"
    )
