"""Multimodal columns (driver north-star extension; SURVEY.md §2.5).

Images/audio/video ride in the same DataFrame as opaque BINARY columns with
typed metadata — parquet keeps binary columnar and the metadata prunable, so
a filter on (modality, byte_len) never touches payload bytes.

The decode step is STUBBED (no image/audio libs in this container): the
Spark-side plumbing — schema, Arrow batch shape, ``mapInPandas`` signature,
partition sizing — is real and tested; ``decode_image_meta`` computes a
deterministic fake decode from the payload so results are verifiable, and
:func:`real_decoder` shows where Pillow/torchaudio would slot in, gated
behind NotImplementedError.

At 100 TB: binary payloads dominate bytes → size partitions by
``spark.sql.files.maxPartitionBytes`` (payload-aware), keep metadata in
separate small row groups, and never explode payloads through a shuffle —
extract features first (map-only), shuffle features.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media binary, modality string, byte_len int, checksum_md5 string"
)

DECODED_SCHEMA = (
    "doc_id bigint, width int, height int, n_pixels bigint, checksum_md5 string"
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat each document's UTF-8 bytes as an opaque media payload
    (the fixtures carry no real images; the column plumbing is identical).
    byte_len/checksum are metadata computed once at ingest — queries
    filter on them without reading payloads."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id"),
        payload.alias("media"),
        F.lit("image/fake").alias("modality"),
        F.length(payload).cast("int").alias("byte_len"),
        F.md5(payload).alias("checksum_md5"),
    )


def decode_image_meta(media: DataFrame) -> DataFrame:
    """'Decode' every payload via mapInPandas — Arrow-batched, zero-copy
    into pandas, the exact shape a Pillow decode would use.

    The fake decode is deterministic arithmetic on byte_len (so the DuckDB
    oracle can verify the plumbing end-to-end):
        width  = byte_len % 640 + 1
        height = byte_len % 480 + 1
        n_pixels = width * height
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blen = pdf["media"].map(len).astype("int64")
            width = (blen % 640 + 1).astype("int32")
            height = (blen % 480 + 1).astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "n_pixels": (width.astype("int64") * height.astype("int64")),
                    "checksum_md5": pdf["checksum_md5"],
                }
            )

    return media.mapInPandas(decode, schema=DECODED_SCHEMA)


def real_decoder(payload: bytes) -> tuple[int, int]:
    """Real image decode — (width, height) via Pillow where it exists.

    The build container ships no imaging libs, so the import gate raises
    NotImplementedError there (honest, not silently faked) and the
    Pillow-path test carries a skip marker; on a cluster image WITH
    Pillow this decodes for real. Same mapInPandas plumbing either way —
    swap this in for decode_image_meta's arithmetic in the batch loop."""
    try:
        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode requires Pillow; this environment ships none — "
            "use decode_image_meta's deterministic fake for plumbing tests"
        ) from exc
    import io

    with Image.open(io.BytesIO(payload)) as im:
        return im.size


def frame_sample_plan(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Video-frame-sampling plumbing: explode a deterministic frame index
    per payload (fake: one frame per 100 bytes), keep every nth — shows the
    explode-then-filter shape a real ffmpeg-based sampler would use, with
    the filter applied BEFORE any decode cost."""
    n_frames = (F.col("byte_len") / F.lit(100)).cast("int") + 1
    return (
        media.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        )
        .filter(F.col("frame_idx") % every_nth == 0)
    )
