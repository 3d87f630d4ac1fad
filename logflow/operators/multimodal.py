"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a ``kind`` tag
and a metadata struct — the 100 TB layout where payload bytes stay
columnar (parquet binary, never decoded until an explicit operator asks).

Decode/feature ops run as Arrow-batched ``mapInPandas`` so payload bytes
cross into Python once per batch, not per row.  The actual codec step is
STUBBED: the image/audio libraries are not in this container, so
``decode`` raises NotImplementedError unless PIL/soundfile import, and
``fake_features`` provides a deterministic stand-in (byte statistics) that
exercises the full Spark plumbing — schema, batching, partitioning — which
is the part that must be right at scale.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, mean_byte double, feature_dim long"

try:  # real decoders, if ever present
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into the media frame (test fixture):
    payload = utf-8 bytes, kind assigned round-robin by id."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("doc_id"), 3) + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.length("text").cast("long").alias("content_length"),
        ).alias("meta"),
    )


def decode_image(media: DataFrame) -> DataFrame:
    """Real image decode — requires PIL (not available in this container)."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL; use fake_features() for plumbing tests"
        )
    raise NotImplementedError("real decoder intentionally out of scope in this environment")


def fake_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Deterministic stand-in feature extraction over Arrow batches.

    Computes per-payload byte statistics — same batch shape, schema flow,
    and partitioning a real decoder would use (swap the body for
    PIL/torchvision when available).
    """
    import pandas as pd

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "mean_byte": payloads.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                    "feature_dim": pdf["kind"].map(
                        {"image": 2048, "audio": 512, "video": 4096}
                    ).astype("int64"),
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64, frame_len: int = 8) -> DataFrame:
    """'Frame sampling' for video payloads: every n-th byte window, as a
    pure Spark expression (no Python) — the columnar slice pattern."""
    n = (F.length("payload") / every_n_bytes).cast("int")
    make = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.substring(F.col("payload"), (i - 1) * every_n_bytes + 1, frame_len),
    )
    # guard: sequence(1, 0) DESCENDS in Spark — short payloads get no frames
    frames = F.when(n >= 1, make).otherwise(F.array().cast("array<binary>"))
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        frames.alias("frames"),
        F.size(frames).cast("long").alias("n_frames"),
    )
