"""Multimodal columns (beyond-reference): image/audio/video as opaque
``binary`` payloads with typed metadata, processed by Arrow-batched
``mapInPandas`` operators.

The Spark-side plumbing — schema, partition sizing, UDF signatures,
batch shapes — is real and tested; the actual media DECODE step is
stubbed (the image/audio codec libraries are not in this environment):
``decode_image`` raises ``NotImplementedError`` unless PIL is
importable, and ``extract_features`` uses a deterministic fake
featurizer so the distributed pipeline is exercisable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: metadata columns attached to every payload
META_SCHEMA = "payload binary, n_bytes long, content_hash string, media_type string"

FEATURE_DIM = 8


def attach_binary(df: DataFrame, source_col: str, media_type: str = "text/plain") -> DataFrame:
    """Wrap a column as an opaque binary payload + typed metadata —
    the ingestion shape for media blobs (real pipelines read the bytes
    from object-store URIs; the metadata/partitioning story is the same).
    """
    payload = F.encode(F.col(source_col), "UTF-8")
    return df.select(
        "*",
        payload.alias("payload"),
        F.octet_length(F.col(source_col)).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("content_hash"),
        F.lit(media_type).alias("media_type"),
    )


def decode_image(payload: bytes):
    """The real decode step — stubbed: codec libs are not available
    here. Pipelines swap this for PIL/torchvision/ffmpeg."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as e:
        raise NotImplementedError(
            "media decoding requires an image library (e.g. PIL); "
            "not available in this environment"
        ) from e


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in featurizer: bytes → FEATURE_DIM floats.
    Keeps the distributed plumbing testable without codecs."""
    if not payload:
        return [0.0] * FEATURE_DIM
    step = max(1, len(payload) // FEATURE_DIM)
    return [
        float(sum(payload[i * step : (i + 1) * step]) % 1000) / 1000.0
        for i in range(FEATURE_DIM)
    ]


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each batch arrives as a pandas DataFrame; the UDF
    returns (id, n_bytes, features). Partition sizing note: media rows
    are large — upstream should ``repartition`` so a batch of payloads
    fits executor memory (spark.sql.execution.arrow.maxRecordsPerBatch
    caps batch rows)."""
    out_schema = f"{id_col} long, n_bytes long, features array<double>"

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": pdf["payload"].map(len),
                    "features": pdf["payload"].map(_fake_features),
                }
            )

    return df.select(id_col, "payload").mapInPandas(featurize, schema=out_schema)
