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


def parse_media_header(payload: bytes) -> dict | None:
    """Header-parse stdlib-decodable media formats — REAL parsing, no
    codec libraries: PPM/PGM (P5/P6), BMP, PNG (IHDR), WAV. Returns
    ``{media_type, width, height}`` (audio: width=n_frames,
    height=n_channels) or None if the magic bytes match nothing."""
    import struct

    if payload[:2] in (b"P5", b"P6"):
        try:
            fields, i = [], 2
            while len(fields) < 3:
                while i < len(payload) and payload[i : i + 1].isspace():
                    i += 1
                if payload[i : i + 1] == b"#":  # comment line
                    i = payload.index(b"\n", i) + 1
                    continue
                j = i
                while j < len(payload) and not payload[j : j + 1].isspace():
                    j += 1
                fields.append(int(payload[i:j]))
                i = j
            return {
                "media_type": "image/x-portable-graymap"
                if payload[:2] == b"P5"
                else "image/x-portable-pixmap",
                "width": fields[0],
                "height": fields[1],
            }
        except (ValueError, IndexError):
            return None
    if payload[:2] == b"BM" and len(payload) >= 26:
        w, h = struct.unpack_from("<ii", payload, 18)
        return {"media_type": "image/bmp", "width": w, "height": abs(h)}
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        w, h = struct.unpack_from(">II", payload, 16)
        return {"media_type": "image/png", "width": w, "height": h}
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        import io
        import wave

        try:
            with wave.open(io.BytesIO(payload)) as wf:
                return {
                    "media_type": "audio/wav",
                    "width": wf.getnframes(),
                    "height": wf.getnchannels(),
                }
        except wave.Error:
            return None
    return None


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Build a binary P6 PPM payload (3 bytes/pixel RGB)."""
    if len(pixels) != 3 * width * height:
        raise ValueError("pixels must be 3*width*height bytes")
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """FULL decode of a binary P6 PPM — stdlib only. Returns
    (width, height, rgb_bytes)."""
    hdr = parse_media_header(payload)
    if hdr is None or hdr["media_type"] != "image/x-portable-pixmap":
        raise ValueError("not a P6 PPM payload")
    w, h = hdr["width"], hdr["height"]
    body = payload[-3 * w * h :]
    return w, h, body


def decode_image(payload: bytes):
    """General image decode: PPM decodes natively (stdlib); other
    formats need an image library (PIL) — gated, since codec libs are
    not in this environment. Pipelines swap this for
    PIL/torchvision/ffmpeg."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as e:
        raise NotImplementedError(
            "media decoding beyond PPM requires an image library "
            "(e.g. PIL); not available in this environment"
        ) from e


def media_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas header extraction over binary payloads: every
    payload's magic bytes are parsed (real stdlib parsing for
    PPM/PGM/BMP/PNG/WAV; unknown formats → NULLs)."""
    out_schema = (
        f"{id_col} long, media_type string, width long, height long"
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_media_header(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "media_type": [m["media_type"] if m else None for m in metas],
                    "width": [m["width"] if m else None for m in metas],
                    "height": [m["height"] if m else None for m in metas],
                }
            )

    return df.select(id_col, "payload").mapInPandas(parse, schema=out_schema)


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


def resize_ppm(payload: bytes, factor: int = 2) -> bytes:
    """REAL image resize, stdlib+numpy only: decode a P6 PPM, box-
    average by an integer factor (the mean of each factor×factor tile),
    re-encode. The shape every thumbnail/preprocess stage has — swap
    the codec for PIL/ffmpeg in production, keep the Spark plumbing."""
    import numpy as np

    w, h, body = decode_ppm(payload)
    a = np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)
    if h < factor or w < factor:
        # factor exceeds a dimension: collapse to a single mean pixel
        out = a.reshape(1, -1, 3).mean(axis=1, keepdims=True).astype(np.uint8)
        oh = ow = 1
    else:
        oh, ow = h // factor, w // factor
        out = (
            a[: oh * factor, : ow * factor, :]
            .reshape(oh, factor, ow, factor, 3)
            .mean(axis=(1, 3))
            .astype(np.uint8)
        )
    return encode_ppm(ow, oh, out.tobytes())


def split_ppm_frames(payload: bytes) -> list[bytes]:
    """Split a 'video' payload — concatenated fixed-shape binary P6
    frames — into its frames. Pure header arithmetic, no codecs."""
    frames = []
    i = 0
    while i < len(payload):
        hdr = parse_media_header(payload[i : i + 64])
        if hdr is None:
            raise ValueError(f"bad frame header at offset {i}")
        w, h = hdr["width"], hdr["height"]
        # header ends after the maxval line: find 3rd whitespace-delimited
        # field end, then one whitespace byte
        j, fields = 2 + i, 0
        while fields < 3:
            while payload[j : j + 1].isspace():
                j += 1
            while not payload[j : j + 1].isspace():
                j += 1
            fields += 1
        j += 1  # the single whitespace after maxval
        end = j + 3 * w * h
        frames.append(payload[i:end])
        i = end
    return frames


def sample_frames(payload: bytes, stride: int = 2) -> list[bytes]:
    """Frame sampling: every ``stride``-th frame of a concatenated-PPM
    video payload (the decode→sample→re-emit stage of a video
    pipeline)."""
    return split_ppm_frames(payload)[::stride]
