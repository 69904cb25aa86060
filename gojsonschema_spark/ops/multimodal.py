"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video travel as opaque ``binary`` columns with a metadata
struct. Decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages — the Spark-side plumbing (schema,
batching, partition sizing) is real and tested; the codec step itself is
STUBBED behind ``decoder=`` (the image/audio libraries are not available
in this container). Pass a real decoder (e.g. PIL/libav-based) in
production; the default deterministic fake keeps pipelines testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["MEDIA_SCHEMA", "attach_media_metadata", "extract_features",
           "stub_decoder"]

MEDIA_SCHEMA = ("payload binary, media_type string, width int, height int, "
                "duration_ms int")

FEATURE_SCHEMA = "key string, feature array<float>, n_bytes int"


def stub_decoder(payload: bytes) -> list[float]:
    """Deterministic fake 'decode + embed': 8 floats from the md5 digest.

    Replace with a real codec in production; raises on None to mirror a
    decoder failing on corrupt input."""
    if payload is None:
        raise ValueError("cannot decode null payload")
    digest = hashlib.md5(payload).digest()
    return [b / 255.0 for b in digest[:8]]


def attach_media_metadata(df: DataFrame, payload_col: str = "payload",
                          media_type: str = "image/png") -> DataFrame:
    from pyspark.sql import functions as F

    return df.select(
        "*",
        F.lit(media_type).alias("media_type"),
        F.length(F.col(payload_col)).alias("n_bytes"),
    )


def extract_features(df: DataFrame, key_col: str = "key",
                     payload_col: str = "payload",
                     decoder: Callable[[bytes], list[float]] = stub_decoder,
                     batch_rows: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas streams column batches through Python; corrupt payloads
    yield feature=NULL rather than failing the job (poison-pill guard a
    100 TB run needs)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            sizes = []
            for payload in pdf[payload_col]:
                try:
                    feats.append(decoder(bytes(payload)))
                except Exception:
                    feats.append(None)
                sizes.append(0 if payload is None else len(payload))
            yield pd.DataFrame({
                "key": pdf[key_col].astype(str),
                "feature": feats,
                "n_bytes": sizes,
            })

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)
