"""Multimodal column plumbing (driver brief): image/audio/video as
opaque binary columns with typed metadata.

The decode step is STUBBED (no image/audio libs in this container):
``decode_stub=True`` produces a deterministic fake decode so the
Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF
signature — is real and tested; ``decode_stub=False`` raises
NotImplementedError at the exact point a real decoder (PIL/ffmpeg)
would plug in.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha256 string, "
    "feat array<float>, frames int"
)


def _fake_decode(payload: bytes, kind: str) -> tuple[list[float], int]:
    """Deterministic stand-in for decode + feature-extract: an 8-dim
    'embedding' from the payload digest and a fake frame count."""
    d = hashlib.sha256(payload).digest()
    feat = [b / 255.0 for b in d[:8]]
    frames = 1 if kind == "image" else 1 + d[8] % 32
    return feat, frames


def extract_media_features(
    media: DataFrame, decode_stub: bool = True, batch_hint: int = 256
) -> DataFrame:
    """media(media_id, kind, payload, ...) -> per-item features.

    One mapInPandas stage; payload bytes move via Arrow. At scale the
    input should be repartitioned so payload bytes per task stay
    bounded (binary columns dominate task size, not row count)."""

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                raw = bytes(payload) if payload is not None else b""
                if decode_stub:
                    feat, frames = _fake_decode(raw, kind)
                else:
                    raise NotImplementedError(
                        "real decode requires PIL/ffmpeg; not in this container"
                    )
                rows.append(
                    (
                        media_id,
                        kind,
                        len(raw),
                        hashlib.sha256(raw).hexdigest(),
                        feat,
                        frames,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "n_bytes", "sha256", "feat", "frames"],
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        fn, schema=FEATURES_SCHEMA
    )


def synthesize_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/benches. Payload bytes
    are the ASCII hex digest repeated (still an opaque ``binary``
    column through the Arrow plumbing, but reproducible by a SQL
    oracle — DuckDB's sha256 only accepts VARCHAR)."""
    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % 3]
                payload = (
                    hashlib.sha256(f"{seed}:{i}".encode()).hexdigest()
                    * (1 + i % 7)
                ).encode("ascii")
                rows.append(
                    (
                        i,
                        kind,
                        payload,
                        {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                        64 + i % 512 if kind != "audio" else None,
                        64 + (i * 3) % 512 if kind != "audio" else None,
                        (i * 97) % 60_000 if kind != "image" else None,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "payload", "mime",
                    "width", "height", "duration_ms",
                ],
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)
