"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Design for image/audio/video at 100 TB:

- the payload is an opaque ``BinaryType`` column; metadata (mime,
  width/height, duration, …) travels in a sibling struct so filters and
  partition pruning never touch the bytes;
- decode / feature-extract / resize / frame-sample run as
  ``mapInPandas`` stages — Arrow-batched, so bytes cross the
  JVM↔Python boundary once per batch, not per row;
- every stage keeps the frame schema explicit (``RETURN_SCHEMA``
  strings below) so downstream Catalyst planning has real types.

The actual codec work (PIL/ffmpeg/soundfile) is STUBBED — those
libraries are not in this container. ``decode_stub=True`` (default)
produces a deterministic fake feature vector from the payload hash so
the plumbing (schema, batching, partitioning) is fully testable;
``decode_stub=False`` raises ``NotImplementedError`` at the point a real
codec would be invoked.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: schema of the metadata struct attached to every multimodal column
METADATA_SCHEMA = "struct<mime:string,n_bytes:bigint,checksum:string>"

#: output schema of :func:`extract_features`
FEATURES_SCHEMA = "id bigint, mime string, n_bytes bigint, feature array<float>"


def attach_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  mime: str = "application/octet-stream") -> DataFrame:
    """Demo payload builder: utf-8 bytes of a text column + metadata.

    In production the binary column arrives from the lakehouse; this
    exists so the pipeline is exercisable on the synthetic tables.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit(mime).alias("mime"),
        F.length(payload).cast("bigint").alias("n_bytes"),
        F.md5(payload).alias("checksum"),
    )
    return df.select(
        F.col(id_col).alias("id"), payload.alias("payload"), meta.alias("meta")
    )


def _fake_feature(payload: bytes, dims: int) -> list[float]:
    """Deterministic stand-in for a real decoder: md5-seeded values."""
    out = []
    h = payload
    while len(out) < dims:
        h = hashlib.md5(h).digest()
        out.extend(b / 255.0 for b in h)
    return [float(x) for x in out[:dims]]


def extract_features(df: DataFrame, dims: int = 16, decode_stub: bool = True,
                     batch_size_hint: int | None = None) -> DataFrame:
    """Decode + featurize binary payloads via Arrow-batched ``mapInPandas``.

    ``df`` must have columns (id, payload, meta) as produced by
    :func:`attach_binary`. Narrow map — no shuffle; parallelism is the
    input partitioning, which the caller sizes so a batch of payloads
    fits executor memory (``spark.sql.files.maxPartitionBytes``).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real codecs (PIL/ffmpeg) are not available in this "
                    "environment; pass decode_stub=True"
                )
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "feature": [_fake_feature(bytes(p), dims) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_images(df: DataFrame, width: int = 64, height: int = 64,
                  decode_stub: bool = True) -> DataFrame:
    """Image resize stage (stubbed): payload → fixed-size payload +
    dimension metadata. The real implementation decodes with PIL and
    re-encodes; the stub emits a deterministic byte string of the
    target size derived from the payload hash, so downstream stages see
    the true post-resize schema and batch shape. Narrow map, bytes
    cross the Arrow boundary once per batch."""

    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "no image codec (PIL) in this environment; pass decode_stub=True"
                )
            out_payloads = []
            for p in pdf["payload"]:
                h = hashlib.md5(bytes(p)).digest()
                reps = target // len(h) + 1
                out_payloads.append((h * reps)[:target])
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "payload": out_payloads,
                    "width": width,
                    "height": height,
                    "n_bytes": [len(p) for p in out_payloads],
                }
            )

    return df.mapInPandas(
        run, schema="id bigint, payload binary, width int, height int, n_bytes bigint"
    )


def audio_window_features(df: DataFrame, window_bytes: int = 32,
                          decode_stub: bool = True) -> DataFrame:
    """Audio windowing stage (stubbed): one row per fixed-size window
    with an energy-like statistic — the 1→N fan-out an STFT/feature
    extractor produces. The stub computes mean byte value per window
    from the raw payload (deterministic); a real implementation decodes
    with soundfile/ffmpeg and emits spectral features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("no audio codec in this environment")
            rows = {"id": [], "window_no": [], "energy": []}
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"])
                n_win = max(1, len(payload) // window_bytes)
                for w_no in range(n_win):
                    chunk = payload[w_no * window_bytes : (w_no + 1) * window_bytes]
                    rows["id"].append(row["id"])
                    rows["window_no"].append(w_no)
                    rows["energy"].append(
                        float(sum(chunk)) / max(len(chunk), 1) / 255.0
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema="id bigint, window_no int, energy double")


def frame_sample(df: DataFrame, every_n: int = 10, decode_stub: bool = True) -> DataFrame:
    """Video frame-sampling stage (stubbed): emits one row per sampled
    frame index with a per-frame checksum. Demonstrates the 1→N row
    fan-out shape (``mapInPandas`` may emit more rows than it receives)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("no video codec in this environment")
            rows = {"id": [], "frame_no": [], "frame_checksum": []}
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"])
                n_frames = max(1, len(payload) // every_n)
                for f_no in range(n_frames):
                    chunk = payload[f_no * every_n : (f_no + 1) * every_n]
                    rows["id"].append(row["id"])
                    rows["frame_no"].append(f_no)
                    rows["frame_checksum"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema="id bigint, frame_no int, frame_checksum string")
