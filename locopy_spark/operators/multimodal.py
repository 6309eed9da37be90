"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` payload columns plus a typed metadata
struct. The Spark-side machinery — schema, Arrow batch shape,
``mapInPandas`` decode stage, partition sizing — is real and tested;
the actual codec call is stubbed (``decode_stub``) because no
image/audio libraries ship in this container. Swap ``_fake_decode``
for a real decoder (PIL/librosa/av) without touching the plan.

Scale notes: payloads are large — keep them out of shuffles. The
decode stage is a narrow ``mapInPandas`` (no shuffle); downstream
aggregations should ``select`` away the payload first.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_FIELDS = "width int, height int, n_channels int, decoder string"

DECODED_SCHEMA_SUFFIX = (
    "payload_md5 string, byte_len int, "
    + DECODED_FIELDS
)


def attach_payload(
    docs: DataFrame, text_col: str = "text", mime: str = "text/plain"
) -> DataFrame:
    """Wrap a source column as a binary payload + metadata struct."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.expr("octet_length(payload)").alias("byte_len"),
            F.expr("md5(payload)").alias("payload_md5"),
        ),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic stand-in for a real media decoder.

    Derives fake dimensions from the payload digest so tests are
    stable. A real deployment replaces ONLY this function.
    """
    digest = hashlib.md5(payload).digest()
    width = 64 + digest[0] * 4
    height = 64 + digest[1] * 4
    channels = 1 + digest[2] % 4
    return width, height, channels, "stub"


def frame_sample(
    media: DataFrame,
    id_col: str = "doc_id",
    frame_bytes: int = 64,
    step: int = 4,
) -> DataFrame:
    """Sample every ``step``-th fixed-size frame from a binary payload.

    The video-pipeline shape: payload → frame offsets → sampled chunks,
    computed entirely JVM-side (sequence + substring on binary — no
    Python, no shuffle; one row per sampled frame). A real container
    format would parse frame boundaries in the decode stage; fixed-size
    chunking is the plumbing contract.
    """
    nf = f"(octet_length(payload) + {frame_bytes - 1}) div {frame_bytes}"
    # an EMPTY payload has zero frames: Spark's sequence(0, -1, step)
    # raises on the inverted bounds, so clamp the upper bound and drop
    # the resulting zero-length placeholder frame — matching DuckDB's
    # range(0, 0, step) which is simply empty
    frames = (
        f"transform(sequence(0, greatest(cast({nf} as int) - 1, 0), {step}),"
        " i -> "
        f"named_struct("
        f"'frame_idx', i, "
        f"'frame_md5', md5(substring(payload, i * {frame_bytes} + 1, {frame_bytes})), "
        f"'frame_len', octet_length(substring(payload, i * {frame_bytes} + 1, {frame_bytes}))))"
    )
    return (
        media.select(id_col, F.explode(F.expr(frames)).alias("f"))
        .select(
            id_col,
            F.col("f.frame_idx").alias("frame_idx"),
            F.col("f.frame_md5").alias("frame_md5"),
            F.col("f.frame_len").alias("frame_len"),
        )
        .filter("frame_len > 0")
    )


FEATURE_DIM = 16


def feature_extract(
    media: DataFrame, id_col: str = "doc_id", dim: int = FEATURE_DIM
) -> DataFrame:
    """Arrow-batched feature extraction: payload → ``array<float>``.

    The embedding-encoder stage of a multimodal pipeline. The feature
    here is an L1-normalized high-nibble byte histogram — deterministic
    and computed vectorized with numpy per Arrow batch — standing in
    for a model forward pass. The UDF signature, batch shape, and the
    downstream ``array<float>`` column contract are exactly what a real
    encoder needs; swap the histogram for the model call only. Narrow
    stage: no shuffle, payload never leaves the scan partition.
    """
    import numpy as np

    schema = f"{id_col} long, feature array<float>, feat_l2 double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            # whole-batch vectorization (forward-pass shape): one buffer
            # concat + a single segmented bincount — no per-row Python.
            payloads = [bytes(p) for p in pdf["payload"]]
            lens = np.fromiter(
                (len(p) for p in payloads), dtype=np.int64, count=n
            )
            buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            row_ids = np.repeat(np.arange(n, dtype=np.int64), lens)
            hist = np.bincount(
                row_ids * dim + (buf >> 4), minlength=n * dim
            ).reshape(n, dim)
            sums = hist.sum(axis=1, keepdims=True)
            vec = hist / np.where(sums == 0, 1, sums)  # exact int/int div
            norms = np.sqrt((vec * vec).sum(axis=1))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "feature": list(vec.astype(np.float32)),
                    "feat_l2": norms,
                }
            )

    return media.select(id_col, "payload").mapInPandas(run, schema)


def resize_stub(
    media: DataFrame, id_col: str = "doc_id", max_dim: int = 256
) -> DataFrame:
    """Resize stage: decode dims → aspect-preserving scale to
    ``max_dim`` → deterministic fake resized-payload digest.

    The geometry (scale factor, output dims, no-upscale clamp) is real;
    only the pixel resample is stubbed — a real deployment replaces the
    digest line with the codec call. Single narrow ``mapInPandas``
    stage fused with decode: payload bytes cross into Python once.
    Rounding is floor(x + 0.5) — half-up, engine-portable — rather than
    Python's banker's ``round``, so the DuckDB oracle can reproduce the
    output dims exactly.
    """
    schema = (
        f"{id_col} long, width int, height int, out_w int, out_h int, "
        "scale double, resized_md5 string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            # per-item loop is the real shape here: a codec resample
            # (PIL/av) is a per-item call, not batch-vectorizable
            for rid, payload in zip(pdf[id_col], pdf["payload"]):
                data = bytes(payload)
                w, h, _, _ = _fake_decode(data)
                scale = min(1.0, max_dim / max(w, h))
                ow = max(1, int(w * scale + 0.5))
                oh = max(1, int(h * scale + 0.5))
                digest = hashlib.md5(
                    data + f"{ow}x{oh}".encode()
                ).hexdigest()
                rows.append((rid, w, h, ow, oh, scale, digest))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "width", "height", "out_w", "out_h",
                    "scale", "resized_md5",
                ],
            )

    return media.select(id_col, "payload").mapInPandas(run, schema)


def decode_stub(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched decode stage: (id, payload) → decoded features.

    ``mapInPandas`` keeps the payload bytes inside one Arrow batch per
    partition — no per-row Python round-trips, no shuffle.
    """
    schema = f"{id_col} long, {DECODED_SCHEMA_SUFFIX}"

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            # per-item loop is the real shape here: image/audio decode
            # is a per-item codec call, not batch-vectorizable
            for rid, payload in zip(pdf[id_col], pdf["payload"]):
                data = bytes(payload)
                w, h, c, dec = _fake_decode(data)
                rows.append(
                    (
                        rid,
                        hashlib.md5(data).hexdigest(),
                        len(data),
                        w,
                        h,
                        c,
                        dec,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    "payload_md5",
                    "byte_len",
                    "width",
                    "height",
                    "n_channels",
                    "decoder",
                ],
            )

    return media.select(id_col, "payload").mapInPandas(decode_batches, schema)
