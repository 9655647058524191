"""Multimodal (image / audio / video) column handling.

Media assets are **opaque ``binary`` columns with typed metadata** — the
pattern a 100 TB training-data pipeline needs: the driver never interprets
pixels; Spark moves blobs between stages columnar-Arrow-batched, and the
only Python that touches bytes runs vectorized inside ``mapInPandas``.

Because this container ships no image/audio codecs (no PIL / soundfile /
ffmpeg), the *codec* step is a clearly marked STUB: ``decode_media`` uses a
deterministic fake decode (raw uint8 interpretation of the blob against the
declared geometry) and ``_real_decode`` raises ``NotImplementedError``.
Everything around the codec — the media schema, blob synthesis, batch
shapes, partitioning, feature extraction, resize, frame sampling — is real
and tested (tests/test_multimodal.py), so swapping in a real codec is a
one-function change.

Design notes for scale:

- blobs ride in the DataFrame as ``BinaryType``; nothing ever collects them
  to the driver;
- all per-media work is ``mapInPandas`` (Arrow batches, zero-copy into
  numpy ``frombuffer``), never row-at-a-time Python UDFs;
- outputs are fixed-width feature rows / frame rows, so downstream joins
  and aggregations shuffle sketches, not media bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical media table schema: one row per asset, typed metadata struct.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("blob", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("channels", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

_KIND_FORMAT = {"image": "gray8", "audio": "pcm8", "video": "rawvideo"}

#: Deterministic synthetic blob: ``md5(text) || md5(text||'|1') .. ||'|7'``
#: truncated to ``64 + (doc_id % 4) * 16`` bytes — variable lengths exercise
#: the padding/truncation paths, and the hex construction is reproducible in
#: plain SQL for the DuckDB oracle.
NUM_BLOB_CHUNKS = 8


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a deterministic media table from ``documents``.

    Stands in for a real asset store (parquet with a binary column or a
    blob-store manifest); the blob bytes are a pure function of the source
    text so every engine can re-derive them.
    """
    from queue_system_simulator_spark.schema import load_table

    docs = load_table(spark, sf_dir, "documents")
    hex_chunks = [F.md5("text")] + [
        F.md5(F.concat(F.col("text"), F.lit(f"|{i}")))
        for i in range(1, NUM_BLOB_CHUNKS)
    ]
    n_bytes = (F.lit(64) + (F.col("doc_id") % 4) * 16).cast("int")
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    fmt = (
        F.when(F.col("kind") == "image", _KIND_FORMAT["image"])
        .when(F.col("kind") == "audio", _KIND_FORMAT["audio"])
        .otherwise(_KIND_FORMAT["video"])
    )
    return (
        docs.select(
            F.col("doc_id").alias("media_id"),
            kind.alias("kind"),
            F.unhex(
                F.substring(F.concat(*hex_chunks), 1, 2 * 112)
            ).alias("fullblob"),
            n_bytes.alias("n_bytes"),
        )
        .select(
            "media_id",
            "kind",
            F.expr("substring(fullblob, 1, n_bytes)").alias("blob"),
            F.struct(
                F.lit(16).alias("width"),
                (F.col("n_bytes") / 16).cast("int").alias("height"),
                F.lit(1).alias("channels"),
                fmt.alias("format"),
                F.lit(4).alias("n_frames"),
            ).alias("meta"),
        )
    )


def _real_decode(blob: bytes, fmt: str) -> np.ndarray:
    """Real codec hook — **STUB**: this container has no image/audio codecs.

    Swap in ``PIL.Image.open`` / ``soundfile.read`` / pyav here when the
    runtime ships them; the surrounding plumbing (schemas, batching,
    geometry handling) does not change.
    """
    raise NotImplementedError(
        f"no codec available for format {fmt!r}: install PIL/soundfile/pyav "
        "and wire them into _real_decode"
    )


def _fake_decode(blob: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decode: raw uint8 samples shaped to the declared
    geometry, truncating extra bytes / zero-padding short blobs."""
    want = width * height
    px = np.frombuffer(blob, dtype=np.uint8)[:want]
    if px.size < want:
        px = np.pad(px, (0, want - px.size))
    return px.reshape(height, width)


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.IntegerType())),
    ]
)


def decode_media(media: DataFrame) -> DataFrame:
    """blob + meta → row-major pixel/sample grid (``mapInPandas``).

    Uses the deterministic fake decode (see module docstring); batch shape
    is one output row per input row, pixel payload as a flat array column.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pixels = [
                _fake_decode(b, m["width"], m["height"]).ravel()
                for b, m in zip(pdf["blob"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "height": [m["height"] for m in pdf["meta"]],
                    "width": [m["width"] for m in pdf["meta"]],
                    "pixels": pixels,
                }
            )

    return media.mapInPandas(batches, DECODED_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sum_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("min_byte", T.LongType()),
        T.StructField("max_byte", T.LongType()),
        T.StructField("hist_0", T.LongType()),
        T.StructField("hist_1", T.LongType()),
        T.StructField("hist_2", T.LongType()),
        T.StructField("hist_3", T.LongType()),
    ]
)


def extract_features(media: DataFrame) -> DataFrame:
    """Per-asset byte statistics + 4-bin histogram (``mapInPandas``).

    Integer sums → the rounded mean is exact-rational, so the result is
    engine-portable (DuckDB oracle in plans/multimodal_queries.py).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, kind, blob in zip(pdf["media_id"], pdf["kind"], pdf["blob"]):
                a = np.frombuffer(blob, dtype=np.uint8)
                hist = np.bincount(a >> 6, minlength=4)
                rows.append(
                    (
                        mid,
                        kind,
                        int(a.size),
                        int(a.sum()),
                        round(float(a.sum()) / a.size, 6),
                        int(a.min()),
                        int(a.max()),
                        int(hist[0]),
                        int(hist[1]),
                        int(hist[2]),
                        int(hist[3]),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA])

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def extract_features_arrow(media: DataFrame) -> DataFrame:
    """``mapInArrow`` twin of :func:`extract_features`: operates on raw
    ``pyarrow.RecordBatch`` objects — skips the Arrow→pandas conversion
    entirely, the lowest-overhead Python hop Spark offers.  Byte-identical
    results to the pandas path (tests/test_multimodal.py)."""
    import pyarrow as pa

    def batches(it):
        for rb in it:
            ids = rb.column(rb.schema.get_field_index("media_id"))
            kinds = rb.column(rb.schema.get_field_index("kind"))
            blobs = rb.column(rb.schema.get_field_index("blob"))
            rows = {name: [] for name in [f.name for f in FEATURE_SCHEMA]}
            for mid, kind, blob in zip(
                ids.to_pylist(), kinds.to_pylist(), blobs.to_pylist()
            ):
                a = np.frombuffer(blob, dtype=np.uint8)
                hist = np.bincount(a >> 6, minlength=4)
                vals = (
                    mid,
                    kind,
                    int(a.size),
                    int(a.sum()),
                    round(float(a.sum()) / a.size, 6),
                    int(a.min()),
                    int(a.max()),
                    int(hist[0]),
                    int(hist[1]),
                    int(hist[2]),
                    int(hist[3]),
                )
                for name, v in zip(rows, vals):
                    rows[name].append(v)
            yield pa.RecordBatch.from_pydict(rows)

    return media.mapInArrow(batches, FEATURE_SCHEMA)


def resize_media(decoded: DataFrame, out_width: int, out_height: int) -> DataFrame:
    """Nearest-neighbor resample of the decoded grid to a fixed geometry
    (the 'make every image 224×224' pipeline step), vectorized numpy per
    Arrow batch."""

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("pixels", T.ArrayType(T.IntegerType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, kind, h, w, px in zip(
                pdf["media_id"], pdf["kind"], pdf["height"], pdf["width"], pdf["pixels"]
            ):
                grid = np.asarray(px, dtype=np.uint8).reshape(h, w)
                rows_idx = (np.arange(out_height) * h) // out_height
                cols_idx = (np.arange(out_width) * w) // out_width
                out.append(grid[np.ix_(rows_idx, cols_idx)].ravel())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "height": out_height,
                    "width": out_width,
                    "pixels": out,
                }
            )

    return decoded.mapInPandas(batches, out_schema)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Split each video blob into ``meta.n_frames`` equal frames and keep
    every ``every_n``-th (frame-sampling for video training sets).  One
    input row fans out to ≤ n_frames rows — bounded, shuffle-safe."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, blob, m in zip(pdf["media_id"], pdf["blob"], pdf["meta"]):
                n = m["n_frames"]
                step = max(len(blob) // n, 1)
                for fi in range(0, n, every_n):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(bytes(blob[fi * step : (fi + 1) * step]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.filter(F.col("kind") == "video").mapInPandas(batches, FRAME_SCHEMA)


AUDIO_WINDOWS = 4

AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("window_idx", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sum_amp", T.LongType()),
        T.StructField("max_amp", T.LongType()),
        T.StructField("n_loud", T.LongType()),
    ]
)


def audio_window_stats(media: DataFrame, n_windows: int = AUDIO_WINDOWS) -> DataFrame:
    """Windowed amplitude statistics over audio assets (``mapInPandas``).

    The deterministic stand-in for framed DSP feature extraction (RMS/
    loudness per window): samples are the blob's unsigned bytes, split
    into ``n_windows`` equal windows (tail remainder dropped, as a fixed
    frame size would).  All-integer outputs → engine-portable, oracle in
    plans/multimodal_queries.py re-derives them from the hex string.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                a = np.frombuffer(blob, dtype=np.uint8)
                wlen = a.size // n_windows
                if wlen == 0:
                    continue
                w = a[: n_windows * wlen].reshape(n_windows, wlen).astype(np.int64)
                for i in range(n_windows):
                    rows.append(
                        (
                            mid,
                            i,
                            int(wlen),
                            int(w[i].sum()),
                            int(w[i].max()),
                            int((w[i] >= 192).sum()),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_WINDOW_SCHEMA]
            )

    return media.filter("kind = 'audio'").mapInPandas(batches, AUDIO_WINDOW_SCHEMA)


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("h1", T.LongType()),
        T.StructField("h2", T.LongType()),
    ]
)


def perceptual_ahash(media: DataFrame) -> DataFrame:
    """Average-hash (aHash) over each image's first 64 pixels as an 8x8
    grid — the perceptual-dedup signature stage (``mapInPandas``).

    bit_i = pixel_i * 64 > sum(pixels): the integer cross-multiplied form
    of "pixel above mean", exact on both engines (no float mean).  The 64
    bits pack into two 32-bit halves (h1 = bits 0-31, h2 = bits 32-63) so
    no shift ever reaches the BIGINT sign bit.  With a real codec the
    fake-decode byte grid becomes the downsampled luma plane; the
    signature, banding, and verify stages are unchanged.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, kind, blob in zip(
                pdf["media_id"], pdf["kind"], pdf["blob"]
            ):
                if kind != "image":
                    continue
                a = np.frombuffer(blob, dtype=np.uint8)[:64].astype(np.int64)
                s = int(a.sum())
                bits = (a * 64 > s).astype(np.int64)
                h1 = int((bits[:32] << np.arange(32)).sum())
                h2 = int((bits[32:] << np.arange(32)).sum())
                rows.append((int(mid), h1, h2))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AHASH_SCHEMA.fields]
            )

    return media.filter("kind = 'image'").mapInPandas(batches, AHASH_SCHEMA)
