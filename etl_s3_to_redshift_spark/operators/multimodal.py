"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs (PIL/ffmpeg absent), so the decode
kernels are STUBS behind import-tries: the Spark-side contract — schema,
partition-preserving mapInPandas signature, Arrow batch shape, metadata
propagation — is real and tested; ``decode_image`` raises
NotImplementedError unless a codec is installed, and
``fake_image_features`` is the deterministic stand-in used by tests/queries.

Scale notes: binary payloads ride the scan (parquet BYTE_ARRAY) and are
processed batch-at-a-time in Arrow — no per-row Python. Metadata-only
transformations (length, hash, mime dispatch) stay in JVM expressions;
only the decode kernel crosses into Python, and it sees ``pandas.Series``
of bytes per batch. Frame sampling happens *inside* the kernel so video
payloads never amplify across the shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def docs_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat the documents table's text bytes as an opaque binary
    payload with metadata — the testdata has no real media column, so this
    produces a real binary-typed DataFrame for the plumbing to chew on."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )


def decode_image(payload: bytes) -> "object":
    """Real decode kernel — requires an image codec, absent here."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as e:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "image decode requires PIL/pillow, not present in this "
            "container; use fake_image_features for the plumbing path"
        ) from e


def has_image_codec() -> bool:
    """True when PIL/pillow is importable — gates the real resize path."""
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _make_feature_fn(dim: int = 8):
    """Factory returning the digest-feature closure. The closure (not a
    module-level function) is what Arrow kernels must capture: cloudpickle
    serializes closures BY VALUE, whereas a module-level function is
    pickled by reference and the executor-side Python worker — whose
    sys.path need not contain this repo — would fail to import it."""

    def feats(payload: bytes) -> list[float]:
        import hashlib

        d = hashlib.sha256(payload).digest()
        return [int.from_bytes(d[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]

    return feats


def fake_image_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a feature extractor: digest-derived
    floats in [0,1). Same signature/shape a real CNN embedding would have."""
    return _make_feature_fn(dim)(payload)


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each batch arrives as a pandas DataFrame with a bytes
    column; the kernel computes per-payload metadata + features and yields
    one output row per input row. Partitioning is preserved — no shuffle.
    """
    feats = _make_feature_fn()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha256": payloads.map(lambda b: hashlib.sha256(b).hexdigest()),
                    "feature": payloads.map(feats),
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing: slice each payload into fixed-size frames
    and keep every n-th, exploding to one row per sampled frame — the shape
    a video pipeline needs (sample inside the kernel; never explode raw
    bytes across a shuffle).
    """

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_nos, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                chunks = [
                    payload[i : i + every_n_bytes]
                    for i in range(0, len(payload), every_n_bytes)
                ][:max_frames]
                for no, chunk in enumerate(chunks):
                    ids.append(mid)
                    frame_nos.append(no)
                    frames.append(chunk)
            yield pd.DataFrame({"media_id": ids, "frame_no": frame_nos, "frame": frames})

    return media.mapInPandas(kernel, schema=out_schema)


def resize_media(media: DataFrame, max_side: int = 256, codec: str = "stub") -> DataFrame:
    """Thumbnail/resize plumbing: payloads whose long side exceeds
    ``max_side`` are scaled down aspect-preserving.

    The split mirrors a real codec op: target dimensions and the target
    byte budget are EXACT JVM integer arithmetic (``a * max_side DIV
    long_side`` — no float rounding, so the metadata contract is
    oracle-checkable to the byte), while only the pixel resample crosses
    into the Arrow kernel.

    ``codec`` selects the kernel body; the Spark plan is identical:
    - ``"stub"`` (default): the deterministic stand-in — truncate the
      payload to the area-scaled byte budget. Oracle-exact, needs no
      codec library; what the registered query uses.
    - ``"pil"``: real decode → resize to the SAME JVM-computed target
      dims → re-encode in the source format via PIL (contract-tested in
      tests/test_streaming_multimodal.py, skipped when pillow is
      absent). Rows whose mime is not image/* pass through untouched.
    - ``"auto"``: ``"pil"`` when pillow imports on the driver, else
      ``"stub"``.

    Input/output schema: (media_id, payload, mime, width, height).
    Rows already within bounds — and rows with unknown (NULL) dimensions,
    which ``docs_as_media`` produces — pass through untouched
    (byte-identical, dims preserved).
    """
    if codec == "auto":
        codec = "pil" if has_image_codec() else "stub"
    if codec not in ("stub", "pil"):
        raise ValueError(f"resize_media: unknown codec {codec!r}")
    if codec == "pil" and not has_image_codec():
        raise NotImplementedError(
            "resize_media(codec='pil') requires PIL/pillow on driver and executors"
        )
    out_schema = MEDIA_SCHEMA

    # NULL-dim rows must take the passthrough branch: `__ls > max_side` is
    # NULL (not false) for them, and when()'s otherwise covers both cases.
    needs = F.col("__ls").isNotNull() & (F.col("__ls") > max_side)
    step = (
        media.withColumn("__w", F.col("width").cast("long"))
        .withColumn("__h", F.col("height").cast("long"))
        .withColumn("__ls", F.greatest("__w", "__h"))
        .withColumn(
            "__nw",
            F.when(
                needs,
                F.greatest(F.lit(1).cast("long"), F.expr(f"__w * {max_side} DIV __ls")),
            ).otherwise(F.col("__w")),
        )
        .withColumn(
            "__nh",
            F.when(
                needs,
                F.greatest(F.lit(1).cast("long"), F.expr(f"__h * {max_side} DIV __ls")),
            ).otherwise(F.col("__h")),
        )
        .withColumn(
            "__tgt",
            F.when(
                needs,
                F.greatest(
                    F.lit(1).cast("long"),
                    F.expr(
                        "CAST(octet_length(payload) AS BIGINT) * (__nw * __nh)"
                        " DIV (__w * __h)"
                    ),
                ),
            ).otherwise(F.octet_length("payload").cast("long")),
        )
    )

    use_pil = codec == "pil"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if use_pil:
            import io

            from PIL import Image

        def one(p, mime, w, nw, nh, tgt):
            data = bytes(p)
            if not use_pil:
                return data[: int(tgt)]
            if not (isinstance(mime, str) and mime.startswith("image/")):
                return data
            # pandas renders nullable-long NULLs as NaN (not None), so the
            # unknown-dims passthrough must test pd.isna, not `is None`
            if pd.isna(w) or pd.isna(nw) or int(nw) == int(w):
                return data  # within bounds or unknown dims: byte-identical
            img = Image.open(io.BytesIO(data))
            fmt = img.format or "PNG"
            # the JVM already fixed the exact integer target dims — the
            # kernel only resamples pixels, keeping the metadata contract
            out = io.BytesIO()
            img.resize((int(nw), int(nh))).save(out, format=fmt)
            return out.getvalue()

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        one(p, m, w, nw, nh, t)
                        for p, m, w, nw, nh, t in zip(
                            pdf["payload"], pdf["mime"], pdf["__w"],
                            pdf["__nw"], pdf["__nh"], pdf["__tgt"],
                        )
                    ],
                    "mime": pdf["mime"],
                    # nullable Int32: NULL dims survive the Arrow round-trip
                    "width": pdf["__nw"].astype("Int32"),
                    "height": pdf["__nh"].astype("Int32"),
                }
            )

    cols = ["media_id", "payload", "mime", "__w", "__nw", "__nh", "__tgt"]
    return step.select(*cols).mapInPandas(kernel, schema=out_schema)


def audio_windows(
    media: DataFrame, window_samples: int = 64, max_windows: int = 16
) -> DataFrame:
    """Audio plumbing: interpret each payload as 16-bit little-endian PCM
    mono (the honest stand-in for a codec decode — a real pipeline swaps
    in ffmpeg behind the same kernel signature) and emit per-window RMS
    and peak amplitude — the levels/VAD-style features an audio curation
    pass computes before any model sees the waveform.

    One row per (media_id, window_no); the trailing partial window keeps
    its true ``n_samples``; a trailing odd byte is dropped (int16 frames).
    RMS is rounded to 6 dp from an exact integer sum of squares, so the
    value is engine-portable (the oracle reproduces it from the byte
    codes in SQL).

    Scale shape: windowing happens INSIDE the Arrow kernel (numpy
    frombuffer + reshape — one vectorized pass per batch, no per-row
    Python), so raw payload bytes never amplify across a shuffle; the
    output is metadata-sized (windows × 4 small columns). Partitioning
    preserved — zero shuffles.
    """
    import math

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("window_no", T.IntegerType()),
            T.StructField("n_samples", T.IntegerType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("peak", T.IntegerType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, wnos, ns, rmss, peaks = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                usable = len(payload) // 2 * 2
                samples = np.frombuffer(payload[:usable], dtype="<i2").astype("int64")
                for wno in range(
                    min(math.ceil(len(samples) / window_samples), max_windows)
                ):
                    w = samples[wno * window_samples : (wno + 1) * window_samples]
                    ids.append(mid)
                    wnos.append(wno)
                    ns.append(len(w))
                    rmss.append(round(math.sqrt(int(np.dot(w, w)) / len(w)), 6))
                    peaks.append(int(np.abs(w).max()))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "window_no": pd.Series(wnos, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "rms": pd.Series(rmss, dtype="float64"),
                    "peak": pd.Series(peaks, dtype="int32"),
                }
            )

    return media.mapInPandas(kernel, schema=out_schema)
