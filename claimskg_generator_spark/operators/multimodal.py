"""Multimodal column plumbing (training-data pipeline ops).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched functions over ``mapInPandas``.  The actual codec step is
STUBBED (no image/audio libraries in this environment): ``decode_stub``
raises NotImplementedError unless ``fake=True``, in which case it produces
a deterministic fake decode (shape + checksum-derived features) so the
Spark-side plumbing — schema, batching, partitioning — is real and tested.
"""

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),       # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),     # opaque bytes
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload_sha256", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the documents fixture: the
    text bytes stand in for an encoded payload."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
        (F.col("n_chars") % 1920).cast("int").alias("width"),
        (F.col("n_chars") % 1080).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
    )


def decode_stub(payload: bytes, kind: str, fake: bool):
    """Placeholder for the real codec (PIL / ffmpeg / torchaudio).  The
    deterministic fake derives an 8-dim feature from the payload digest."""
    if not fake:
        raise NotImplementedError(
            "media decoding requires codec libraries not present in this "
            "environment; pass fake=True for the deterministic stand-in"
        )
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:8]]


def extract_features(media: DataFrame, fake: bool = True,
                     batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, Arrow batches out.
    Partition-agnostic and deterministic (fake mode)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for batch in batches:
            feats, shas = [], []
            for payload, kind in zip(batch["payload"], batch["kind"]):
                raw = bytes(payload)
                shas.append(hashlib.sha256(raw).hexdigest())
                feats.append(decode_stub(raw, kind, fake))
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "kind": batch["kind"],
                    "payload_sha256": shas,
                    "n_bytes": [len(bytes(p)) for p in batch["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("resized_sha256", T.StringType()),
    ]
)


def resize_stub(payload: bytes, out_w: int, out_h: int, fake: bool) -> str:
    """Placeholder for the real resampler (PIL.Image.resize / ffmpeg
    scale).  The deterministic fake 'resizes' by digesting the payload
    together with the target geometry, so the output is a pure function of
    (payload, out_w, out_h) that an external SQL oracle can replay."""
    if not fake:
        raise NotImplementedError(
            "media resizing requires codec libraries not present in this "
            "environment; pass fake=True for the deterministic stand-in"
        )
    return hashlib.sha256(
        payload + f"|{out_w}x{out_h}".encode()
    ).hexdigest()


def resize_media(media: DataFrame, target_width: int = 512,
                 fake: bool = True) -> DataFrame:
    """mapInPandas resize over image/video rows (audio has no geometry and
    is excluded).  Output geometry is integer-exact — out_w = min(width,
    target), out_h = height * out_w // max(width, 1) — so the aspect-
    preserving math replays identically in SQL (no float rounding-mode
    drift between engines); the decode+resample step itself is the stubbed
    codec (resize_stub)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for batch in batches:
            out_ws, out_hs, digests = [], [], []
            for payload, w, h in zip(batch["payload"], batch["width"],
                                     batch["height"]):
                w0 = max(int(w), 1)
                out_w = min(w0, target_width)
                out_h = int(h) * out_w // w0
                out_ws.append(out_w)
                out_hs.append(out_h)
                digests.append(resize_stub(bytes(payload), out_w, out_h,
                                           fake))
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "kind": batch["kind"],
                    "out_width": out_ws,
                    "out_height": out_hs,
                    "resized_sha256": digests,
                }
            )

    return media.filter(F.col("kind") != "audio").mapInPandas(
        run, schema=RESIZE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame timestamp to decode —
    the explode happens JVM-side; the (stubbed) decode would run per frame
    batch downstream."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("duration_ms"),
                           F.lit(every_ms).cast("long"))
            ).alias("frame_ts_ms"),
        )
    )
