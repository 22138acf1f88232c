"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Images/audio/video ride through Spark as binary columns with a metadata
struct; the engine's job is the plumbing — schema, batch shape,
partition sizing, Arrow transfer — while the actual codecs are pluggable.
The decode layer is pluggable: ``extract_features`` accepts a real codec
(``codec="pil"`` / ``codec="auto"`` / an injected ``opener`` callable);
with none given, ``decode_stub=True`` (default) produces deterministic
fake features from the payload bytes so the full pipeline is testable in
this environment (no imaging/audio libraries installed), and
``decode_stub=False`` raises ``NotImplementedError`` at the plug point
(``extract_frames`` keeps only the stub — video codecs are a heavier
dependency than Pillow and stay a documented plug point).

Scale notes: payloads dominate partition size — ``repartition_for_payloads``
sizes partitions by total bytes, not row count, so a 100 TB image corpus
doesn't OOM executors on row-count-balanced partitions of 10 MB cells.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def binarize_text(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Manufacture a media table from a text corpus (test/dev helper):
    UTF-8 payload bytes + metadata, all JVM-side expressions."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
    )


def repartition_for_payloads(
    df: DataFrame, bytes_col: str = "n_bytes", target_partition_bytes: int = 128 << 20
) -> DataFrame:
    """Repartition so each partition carries ~target bytes of payload.
    Row-count balance is the wrong invariant for multimodal data — a
    partition of 200k thumbnails and a partition of 200k 4K frames differ
    by 1000× in memory."""
    total = df.agg(F.sum(F.col(bytes_col)).alias("b")).collect()[0]["b"] or 0
    n = max(1, int(total // target_partition_bytes) + 1)
    return df.repartition(n)


def _pil_opener(payload: bytes) -> tuple[int | None, int | None]:
    """Real image decode: header-only ``PIL.Image.open`` (lazy — reads
    dimensions without decoding pixel data). Runs on EXECUTORS; the lazy
    import keeps the module importable without Pillow. Undecodable
    payloads yield null dims rather than failing the partition — at crawl
    scale some fraction of media bytes is always corrupt."""
    import io

    from PIL import Image

    try:
        with Image.open(io.BytesIO(payload or b"")) as im:
            return int(im.width), int(im.height)
    except Exception:
        return None, None


def extract_features(
    df: DataFrame,
    decode_stub: bool = True,
    codec: str | None = None,
    opener=None,
) -> DataFrame:
    """Decode payloads → features via Arrow-batched ``mapInPandas``.

    Decode resolution, driver-side so failures are immediate and clear:
    ``opener`` (a ``bytes -> (width|None, height|None)`` callable, shipped
    to executors inside the pickled closure) wins if given; else
    ``codec="pil"`` requires Pillow (ImportError here, not a mid-job
    executor crash), ``codec="auto"`` uses Pillow when importable and
    otherwise falls back to the stub; with neither, ``decode_stub=True``
    derives deterministic pseudo-dimensions from the payload hash and
    ``decode_stub=False`` raises at the plug point. Schema, batching and
    partitioning are identical on every path — swapping the codec never
    changes the plan.
    """
    if opener is None and codec is not None:
        if codec not in ("pil", "auto"):
            raise ValueError(f"unknown codec {codec!r}; use 'pil' or 'auto'")
        try:
            import PIL.Image  # noqa: F401  (probe only; executors re-import)

            opener = _pil_opener
        except ImportError:
            if codec == "pil":
                raise ImportError(
                    "codec='pil' requires Pillow on driver and executors; "
                    "install it or use codec='auto' for stub fallback"
                ) from None
            if not decode_stub:
                # codec='auto' promised a fallback, but the stub is the
                # only one left and the caller disabled it — fail on the
                # DRIVER, not as a NotImplementedError mid-job
                raise ValueError(
                    "codec='auto' with decode_stub=False has no decode "
                    "path when Pillow is absent; enable the stub, install "
                    "Pillow, or inject an opener"
                ) from None

    def _decode_one(payload: bytes) -> tuple[int | None, int | None]:
        if opener is not None:
            return opener(payload)
        if not decode_stub:
            raise NotImplementedError(
                "real media decode requires an imaging/audio codec; "
                "plug one in here (PIL.Image.open / ffmpeg / torchaudio)"
            )
        digest = hashlib.sha256(payload or b"").digest()
        width = 64 + digest[0] % 192   # deterministic fake dims
        height = 64 + digest[1] % 192
        return width, height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            hashes = payloads.map(lambda b: hashlib.sha256(b or b"").hexdigest())
            dims = [_decode_one(b) for b in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "sha256": hashes,
                    # nullable Int32: real codecs emit null dims for
                    # undecodable payloads; Arrow maps it to the same
                    # IntegerType as the stub's plain int32
                    "width": pd.array([d[0] for d in dims], dtype="Int32"),
                    "height": pd.array([d[1] for d in dims], dtype="Int32"),
                }
            )

    from bigdata_etl_customer360_spark.operators.util import fan_out

    return fan_out(df).mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10, id_col: str = "media_id") -> DataFrame:
    """Deterministic 1-in-N sample of media rows (frame-sampling shape for
    video pipelines): pure expression on the id, no RNG state."""
    return df.filter(F.col(id_col) % every_n == 0)


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def png_concat_opener(payload: bytes) -> list[bytes]:
    """Frame opener for the simplest real container: CONCATENATED PNG
    images (the shape ffmpeg's ``image2pipe`` emits). Splits on the PNG
    signature; each segment is one frame's bytes. No imaging library
    needed — signature parsing only — so the REAL-decode path of
    :func:`extract_frames` is exercisable in this sandbox; a production
    pipeline injects an ffmpeg-backed opener with the same signature."""
    payload = payload or b""
    if not payload.startswith(PNG_MAGIC):
        return []
    return [PNG_MAGIC + seg for seg in payload.split(PNG_MAGIC) if seg]


def extract_frames(
    df: DataFrame,
    n_frames: int = 4,
    decode_stub: bool = True,
    opener=None,
) -> DataFrame:
    """Video-style frame sampling: (media_id, frame_idx, frame_bytes,
    frame_sha256) — one output row per sampled frame via Arrow-batched
    ``mapInPandas`` (a Python generator is the natural shape for 1→N row
    expansion with binary payloads).

    ``opener`` (``bytes -> list[bytes]``, shipped inside the pickled
    closure like ``extract_features``'s) is the real-decode plug: it
    returns the container's frames and the operator samples EVENLY down
    to ``n_frames`` when the container holds more (indices
    ``i * n_total // n_frames`` — deterministic keyframe-sampling shape;
    fewer frames pass through unsampled). ``png_concat_opener`` is the
    built-in sandbox-testable instance. Without an opener, the stub
    "decodes" by slicing the payload into ``n_frames`` even byte windows
    (``decode_stub=False`` raises at the plug point). Schema, batching
    and partitioning are identical on every path.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_bytes", BinaryType()),
            StructField("frame_sha256", StringType()),
        ]
    )

    def _frames_of(payload: bytes) -> list[bytes]:
        if opener is not None:
            frames = opener(payload)
            if len(frames) > n_frames:
                n = len(frames)
                frames = [frames[i * n // n_frames] for i in range(n_frames)]
            return frames
        if not decode_stub:
            raise NotImplementedError(
                "real frame extraction requires a video codec (ffmpeg); "
                "inject an opener (e.g. png_concat_opener) or plug one in here"
            )
        payload = payload or b""
        step = max(1, len(payload) // n_frames)
        return [payload[i * step : (i + 1) * step] for i in range(n_frames)]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, hashes = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i, fb in enumerate(_frames_of(payload)):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(fb)
                    hashes.append(hashlib.sha256(fb).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_bytes": frames,
                    "frame_sha256": hashes,
                }
            )

    from bigdata_etl_customer360_spark.operators.util import fan_out

    return fan_out(df).mapInPandas(run, schema=out_schema)


TAR_MEMBER_SCHEMA = StructType(
    [
        StructField("shard", StringType()),
        StructField("member", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)

# extension -> mime for tar members; anything else is opaque bytes
_EXT_MIME = {
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "png": "image/png",
    "gif": "image/gif",
    "txt": "text/plain",
    "json": "application/json",
    "wav": "audio/wav",
    "mp3": "audio/mpeg",
    "mp4": "video/mp4",
}


def expand_tar_shards(
    shards: DataFrame,
    content_col: str = "content",
    path_col: str = "path",
) -> DataFrame:
    """WebDataset-style tar-shard expansion: each input row is one tar
    archive (the ``sources.readers.read_binary`` row shape), each output
    row one REGULAR member — ``(shard, member, payload, n_bytes)``.

    This is the standard multimodal lake layout: millions of small media
    files are packed into ~100 MB-1 GB tar shards so the filesystem sees
    thousands of objects instead of billions, and a distributed read
    stays sequential within each shard. Expansion runs inside
    ``mapInPandas`` — one Python ``tarfile`` pass per shard payload ON
    THE EXECUTOR holding it (no driver round-trip, no shuffle; the
    work parallelizes across shards). ONE output frame is yielded PER
    SHARD (not per Arrow batch), so peak task memory is bounded by a
    single shard's expansion (~2× one shard: blob + extracted members)
    no matter how many shards the scan packed into a batch — at the
    advertised 100 MB-1 GB shard size, accumulating a whole batch
    before yielding would hold every shard's expansion simultaneously
    (r7 ADVICE). Non-regular members (directories, links) are skipped;
    member order inside a shard is preserved as the archive laid it
    out.

    Feed the result to :func:`media_from_tar_members` for the
    ``MEDIA_SCHEMA`` shape that :func:`extract_features` /
    :func:`extract_frames` consume.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return _expand_tar_batches(batches, content_col, path_col)

    return shards.mapInPandas(run, schema=TAR_MEMBER_SCHEMA)


def _expand_tar_batches(
    batches: Iterator[pd.DataFrame], content_col: str, path_col: str
) -> Iterator[pd.DataFrame]:
    """Executor-side generator behind :func:`expand_tar_shards`
    (module-level so the per-shard-yield memory bound is unit-testable)."""
    import io
    import tarfile

    for pdf in batches:
        for path, blob in zip(pdf[path_col], pdf[content_col]):
            members: list[str] = []
            payloads: list[bytes] = []
            sizes: list[int] = []
            with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
                for info in tf:
                    if not info.isreg():
                        continue
                    fh = tf.extractfile(info)
                    data = fh.read() if fh is not None else b""
                    members.append(info.name)
                    payloads.append(data)
                    sizes.append(len(data))
            # per-shard yield bounds peak memory at ONE expanded shard
            yield pd.DataFrame(
                {
                    "shard": pd.Series([path] * len(members), dtype=object),
                    "member": pd.Series(members, dtype=object),
                    "payload": pd.Series(payloads, dtype=object),
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                }
            )


def media_from_tar_members(members: DataFrame) -> DataFrame:
    """Lift expanded tar members into the ``MEDIA_SCHEMA`` shape the
    feature extractors consume: ``media_id`` is ``xxhash64(shard, member)``
    (deterministic, collision-safe at corpus scale for the 64-bit id the
    schema pins), ``mime`` from the member extension (octet-stream when
    unknown). Pure JVM projection — zero Python, zero shuffle."""
    ext = F.lower(F.regexp_extract(F.col("member"), r"\.([A-Za-z0-9]+)$", 1))
    mime = F.lit("application/octet-stream")
    for e, m in _EXT_MIME.items():
        mime = F.when(ext == e, F.lit(m)).otherwise(mime)
    return members.select(
        F.xxhash64(F.col("shard"), F.col("member")).alias("media_id"),
        F.col("payload"),
        mime.alias("mime"),
        F.col("n_bytes"),
    )
