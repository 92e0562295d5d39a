"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + a typed metadata struct; the
Spark-side plumbing (schemas, magic sniffing, Arrow batch shapes,
mapInPandas signatures, partitioning) is real and tested. The codec
step is RUNTIME-DETECTED per executor: when the decode library
imports (PIL for images, soundfile for audio), ``decode_*`` extracts
real features (_pil_image_features / _sf_audio_features); when it
does not — this container ships neither — a clearly-marked
deterministic md5 fake runs instead, and ``strict=True`` raises
``NotImplementedError`` rather than faking. On an equipped cluster
nothing needs forking: the same call decodes for real.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
    ]
)

_MAGIC = {
    "89504e47": "png",
    "ffd8ffe0": "jpeg",
    "ffd8ffe1": "jpeg",
    "52494646": "riff",  # wav/avi container
    "1a45dfa3": "mkv",
    "00000018": "mp4",
    "00000020": "mp4",
}


def media_metadata(col: Column | str) -> Column:
    """Typed metadata struct for a binary media column — all JVM-side
    (magic sniff via hex prefix, size, content hash)."""
    c = F.col(col) if isinstance(col, str) else col
    magic = F.lower(F.hex(F.substring(c, 1, 4)))
    fmt = F.lit(None).cast("string")
    for m, name in _MAGIC.items():
        fmt = F.when(magic == m, F.lit(name)).otherwise(fmt)
    return F.struct(
        fmt.alias("format"),
        F.length(c).cast("long").alias("n_bytes"),
        F.sha2(c, 256).alias("sha256"),
    )


IMAGE_FEATURES_SCHEMA = "id long, width int, height int, mean_luma double, feature array<float>"


def _fake_image_features(blob: bytes, feat_dim: int) -> tuple[int, int, float, np.ndarray]:
    """Deterministic fake decoder (container has no image libs): derives
    stable pseudo-features from md5 of the bytes. CLEARLY A STUB — swap
    for a PIL/torchvision decode on a real cluster. md5-derived (not
    pandas-hash) so an INDEPENDENT engine can replay the derivation and
    value-oracle the mapInPandas plumbing end-to-end; feature values
    are integers in [-2048, 2048) (exact in float32 and in any SQL
    engine's cast)."""
    import hashlib

    hhex = hashlib.md5(blob).hexdigest()
    width = 16 + int(hhex[0:8], 16) % 1024
    height = 16 + int(hhex[8:16], 16) % 1024
    mean_luma = (int(hhex[16:24], 16) % 256000) / 1000.0
    feats = np.array(
        [
            (int(hashlib.md5(f"{hhex}|{j}".encode()).hexdigest()[:8], 16) % 4096)
            - 2048
            for j in range(feat_dim)
        ],
        dtype=np.float32,
    )
    return width, height, mean_luma, feats


def _pil_image_features(
    blob: bytes, feat_dim: int
) -> tuple[int, int, float, np.ndarray]:
    """REAL decode (runs when PIL imports on the cluster): grayscale
    mean luma + a coarse-grid mean-intensity feature vector (resize to
    a g×g grid, g = ceil(sqrt(feat_dim)), row-major first feat_dim
    cells) — the standard cheap perceptual embedding."""
    import io
    import math

    import PIL.Image

    img = PIL.Image.open(io.BytesIO(blob))
    w, h = img.size
    gray = img.convert("L")
    arr = np.asarray(gray, dtype=np.float32)
    mean_luma = float(arr.mean()) if arr.size else 0.0
    g = max(1, math.ceil(math.sqrt(feat_dim)))
    small = np.asarray(
        gray.resize((g, g)), dtype=np.float32
    ).reshape(-1)[:feat_dim]
    if small.shape[0] < feat_dim:
        small = np.pad(small, (0, feat_dim - small.shape[0]))
    return w, h, mean_luma, small.astype(np.float32)


def decode_image_features(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    feat_dim: int = 16,
    strict: bool = False,
) -> DataFrame:
    """mapInPandas image decode → (dims, luma, feature vector).

    Real pipeline shape: Arrow batches of binary blobs into the Python
    worker, numpy feature extraction, columnar out. The codec is
    RUNTIME-DETECTED per executor: when PIL imports, blobs decode for
    real (_pil_image_features); otherwise — and for any blob PIL
    cannot parse in non-strict mode — the clearly-marked deterministic
    md5 stub runs (_fake_image_features). ``strict=True`` raises
    NotImplementedError up front when PIL is absent, and re-raises
    per-blob decode errors instead of falling back."""
    try:
        import PIL.Image  # noqa: F401

        has_pil = True
    except Exception:
        has_pil = False
    if strict and not has_pil:
        raise NotImplementedError(
            "image decode requires PIL, not present in this container"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:  # executor-side detection (may differ from the driver)
            import PIL.Image  # noqa: F401

            pil_here = True
        except Exception:
            pil_here = False
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(blob or b"")
                if pil_here:
                    try:
                        w, h, luma, feats = _pil_image_features(b, feat_dim)
                    except NotImplementedError:
                        raise
                    except Exception:
                        if strict:
                            raise
                        w, h, luma, feats = _fake_image_features(b, feat_dim)
                else:
                    w, h, luma, feats = _fake_image_features(b, feat_dim)
                rows.append((int(i), w, h, luma, feats.tolist()))
            yield pd.DataFrame(
                rows, columns=["id", "width", "height", "mean_luma", "feature"]
            )

    return df.select(id_col, binary_col).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def frame_sample(
    df: DataFrame, binary_col: str, id_col: str, every_n_bytes: int = 4096
) -> DataFrame:
    """'Frame sampling' plumbing for video blobs: emits one row per
    sampled offset with a slice hash (stub for keyframe extraction —
    the partitioning/explode shape is the real part). frame_id is
    value-keyed (xxhash64 of id + offset), so it is stable under task
    retry/repartitioning — unlike monotonically_increasing_id."""
    c = F.col(binary_col)
    n = F.length(c)
    offs = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes))
    return df.select(
        F.col(id_col),
        F.explode(offs).alias("frame_offset"),
        n.alias("n_bytes"),
    ).withColumn("frame_id", F.xxhash64(F.col(id_col), F.col("frame_offset")))


AUDIO_FEATURES_SCHEMA = (
    "id long, n_samples long, sample_rate int, duration_s double, rms double"
)


def _fake_audio_features(blob: bytes) -> tuple[int, int, float, float]:
    """Deterministic fake decoder (container has no audio libs —
    librosa/soundfile absent). CLEARLY A STUB: derives stable pseudo-
    features from md5 of the bytes (engine-replayable, same rationale
    as _fake_image_features); swap for a real PCM decode on a
    cluster."""
    import hashlib

    hhex = hashlib.md5(blob).hexdigest()
    sample_rate = [8000, 16000, 22050, 44100][int(hhex[0:2], 16) % 4]
    n_samples = len(blob) * 4 + int(hhex[2:8], 16) % 1000
    rms = (int(hhex[8:16], 16) % 10000) / 10000.0
    return n_samples, sample_rate, n_samples / sample_rate, rms


def _sf_audio_features(blob: bytes) -> tuple[int, int, float, float]:
    """REAL decode (runs when soundfile imports on the cluster):
    sample count / rate from the container header, RMS over all
    channels of the float32 PCM."""
    import io
    import math

    import soundfile as sf

    data, sr = sf.read(io.BytesIO(blob), dtype="float32")
    n = int(data.shape[0])
    rms = float(math.sqrt(float(np.mean(np.square(data))))) if n else 0.0
    return n, int(sr), (n / sr if sr else 0.0), rms


def decode_audio_features(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    strict: bool = False,
) -> DataFrame:
    """mapInPandas audio decode → (sample count, rate, duration, rms).
    Same Arrow-batch plumbing shape as decode_image_features, same
    runtime codec detection: soundfile decodes for real when present
    (_sf_audio_features), the md5 stub runs otherwise or on per-blob
    parse failure in non-strict mode; ``strict=True`` raises instead
    of falling back."""
    try:
        import soundfile  # noqa: F401

        has_codec = True
    except Exception:
        has_codec = False
    if strict and not has_codec:
        raise NotImplementedError(
            "audio decode requires soundfile/librosa, not present in this container"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import soundfile  # noqa: F401

            sf_here = True
        except Exception:
            sf_here = False
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(blob or b"")
                if sf_here:
                    try:
                        n, sr, dur, rms = _sf_audio_features(b)
                    except Exception:
                        if strict:
                            raise
                        n, sr, dur, rms = _fake_audio_features(b)
                else:
                    n, sr, dur, rms = _fake_audio_features(b)
                rows.append((int(i), n, sr, dur, rms))
            yield pd.DataFrame(
                rows, columns=["id", "n_samples", "sample_rate", "duration_s", "rms"]
            )

    return df.select(id_col, binary_col).mapInPandas(run, AUDIO_FEATURES_SCHEMA)
