"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed metadata
struct; decode / feature-extract / frame-sample run as Arrow-batched
``mapInPandas`` operators. The image/audio decode libraries are NOT in this
container, so the actual byte decoding is STUBBED (clearly marked below) with
a deterministic fake — but everything Spark-side is real and tested: schema,
partitioning, the mapInPandas batch shape, and the metadata contract.

Scale notes: binary payloads ride in the same parquet row groups as their
metadata; ``maxPartitionBytes`` controls batch size; mapInPandas streams
Arrow record batches so a 100 MB image row never materializes per-row Python
objects outside its batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes int, format string, width int, height int, channels int"
)

FRAME_SCHEMA = "doc_id long, n_bytes int, n_frames int, frame_index int, frame_offset int"

# Real-decoder escape hatch: probe for PIL at import. In THIS container the
# probe fails (PIL/cv2/torchaudio absent) and every decode runs the
# deterministic stub; in a container with Pillow the real path activates
# automatically (decode_image_meta(use_real_decoder=None) follows this flag)
# while the stub stays available for oracle-reproducible runs.
try:
    from PIL import Image as _PILImage  # type: ignore

    REAL_DECODERS_AVAILABLE = True
except Exception:  # ImportError, or a broken PIL install
    _PILImage = None
    REAL_DECODERS_AVAILABLE = False


def attach_binary_payload(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column + typed metadata struct.

    In production this is the parquet binary column as landed; here the
    payload is synthesized from the text bytes so the plumbing is exercised
    end-to-end on the driver testdata.
    """
    binary = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        binary.alias("payload"),
        F.struct(
            F.length(binary).alias("n_bytes"),
            F.lit("fake/png").alias("format"),
        ).alias("media_meta"),
    )


def _fake_image_meta(n_bytes: int) -> tuple[int, int, int]:
    """STUB: deterministic fake decode (real decoder unavailable in image).

    Derives plausible dimensions purely from payload length so oracles can
    reproduce it. Replace with PIL/cv2 in a container that has them.
    """
    width = (n_bytes % 640) + 16
    height = ((n_bytes // 7) % 480) + 16
    return width, height, 3


def _real_image_meta(payload) -> tuple:
    """REAL decode of one payload via PIL → (width, height, channels);
    a payload PIL cannot parse yields (None, None, None) — NULL metadata,
    never a job abort (at corpus scale some fraction of blobs is always
    corrupt). Only callable when REAL_DECODERS_AVAILABLE."""
    import io

    try:
        with _PILImage.open(io.BytesIO(bytes(payload))) as im:
            return im.width, im.height, len(im.getbands())
    except Exception:
        return None, None, None


def decode_image_meta(df: DataFrame, use_real_decoder: bool | None = None) -> DataFrame:
    """Arrow-batched image 'decode' extracting (width, height, channels).

    ``use_real_decoder``: ``None`` (default) auto-selects — the real PIL
    path when the import probe found Pillow, else the deterministic stub;
    ``True`` demands the real path and raises when no decoder is present
    (the stub boundary stays explicit, not silent); ``False`` pins the
    stub (what the DuckDB oracles reproduce).

    Both paths share the SAME ``DECODE_SCHEMA``, mapInPandas batch shape,
    and metadata contract — only the (width, height, channels) values
    differ, so swapping containers never changes the plan or the schema.
    Real-path contract: one PIL header decode per payload (no pixel-buffer
    materialization — PIL reads dimensions lazily), undecodable payloads
    yield NULL dimensions.
    """
    if use_real_decoder is None:
        use_real_decoder = REAL_DECODERS_AVAILABLE
    if use_real_decoder and not REAL_DECODERS_AVAILABLE:
        raise NotImplementedError(
            "real image decoding requires PIL/cv2, not present in this container; "
            "run with use_real_decoder=False for the deterministic stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # NULL payload -> NULL metadata (same contract as an
            # undecodable payload on the real path); at corpus scale some
            # fraction of blobs is always missing and len(None) would
            # abort the job
            n_bytes = pdf["payload"].map(lambda p: len(p) if p is not None else None)
            if use_real_decoder:
                meta = [
                    _real_image_meta(p) if p is not None else (None, None, None)
                    for p in pdf["payload"]
                ]
            else:
                meta = [
                    _fake_image_meta(n) if n is not None else (None, None, None)
                    for n in n_bytes
                ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("Int32"),
                    "format": [
                        m["format"] if m is not None else None
                        for m in pdf["media_meta"]
                    ],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "channels": [m[2] for m in meta],
                }
            )

    return df.mapInPandas(batches, schema=DECODE_SCHEMA)


def sample_frames(df: DataFrame, frame_stride: int = 1024) -> DataFrame:
    """Frame-sampling plumbing for audio/video payloads.

    Emits one row per sampled frame: ``n_frames = n_bytes div stride + 1``,
    offsets at stride boundaries — the real sampler would seek/decode at each
    offset (STUB: offsets only). Row-exploding inside mapInPandas keeps the
    fan-out streaming (no collect, no driver loop).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {k: [] for k in ("doc_id", "n_bytes", "n_frames", "frame_index", "frame_offset")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue  # a NULL payload has nothing to sample
                n = len(payload)
                n_frames = n // frame_stride + 1
                for i in range(n_frames):
                    out["doc_id"].append(doc_id)
                    out["n_bytes"].append(n)
                    out["n_frames"].append(n_frames)
                    out["frame_index"].append(i)
                    out["frame_offset"].append(i * frame_stride)
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, width int, height int, resized_width int, resized_height int, "
    "resized_bytes int"
)

FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, byte_histogram array<double>, "
    "byte_hist_counts array<int>"
)


def resize_image_meta(df: DataFrame, target: int = 256) -> DataFrame:
    """Aspect-preserving resize plumbing (STUB: metadata-only scaling).

    Consumes the decode output; the real operator would rescale pixel
    buffers (PIL/cv2 — absent here), so the stub scales the *geometry* with
    pure integer math (``new = dim * target div max(w, h)``), which keeps the
    whole chain reproducible by an integer-division SQL oracle. The
    mapInPandas batch shape, schema, and row-per-image contract match what
    the real kernel would use.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # rows whose decode produced NULL metadata (missing/undecodable
            # payload) resize to NULL — compute on placeholder-filled ints,
            # then re-null via the validity mask
            valid = (
                pdf["width"].notna() & pdf["height"].notna() & pdf["channels"].notna()
            )
            w = pdf["width"].fillna(1).astype("int64")
            h = pdf["height"].fillna(1).astype("int64")
            c = pdf["channels"].fillna(1).astype("int64")
            mx = w.where(w >= h, h)
            scale_needed = mx > target
            rw = (w * target // mx).where(scale_needed, w)
            rh = (h * target // mx).where(scale_needed, h)
            rbytes = rw * rh * c
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "resized_width": rw.where(valid).astype("Int32"),
                    "resized_height": rh.where(valid).astype("Int32"),
                    "resized_bytes": rbytes.where(valid).astype("Int32"),
                }
            )

    return df.mapInPandas(batches, schema=RESIZE_SCHEMA)


def extract_byte_features(df: DataFrame, bins: int = 16) -> DataFrame:
    """REAL feature extraction: normalized byte-value histogram per payload.

    Unlike the decode/resize stubs this computes on the actual bytes —
    a 16-bin histogram of byte values (np.bincount over the buffer, one
    vectorized pass per Arrow batch), L1-normalized. The cheap, universal
    content fingerprint for binary columns: no decode library needed, and
    the same mapInPandas shape a CNN/CLIP embedder would use.
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n_list, feats, counts = [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    # NULL payload -> NULL features (distinct from an
                    # empty payload's zero histogram)
                    n_list.append(None)
                    feats.append(None)
                    counts.append(None)
                    continue
                buf = np.frombuffer(bytes(payload), dtype=np.uint8)
                n_list.append(len(buf))
                if len(buf) == 0:
                    feats.append([0.0] * bins)
                    counts.append([0] * bins)
                    continue
                hist = np.bincount(buf >> (8 - bins.bit_length() + 1), minlength=bins)
                feats.append((hist / len(buf)).round(6).tolist())
                # raw integer counts alongside the normalized view: exact
                # integer math is what a cross-engine oracle can reproduce
                # bit-for-bit (float normalization has rounding knife-edges)
                counts.append(hist.astype(int).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.array(n_list, dtype="Int32"),
                    "byte_histogram": feats,
                    "byte_hist_counts": counts,
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)
