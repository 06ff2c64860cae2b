"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed metadata
struct; decode / feature-extract / frame-sample run as Arrow-batched
``mapInPandas`` operators. Image decode is REAL in this container for BMP
payloads via the vendored pure-numpy codec at the bottom of this file
(headers, stride, padding, pixel sums — value-oracled); PIL remains the
escape hatch for other formats (probed at import, below), and the
deterministic stub kernel stays available for oracle-reproducible runs of
the PIL-shaped path.

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
            "real decoding of LOSSY formats (JPEG etc.) requires PIL/cv2, not "
            "present in this container — BMP and PNG decode for real via the "
            "vendored codecs (decode_bmp_meta routes by magic bytes); run "
            "with use_real_decoder=False for the deterministic stub. This "
            "boundary is PERMANENT by design (SURVEY.md §8, round-10): a "
            "vendored DCT decode has no closed-form SQL replay, so it could "
            "never join the value-oracled catalog; production plugs a codec "
            "library into this same mapInPandas seam"
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


# ---------------------------------------------------------------------------
# REAL image decode without PIL: a vendored pure-numpy 24-bit BMP codec
# (round-7). The writer synthesizes genuine BMP byte streams into the binary
# column (deterministic pixels, so a SQL oracle can recompute the decode
# output in closed form WITHOUT parsing bytes); the parser reads the actual
# BITMAPFILEHEADER/BITMAPINFOHEADER, walks the 4-byte-aligned bottom-up rows,
# and sums real pixel bytes. This kills the "stub decode VALUES" placeholder
# in THIS container: the Spark path round-trips true bytes, the oracle checks
# the invariant formula the pixels were generated from.
# ---------------------------------------------------------------------------

_DECODE_FIXED_FIELDS = (
    "n_bytes int, format string, width int, height int, "
    "channels int, pixel_sum long"
)
BMP_DECODE_SCHEMA = "doc_id long, " + _DECODE_FIXED_FIELDS


def _decode_schema(id_col: str) -> str:
    """The decode output schema with the caller's id column name. A name
    that collides with a fixed field would yield silent duplicate columns,
    so reject it outright."""
    fixed = {f.split()[0] for f in _DECODE_FIXED_FIELDS.split(", ")}
    if id_col in fixed:
        raise ValueError(
            f"id_col {id_col!r} collides with a decode output field {sorted(fixed)}"
        )
    return f"{id_col} long, " + _DECODE_FIXED_FIELDS


def _bmp_dims(did: int) -> tuple[int, int]:
    """Deterministic synthetic dimensions from a (non-negative) doc id."""
    return did % 31 + 2, (did * 7) % 13 + 2


def encode_bmp(did: int) -> bytes:
    """Write a real 24-bit uncompressed BMP whose pixel (x, y) channel c
    (RGB index) has value ``(did + 3x + 7y + 11c) % 256`` — position- and
    channel-dependent so a parser that miscounts row padding, stride, or
    vertical flip changes the pixel sum and fails the oracle."""
    import struct

    import numpy as np

    w, h = _bmp_dims(did)
    x = np.arange(w, dtype=np.int64)
    y = np.arange(h, dtype=np.int64)
    c = np.arange(3, dtype=np.int64)  # RGB
    # (h, w, 3) in image orientation (row 0 = top), RGB channel order
    px = (did + 3 * x[None, :, None] + 7 * y[:, None, None] + 11 * c[None, None, :]) % 256
    bgr = px[:, :, ::-1].astype(np.uint8)  # BMP stores B,G,R
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    pixel_data = rows[::-1].tobytes()  # bottom-up row order
    file_size = 54 + len(pixel_data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    return header + pixel_data


def parse_bmp(payload) -> tuple:
    """VENDORED pure-numpy BMP parser: (width, height, channels, pixel_sum)
    from a 24-bit uncompressed BMP byte stream; anything unparseable yields
    all-None (NULL metadata, never a job abort — at corpus scale some
    fraction of blobs is always corrupt). Handles both bottom-up (positive
    biHeight) and top-down (negative) layouts and excludes the per-row
    alignment padding from the pixel sum."""
    import struct

    import numpy as np

    try:
        buf = bytes(payload)
        if len(buf) < 54 or buf[:2] != b"BM":
            return (None, None, None, None)
        data_offset = struct.unpack_from("<I", buf, 10)[0]
        (
            hdr_size,
            w,
            h_raw,
            _planes,
            bits,
            compression,
        ) = struct.unpack_from("<IiiHHI", buf, 14)
        if hdr_size < 40 or bits != 24 or compression != 0 or w <= 0 or h_raw == 0:
            return (None, None, None, None)
        h = abs(h_raw)
        stride = (w * 3 + 3) & ~3
        end = data_offset + stride * h
        if data_offset < 54 or end > len(buf):
            return (None, None, None, None)
        rows = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=data_offset)
        rows = rows.reshape(h, stride)[:, : w * 3]  # drop alignment padding
        return (w, h, 3, int(rows.astype(np.int64).sum()))
    except Exception:
        return (None, None, None, None)


# ---------------------------------------------------------------------------
# REAL PNG codec without PIL (round-8): stdlib zlib + critical-chunk parsing.
# The writer emits 8-bit truecolor (color type 2), non-interlaced, filter-0
# rows, STORED deflate blocks (zlib level 0) so the byte length is closed-form
# (68 + h*(3w+1) for one stored block) and a SQL oracle can predict n_bytes
# without compressing anything. The parser handles ANY 8-bit RGB
# non-interlaced PNG — multi-IDAT streams and all five row filters (Sub/Up/
# Average/Paeth unfiltering) — so real-world payloads decode too, not just
# our writer's. With BMP (round-7) this makes the decode operator's
# NotImplementedError guard "lossy formats only" (JPEG needs a DCT stack).
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(did: int) -> bytes:
    """Write a real PNG (8-bit RGB, non-interlaced, filter-0 rows, stored
    deflate) whose pixel (x, y) channel c has value
    ``(did + 3x + 7y + 11c) % 256`` — the SAME pixel formula as
    :func:`encode_bmp`, so the oracle's closed-form pixel sum is shared and
    only the container length differs. ``zlib.compress(data, 0)`` emits
    stored blocks: total length is ``68 + h*(3w+1)`` while the raw scanline
    stream fits one 65535-byte block (always true at these dims — asserted
    so a dims change can't silently break the oracle's length formula)."""
    import struct
    import zlib

    import numpy as np

    w, h = _bmp_dims(did)  # shared synthetic dims with the BMP writer
    x = np.arange(w, dtype=np.int64)
    y = np.arange(h, dtype=np.int64)
    c = np.arange(3, dtype=np.int64)
    px = (did + 3 * x[None, :, None] + 7 * y[:, None, None] + 11 * c[None, None, :]) % 256
    rgb = px.astype(np.uint8)  # PNG stores RGB directly, top-down
    # one filter-type byte (0 = None) per scanline, then the raw RGB row
    raw = b"".join(b"\x00" + rgb[j].tobytes() for j in range(h))
    if len(raw) > 65535:
        # The multimodal_decode oracle's closed-form 68 + h*(3w+1) length
        # depends on the ONE-stored-deflate-block invariant; an assert here
        # would vanish under `python -O`, so fail loudly instead.
        raise ValueError(
            f"raw scanline stream ({len(raw)} bytes) exceeds one 65535-byte "
            "stored deflate block — the oracle's length formula would break"
        )
    idat = zlib.compress(raw, 0)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB, no interlace
    return PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def _png_unfilter(raw: bytes, w: int, h: int):
    """Reverse PNG row filtering for an 8-bit RGB scanline stream →
    (h, 3w) uint8 array, or None on a malformed stream. Filters 0/1/2 are
    vectorized (None / channel-lane cumsum / previous-row add); 3/4
    (Average/Paeth) fall back to a per-byte loop — our writer never emits
    them, they exist so arbitrary real PNGs decode correctly."""
    import numpy as np

    bpp, stride = 3, w * 3
    if len(raw) != h * (stride + 1):
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    arr = np.frombuffer(raw, dtype=np.uint8)
    pos = 0
    for yy in range(h):
        ft = int(arr[pos])
        line = arr[pos + 1 : pos + 1 + stride].astype(np.int64)
        pos += 1 + stride
        prev = out[yy - 1].astype(np.int64) if yy else np.zeros(stride, np.int64)
        if ft == 0:
            cur = line
        elif ft == 1:  # Sub: per channel lane, running sum along the row
            cur = line.reshape(w, bpp).cumsum(axis=0).reshape(stride) % 256
        elif ft == 2:  # Up
            cur = (line + prev) % 256
        elif ft in (3, 4):  # Average / Paeth: inherently sequential
            cur = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                if ft == 3:
                    pred = (a + b) // 2
                else:
                    cc = int(prev[i - bpp]) if i >= bpp else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                cur[i] = (int(line[i]) + pred) % 256
        else:
            return None
        out[yy] = cur.astype(np.uint8)
    return out


def parse_png(payload) -> tuple:
    """VENDORED pure-stdlib PNG parser: (width, height, channels, pixel_sum)
    from an 8-bit truecolor non-interlaced PNG — signature check, chunk
    walk (multi-IDAT concatenation), zlib inflate, full unfiltering.
    Anything unparseable (wrong color type/bit depth, interlaced, bad
    lengths, corrupt deflate) yields all-None — NULL metadata, never a job
    abort, the same corrupt-blob contract as :func:`parse_bmp`."""
    import struct
    import zlib

    import numpy as np

    try:
        buf = bytes(payload)
        if len(buf) < 8 + 25 + 12 or buf[:8] != PNG_SIG:
            return (None, None, None, None)
        pos, w = 8, None
        idat = bytearray()
        h = None
        while pos + 8 <= len(buf):
            (length,) = struct.unpack_from(">I", buf, pos)
            tag = buf[pos + 4 : pos + 8]
            body_end = pos + 8 + length
            if body_end + 4 > len(buf):
                return (None, None, None, None)
            body = buf[pos + 8 : body_end]
            if tag == b"IHDR":
                if length != 13:
                    return (None, None, None, None)
                w, h, depth, ctype, comp, filt, inter = struct.unpack(">IIBBBBB", body)
                if depth != 8 or ctype != 2 or comp != 0 or filt != 0 or inter != 0:
                    return (None, None, None, None)
                if w <= 0 or h <= 0:
                    return (None, None, None, None)
            elif tag == b"IDAT":
                idat.extend(body)
            elif tag == b"IEND":
                break
            pos = body_end + 4  # skip CRC (payload integrity, not structure)
        if w is None or not idat:
            return (None, None, None, None)
        # Bounded inflate: a crafted tiny IDAT can expand to gigabytes
        # (decompression bomb) if inflated unboundedly before the length
        # check. Cap the output at the expected scanline-stream size + 1;
        # any overflow byte means the stream is oversized → reject, having
        # allocated at most h*(3w+1)+1 bytes per task.
        expected = h * (w * 3 + 1)
        dobj = zlib.decompressobj()
        raw = dobj.decompress(bytes(idat), expected + 1)
        if len(raw) > expected or dobj.unconsumed_tail:
            return (None, None, None, None)
        rows = _png_unfilter(raw, w, h)
        if rows is None:
            return (None, None, None, None)
        return (w, h, 3, int(rows.astype(np.int64).sum()))
    except Exception:
        return (None, None, None, None)


def attach_image_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL mixed-format image payload per row: even ids get a
    24-bit BMP, odd ids an 8-bit RGB PNG — both carrying the SAME
    deterministic pixel pattern, so the decode oracle shares one pixel-sum
    formula and only the container metadata (n_bytes, format) splits on
    parity. A NULL id yields a NULL payload (the missing-blob case)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for d in pdf[id_col]:
                if d is None or pd.isna(d):
                    payloads.append(None)
                else:
                    did = abs(int(d))
                    payloads.append(encode_png(did) if did % 2 else encode_bmp(did))
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(
        batches, schema=f"{id_col} long, payload binary"
    )


def attach_bmp_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL BMP binary payload per row (mapInPandas, Arrow
    batches) — the testdata stand-in for a landed image column. A NULL id
    yields a NULL payload (the missing-blob case the decode contract must
    survive). The id column keeps its name in the output (callers joining
    back on ``id_col`` rely on it); ``decode_bmp_meta`` takes the same
    ``id_col`` for the round trip."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [
                encode_bmp(abs(int(d))) if d is not None and not pd.isna(d) else None
                for d in pdf[id_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(
        batches, schema=f"{id_col} long, payload binary"
    )


def _route_decode(payload) -> tuple:
    """Magic-byte router over the vendored codecs: BMP ('BM'), PNG
    (8-byte signature); anything else — including NULL — is
    (format, w, h, c, sum) of all-None. A recognized container whose body
    fails to parse also yields all-None (corrupt blob ≠ unknown format for
    the caller; both are NULL metadata)."""
    if payload is None:
        return (None, None, None, None, None)
    buf = bytes(payload)
    if buf[:2] == b"BM":
        w, h, c, s = parse_bmp(buf)
        return ("image/bmp" if w is not None else None, w, h, c, s)
    if buf[:8] == PNG_SIG:
        w, h, c, s = parse_png(buf)
        return ("image/png" if w is not None else None, w, h, c, s)
    return (None, None, None, None, None)


def decode_bmp_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL image decode: route each payload by magic bytes to the vendored
    BMP or PNG parser (no PIL) and emit typed metadata + an exact pixel
    sum. Same mapInPandas/Arrow shape as the PIL path — swapping decoders
    never changes the plan or schema. ``id_col`` names the id column of
    the incoming (id, payload) frame — the `attach_bmp_payload` /
    `attach_image_payload` contract. (The name predates the PNG route —
    round-7 callers pass pure-BMP frames and decode identically.)"""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [_route_decode(p) for p in pdf["payload"]]
            n_bytes = pdf["payload"].map(lambda p: len(p) if p is not None else None)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n_bytes.astype("Int32"),
                    "format": [m[0] for m in metas],
                    "width": pd.array([m[1] for m in metas], dtype="Int32"),
                    "height": pd.array([m[2] for m in metas], dtype="Int32"),
                    "channels": pd.array([m[3] for m in metas], dtype="Int32"),
                    "pixel_sum": pd.array([m[4] for m in metas], dtype="Int64"),
                }
            )

    schema = _decode_schema(id_col)
    return df.mapInPandas(batches, schema=schema)


decode_image_bytes_meta = decode_bmp_meta  # the format-routing name


def attach_media_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a REAL mixed-MODALITY payload per row — the realistic
    landed-blob-column case: ``id % 4`` routes to 24-bit BMP (0), 8-bit
    RGB PNG (1), 16-bit PCM WAV (2), or Y4M C420 video (3), each a
    genuine container from the vendored writers. A NULL id yields a NULL
    payload."""
    from .audio import encode_wav
    from .video import encode_y4m

    writers = (encode_bmp, encode_png, encode_wav, encode_y4m)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for d in pdf[id_col]:
                if d is None or pd.isna(d):
                    payloads.append(None)
                else:
                    did = abs(int(d))
                    payloads.append(writers[did % 4](did))
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(
        batches, schema=f"{id_col} long, payload binary"
    )


_MEDIA_FIELDS = (
    "n_bytes int, format string, width int, height int, channels int,"
    " pixel_sum long, sample_rate int, n_samples int, energy long,"
    " fps_num int, n_frames int, luma_sum long"
)


def decode_media_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """UNIFIED mixed-modality decode: route each payload by MAGIC BYTES
    across all four vendored parsers — 'BM' → BMP, PNG signature → PNG,
    'RIFF…WAVE' → WAV, 'YUV4MPEG2' → Y4M — into one wide nullable schema
    (image fields NULL for audio rows and vice versa; the curation-layer
    contract for a heterogeneous blob column). Unknown containers and
    corrupt payloads yield an all-NULL row, never a job abort. One
    mapInPandas pass; per-payload numpy only."""
    from .audio import parse_wav
    from .video import Y4M_MAGIC, parse_y4m

    def route(payload):
        none = [None] * 12
        if payload is None:
            return none
        buf = bytes(payload)
        n = len(buf)
        if buf[:2] == b"BM":
            w, h, c, s = parse_bmp(buf)
            if w is None:
                return none
            return [n, "image/bmp", w, h, c, s] + [None] * 6
        if buf[:8] == PNG_SIG:
            w, h, c, s = parse_png(buf)
            if w is None:
                return none
            return [n, "image/png", w, h, c, s] + [None] * 6
        if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
            rate, ch, ns, e = parse_wav(buf)
            if rate is None:
                return none
            return [n, "audio/wav", None, None, ch, None, rate, ns, e,
                    None, None, None]
        if buf[: len(Y4M_MAGIC)] == Y4M_MAGIC:
            w, h, num, _den, nf, ls = parse_y4m(buf)
            if w is None:
                return none
            return [n, "video/y4m", w, h, None, None, None, None, None,
                    num, nf, ls]
        return none

    int32_cols = {
        "n_bytes": 0, "width": 2, "height": 3, "channels": 4,
        "sample_rate": 6, "n_samples": 7, "fps_num": 9, "n_frames": 10,
    }
    int64_cols = {"pixel_sum": 5, "energy": 8, "luma_sum": 11}

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [route(p) for p in pdf["payload"]]
            out = {id_col: pdf[id_col]}
            for name, idx in int32_cols.items():
                out[name] = pd.array([m[idx] for m in metas], dtype="Int32")
            out["format"] = [m[1] for m in metas]
            for name, idx in int64_cols.items():
                out[name] = pd.array([m[idx] for m in metas], dtype="Int64")
            yield pd.DataFrame(out)[
                [id_col, "n_bytes", "format", "width", "height", "channels",
                 "pixel_sum", "sample_rate", "n_samples", "energy",
                 "fps_num", "n_frames", "luma_sum"]
            ]

    return df.mapInPandas(batches, schema=f"{id_col} long, {_MEDIA_FIELDS}")
