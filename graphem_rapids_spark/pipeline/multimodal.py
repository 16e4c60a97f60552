"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched Pandas UDFs over
``mapInPandas``.

The Spark-side plumbing — schemas, partition sizing, UDF signatures,
batch shapes — is real and tested. Decoder tiers, by capability:

- **metadata** (``extract_image_features``): PIL when installed, else
  a pure-Python header sniffer (PNG/JPEG/GIF/BMP dimensions from the
  container header — no codec needed, works in this container and is
  golden-tested against crafted files);
- **rasterization** (``resize_images``): PIL when installed
  (auto-detected at import), else a stdlib PNG rasterizer
  (zlib inflate + per-scanline unfilter + nearest-neighbor resize +
  PNG re-encode — golden-tested against hand-unfiltered scanlines);
  non-PNG pixel work without a codec lib yields the (0, 0, b"")
  corrupt-input contract;
- **pinned stub** (``fake=True`` on either): a deterministic fake
  decoder seeded by content hash, so hash-checked oracle queries are
  immune to environment changes.

Scale notes: media blobs dominate row size, so `media_repartition`
targets a byte budget per partition (not a row count); feature
extraction is mapInPandas (narrow, no shuffle); only the small typed
metadata ever enters joins/aggregations.
"""

from __future__ import annotations

import hashlib
import io
import struct
from collections.abc import Iterator

import numpy as np
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

try:  # real codec, auto-detected — absent in this container, used if present
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:  # pragma: no cover - environment-dependent
    _PILImage = None
    HAS_PIL = False

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("mime", StringType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("phash", StringType(), True),
    ]
)


def media_repartition(df: DataFrame, target_bytes_per_partition: int = 128 << 20,
                      avg_blob_bytes: int = 1 << 20) -> DataFrame:
    """Repartition a media table by byte budget, not row count —
    partitions of huge blobs must fit executor memory."""
    n = df.count()
    parts = max(1, (n * avg_blob_bytes) // target_bytes_per_partition)
    return df.repartition(int(parts))


def _fake_decode(content: bytes) -> tuple[int, int]:
    """Deterministic fake 'decode' — dimensions derived from content
    hash. Stands in for PIL/libav until real codecs are available."""
    h = hashlib.md5(content or b"").digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


def _pil_dims(content: bytes) -> tuple[int, int]:
    """Header-only decode (PIL lazy-loads: open() reads dimensions
    without rasterizing pixels)."""
    try:
        with _PILImage.open(io.BytesIO(content)) as im:
            return int(im.width), int(im.height)
    except Exception:
        return 0, 0


def _sniff_dims(content: bytes) -> tuple[int, int]:
    """Pure-Python container-header parse for PNG / JPEG / GIF / BMP —
    dimensions without any codec library (format specs are public:
    PNG IHDR big-endian u32 pair, GIF logical-screen little-endian
    u16, BMP BITMAPINFOHEADER little-endian i32, JPEG SOFn segment
    walk). Unknown or corrupt input → (0, 0), the same contract as
    the PIL path's exception fallback."""
    b = content
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return int(w), int(h)
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return int(w), int(h)
    if len(b) >= 22 and b[:2] == b"BM":
        hdr = struct.unpack("<I", b[14:18])[0]  # DIB header size field
        if hdr == 12:  # OS/2 BITMAPCOREHEADER: u16 dims
            w, h = struct.unpack("<HH", b[18:22])
            return int(w), int(h)
        if hdr >= 40 and len(b) >= 26:  # BITMAPINFOHEADER family: i32
            w, h = struct.unpack("<ii", b[18:26])
            return int(w), abs(int(h))  # negative height = top-down DIB
        return 0, 0
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        i = 2  # walk marker segments to the first SOFn frame header
        sof = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}
        while i + 1 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:  # standalone
                i += 2
                continue
            if i + 4 > len(b):
                break
            seglen = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if marker in sof:
                if i + 9 <= len(b):
                    h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                    return int(w), int(h)
                break
            i += 2 + seglen
    return 0, 0


def extract_image_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """mapInPandas feature extraction: (media_id, width, height,
    n_bytes, phash). Arrow-batched; one pass, no shuffle.

    Decoder selection: ``fake=True`` pins the deterministic stub
    (oracle-reproducible — a real codec must not silently take over a
    hash-checked query); otherwise PIL when installed (auto-detected
    at import), else the pure-Python header sniffer
    (:func:`_sniff_dims` — dimensions need no codec). The plumbing
    (schema, Arrow batching, byte-budget partitioning) is identical
    on every path."""
    if fake:
        dims_fn = _fake_decode
    elif HAS_PIL:
        dims_fn = _pil_dims
    else:
        dims_fn = _sniff_dims

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # columnar within the batch: one pass builds the blob list,
            # one list-comp per derived column (the per-blob hash/decode
            # is inherently per-item, like any real codec; everything
            # else is vectorized assembly — no iterrows)
            contents = [
                bytes(c) if c is not None else b"" for c in pdf["content"].to_numpy()
            ]
            dims = [dims_fn(c) for c in contents]
            wh = np.asarray(dims, dtype=np.int64).reshape(len(contents), 2)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "width": wh[:, 0].astype(np.int32),
                    "height": wh[:, 1].astype(np.int32),
                    "n_bytes": np.fromiter(
                        (len(c) for c in contents), dtype=np.int64, count=len(contents)
                    ),
                    "phash": [hashlib.md5(c).hexdigest()[:16] for c in contents],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def _png_decode(content: bytes) -> "np.ndarray | None":
    """stdlib PNG rasterizer (public spec, RFC 2083): 8-bit
    gray / gray+alpha / RGB / RGBA / palette, non-interlaced → H×W×C
    uint8 array (palette indices expand to RGB via PLTE). Returns
    None for anything else (16-bit, Adam7, other formats) — the
    caller falls back to its corrupt-input contract. zlib inflate is
    stdlib; unfiltering (None/Sub/Up/Average/Paeth) runs per scanline
    with the sequential left dependency the spec requires."""
    import zlib

    if len(content) < 33 or content[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    w = h = bits = color = interlace = None
    idat = b""
    plte = None
    i = 8
    try:
        while i + 8 <= len(content):
            (clen,) = struct.unpack(">I", content[i : i + 4])
            typ = content[i + 4 : i + 8]
            data = content[i + 8 : i + 8 + clen]
            if typ == b"IHDR":
                w, h, bits, color, _, _, interlace = struct.unpack(">IIBBBBB", data)
            elif typ == b"PLTE":
                plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
            elif typ == b"IDAT":
                idat += data
            elif typ == b"IEND":
                break
            i += 12 + clen  # len + type + crc
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
        if not (w and h and bits == 8 and channels and interlace == 0 and idat):
            return None
        if color == 3 and plte is None:
            return None
        raw = zlib.decompress(idat)
        stride = w * channels
        if len(raw) < h * (stride + 1):
            return None
        out = np.zeros((h, stride), np.uint8)
        pos = 0
        for y in range(h):
            f = raw[pos]
            line = np.frombuffer(raw[pos + 1 : pos + 1 + stride], np.uint8).astype(
                np.int32
            )
            pos += 1 + stride
            pr = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
            if f == 0:
                cur = line
            elif f == 2:  # Up — fully vectorized
                cur = (line + pr) & 0xFF
            elif f in (1, 3, 4):  # Sub/Average/Paeth: left dependency
                cur = np.empty(stride, np.int32)
                for j in range(stride):
                    a = cur[j - channels] if j >= channels else 0
                    b = pr[j]
                    if f == 1:
                        pred = a
                    elif f == 3:
                        pred = (a + b) // 2
                    else:
                        c = int(out[y - 1][j - channels]) if (y and j >= channels) else 0
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[j] = (line[j] + pred) & 0xFF
            else:
                return None
            out[y] = cur.astype(np.uint8)
        img = out.reshape(h, w, channels)
        if color == 3:  # palette lookup expands indices to RGB
            if int(img.max()) >= len(plte):
                return None
            img = plte[img[:, :, 0]]
        return img
    except Exception:
        return None


def _png_encode(arr: "np.ndarray") -> bytes:
    """Minimal spec-valid PNG writer (filter 0 rows, one zlib IDAT)
    for 8-bit gray / gray+alpha / RGB / RGBA arrays."""
    import zlib

    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _resize_nearest(arr: "np.ndarray", max_side: int) -> "np.ndarray":
    """Deterministic nearest-neighbor downscale, longer side clamped
    to max_side, aspect preserved (floor semantics of the stub)."""
    h, w = arr.shape[:2]
    scale = min(1.0, max_side / max(w, h))
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    ys = (np.arange(nh) * h) // nh
    xs = (np.arange(nw) * w) // nw
    return arr[ys][:, xs]


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("content", BinaryType(), True),
    ]
)


def resize_images(
    media: DataFrame, max_side: int = 224, fake: bool = False
) -> DataFrame:
    """mapInPandas resize: (media_id, width, height, content) with the
    longer side clamped to ``max_side`` (aspect preserved).
    ``fake=True`` pins the deterministic stub (aspect-correct target
    dimensions + content-hash payload); otherwise PIL when installed
    (real thumbnail re-encoded as PNG), else the stdlib PNG rasterizer
    (:func:`_png_decode` → nearest-neighbor → :func:`_png_encode` —
    codec-free, PNG only). Undecodable blobs yield (0, 0, b"") on
    every real path — the same contract as PIL's exception fallback.
    Arrow-batched, one pass, no shuffle."""
    use_pil = HAS_PIL and not fake

    def _pil_resize(content: bytes) -> tuple[int, int, bytes]:
        try:
            with _PILImage.open(io.BytesIO(content)) as im:
                im.thumbnail((max_side, max_side))
                buf = io.BytesIO()
                im.save(buf, format="PNG")
                return int(im.width), int(im.height), buf.getvalue()
        except Exception:
            return 0, 0, b""

    def _fake_resize(content: bytes) -> tuple[int, int, bytes]:
        w, h = _fake_decode(content)
        scale = min(1.0, max_side / max(w, h))
        nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
        return nw, nh, hashlib.md5(content + f"{nw}x{nh}".encode()).digest()

    def _stdlib_resize(content: bytes) -> tuple[int, int, bytes]:
        arr = _png_decode(content)
        if arr is None:
            return 0, 0, b""  # non-PNG rasterization needs a codec lib
        small = _resize_nearest(arr, max_side)
        return small.shape[1], small.shape[0], _png_encode(small)

    if fake:
        kernel = _fake_resize
    elif use_pil:
        kernel = _pil_resize
    else:
        kernel = _stdlib_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents = [
                bytes(c) if c is not None else b"" for c in pdf["content"].to_numpy()
            ]
            out = [kernel(c) for c in contents]  # per-blob codec work
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "width": np.fromiter((o[0] for o in out), np.int32, len(out)),
                    "height": np.fromiter((o[1] for o in out), np.int32, len(out)),
                    "content": [o[2] for o in out],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(run, RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n_frames: int = 30,
                      assumed_frames: int = 300) -> DataFrame:
    """(media_id, frame_idx) sampling plan for video — the shuffle-free
    explode that downstream decode UDFs consume."""
    idx = F.sequence(F.lit(0), F.lit(assumed_frames - 1), F.lit(every_n_frames))
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(idx).alias("frame_idx"))
    )

def dhash_images(media: DataFrame, fake: bool = False) -> DataFrame:
    """(media_id, b0, b1, b2, b3) — 64-bit difference hash (dHash) of
    each image as FOUR 16-bit band integers: rasterize, grayscale,
    average-pool to a 9×8 luminance grid, and set bit r·8+c iff
    grid[r][c] < grid[r][c+1]. Bands (rather than one 64-bit value)
    keep every integer small-positive on both engines AND are exactly
    what the banded hamming near-dup join buckets on. ``fake=True``
    pins the deterministic stub grid (row-keyed md5 bytes — the
    :func:`resize_images` fake-kernel discipline, replayed exactly by
    the SQL oracle in queries.py); the real path uses the stdlib PNG
    rasterizer (undecodable blobs hash to all-zero bands, the corrupt
    input contract). Arrow-batched, one pass, no shuffle."""

    def _grid_fake(content: bytes):
        rows = []
        for r in range(8):
            digest = hashlib.md5(content + b":" + str(r).encode()).hexdigest()
            rows.append([int(digest[2 * c : 2 * c + 2], 16) for c in range(9)])
        return rows

    def _grid_real(content: bytes):
        arr = _png_decode(content)
        if arr is None:
            return None
        gray = arr[..., :3].mean(axis=2) if arr.shape[2] >= 3 else arr[..., 0]
        h, w = gray.shape
        rows = []
        for r in range(8):
            row = []
            for c in range(9):
                y0, y1 = (r * h) // 8, max((r * h) // 8 + 1, ((r + 1) * h) // 8)
                x0, x1 = (c * w) // 9, max((c * w) // 9 + 1, ((c + 1) * w) // 9)
                row.append(int(gray[y0:y1, x0:x1].mean()))
            rows.append(row)
        return rows

    grid_fn = _grid_fake if fake else _grid_real

    def _bands(content: bytes) -> tuple[int, int, int, int]:
        grid = grid_fn(content)
        if grid is None:
            return 0, 0, 0, 0
        bands = [0, 0, 0, 0]
        for r in range(8):
            for c in range(8):
                if grid[r][c] < grid[r][c + 1]:
                    idx = r * 8 + c
                    bands[idx // 16] |= 1 << (idx % 16)
        return tuple(bands)

    schema = "media_id long, b0 long, b1 long, b2 long, b3 long"

    def _batches(it):
        for pdf in it:
            out = pdf["content"].map(lambda c: _bands(bytes(c)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    **{f"b{k}": out.map(lambda t, k=k: t[k]) for k in range(4)},
                }
            )

    return media.select("media_id", "content").mapInPandas(_batches, schema)


def hamming_near_dup(hashes: DataFrame, max_dist: int = 6) -> DataFrame:
    """(a, b, hamming) — near-duplicate image pairs by dHash hamming
    distance ≤ ``max_dist``, via the BANDED join. Candidate buckets
    are the EIGHT 8-bit bytes of the 64-bit hash (each stored 16-bit
    band split into its low and high byte), so the pigeonhole bound
    covers the default radius: ≤ 7 differing bits over 8 bands forces
    ≥ 1 identical byte — every true pair at distance ≤ ``max_dist``
    (must be ≤ 7) lands in some equality bucket, never O(n²); the
    SimHash text-dedup discipline applied to media. (4×16-bit bands
    only guarantee recall to distance 3 — the round-4 shape missed
    distance-4..6 pairs whose bits spread across all four bands.)
    All-zero hashes are EXCLUDED: undecodable blobs and flat images
    all hash to zero, which is both perceptually meaningless and a
    single skew-bomb bucket at corpus scale."""
    from pyspark.sql import functions as F

    if max_dist > 7:
        raise ValueError("8-band pigeonhole join only guarantees recall to distance 7")
    hashes = hashes.filter(
        (F.col("b0") != 0) | (F.col("b1") != 0) | (F.col("b2") != 0) | (F.col("b3") != 0)
    )
    byte_bands = []
    for i in range(4):
        byte_bands.append(F.col(f"b{i}").bitwiseAND(F.lit(255)))
        byte_bands.append(F.shiftright(F.col(f"b{i}"), 8))
    bands = hashes.select(
        F.col("media_id"),
        "b0", "b1", "b2", "b3",
        F.posexplode(F.array(*byte_bands)).alias("k", "bv"),
    )
    left = bands.select(
        F.col("media_id").alias("a"),
        *[F.col(f"b{i}").alias(f"a{i}") for i in range(4)],
        "k", "bv",
    )
    right = bands.select(
        F.col("media_id").alias("b"),
        *[F.col(f"b{i}").alias(f"c{i}") for i in range(4)],
        "k", "bv",
    )
    cand = (
        left.join(right, ["k", "bv"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", *[f"a{i}" for i in range(4)], *[f"c{i}" for i in range(4)])
        .distinct()
    )
    ham = sum(
        F.bit_count(F.col(f"a{i}").bitwiseXOR(F.col(f"c{i}"))) for i in range(4)
    )
    return cand.select("a", "b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_dist
    )
