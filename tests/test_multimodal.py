"""Multimodal plumbing — schemas, batch shapes, partition sizing —
plus the decoder tiers: pinned stub (fake=True), PIL when installed,
and the codec-free paths (container-header sniffer for metadata,
stdlib PNG rasterizer for resize), golden-tested against hand-built
spec-valid files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphem_rapids_spark.pipeline.multimodal import (
    extract_image_features,
    frame_sample_plan,
    media_repartition,
    resize_images,
)


@pytest.fixture(scope="module")
def media(spark):
    return spark.range(20).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 4 == 0, "video").otherwise("image").alias("kind"),
        F.encode(F.concat(F.lit("blob-"), F.col("id")), "UTF-8").alias("content"),
        F.lit("application/fake").alias("mime"),
    )


def test_decode_tiers(media):
    from graphem_rapids_spark.pipeline import multimodal as M

    # metadata tier never raises: PIL or the header sniffer handles it
    # (unrecognized blobs → (0, 0) dims, n_bytes/phash still real)
    feats = extract_image_features(media, fake=False).collect()
    assert len(feats) == 15  # images only
    assert all(r.width == 0 and r.height == 0 for r in feats)  # not real images
    assert all(r.n_bytes > 0 and len(r.phash) == 16 for r in feats)
    # rasterization tier: real mode never raises either — the stdlib
    # PNG rasterizer handles PNGs, everything else falls back to the
    # (0, 0, b"") corrupt-input contract (these blobs are not PNGs)
    rs = resize_images(media, fake=False).collect()
    assert len(rs) == 15
    if not M.HAS_PIL:
        assert all(
            (r.width, r.height, bytes(r.content)) == (0, 0, b"") for r in rs
        )


def _png_bytes(w: int, h: int) -> bytes:
    """A complete, spec-valid RGB PNG built with stdlib only."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x80" * (3 * w) for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _jpeg_header_bytes(w: int, h: int) -> bytes:
    """SOI + APP0(JFIF) + SOF0 carrying the dimensions (enough for any
    header parser; not a decodable image)."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x01\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_header_sniffer_goldens():
    """Golden container headers → exact dimensions, no codec needed."""
    import struct

    from graphem_rapids_spark.pipeline.multimodal import _sniff_dims

    assert _sniff_dims(_png_bytes(5, 3)) == (5, 3)
    assert _sniff_dims(_jpeg_header_bytes(640, 480)) == (640, 480)
    # SOF dimension bytes ending exactly at the buffer end: keep
    # SOI(2) + APP0(18) + marker/len/precision/height/width(9) = 29
    truncated = _jpeg_header_bytes(33, 22)[:29]
    assert _sniff_dims(truncated) == (33, 22)
    gif = b"GIF89a" + struct.pack("<HH", 12, 7) + b"\x00" * 4
    assert _sniff_dims(gif) == (12, 7)
    # BITMAPINFOHEADER (header-size field 40 at offset 14, i32 dims)
    bmp = (
        b"BM" + b"\x00" * 12 + struct.pack("<I", 40)
        + struct.pack("<ii", 9, -4) + b"\x00" * 4
    )
    assert _sniff_dims(bmp) == (9, 4)  # top-down DIB: |height|
    # OS/2 BITMAPCOREHEADER (header-size 12, u16 dims)
    core = b"BM" + b"\x00" * 12 + struct.pack("<I", 12) + struct.pack("<HH", 100, 50)
    assert _sniff_dims(core) == (100, 50)
    # unknown DIB header size -> contract fallback, not garbage
    junk = b"BM" + b"\x00" * 12 + struct.pack("<I", 7) + b"\x00" * 8
    assert _sniff_dims(junk) == (0, 0)
    assert _sniff_dims(b"not an image") == (0, 0)
    assert _sniff_dims(b"") == (0, 0)


def test_real_decode_golden_end_to_end(spark):
    """A crafted PNG flows through the full mapInPandas path in
    fake=False mode and yields its true dimensions — via PIL when
    installed, via the header sniffer otherwise (same answer)."""
    from graphem_rapids_spark.pipeline import multimodal as M

    df = spark.createDataFrame(
        [(1, "image", bytearray(_png_bytes(5, 3)), "image/png")],
        M.MEDIA_SCHEMA,
    )
    [r] = M.extract_image_features(df, fake=False).collect()
    assert (r.width, r.height) == (5, 3)
    assert r.n_bytes == len(_png_bytes(5, 3))


@pytest.mark.skipif(
    not __import__("importlib.util", fromlist=["util"]).find_spec("PIL"),
    reason="PIL not installed",
)
def test_pil_agrees_with_sniffer_on_png_golden():
    from graphem_rapids_spark.pipeline.multimodal import _pil_dims, _sniff_dims

    png = _png_bytes(7, 11)
    assert _pil_dims(png) == _sniff_dims(png) == (7, 11)


def test_resize_clamps_and_preserves_aspect(media):
    out = resize_images(media, max_side=64, fake=True).collect()
    assert len(out) == 15  # images only
    for r in out:
        assert 1 <= max(r.width, r.height) <= 64
        assert r.content is not None and len(r.content) == 16
    # determinism: same input → same output
    again = resize_images(media, max_side=64, fake=True).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_frame_sample_plan_videos_only(media):
    plan = frame_sample_plan(media, every_n_frames=100, assumed_frames=300)
    rows = plan.collect()
    assert {r.media_id % 4 for r in rows} == {0}
    per = {}
    for r in rows:
        per.setdefault(r.media_id, []).append(r.frame_idx)
    assert all(sorted(v) == [0, 100, 200] for v in per.values())


def test_media_repartition_by_bytes(media):
    out = media_repartition(media, target_bytes_per_partition=4 << 20,
                            avg_blob_bytes=1 << 20)
    assert out.rdd.getNumPartitions() == 5  # 20 × 1MB / 4MB


def test_pil_autodetect_gated(media):
    """When PIL is installed the real decoder takes over (fake=False);
    fake=True must ALWAYS pin the stub so hash-checked queries are
    immune to environment changes."""
    from graphem_rapids_spark.pipeline import multimodal as M

    feats = M.extract_image_features(media).collect()  # real metadata path
    assert all(r.n_bytes >= 0 for r in feats)
    # stub path is pinned regardless of PIL
    stub = M.extract_image_features(media, fake=True).collect()
    again = M.extract_image_features(media, fake=True).collect()
    assert sorted(map(tuple, stub)) == sorted(map(tuple, again))


def test_png_unfilter_golden_all_filters():
    """Hand-computed 2x4 RGB PNG exercising filter types Sub(1),
    Up(2), Average(3), Paeth(4) — decoded scanlines must equal the
    spec-reconstructed bytes worked out by hand."""
    import struct
    import zlib

    import numpy as np

    from graphem_rapids_spark.pipeline.multimodal import _png_decode

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 4, 8, 2, 0, 0, 0)  # 2x4 RGB
    raw = (
        b"\x01" + bytes([10, 20, 30, 5, 6, 7])    # Sub
        + b"\x02" + bytes([1, 1, 1, 2, 2, 2])      # Up
        + b"\x03" + bytes([4, 4, 4, 8, 8, 8])      # Average
        + b"\x04" + bytes([3, 3, 3, 1, 1, 1])      # Paeth
    )
    png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    got = _png_decode(png)
    want = np.array(
        [
            [[10, 20, 30], [15, 26, 37]],
            [[11, 21, 31], [17, 28, 39]],
            [[9, 14, 19], [21, 29, 37]],
            [[12, 17, 22], [22, 30, 38]],
        ],
        dtype=np.uint8,
    )
    assert got is not None and (got == want).all()


def test_png_encode_decode_roundtrip():
    import numpy as np

    from graphem_rapids_spark.pipeline.multimodal import _png_decode, _png_encode

    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        arr = rng.integers(0, 256, size=(13, 9, ch), dtype=np.uint8)
        assert (_png_decode(_png_encode(arr)) == arr).all()
    # PIL agrees with the stdlib decoder when installed
    try:
        from PIL import Image
        import io as _io

        arr = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
        pil = np.asarray(Image.open(_io.BytesIO(_png_encode(arr))))
        assert (pil == arr).all()
    except ImportError:
        pass


def test_png_decode_rejects_unsupported():
    from graphem_rapids_spark.pipeline.multimodal import _png_decode

    assert _png_decode(b"") is None
    assert _png_decode(b"\x89PNG\r\n\x1a\n" + b"\x00" * 30) is None
    assert _png_decode(_jpeg_header_bytes(4, 4)) is None


def test_resize_real_png_codec_free(spark):
    """A real 8x4 PNG flows through resize_images(fake=False) without
    any codec library: output is a decodable PNG with the long side
    clamped; non-PNG blobs fall back to the (0,0,b'') contract."""
    import numpy as np

    from graphem_rapids_spark.pipeline import multimodal as M

    arr = np.arange(8 * 4 * 3, dtype=np.uint8).reshape(4, 8, 3)
    df = spark.createDataFrame(
        [
            (1, "image", bytearray(M._png_encode(arr)), "image/png"),
            (2, "image", bytearray(b"not a png"), "application/octet-stream"),
        ],
        M.MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in M.resize_images(df, max_side=4, fake=False).collect()}
    ok = rows[1]
    assert (ok.width, ok.height) == (4, 2)
    back = M._png_decode(bytes(ok.content))
    assert back is not None and back.shape == (2, 4, 3)
    # nearest-neighbor: sampled pixels come from the source grid
    assert (back == arr[::2, ::2]).all()
    bad = rows[2]
    assert (bad.width, bad.height, bytes(bad.content)) == (0, 0, b"")


def test_png_decode_palette():
    """Color-type-3 (palette) PNG: indices expand to RGB via PLTE."""
    import struct
    import zlib

    import numpy as np

    from graphem_rapids_spark.pipeline.multimodal import _png_decode

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)  # 3x2 palette
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red, green, blue
    raw = b"\x00" + bytes([0, 1, 2]) + b"\x00" + bytes([2, 2, 0])
    png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    got = _png_decode(png)
    want = np.array(
        [[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
         [[0, 0, 255], [0, 0, 255], [255, 0, 0]]],
        dtype=np.uint8,
    )
    assert got is not None and (got == want).all()
    # out-of-range palette index -> corrupt-input contract
    bad_raw = b"\x00" + bytes([0, 7, 2]) + b"\x00" + bytes([2, 2, 0])
    bad = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(bad_raw)) + chunk(b"IEND", b"")
    )
    assert _png_decode(bad) is None


def _gradient_png(w: int, h: int, flip: bool = False) -> bytes:
    """RGB PNG with a horizontal luminance gradient (reversed when
    flip) — gives dHash a deterministic non-trivial bit pattern."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    rows = []
    for _ in range(h):
        px = b"".join(
            bytes([v, v, v])
            for c in range(w)
            for v in [(255 - c * 255 // (w - 1)) if flip else (c * 255 // (w - 1))]
        )
        rows.append(b"\x00" + px)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + chunk(b"IEND", b"")
    )


def test_dhash_real_rasterizer_and_banded_join(spark):
    """Real-path dHash: identical PNGs hash identically (hamming 0),
    the mirrored gradient is far away, undecodable blobs hash to the
    zero bands — and the banded join finds exactly the identical
    pair."""
    from graphem_rapids_spark.pipeline.multimodal import (
        dhash_images,
        hamming_near_dup,
    )

    g = _gradient_png(36, 24)
    rows = [
        (1, bytearray(g)),
        (2, bytearray(g)),                            # exact duplicate
        (3, bytearray(_gradient_png(36, 24, flip=True))),
        (4, bytearray(b"not an image")),
    ]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    h = dhash_images(media)  # real stdlib-rasterizer path
    by_id = {r["media_id"]: (r["b0"], r["b1"], r["b2"], r["b3"]) for r in h.collect()}
    assert by_id[1] == by_id[2]
    assert by_id[4] == (0, 0, 0, 0)
    # ascending gradient: left < right everywhere -> all 64 bits set
    assert by_id[1] == (0xFFFF,) * 4
    # mirrored gradient: left > right everywhere -> all-zero hash,
    # the degenerate value undecodable blobs share — both must be
    # EXCLUDED from the near-dup join (zero-bucket skew bomb)
    assert by_id[3] == (0, 0, 0, 0)
    pairs = hamming_near_dup(h, max_dist=6).collect()
    assert {(r["a"], r["b"], r["hamming"]) for r in pairs} == {(1, 2, 0)}


def test_hamming_near_dup_recall_bits_spread_across_bands(spark):
    """Recall at the full default radius: a pair differing in 4-6 bits
    SPREAD ACROSS ALL FOUR 16-bit bands has no identical 16-bit band,
    so the round-4 four-band bucket join silently missed it; the
    8-byte-band join (pigeonhole: <=7 differing bits over 8 bands)
    must find it."""
    from graphem_rapids_spark.pipeline.multimodal import hamming_near_dup

    base = (0x1234, 0x5678, 0x9ABC, 0x0DEF)
    # flip 2 bits in b0, 2 in b1, 1 in b2, 1 in b3 -> hamming 6,
    # every 16-bit band differs; all flips in the LOW byte so the
    # high-byte bands stay equal (the pigeonhole witness)
    other = (base[0] ^ 0x03, base[1] ^ 0x05, base[2] ^ 0x10, base[3] ^ 0x40)
    far = (0xFFFF, 0xEEEE, 0xDDDD, 0xCCCC)
    rows = [(1, *base), (2, *other), (3, *far)]
    h = spark.createDataFrame(
        rows, "media_id long, b0 long, b1 long, b2 long, b3 long"
    )
    pairs = {(r["a"], r["b"], r["hamming"]) for r in hamming_near_dup(h, max_dist=6).collect()}
    assert pairs == {(1, 2, 6)}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hamming_near_dup(h, max_dist=8)
