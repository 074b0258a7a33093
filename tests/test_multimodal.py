"""Multimodal column plumbing: binary payload + metadata schema, decode
stub behavior, Arrow-batched feature extraction, frame sampling fan-out."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql.types import BinaryType, StructType

from kafka_stream_unify_order_messages_spark.operators import multimodal as M

TEXTS = [
    (0, "hello world, this is a fake image payload"),
    (1, "a" * 300),
    (2, "short"),
    (3, ""),
]


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(TEXTS, "doc_id long, text string")
    return M.synthetic_media(docs)


def test_synthetic_media_schema(media):
    schema: StructType = media.schema
    assert isinstance(schema["payload"].dataType, BinaryType)
    meta = schema["meta"].dataType
    assert [f.name for f in meta.fields] == [
        "media_type",
        "n_bytes",
        "digest",
        "frame_size",
    ]
    rows = {r.doc_id: r for r in media.collect()}
    assert bytes(rows[0].payload) == TEXTS[0][1].encode()
    assert rows[1].meta.n_bytes == 300
    assert rows[0].meta.media_type == "image"
    assert rows[1].meta.media_type == "audio"
    assert rows[2].meta.media_type == "video"
    assert rows[0].meta.digest == hashlib.md5(TEXTS[0][1].encode()).hexdigest()


def test_media_metadata_prunes_payload(media):
    meta = M.media_metadata(media)
    assert "payload" not in meta.columns
    # the payload column must be pruned from the scan, not carried along
    plan = meta._jdf.queryExecution().optimizedPlan().toString()
    assert "payload" not in plan.lower().replace("n_bytes", "")


try:
    from PIL import Image as _PIL_IMAGE
except ImportError:
    _PIL_IMAGE = None


@pytest.mark.skipif(
    _PIL_IMAGE is not None,
    reason="Pillow installed: decode_media takes the real codec path",
)
def test_decode_stub_raises_without_codec(media):
    # the media fixture's payloads are utf-8 text — NO codec path
    # (Pillow absent, stdlib magic unrecognized) -> honest gate intact
    from py4j.protocol import Py4JJavaError

    decoded = M.decode_media(media, fake_decode=False)
    with pytest.raises(Exception) as exc_info:
        decoded.collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, Py4JJavaError
    )


# --- stdlib codec: pure-function tests (run in EVERY environment) -------


def _checker(w, h, nch):
    import numpy as np

    y, x = np.mgrid[0:h, 0:w]
    base = (x * 7 + y * 13) % 256
    return np.stack(
        [(base + 40 * c) % 256 for c in range(nch)], axis=-1
    ).astype("uint8")


def test_stdlib_png_roundtrip_all_color_types():
    import numpy as np

    for nch, mode in ((1, "L"), (3, "RGB"), (4, "RGBA")):
        px = _checker(20, 13, nch)
        blob = M.encode_png(px)
        w, h, got_mode, got = M.decode_image_bytes(blob)
        assert (w, h, got_mode) == (20, 13, mode)
        assert np.array_equal(got, px)


def test_stdlib_png_roundtrip_property_random_geometry():
    """Hypothesis sweep of the codec pair: ANY HxW[xC] uint8 raster
    (1-pixel axes included) survives encode_png -> decode_image_bytes
    bit-exactly with the right mode label."""
    from hypothesis import given, settings, strategies as st

    import numpy as np

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        nch=st.sampled_from([1, 3, 4]),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(w, h, nch, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, (h, w, nch)).astype("uint8")
        got_w, got_h, mode, got = M.decode_image_bytes(M.encode_png(px))
        assert (got_w, got_h) == (w, h)
        assert mode == {1: "L", 3: "RGB", 4: "RGBA"}[nch]
        assert np.array_equal(got, px)

    check()


def test_stdlib_png_filter_reversal_all_filters():
    """Hand-filter scanlines with each PNG filter type (Sub/Up/Average/
    Paeth per RFC 2083 §6) and check the decoder reconstructs the exact
    pixels — the part of PNG decode that is NOT just zlib."""
    import struct
    import zlib

    import numpy as np

    px = _checker(9, 5, 3)  # 5 rows -> filters 0..4, one each
    h, w, nch = px.shape
    stride = w * nch

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = bytearray()
    prior = bytes(stride)
    for y in range(h):
        line = px[y].tobytes()
        f = y % 5
        raw.append(f)
        for i in range(stride):
            left = line[i - nch] if i >= nch else 0
            up = prior[i]
            ul = prior[i - nch] if i >= nch else 0
            if f == 0:
                v = line[i]
            elif f == 1:
                v = (line[i] - left) & 0xFF
            elif f == 2:
                v = (line[i] - up) & 0xFF
            elif f == 3:
                v = (line[i] - ((left + up) >> 1)) & 0xFF
            else:
                v = (line[i] - paeth(left, up, ul)) & 0xFF
            raw.append(v)
        prior = line

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    got_w, got_h, mode, got = M.decode_image_bytes(blob)
    assert (got_w, got_h, mode) == (w, h, "RGB")
    assert np.array_equal(got, px)


def test_stdlib_png_error_taxonomy():
    import pytest as _pytest

    blob = bytearray(M.encode_png(_checker(8, 8, 3)))
    # flip a byte inside IDAT: CRC mismatch -> ValueError (corrupt)
    corrupt = bytearray(blob)
    corrupt[-20] ^= 0xFF
    with _pytest.raises(ValueError):
        M.decode_image_bytes(bytes(corrupt))
    # interlaced flag: valid PNG feature outside the mini-codec's core
    # -> NotImplementedError (needs Pillow), NOT a quarantine
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 2, 0, 0, 1)
    inter = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        + blob[8 + 12 + 13:]
    )
    with _pytest.raises(NotImplementedError):
        M.decode_image_bytes(bytes(inter))
    # unrecognized magic -> NotImplementedError
    with _pytest.raises(NotImplementedError):
        M.decode_image_bytes(b"plainly not an image")
    assert M.sniff_image_format(b"plainly not an image") is None
    # truncation -> ValueError
    with _pytest.raises(ValueError):
        M.decode_image_bytes(bytes(blob[: len(blob) // 2]))


def test_stdlib_ppm_decode_with_comments():
    import numpy as np

    px = _checker(6, 4, 3)
    blob = b"P6 # comment\n# another\n 6 4\n255\n" + px.tobytes()
    w, h, mode, got = M.decode_image_bytes(blob)
    assert (w, h, mode) == (6, 4, "RGB")
    assert np.array_equal(got, px)
    gray = _checker(5, 3, 1)
    blob5 = b"P5\n5 3\n255\n" + gray.tobytes()
    w, h, mode, got = M.decode_image_bytes(blob5)
    assert (w, h, mode) == (5, 3, "L")
    assert np.array_equal(got, gray)
    with pytest.raises(ValueError):
        M.decode_image_bytes(b"P6\n6 4\n255\n" + px.tobytes()[:-5])


def test_ppm_sniff_requires_header_digit():
    """Prose that merely STARTS with the PPM magic ('P6 is...') must hit
    the honest not-an-image gate (NotImplementedError), not the corrupt-
    image quarantine (ValueError): the sniff requires a digit after the
    magic's whitespace/comment run."""
    for text in (
        b"P6 is the binary RGB netpbm format",
        b"P5\tnotes on grayscale payloads",
        b"P6 # only a comment, no header digits",
        b"P6 ",  # magic + whitespace, then nothing
    ):
        assert M.sniff_image_format(text) is None
        with pytest.raises(NotImplementedError):
            M.decode_image_bytes(text)
    # comments between magic and dimensions still sniff as PPM
    assert M.sniff_image_format(b"P6 # c\n# c2\n 6 4\n255\n") == "ppm"
    assert M.sniff_image_format(b"P5\n5 3\n255\n") == "ppm"


# --- stdlib codec through the Spark operators (no-Pillow environments) --


@pytest.mark.skipif(
    _PIL_IMAGE is not None,
    reason="Pillow installed: decode_media prefers the PIL codec",
)
def test_decode_media_stdlib_real_bytes(spark):
    """The round-9 unblock: real decode runs WITHOUT Pillow — PNG and
    PPM payloads yield true dimensions through the full mapInPandas
    path, corrupt bytes of a recognized format quarantine as nulls."""
    png = M.encode_png(_checker(48, 32, 3))
    gray_png = M.encode_png(_checker(10, 7, 1))
    ppm = b"P6\n25 9\n255\n" + _checker(25, 9, 3).tobytes()
    corrupt = bytearray(png)
    corrupt[-20] ^= 0xFF  # IDAT CRC break
    df = spark.createDataFrame(
        [
            (1, bytearray(png)),
            (2, bytearray(gray_png)),
            (3, bytearray(ppm)),
            (4, corrupt),
        ],
        "doc_id long, payload binary",
    )
    dims = {
        r.doc_id: (r.width, r.height, r.mode)
        for r in M.decode_media(df).collect()
    }
    assert dims[1] == (48, 32, "RGB")
    assert dims[2] == (10, 7, "L")
    assert dims[3] == (25, 9, "RGB")
    assert dims[4] == (None, None, None)


@pytest.mark.skipif(
    _PIL_IMAGE is not None,
    reason="Pillow installed: resize_media prefers the PIL codec",
)
def test_resize_media_stdlib_lanczos_roundtrip(spark):
    """No-Pillow resize: the numpy LANCZOS-3 resampler over
    stdlib-decoded pixels, re-encoded as a real PNG the stdlib decoder
    can read back; a solid color survives resizing exactly (border
    renormalization makes constants a fixed point), a non-trivial image
    matches a direct ``resample_image`` call bit-for-bit through the
    full mapInPandas path; corrupt payloads quarantine."""
    import numpy as np

    solid = np.full((48, 64, 3), (200, 10, 10), dtype="uint8")
    grad = _checker(64, 48, 3)
    png = M.encode_png(solid)
    corrupt = bytearray(png)
    corrupt[-20] ^= 0xFF
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, corrupt), (3, bytearray(M.encode_png(grad)))],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in M.resize_media(df, 224, 224).collect()}
    w, h, mode, px = M.decode_image_bytes(bytes(out[1]["thumb"]))
    assert (w, h, mode) == (224, 224, "RGB")
    assert (px == np.array([200, 10, 10], dtype="uint8")).all()
    assert (out[1]["thumb_width"], out[1]["thumb_height"]) == (224, 224)
    assert out[2]["thumb"] is None  # corrupt -> quarantined
    _, _, _, got = M.decode_image_bytes(bytes(out[3]["thumb"]))
    assert np.array_equal(got, M.resample_image(grad, 224, 224))


# --- numpy resampler: pure-function tests (run in EVERY environment) -----


def _ref_resample(arr, width, height, kernel):
    """Scalar-loop re-derivation of the separable support-scaled
    convolution (independent of the vectorized einsum path): for each
    output pixel, taps within `support * max(scale, 1)` of the projected
    center, kernel stretched by the same factor, clipped window
    renormalized to sum 1. Rows first, then columns — same pass order as
    ``resample_image`` so float64 intermediates agree bit-for-bit."""
    import math

    import numpy as np

    a = 3.0 if kernel == "lanczos" else 1.0

    def kval(x):
        if kernel == "bilinear":
            return max(0.0, 1.0 - abs(x))
        if abs(x) < 1e-12:
            return 1.0
        if abs(x) >= a:
            return 0.0
        return (
            a
            * math.sin(math.pi * x)
            * math.sin(math.pi * x / a)
            / (math.pi * math.pi * x * x)
        )

    def axis0(src, out_size):
        in_size = src.shape[0]
        scale = in_size / out_size
        fscale = max(scale, 1.0)
        support = a * fscale
        out = np.zeros((out_size,) + src.shape[1:], dtype=np.float64)
        for i in range(out_size):
            center = (i + 0.5) * scale
            lo = max(int(math.floor(center - support + 0.5)), 0)
            hi = min(int(math.floor(center + support + 0.5)), in_size)
            ws = [kval((t + 0.5 - center) / fscale) for t in range(lo, hi)]
            tot = sum(ws)
            for t, w in zip(range(lo, hi), ws):
                out[i] += src[t] * (w / tot)
        return out

    x = np.asarray(arr).astype(np.float64)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[:, :, None]
    if x.shape[0] != height:
        x = axis0(x, height)
    if x.shape[1] != width:
        x = axis0(x.transpose(1, 0, 2), width).transpose(1, 0, 2)
    out = np.clip(np.floor(x + 0.5), 0, 255).astype(np.uint8)
    return out[:, :, 0] if squeeze else out


def test_resample_identity_is_exact():
    # at 1:1 scale both kernels put weight 1 on the center tap and 0 on
    # the rest (lanczos is 0 at nonzero integers), so output == input
    import numpy as np

    px = _checker(23, 17, 3)
    for kernel in ("lanczos", "bilinear"):
        assert np.array_equal(
            M.resample_image(px, 23, 17, kernel=kernel), px
        )


def test_resample_constant_fixed_point():
    # clipped-window renormalization -> a solid color survives ANY
    # resize exactly, up or down, gray or RGB
    import numpy as np

    for shape in ((9, 5), (9, 5, 3)):
        px = np.full(shape, 137, dtype="uint8")
        for w, h in ((1, 1), (3, 20), (50, 2), (224, 224)):
            for kernel in ("lanczos", "bilinear"):
                out = M.resample_image(px, w, h, kernel=kernel)
                assert out.shape[:2] == (h, w)
                assert (out == 137).all()


def test_resample_matches_scalar_reference():
    import numpy as np

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (19, 31, 3)).astype("uint8")
    gray = px[:, :, 0]
    for kernel in ("lanczos", "bilinear"):
        for w, h in ((8, 5), (64, 40), (31, 5), (8, 19)):
            assert np.array_equal(
                M.resample_image(px, w, h, kernel=kernel),
                _ref_resample(px, w, h, kernel),
            ), (kernel, w, h)
            assert np.array_equal(
                M.resample_image(gray, w, h, kernel=kernel),
                _ref_resample(gray, w, h, kernel),
            ), (kernel, w, h, "gray")


def test_resample_property_random_geometry():
    """Property sweep: for ANY input/output geometry (1-pixel axes,
    extreme aspect ratios, up/down per-axis mixes) and either kernel,
    the vectorized resampler equals the scalar reference and preserves
    constants exactly."""
    from hypothesis import given, settings, strategies as st

    import numpy as np

    @settings(max_examples=40, deadline=None)
    @given(
        in_w=st.integers(1, 40),
        in_h=st.integers(1, 40),
        out_w=st.integers(1, 48),
        out_h=st.integers(1, 48),
        nch=st.sampled_from([0, 1, 3]),  # 0 = 2-D grayscale
        kernel=st.sampled_from(["lanczos", "bilinear"]),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(in_w, in_h, out_w, out_h, nch, kernel, seed):
        rng = np.random.default_rng(seed)
        shape = (in_h, in_w) if nch == 0 else (in_h, in_w, nch)
        px = rng.integers(0, 256, shape).astype("uint8")
        got = M.resample_image(px, out_w, out_h, kernel=kernel)
        assert got.shape[:2] == (out_h, out_w)
        assert got.dtype == np.uint8
        assert np.array_equal(got, _ref_resample(px, out_w, out_h, kernel))
        const = np.full(shape, 201, dtype="uint8")
        assert (
            M.resample_image(const, out_w, out_h, kernel=kernel) == 201
        ).all()

    check()


def test_resample_rejects_unknown_kernel():
    import numpy as np

    with pytest.raises(ValueError, match="kernel"):
        M.resample_image(np.zeros((4, 4), dtype="uint8"), 2, 2, kernel="box")


def test_to_grayscale_itu601():
    import numpy as np

    px = _checker(12, 7, 3)
    r, g, b = (px[:, :, i].astype("int64") for i in range(3))
    expect = ((r * 299 + g * 587 + b * 114) // 1000).astype("uint8")
    assert np.array_equal(M.to_grayscale(px), expect)
    gray = px[:, :, 0]
    assert np.array_equal(M.to_grayscale(gray), gray)  # passthrough
    assert np.array_equal(M.to_grayscale(gray[:, :, None]), gray)


@pytest.mark.skipif(_PIL_IMAGE is None, reason="Pillow not installed")
def test_resample_parity_with_pillow():
    """The stdlib resampler implements the same support-scaled separable
    convolution Pillow's LANCZOS/BILINEAR resize runs; Pillow accumulates
    in fixed-point (8bpc precision bits) vs our float64, so allow ±2."""
    import numpy as np

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (37, 53, 3)).astype("uint8")
    resampling = getattr(_PIL_IMAGE, "Resampling", _PIL_IMAGE)
    for kernel, pil_kernel in (
        ("lanczos", resampling.LANCZOS),
        ("bilinear", resampling.BILINEAR),
    ):
        for w, h in ((16, 16), (96, 80)):
            theirs = np.asarray(
                _PIL_IMAGE.fromarray(px).resize((w, h), pil_kernel)
            )
            ours = M.resample_image(px, w, h, kernel=kernel)
            diff = np.abs(
                ours.astype("int64") - theirs.astype("int64")
            ).max()
            assert diff <= 2, (kernel, w, h, diff)


@pytest.mark.skipif(
    _PIL_IMAGE is not None,
    reason="Pillow installed: decoded_phash prefers the PIL codec",
)
def test_decoded_phash_stdlib_path(spark):
    """No-Pillow decoded_phash: stdlib decode + numpy BILINEAR tile.
    Lossless re-encodes of the same pixels hash identically, a different
    image differs, corrupt recognized bytes quarantine as null, and a
    payload NO codec recognizes still hits the honest gate."""
    import numpy as np

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (32, 48, 3)).astype("uint8")
    png = M.encode_png(px)
    # a second, byte-different PNG of the SAME pixels: as PPM
    ppm = b"P6\n48 32\n255\n" + px.tobytes()
    neg = M.encode_png(255 - px)
    corrupt = bytearray(png)
    corrupt[-20] ^= 0xFF
    df = spark.createDataFrame(
        [
            (1, bytearray(png)),
            (2, bytearray(ppm)),
            (3, bytearray(neg)),
            (4, corrupt),
        ],
        "doc_id long, payload binary",
    )
    ph = {r.doc_id: r.phash for r in M.decoded_phash(df).collect()}
    assert ph[1] == ph[2]      # same decoded pixels, different container
    assert ph[1] != ph[3]
    assert ph[4] is None       # corrupt recognized bytes -> quarantine
    bad = spark.createDataFrame(
        [(9, bytearray(b"definitely not an image"))],
        "doc_id long, payload binary",
    )
    with pytest.raises(Exception) as exc_info:
        M.decoded_phash(bad).collect()
    assert "NotImplementedError" in str(exc_info.value)


def test_decoder_tier_resolution(monkeypatch):
    """tier='stdlib' must NEVER consult Pillow — that is what makes the
    pinned hash bit-identical with and without Pillow installed. The
    fake module stands in for 'Pillow is installed'; the None patch for
    'it is not'. (The e2e value identity is pinned by the test below.)"""
    sentinel = object()
    monkeypatch.setattr(M, "_try_import_pil", lambda: sentinel)
    assert M._resolve_decoder_tier("stdlib") is None  # ignores Pillow
    assert M._resolve_decoder_tier("auto") is sentinel
    assert M._resolve_decoder_tier("pillow") is sentinel
    monkeypatch.setattr(M, "_try_import_pil", lambda: None)
    assert M._resolve_decoder_tier("stdlib") is None
    assert M._resolve_decoder_tier("auto") is None
    with pytest.raises(ImportError, match="pinned to 'pillow'"):
        M._resolve_decoder_tier("pillow")


def test_decoded_phash_tier_stdlib_is_pillow_independent(spark):
    """tier='stdlib' output equals the pure-stdlib computation (the same
    decode -> ITU-601 luma -> BILINEAR tile -> aHash integer math, run
    locally). Because the expectation never touches Pillow, this test
    asserts the SAME hash values in a Pillow-less env and in a
    Pillow-installed env — the fleet-uniformity contract of the pin."""
    import numpy as np

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (24, 40, 3)).astype("uint8")
    png = M.encode_png(px)

    tile = M.resample_image(
        M.to_grayscale(px), 8, 8, kernel="bilinear"
    ).astype("int64").ravel()
    total = int(tile.sum())
    expected = 0
    for j in range(64):
        if int(tile[j]) * 64 > total:
            expected |= 1 << j
    if expected >= 1 << 63:
        expected -= 1 << 64

    df = spark.createDataFrame(
        [(1, bytearray(png))], "doc_id long, payload binary"
    )
    got = {
        r.doc_id: r.phash
        for r in M.decoded_phash(df, tier="stdlib").collect()
    }
    assert got[1] == expected
    if _PIL_IMAGE is None:
        # without Pillow, auto falls back to the same stdlib path
        auto = {
            r.doc_id: r.phash for r in M.decoded_phash(df).collect()
        }
        assert auto[1] == expected


def test_decoded_phash_tier_validation(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"P5\n2 2\n255\n\x00\x40\x80\xc0"))],
        "doc_id long, payload binary",
    )
    with pytest.raises(ValueError, match="tier must be"):
        M.decoded_phash(df, tier="fast")
    if _PIL_IMAGE is None:
        with pytest.raises(Exception) as exc_info:
            M.decoded_phash(df, tier="pillow").collect()
        assert "pinned to 'pillow'" in str(exc_info.value)


@pytest.mark.skipif(_PIL_IMAGE is None, reason="Pillow not installed")
def test_real_decode_and_phash_over_decoded_pixels(spark):
    # the optional-dependency path: true dims from PIL, identical pixels
    # under different PNG encodings -> identical aHash, corrupt payloads
    # quarantined as nulls instead of failing the task
    import io

    import numpy as np

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (32, 48, 3)).astype("uint8")

    def png_bytes(arr, **kw):
        buf = io.BytesIO()
        _PIL_IMAGE.fromarray(arr).save(buf, format="PNG", **kw)
        return buf.getvalue()

    rows = [
        (1, bytearray(png_bytes(px))),
        (2, bytearray(png_bytes(px, compress_level=9))),  # same pixels
        (3, bytearray(png_bytes(255 - px))),              # different image
        (4, bytearray(b"definitely not an image")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    dims = {
        r.doc_id: (r.width, r.height, r.mode)
        for r in M.decode_media(df).collect()
    }
    assert dims[1] == (48, 32, "RGB")
    assert dims[2] == (48, 32, "RGB")
    assert dims[4] == (None, None, None)
    ph = {r.doc_id: r.phash for r in M.decoded_phash(df).collect()}
    assert ph[1] == ph[2]      # lossless re-encode, same decoded pixels
    assert ph[1] != ph[3]
    assert ph[4] is None


def test_synthetic_png_media_real_decode_with_pixel_sum(spark):
    """The oracle-proven loop (multimodal_real_decode): closed-form
    geometry/content -> encode_png -> real decode -> px_sum matches the
    analytic formula; corrupt payloads quarantine px_sum as null; the
    fake stub refuses pixel_sum."""
    import numpy as np

    docs = spark.createDataFrame(
        [(i,) for i in (0, 1, 7, 62)], "doc_id long"
    )
    media = M.synthetic_png_media(docs)
    got = {
        r.doc_id: r
        for r in M.decode_media(media, pixel_sum=True).collect()
    }
    for i in (0, 1, 7, 62):
        w, h = i % 31 + 2, i % 17 + 2
        nch = 3 if i % 2 == 0 else 1
        expect = sum(
            (i + x + 5 * y + 40 * c) % 256
            for x in range(w)
            for y in range(h)
            for c in range(nch)
        )
        r = got[i]
        assert (r.width, r.height) == (w, h)
        assert r.mode == ("RGB" if nch == 3 else "L")
        assert r.px_sum == expect
    # corrupt recognized bytes -> all-null quarantine incl. px_sum
    png = bytearray(M.encode_png(np.zeros((4, 4), dtype="uint8")))
    png[-20] ^= 0xFF
    bad = spark.createDataFrame(
        [(9, png)], "doc_id long, payload binary"
    )
    row = M.decode_media(bad, pixel_sum=True).collect()[0]
    assert (row.width, row.px_sum) == (None, None)
    with pytest.raises(ValueError, match="pixel_sum"):
        M.decode_media(bad, fake_decode=True, pixel_sum=True)


def test_fake_decode_deterministic(media):
    a = {r.doc_id: (r.width, r.height, r.mode) for r in
         M.decode_media(media, fake_decode=True).collect()}
    b = {r.doc_id: (r.width, r.height, r.mode) for r in
         M.decode_media(media, fake_decode=True).collect()}
    assert a == b
    w, h, mode = a[1]  # 300 x 'a' (0x61 = 97)
    assert w == 97 % 64 + 1
    assert h == 300 % 64 + 1
    assert mode == "RGB"


def test_byte_histogram_shares_sum_to_one(media):
    rows = M.byte_histogram_features(media, bins=16).collect()
    by_id = {r.doc_id: r.features for r in rows}
    assert len(by_id[0]) == 16
    assert abs(sum(by_id[0]) - 1.0) < 1e-9
    # 'a' = 0x61 -> bin 6 exclusively
    assert by_id[1][6] == 1.0
    # empty payload: all-zero histogram, no crash
    assert sum(by_id[3]) == 0.0


def test_frame_sample_fanout_and_digests(media):
    frames = M.frame_sample(media, frame_size=100, every_nth=2).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.doc_id, []).append(r)
    # 300 bytes / 100 per frame = 3 frames; every 2nd -> idx 0, 2
    idxs = sorted(r.frame_idx for r in by_id[1])
    assert idxs == [0, 2]
    f0 = next(r for r in by_id[1] if r.frame_idx == 0)
    assert bytes(f0.frame) == b"a" * 100
    assert f0.frame_digest == hashlib.md5(b"a" * 100).hexdigest()
    # empty payload still yields exactly one (empty) frame
    assert [r.frame_idx for r in by_id[3]] == [0]


def test_media_phash_matches_pure_python_and_partitioning(spark):
    from kafka_stream_unify_order_messages_spark.operators.multimodal import (
        media_phash,
        synthetic_media,
    )

    texts = [
        (1, "hello world this is a payload with some variety 0123"),
        (2, "hello world this is a payload with some variety 0123"),
        (3, "aaaaaaaaaaaaaaaa"),  # uniform bytes -> no bit set
        (4, "zz" * 40 + "aa" * 40),  # high then low halves
    ]

    def py_phash(s: str, bits: int = 32) -> int:
        bs = s.encode()
        n = len(bs)
        csum = [0] * bits
        clen = [0] * bits
        for i, byte in enumerate(bs):
            j = (i * bits) // n
            csum[j] += byte
            clen[j] += 1
        total = sum(bs)
        return sum(
            1 << j
            for j in range(bits)
            if csum[j] * n > total * clen[j]
        )

    expect = {i: py_phash(t) for i, t in texts}
    for n_parts in (1, 6):
        docs = spark.createDataFrame(texts, ["doc_id", "text"]).repartition(
            n_parts
        )
        got = {
            r["doc_id"]: r["phash"]
            for r in media_phash(synthetic_media(docs)).collect()
        }
        assert got == expect, f"n_parts={n_parts}"
    assert expect[1] == expect[2]  # identical payloads -> identical hash
    assert expect[3] == 0
    assert expect[4] != 0


def test_media_phash_pairs_find_exact_reupload(spark):
    from kafka_stream_unify_order_messages_spark.operators.dedup import (
        hamming_pairs,
    )
    from kafka_stream_unify_order_messages_spark.operators.multimodal import (
        media_phash,
        synthetic_media,
    )

    base = "the quick brown fox jumps over the lazy dog " * 3
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, "completely different content here: " + "q9" * 60)],
        ["doc_id", "text"],
    )
    fps = media_phash(synthetic_media(docs))
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_pairs(fps, "doc_id", "phash").collect()
    }
    assert pairs.get((1, 2)) == 0


def test_resize_stub_plumbing_and_null_quarantine(media):
    """fake_decode resize: fixed thumb geometry, deterministic bytes,
    empty payloads quarantine as null thumbs."""
    out = {
        r["doc_id"]: r
        for r in M.resize_media(
            media, width=16, height=16, fake_decode=True
        ).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    for doc_id, r in out.items():
        if doc_id == 3:  # empty payload -> quarantined
            assert r["thumb"] is None
            assert r["thumb_width"] is None and r["thumb_height"] is None
        else:
            assert len(bytes(r["thumb"])) == 16 * 16
            assert (r["thumb_width"], r["thumb_height"]) == (16, 16)
    # deterministic across runs
    again = {
        r["doc_id"]: bytes(r["thumb"]) if r["thumb"] is not None else None
        for r in M.resize_media(
            media, width=16, height=16, fake_decode=True
        ).collect()
    }
    assert again == {
        k: (bytes(v["thumb"]) if v["thumb"] is not None else None)
        for k, v in out.items()
    }


@pytest.mark.skipif(
    _PIL_IMAGE is not None,
    reason="Pillow installed: resize_media takes the real codec path",
)
def test_resize_stub_raises_without_codec(media):
    with pytest.raises(Exception) as exc_info:
        M.resize_media(media, fake_decode=False).collect()
    assert "NotImplementedError" in str(exc_info.value)


@pytest.mark.skipif(_PIL_IMAGE is None, reason="Pillow not installed")
def test_real_resize_roundtrip(spark):
    import io

    img = _PIL_IMAGE.new("RGB", (64, 48), (200, 10, 10))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue())), (2, bytearray(b"not an image"))],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in M.resize_media(df, 224, 224).collect()}
    with _PIL_IMAGE.open(io.BytesIO(bytes(out[1]["thumb"]))) as thumb:
        assert thumb.size == (224, 224)
    assert out[2]["thumb"] is None  # undecodable -> quarantined
