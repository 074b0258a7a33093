"""Multimodal (image/audio/video) column handling.

Design (north-star training-data pipeline): media rides through the engine
as an opaque ``binary`` payload column plus a typed metadata struct —
Spark never interprets the bytes except inside explicitly-invoked
Arrow-batched decode/feature UDFs, so filters/joins/dedup on metadata stay
JVM-side and columnar while payloads stream through untouched.

Decoding resolves through a three-tier codec chain: when Pillow is
importable on the executors (OPTIONAL dependency), ``decode_media`` opens
payloads with the real codec (any format PIL reads) and ``decoded_phash``
computes the classic aHash over real decoded pixels; rows PIL cannot
parse yield nulls (quarantine, don't kill the 100 TB job). Without
Pillow — as in this container — a STDLIB codec (``decode_image_bytes``:
real PNG via zlib inflate + per-scanline filter reversal, plus binary
PPM/PGM) decodes recognized payloads, so the decode and resize contracts
are runtime-proven on real image bytes even here; ``resize_media``'s
stdlib path resizes with a vectorized numpy LANCZOS-3 resampler
(``resample_image``) and ``decoded_phash`` falls back to the stdlib
decode + BILINEAR tile, so no contract is Pillow-gated anymore — Pillow
only widens the set of decodable formats.
Payloads NO codec path recognizes keep the honest stub behavior:
``NotImplementedError`` at execution unless given the deterministic fake
decoder (``fake_decode=True``), which derives pixel-like properties from
the payload bytes. Everything AROUND the decode — schema, partitioning,
``mapInPandas`` batch shape, frame-slicing, feature vectors — is real and
tested in every tier.

Scale notes: payload bytes never shuffle except where semantically
required (frame explode); metadata-only transforms select away the binary
column before any wide operation. Feature extraction is one pass of
Arrow-batched numpy per partition — no driver collection, no Python
row-at-a-time loops.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F

MEDIA_METADATA_FIELDS = (
    "media_type string, n_bytes long, digest string, frame_size int"
)

HISTOGRAM_BINS = 16
DEFAULT_FRAME_SIZE = 256


def synthetic_media(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic fake media corpus: utf-8 payload bytes + metadata.

    Stands in for a real binary ingest (S3 image tarballs etc.); the
    engine-side contract — (id, payload binary, meta struct) — is exactly
    what a real loader would produce.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    media_type = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            media_type.alias("media_type"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("digest"),
            F.lit(DEFAULT_FRAME_SIZE).alias("frame_size"),
        ).alias("meta"),
    )


def synthetic_png_media(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic REAL-PNG media corpus: (id, payload binary) where
    every payload is a valid PNG built with ``encode_png`` from geometry
    and content derived from the id alone —

    - width  = id % 31 + 2, height = id % 17 + 2
    - RGB when id is even, grayscale (L) when odd
    - pixel(y, x, c) = (id + x + 5*y + 40*c) % 256

    Closed-form content makes the real encode -> decode loop
    value-checkable by an oracle that never touches a codec (it computes
    the same dimensions and pixel sum analytically), turning the stdlib
    PNG codec from a pytest-proven into an oracle-proven component. The
    generation runs executor-side via mapInPandas — no driver fan-out,
    embarrassingly parallel, geometry bounded so payloads stay small.
    """
    schema = f"{_id_field_ddl(df, id_col)}, payload binary"

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                w, h = i % 31 + 2, i % 17 + 2
                nch = 3 if i % 2 == 0 else 1
                y, x = np.mgrid[0:h, 0:w]
                px = (
                    i + x[:, :, None] + 5 * y[:, :, None]
                    + 40 * np.arange(nch)
                ) % 256
                payloads.append(encode_png(px.astype(np.uint8)))
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(run, schema)


def media_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Metadata projection WITHOUT the payload — the shape any wide
    operation (join/groupBy/dedup) should run on. Pure Column exprs.
    """
    return df.select(
        F.col(id_col),
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.digest").alias("digest"),
    )


def _try_import_pil():
    """Pillow is an optional dependency resolved on the EXECUTOR (the
    import runs inside the mapInPandas closure, so a cluster whose
    workers have Pillow gets the real codec even if the driver doesn't).
    """
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _resolve_decoder_tier(tier: str):
    """Map a codec-tier pin to the Pillow module to use (or None for the
    stdlib codec). Runs on the EXECUTOR inside the mapInPandas closure.

    - ``"auto"``: Pillow when importable, else the stdlib codec — the
      historical behavior. On a MIXED fleet (some executors have Pillow)
      hash-style consumers get tier-dependent output (the 1-LSB luma
      divergence, see ``to_grayscale``), so auto is only safe when the
      whole fleet is one tier or the consumer is Hamming-tolerant.
    - ``"stdlib"``: NEVER consults Pillow — bit-identical output on
      every executor regardless of what is installed. The pin for
      equality-join consumers on heterogeneous clusters.
    - ``"pillow"``: require Pillow; an executor without it fails loudly
      here instead of silently hashing on the divergent stdlib tier.
    """
    if tier == "stdlib":
        return None
    mod = _try_import_pil()
    if tier == "pillow" and mod is None:
        raise ImportError(
            "decoder tier pinned to 'pillow' but Pillow is not "
            "importable on this executor — install it fleet-wide, or "
            "pin tier='stdlib' for a Pillow-independent hash"
        )
    return mod


# ---------------------------------------------------------------------------
# Stdlib-only image codec (PNG + PPM/PGM): runtime-proves the decode
# contract in codec-less environments. PNG here is the real format —
# zlib-inflated IDAT with per-scanline filter reversal per the PNG spec
# (RFC 2083 §6) — restricted to the common core: 8-bit depth, color
# types 0 (grayscale), 2 (RGB), 6 (RGBA), no interlace. Recognized
# inputs outside that core raise NotImplementedError (an honest gate —
# the payload is a VALID image this mini-codec can't handle; Pillow on
# the executors would); corrupt bytes of a recognized format raise
# ValueError (quarantine). Error taxonomy is load-bearing for
# decode_media's null-vs-raise behavior below.
# ---------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}
_PNG_MODES = {0: "L", 2: "RGB", 6: "RGBA"}


def sniff_image_format(b: bytes) -> str | None:
    """'png' / 'ppm' (P5 PGM counts) when the stdlib codec recognizes
    the payload's magic, else None.

    The PPM check requires a DIGIT after the magic's whitespace/comment
    run, not just the magic itself: prose that merely starts "P6 is..."
    must fall through to the NotImplementedError honest gate (payload is
    not an image), not into _decode_ppm's ValueError (payload is a
    corrupt image) — the two routes quarantine differently."""
    if b[:8] == _PNG_MAGIC:
        return "png"
    if b[:2] in (b"P5", b"P6") and (len(b) > 2 and b[2:3].isspace()):
        pos = 2
        while pos < len(b):
            c = b[pos : pos + 1]
            if c.isspace():
                pos += 1
            elif c == b"#":  # header comment runs to end of line
                while pos < len(b) and b[pos : pos + 1] != b"\n":
                    pos += 1
            else:
                return "ppm" if c.isdigit() else None
        return None
    return None


def _decode_png(b: bytes) -> tuple[int, int, str, np.ndarray]:
    import struct
    import zlib

    if b[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(b):
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(
            ">I", b[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, ct, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("invalid IHDR method fields")
    if interlace != 0:
        raise NotImplementedError("interlaced PNG needs Pillow")
    if depth != 8 or ct not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG bit depth {depth} / color type {ct} needs Pillow"
        )
    nch = _PNG_CHANNELS[ct]
    stride = w * nch
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"IDAT inflate failed: {e}") from e
    if len(raw) != (stride + 1) * h:
        raise ValueError("raster size mismatch")
    out = bytearray(stride * h)
    prior = bytes(stride)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 0:
            pass
        elif f == 1:  # Sub
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prior[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + ((left + prior[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                bb = prior[i]
                c = prior[i - nch] if i >= nch else 0
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (bb if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown filter type {f}")
        out[y * stride : (y + 1) * stride] = line
        prior = bytes(line)
    px = np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, nch)
    return w, h, _PNG_MODES[ct], px


def _decode_ppm(b: bytes) -> tuple[int, int, str, np.ndarray]:
    # P6 (binary RGB) / P5 (binary grayscale); '#' comments allowed in
    # the header per the netpbm spec
    magic = b[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM")
    pos, fields = 2, []
    while len(fields) < 3:
        if pos >= len(b):
            raise ValueError("truncated PPM header")
        c = b[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isdigit():
            start = pos
            while pos < len(b) and b[pos : pos + 1].isdigit():
                pos += 1
            fields.append(int(b[start:pos]))
        else:
            raise ValueError("bad PPM header byte")
    w, h, maxval = fields
    if w <= 0 or h <= 0:
        raise ValueError("bad PPM dimensions")
    if maxval > 255:
        raise NotImplementedError("16-bit PPM needs Pillow")
    pos += 1  # single whitespace after maxval
    nch = 3 if magic == b"P6" else 1
    need = w * h * nch
    raster = b[pos : pos + need]
    if len(raster) != need:
        raise ValueError("truncated PPM raster")
    px = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, nch)
    return w, h, ("RGB" if nch == 3 else "L"), px


def decode_image_bytes(b: bytes) -> tuple[int, int, str, np.ndarray]:
    """Stdlib-only decode of a recognized payload: (width, height, mode,
    pixels HxWxC uint8). ValueError = corrupt bytes of a recognized
    format (quarantine); NotImplementedError = valid but outside the
    mini-codec's core (needs Pillow). Unrecognized magic also raises
    NotImplementedError — use ``sniff_image_format`` to pre-screen."""
    fmt = sniff_image_format(bytes(b))
    if fmt == "png":
        return _decode_png(bytes(b))
    if fmt == "ppm":
        return _decode_ppm(bytes(b))
    raise NotImplementedError("unrecognized image format; needs Pillow")


def encode_png(px: np.ndarray) -> bytes:
    """Minimal stdlib PNG encoder (filter 0 scanlines, one IDAT): the
    re-encode half of the no-Pillow resize path, and the fixture factory
    for the codec tests. Accepts HxW (grayscale) or HxWx{1,3,4} uint8."""
    import struct
    import zlib

    arr = np.asarray(px, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nch = arr.shape
    ct = {1: 0, 3: 2, 4: 6}[nch]
    raw = b"".join(
        b"\x00" + arr[y].tobytes() for y in range(h)
    )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return (
        _PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# Stdlib resampler (vectorized numpy, no Pillow): the separable
# support-scaled convolution every raster library uses — for each output
# pixel, taps cover `support * max(in/out, 1)` input pixels around the
# projected center and the kernel is stretched by the same factor when
# downscaling (plain kernel-at-integer-offsets aliases badly below 1:1).
# LANCZOS-3 is the quality kernel (windowed sinc, a=3); BILINEAR (triangle,
# a=1) matches the cheap kernel `decoded_phash` uses under Pillow. Border
# taps are clipped and the remaining window renormalized to sum 1, so a
# constant image is a fixed point of any resize.
# ---------------------------------------------------------------------------

_RESAMPLE_SUPPORT = {"lanczos": 3.0, "bilinear": 1.0}


def _kernel_values(kernel: str, x: np.ndarray) -> np.ndarray:
    if kernel == "bilinear":
        return np.maximum(0.0, 1.0 - np.abs(x))
    a = _RESAMPLE_SUPPORT["lanczos"]
    ax = np.abs(x)
    # sinc(x) * sinc(x/a) on |x| < a; the x=0 singularity is 1 by limit
    with np.errstate(invalid="ignore", divide="ignore"):
        v = (
            a
            * np.sin(np.pi * x)
            * np.sin(np.pi * x / a)
            / (np.pi * np.pi * x * x)
        )
    return np.where(ax < 1e-12, 1.0, np.where(ax < a, v, 0.0))


def _resample_weights(
    in_size: int, out_size: int, kernel: str
) -> tuple[np.ndarray, np.ndarray]:
    """(taps, weights), each (out_size, n_taps): output pixel i is the dot
    product of weights[i] with input pixels taps[i]. Tap windows at the
    image border are clipped and renormalized (weights always sum to 1);
    out-of-window taps carry weight 0 with an in-range index."""
    scale = in_size / out_size
    fscale = max(scale, 1.0)
    support = _RESAMPLE_SUPPORT[kernel] * fscale
    centers = (np.arange(out_size, dtype=np.float64) + 0.5) * scale
    lo = np.clip(np.floor(centers - support + 0.5), 0, None).astype(np.int64)
    hi = np.minimum(np.floor(centers + support + 0.5), in_size).astype(
        np.int64
    )
    taps = lo[:, None] + np.arange(int((hi - lo).max()))[None, :]
    w = _kernel_values(kernel, (taps + 0.5 - centers[:, None]) / fscale)
    w[taps >= hi[:, None]] = 0.0
    w /= w.sum(axis=1, keepdims=True)
    return np.minimum(taps, in_size - 1), w


def _resample_rows(arr: np.ndarray, out_size: int, kernel: str) -> np.ndarray:
    """Resample axis 0 of a float (H, W, C) array to out_size rows."""
    taps, w = _resample_weights(arr.shape[0], out_size, kernel)
    # gather (out, taps, W, C) then contract the tap axis — one einsum,
    # no Python loop over pixels
    return np.einsum("ok,okwc->owc", w, arr[taps])


def resample_image(
    px: np.ndarray, width: int, height: int, kernel: str = "lanczos"
) -> np.ndarray:
    """Resize an HxW[xC] uint8 raster to (height, width) with a real
    filter kernel — the stdlib half of ``resize_media``'s LANCZOS
    contract (Pillow's resize does the same separable support-scaled
    convolution; parity is pinned by a Pillow-gated test). Accumulates in
    float64 through both passes, then rounds half-up and clips to uint8
    (LANCZOS lobes go negative, so ringing past 0/255 must clip)."""
    if kernel not in _RESAMPLE_SUPPORT:
        raise ValueError(f"unknown resample kernel {kernel!r}")
    arr = np.asarray(px)
    squeeze = arr.ndim == 2
    if squeeze:
        arr = arr[:, :, None]
    out = arr.astype(np.float64)
    if out.shape[0] != height:
        out = _resample_rows(out, height, kernel)
    if out.shape[1] != width:
        out = _resample_rows(out.transpose(1, 0, 2), width, kernel)
        out = out.transpose(1, 0, 2)
    out = np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
    return out[:, :, 0] if squeeze else out


def to_grayscale(px: np.ndarray) -> np.ndarray:
    """ITU-R 601 luma, L = (R*299 + G*587 + B*114) // 1000. Matches
    Pillow's ``convert("L")`` to within 1 LSB — Pillow uses rounded
    fixed-point (L = (R*19595 + G*38470 + B*7471 + 0x8000) >> 16), which
    can differ by 1 on near-boundary pixels, so hash-style consumers
    (``decoded_phash``) agree across the Pillow/stdlib tiers only within
    a small Hamming distance, not bit-exactly. Alpha is ignored,
    single-channel input passes through."""
    arr = np.asarray(px)
    if arr.ndim == 2:
        return arr
    if arr.shape[2] == 1:
        return arr[:, :, 0]
    r, g, b = (arr[:, :, i].astype(np.int64) for i in range(3))
    return ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)


def decode_media(
    df: DataFrame,
    id_col: str = "doc_id",
    fake_decode: bool = False,
    pixel_sum: bool = False,
) -> DataFrame:
    """Decode payloads to (id, width, height, mode) via mapInPandas.

    ``pixel_sum=True`` appends a ``px_sum bigint`` column — the sum of
    every decoded channel byte — a cheap content checksum for corruption
    auditing, and the hook that lets an oracle value-check REAL decodes
    of closed-form content (``synthetic_png_media``). Incompatible with
    ``fake_decode`` (the stub has no pixels to sum).

    Decoder resolution, one schema throughout:
    - Pillow importable on executors (optional dependency): REAL decode —
      ``PIL.Image.open`` per payload; rows PIL cannot parse yield null
      width/height/mode instead of failing the task (a 100 TB corpus
      always contains corrupt blobs; quarantine with
      ``filter(width IS NULL)``, don't retry the job).
    - no Pillow, payload magic recognized by the stdlib codec (PNG /
      binary PPM/PGM — see ``decode_image_bytes``): REAL decode via
      zlib + filter reversal; corrupt bytes of a recognized format
      quarantine as nulls exactly like the Pillow path; recognized-but-
      unsupported features (interlace, 16-bit, palette) raise — they are
      valid images this environment genuinely cannot decode.
    - ``fake_decode=True``: deterministic stub deriving dimensions from
      the payload bytes, so the full pipeline is testable end-to-end
      regardless of payload format.
    - no codec path applies (no Pillow AND unrecognized magic): the
      returned DataFrame raises ``NotImplementedError`` on execution —
      an honest gate, not silent garbage.
    """
    if pixel_sum and fake_decode:
        raise ValueError("pixel_sum requires a real decode path")
    schema = f"{_id_field_ddl(df, id_col)}, width int, height int, mode string"
    if pixel_sum:
        schema += ", px_sum bigint"

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        image_mod = None if fake_decode else _try_import_pil()
        for pdf in pdfs:
            if fake_decode:
                payloads = pdf["payload"]
                n = payloads.str.len().to_numpy()
                first = payloads.str[0:1].apply(
                    lambda b: b[0] if len(b) else 0
                ).to_numpy()
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "width": (first % 64 + 1).astype("int32"),
                        "height": (n % 64 + 1).astype("int32"),
                        "mode": np.where(n % 2 == 0, "RGB", "L"),
                    }
                )
                continue
            import io

            widths: list = []
            heights: list = []
            modes: list = []
            sums: list = []
            for b in pdf["payload"]:
                bb = bytes(b)
                if image_mod is None:
                    # stdlib fallback: real decode for recognized
                    # formats; honest NotImplementedError otherwise
                    if sniff_image_format(bb) is None:
                        raise NotImplementedError(
                            "payload format not decodable without an "
                            "image codec library (Pillow); the stdlib "
                            "fallback handles PNG and binary PPM/PGM — "
                            "pass fake_decode=True for the "
                            "deterministic stub"
                        )
                    try:
                        w, h, mode, _px = decode_image_bytes(bb)
                        widths.append(w)
                        heights.append(h)
                        modes.append(mode)
                        sums.append(
                            int(np.asarray(_px, dtype=np.int64).sum())
                            if pixel_sum
                            else None
                        )
                    except ValueError:  # corrupt bytes -> quarantine
                        widths.append(None)
                        heights.append(None)
                        modes.append(None)
                        sums.append(None)
                    continue
                try:
                    # Decode to locals FIRST, append once after: Pillow's
                    # open() parses only headers, so width/height/mode are
                    # available before np.asarray forces the pixel decode —
                    # a valid-header/corrupt-body payload must not leave
                    # the lists misaligned when the full decode raises.
                    with image_mod.open(io.BytesIO(bb)) as im:
                        w, h, mode = im.width, im.height, im.mode
                        s = (
                            int(np.asarray(im, dtype=np.int64).sum())
                            if pixel_sum
                            else None
                        )
                    widths.append(w)
                    heights.append(h)
                    modes.append(mode)
                    sums.append(s)
                except Exception:  # noqa: BLE001 — any undecodable
                    # payload becomes a quarantine row
                    widths.append(None)
                    heights.append(None)
                    modes.append(None)
                    sums.append(None)
            cols = {
                id_col: pdf[id_col],
                "width": pd.array(widths, dtype="Int32"),
                "height": pd.array(heights, dtype="Int32"),
                "mode": modes,
            }
            if pixel_sum:
                cols["px_sum"] = pd.array(sums, dtype="Int64")
            yield pd.DataFrame(cols)

    return df.select(id_col, "payload").mapInPandas(run, schema)


def resize_media(
    df: DataFrame,
    width: int = 224,
    height: int = 224,
    id_col: str = "doc_id",
    fake_decode: bool = False,
) -> DataFrame:
    """Resize payloads to a fixed (width, height) thumbnail and re-encode:
    (id, thumb binary, thumb_width, thumb_height) via mapInPandas — the
    standard normalize-before-feature-extraction step of an image
    training pipeline. Same decoder-resolution contract as
    ``decode_media``: Pillow on the executors does a real LANCZOS resize
    + PNG re-encode (undecodable payloads quarantine as null thumbs);
    without Pillow, payloads the stdlib codec recognizes (PNG / binary
    PPM/PGM) get a real decode + the numpy LANCZOS-3 resampler
    (``resample_image`` — same support-scaled separable convolution
    Pillow runs, parity pinned by a Pillow-gated test) + stdlib PNG
    re-encode; ``fake_decode`` derives
    a deterministic pseudo-thumbnail from the payload bytes so the
    Spark-side plumbing (schema, batching, null quarantine) is testable
    regardless of payload format; no codec path at all raises an honest
    ``NotImplementedError``. Batch shape: one Arrow batch in, one out —
    never a Python call per row.
    """
    schema = (
        f"{_id_field_ddl(df, id_col)}, thumb binary, "
        "thumb_width int, thumb_height int"
    )

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        image_mod = None if fake_decode else _try_import_pil()
        for pdf in pdfs:
            if fake_decode:
                # deterministic stub: tile the payload bytes to exactly
                # width*height bytes (a fake 8-bit grayscale raster)
                thumbs = [
                    bytes(
                        (b * ((width * height) // max(len(b), 1) + 1))[
                            : width * height
                        ]
                    )
                    if len(b)
                    else None
                    for b in (bytes(x) for x in pdf["payload"])
                ]
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "thumb": thumbs,
                        "thumb_width": pd.array(
                            [width if t is not None else None
                             for t in thumbs],
                            dtype="Int32",
                        ),
                        "thumb_height": pd.array(
                            [height if t is not None else None
                             for t in thumbs],
                            dtype="Int32",
                        ),
                    }
                )
                continue
            import io

            thumbs = []
            for b in pdf["payload"]:
                bb = bytes(b)
                if image_mod is None:
                    if sniff_image_format(bb) is None:
                        raise NotImplementedError(
                            "payload format not resizable without an "
                            "image codec library (Pillow); the stdlib "
                            "fallback handles PNG and binary PPM/PGM — "
                            "pass fake_decode=True for the "
                            "deterministic stub"
                        )
                    try:
                        _w, _h, _mode, px = decode_image_bytes(bb)
                        thumbs.append(
                            encode_png(resample_image(px, width, height))
                        )
                    except ValueError:  # corrupt -> quarantine
                        thumbs.append(None)
                    continue
                try:
                    with image_mod.open(io.BytesIO(bb)) as im:
                        out = io.BytesIO()
                        im.resize(
                            (width, height),
                            resample=image_mod.LANCZOS,
                        ).save(out, format="PNG")
                        thumbs.append(out.getvalue())
                except Exception:  # noqa: BLE001 — quarantine row
                    thumbs.append(None)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "thumb": thumbs,
                    "thumb_width": pd.array(
                        [width if t is not None else None for t in thumbs],
                        dtype="Int32",
                    ),
                    "thumb_height": pd.array(
                        [height if t is not None else None for t in thumbs],
                        dtype="Int32",
                    ),
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, schema)


def decoded_phash(
    df: DataFrame,
    id_col: str = "doc_id",
    hash_size: int = 8,
    tier: str = "auto",
) -> DataFrame:
    """Perceptual average-hash over REAL decoded pixels: grayscale ->
    ``hash_size``²-pixel BILINEAR resize -> bit j set when pixel j
    exceeds the tile mean. The classic aHash — re-encodings of the same
    image (format/quality changes) produce hashes within a small Hamming
    distance. Same (id, phash long) contract as the byte-level
    ``media_phash``, so ``hamming_pairs`` / ``media_dedup`` consume
    either interchangeably; undecodable payloads yield null.

    Decoder resolution (``tier="auto"``) mirrors ``decode_media``:
    Pillow when importable on the executors (any PIL-readable format;
    unparseable rows quarantine as null); otherwise the stdlib codec +
    the numpy BILINEAR resampler for recognized payloads (PNG / binary
    PPM/PGM — corrupt bytes quarantine, unrecognized magic raises the
    honest ``NotImplementedError`` gate). The two tiers use slightly
    different integer luma roundings (see ``to_grayscale``), so the SAME
    image hashed on a Pillow executor vs a stdlib executor agrees within
    a small Hamming distance, not bit-exactly — fine for the
    ``hamming_pairs`` consumers, but don't join raw hash values across
    tiers as equality keys. To make equality joins safe on a MIXED or
    heterogeneous fleet, pin the codec: ``tier="stdlib"`` forces the
    Pillow-independent path on every executor (bit-identical output
    whether or not Pillow is installed); ``tier="pillow"`` requires
    Pillow and fails loudly on executors lacking it (see
    ``_resolve_decoder_tier``).

    Comparisons are integer cross-multiplied (``pixel * n > total``) —
    no float division, bit-identical across batch shapes.
    """
    schema = f"{_id_field_ddl(df, id_col)}, phash long"
    n_bits = hash_size * hash_size
    if n_bits > 64:
        raise ValueError("hash_size^2 must fit in 64 bits")
    if tier not in ("auto", "stdlib", "pillow"):
        raise ValueError(
            f"tier must be 'auto', 'stdlib' or 'pillow', got {tier!r}"
        )

    def ahash(px: np.ndarray) -> int:
        flat = px.astype(np.int64).ravel()
        total = int(flat.sum())
        h = 0
        for j in range(n_bits):
            if int(flat[j]) * n_bits > total:
                h |= 1 << j
        # wrap to signed 64-bit so bit 63 survives the long column
        return h - (1 << 64) if h >= 1 << 63 else h

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        image_mod = _resolve_decoder_tier(tier)
        import io

        for pdf in pdfs:
            out: list = []
            for b in pdf["payload"]:
                bb = bytes(b)
                if image_mod is None:
                    if sniff_image_format(bb) is None:
                        raise NotImplementedError(
                            "payload format not decodable without an "
                            "image codec library (Pillow); the stdlib "
                            "fallback handles PNG and binary PPM/PGM — "
                            "use media_phash for the codec-free "
                            "byte-level fingerprint"
                        )
                    try:
                        _w, _h, _mode, px = decode_image_bytes(bb)
                        tile = resample_image(
                            to_grayscale(px),
                            hash_size,
                            hash_size,
                            kernel="bilinear",
                        )
                        out.append(ahash(tile))
                    except ValueError:  # corrupt -> quarantine
                        out.append(None)
                    continue
                resample = getattr(
                    image_mod, "Resampling", image_mod
                ).BILINEAR
                try:
                    with image_mod.open(io.BytesIO(bb)) as im:
                        tile = im.convert("L").resize(
                            (hash_size, hash_size), resample
                        )
                        out.append(ahash(np.asarray(tile)))
                except Exception:  # noqa: BLE001
                    out.append(None)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "phash": pd.array(out, dtype="Int64")}
            )

    return df.select(id_col, "payload").mapInPandas(run, schema)


def byte_histogram_features(
    df: DataFrame, id_col: str = "doc_id", bins: int = HISTOGRAM_BINS
) -> DataFrame:
    """(id, features array<double>) — normalized byte-value histogram.

    The stand-in for real feature extraction (CLIP embedding, mel
    spectrogram): Arrow-batched numpy over each partition, one output row
    per input row, payload column pruned immediately after.
    """
    schema = f"{_id_field_ddl(df, id_col)}, features array<double>"
    edges = np.linspace(0, 256, bins + 1)

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            feats = []
            for raw in pdf["payload"]:
                arr = np.frombuffer(raw, dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=edges)
                total = max(arr.size, 1)
                feats.append((hist / total).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, "payload").mapInPandas(run, schema)


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    frame_size: int = DEFAULT_FRAME_SIZE,
    every_nth: int = 4,
) -> DataFrame:
    """Sample every n-th fixed-size frame of each payload (the video-frame
    extraction shape): one input row fans out to ceil(n_frames/every_nth)
    rows of (id, frame_idx, frame binary, frame_digest).
    """
    import hashlib

    schema = (
        f"{_id_field_ddl(df, id_col)}, frame_idx int, frame binary,"
        " frame_digest string"
    )

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            ids, idxs, frames, digests = [], [], [], []
            for rid, raw in zip(pdf[id_col], pdf["payload"]):
                n_frames = max((len(raw) + frame_size - 1) // frame_size, 1)
                for fi in range(0, n_frames, every_nth):
                    chunk = bytes(raw[fi * frame_size : (fi + 1) * frame_size])
                    ids.append(rid)
                    idxs.append(fi)
                    frames.append(chunk)
                    digests.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame": frames,
                    "frame_digest": digests,
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, schema)


def media_phash(
    df: DataFrame, id_col: str = "doc_id", bits: int = 32
) -> DataFrame:
    """Perceptual average-hash (aHash) fingerprint per payload: the media
    analogue of simhash. The payload's byte stream is divided into
    ``bits`` contiguous chunks (the stand-in for a downscaled grayscale
    tile grid — with a real codec the chunks would be 8x8 pixel means);
    bit j is set when chunk j's mean byte value exceeds the whole
    payload's mean. Re-encodings that preserve content shift byte means
    only locally, so perceptual duplicates land within a small Hamming
    distance — feed the result to ``dedup.hamming_pairs``.

    Every comparison is cross-multiplied integer math
    (``chunk_sum * L > total_sum * chunk_len``) — no float division, so
    the hash is bit-identical across engines and batch shapes.

    Scale: one Arrow-batched pass, no shuffle; only (id, long) leaves
    the scan, the payload never crosses a wire.
    """
    schema = f"{_id_field_ddl(df, id_col)}, phash long"

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            hashes = np.zeros(len(pdf), dtype=np.int64)
            for row_i, b in enumerate(pdf["payload"]):
                arr = np.frombuffer(bytes(b), dtype=np.uint8).astype(
                    np.int64
                )
                n = len(arr)
                if n == 0:
                    continue
                # chunk of byte i = (i * bits) // n: contiguous, covers
                # every byte, possibly empty chunks when n < bits
                idx = (np.arange(n) * bits) // n
                csum = np.bincount(idx, weights=arr, minlength=bits)
                clen = np.bincount(idx, minlength=bits)
                total = int(arr.sum())
                bits_set = (csum * n) > (total * clen)
                hashes[row_i] = int(
                    (bits_set.astype(np.int64) << np.arange(bits)).sum()
                )
            yield pd.DataFrame({id_col: pdf[id_col], "phash": hashes})

    return df.select(id_col, "payload").mapInPandas(run, schema)


def _id_field_ddl(df: DataFrame, id_col: str) -> str:
    return f"{id_col} {df.schema[id_col].dataType.simpleString()}"


def media_dedup(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact media deduplication on the content digest: (digest, keep_id,
    n_copies) with the minimum id canonical — the binary-column sibling
    of ``dedup.dedup_exact``. Payload bytes NEVER shuffle: the digest is
    already in the metadata struct, so the groupBy exchanges 32-byte
    keys regardless of media size (the property that matters when the
    payload column is megabytes per row).
    """
    return (
        media.select(F.col(id_col), F.col("meta.digest").alias("digest"))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
