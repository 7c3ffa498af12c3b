"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schema contract, Arrow-batched ``mapInPandas``
kernels, partition sizing — is real and tested, and so are the decoders a
dependency-free engine can own: images in **PPM (P6/P3), uncompressed BMP
(24/32-bit BI_RGB), PNG, and baseline/progressive JPEG** (pure-Python
readers; see also pipeline/jpeg.py), and audio in **PCM RIFF/WAVE (8/16
bit)** with duration/RMS/zero-crossing features. Other formats raise
``NotImplementedError`` honestly: swapping in PIL/libvips/ffmpeg changes
ONE function body (``decode_image`` / ``decode_wav``), the distributed
plumbing stays identical.

Column contract:
    media: STRUCT<content: BINARY, meta: STRUCT<mime STRING, width INT,
           height INT, n_frames INT, sample_rate INT>>
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16


# ------------------------------------------------------------ image codec


def _ppm_tokens(data: bytes):
    """Token stream of a PPM header: whitespace-separated, '#' comments run
    to end-of-line (netpbm spec)."""
    i = 0
    n = len(data)
    while i < n:
        c = data[i : i + 1]
        if c in b" \t\r\n":
            i += 1
            continue
        if c == b"#":
            while i < n and data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < n and data[j : j + 1] not in b" \t\r\n":
            j += 1
        yield i, data[i:j]
        i = j


def _decode_ppm(data: bytes) -> Tuple[int, int, bytes]:
    magic = data[:2]
    toks = _ppm_tokens(data[2:])
    (_, w), (_, h), (off_max, maxval) = next(toks), next(toks), next(toks)
    w, h, maxval = int(w), int(h), int(maxval)
    if w <= 0 or h <= 0 or not (0 < maxval < 65536):
        raise ValueError("malformed PPM header")
    if magic == b"P3":
        vals = []
        for _, t in toks:
            vals.append(int(t))
            if len(vals) == w * h * 3:
                break
        if len(vals) != w * h * 3:
            raise ValueError("truncated P3 raster")
        scale = 255.0 / maxval
        return w, h, bytes(round(v * scale) for v in vals)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    # P6: exactly ONE whitespace byte after maxval, then the binary raster
    start = 2 + off_max + len(str(maxval).encode()) + 1
    raster = data[start : start + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError("truncated P6 raster")
    return w, h, raster


def _decode_bmp(data: bytes) -> Tuple[int, int, bytes]:
    import struct as _s

    if len(data) < 54:
        raise ValueError("truncated BMP header")
    pix_off = _s.unpack_from("<I", data, 10)[0]
    hdr_size = _s.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError("BMP core-header variant not supported")
    w, h_raw = _s.unpack_from("<ii", data, 18)
    bpp = _s.unpack_from("<H", data, 28)[0]
    compression = _s.unpack_from("<I", data, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"only uncompressed 24/32-bit BMP supported (bpp={bpp})")
    h = abs(h_raw)
    bottom_up = h_raw > 0
    bytes_pp = bpp // 8
    stride = ((w * bytes_pp + 3) // 4) * 4
    out = bytearray(w * h * 3)
    for row in range(h):
        src_row = (h - 1 - row) if bottom_up else row
        base = pix_off + src_row * stride
        if base + w * bytes_pp > len(data):
            raise ValueError("truncated BMP raster")
        for x in range(w):
            o = (row * w + x) * 3
            b_ = base + x * bytes_pp
            out[o] = data[b_ + 2]      # R  (BMP stores BGR[A])
            out[o + 1] = data[b_ + 1]  # G
            out[o + 2] = data[b_]      # B
    return w, h, bytes(out)


def _decode_png(data: bytes) -> Tuple[int, int, bytes]:
    """Pure-Python PNG decoder: zlib (stdlib) inflate + scanline
    unfiltering (None/Sub/Up/Average/Paeth, RFC 2083 §6).  Supports
    8-bit-depth greyscale (0), truecolor (2), and truecolor+alpha (6)
    without interlacing — the common baseline; palette/16-bit/interlaced
    variants raise."""
    import struct as _s
    import zlib

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("bad PNG signature")
    pos = 8
    w = h = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        ln, typ = _s.unpack_from(">I4s", data, pos)
        chunk = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = _s.unpack(
                ">IIBBBBB", chunk
            )
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or color_type not in (0, 2, 6) or interlace != 0:
        raise ValueError(
            f"PNG variant not supported (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace}) — 8-bit grey/truecolor/RGBA only"
        )
    nch = {0: 1, 2: 3, 6: 4}[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG raster")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    for row in range(h):
        base = row * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[row * stride : (row + 1) * stride] = line
        prev = line
    # normalize to RGB
    if nch == 3:
        return w, h, bytes(out)
    rgb = bytearray(w * h * 3)
    if nch == 1:
        for i in range(w * h):
            rgb[i * 3] = rgb[i * 3 + 1] = rgb[i * 3 + 2] = out[i]
    else:  # RGBA: drop alpha
        for i in range(w * h):
            rgb[i * 3 : i * 3 + 3] = out[i * 4 : i * 4 + 3]
    return w, h, bytes(rgb)


def decode_image(content: bytes) -> Tuple[int, int, bytes]:
    """Decode an image to (width, height, top-down RGB bytes).

    Pure-Python support for PPM P6/P3, uncompressed 24/32-bit BMP, 8-bit
    PNG (grey/truecolor/RGBA; zlib from the stdlib), and JPEG — baseline
    sequential AND progressive (pipeline/jpeg.py — huffman + numpy IDCT,
    4:4:4 / 4:2:2 / 4:2:0, spectral selection + successive
    approximation).  Palette PNG / exotic BMPs / arithmetic-coded JPEG
    raise (disclosed bounds)."""
    if content is None or len(content) < 2:
        raise ValueError("empty image content")
    magic = bytes(content[:2])
    if magic in (b"P6", b"P3"):
        return _decode_ppm(bytes(content))
    if magic == b"BM":
        return _decode_bmp(bytes(content))
    if bytes(content[:4]) == b"\x89PNG":
        return _decode_png(bytes(content))
    if magic == b"\xff\xd8":
        from .jpeg import decode_baseline_jpeg

        return decode_baseline_jpeg(bytes(content))
    raise NotImplementedError(
        "unrecognized image format (PPM/BMP/PNG/baseline-JPEG supported)"
    )


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """P6 encoder (the round-trip twin of decode_image for tests/resize)."""
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def _resize_nearest(w: int, h: int, rgb: bytes, nw: int, nh: int) -> bytes:
    out = bytearray(nw * nh * 3)
    for y in range(nh):
        sy = min(h - 1, (y * h) // nh)
        for x in range(nw):
            sx = min(w - 1, (x * w) // nw)
            s = (sy * w + sx) * 3
            d = (y * nw + x) * 3
            out[d : d + 3] = rgb[s : s + 3]
    return bytes(out)


# ------------------------------------------------------------- attachers


def attach_fake_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic synthetic media column derived from text bytes — stands
    in for reading real blobs (e.g. from object-store parquet with a binary
    column). The content is NOT a decodable image (mime image/fake)."""
    content = F.encode(F.col(text_col), "utf-8").cast("binary")
    meta = F.struct(
        F.lit("image/fake").alias("mime"),
        (F.length(F.col(text_col)) % 1024).cast("int").alias("width"),
        (F.length(F.col(text_col)) % 768).cast("int").alias("height"),
        F.lit(1).alias("n_frames"),
        F.lit(None).cast("int").alias("sample_rate"),
    )
    return df.withColumn("media", F.struct(content.alias("content"), meta.alias("meta")))


def attach_generated_ppm(
    df: DataFrame, text_col: str = "text", width: int = 8, height: int = 8
) -> DataFrame:
    """Deterministic REAL images: a small PPM per row whose pixels derive
    from the row's text digest — so the genuine decode path can be driven
    end-to-end without image libraries or external fixtures. JVM-side:
    pixels come from repeated sha2 hex, assembled into a P6 blob with
    concat/unhex — no Python in the plan."""
    npix = width * height * 3
    reps = (npix * 2 + 63) // 64  # sha2-256 hex chars per rep
    hexpix = F.substring(
        F.concat(*[F.sha2(F.concat(F.col(text_col), F.lit(str(r))), 256) for r in range(reps)]),
        1,
        npix * 2,
    )
    header = F.lit(f"P6\n{width} {height}\n255\n".encode())
    content = F.concat(header.cast("binary"), F.unhex(hexpix))
    meta = F.struct(
        F.lit("image/x-portable-pixmap").alias("mime"),
        F.lit(width).alias("width"),
        F.lit(height).alias("height"),
        F.lit(1).alias("n_frames"),
        F.lit(None).cast("int").alias("sample_rate"),
    )
    return df.withColumn("media", F.struct(content.alias("content"), meta.alias("meta")))


def attach_fake_audio(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Audio variant of the media contract (sample_rate set, no frames)."""
    content = F.encode(F.col(text_col), "utf-8").cast("binary")
    meta = F.struct(
        F.lit("audio/fake").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("n_frames"),
        F.lit(16000).alias("sample_rate"),
    )
    return df.withColumn("media", F.struct(content.alias("content"), meta.alias("meta")))


# --------------------------------------------------------------- kernels


def _pixel_features(w: int, h: int, rgb: bytes, dim: int) -> list:
    """Real image features: per-channel means and a luminance histogram —
    deterministic, library-free, and a drop-in shape for an embedding
    model later."""
    n = w * h
    rs = sum(rgb[0::3]) / (255.0 * n)
    gs = sum(rgb[1::3]) / (255.0 * n)
    bs = sum(rgb[2::3]) / (255.0 * n)
    nbins = dim - 3
    hist = [0] * nbins
    for p in range(n):
        lum = (rgb[p * 3] * 299 + rgb[p * 3 + 1] * 587 + rgb[p * 3 + 2] * 114) // 1000
        hist[min(nbins - 1, lum * nbins // 256)] += 1
    return [round(rs, 6), round(gs, 6), round(bs, 6)] + [
        round(c / n, 6) for c in hist
    ]


def _fake_features(content: bytes, dim: int = FEATURE_DIM) -> list:
    """Deterministic stand-in feature extractor: byte-histogram moments."""
    if content is None:
        return [0.0] * dim
    out = []
    for i in range(dim):
        bucket = [b for j, b in enumerate(content) if j % dim == i]
        out.append(round(sum(bucket) / (255.0 * (len(bucket) or 1)), 6))
    return out


def extract_features(
    df: DataFrame, media_col: str = "media", fake: bool = True, dim: int = FEATURE_DIM
) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas so each Python worker sees pandas batches; output schema =
    input fields + features array<double>. ``fake=False`` runs the REAL
    decode (PPM/BMP) and pixel features; ``fake=True`` uses the
    byte-histogram stand-in for non-decodable synthetic media."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("features", T.ArrayType(T.DoubleType()))]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = pdf[media_col]
            feats = []
            for m in media:
                content = None if m is None else m["content"]
                if fake:
                    feats.append(_fake_features(content, dim))
                else:
                    w, h, rgb = decode_image(content)
                    feats.append(_pixel_features(w, h, rgb, dim))
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)


def resize_plan(
    df: DataFrame, media_col: str = "media", width: int = 224, height: int = 224,
    fake: bool = True,
) -> DataFrame:
    """Resize. ``fake=True``: metadata-only update, JVM-side (no decode —
    for non-decodable synthetic media). ``fake=False``: REAL nearest-
    neighbor resample of the decoded pixels in the same Arrow-batched
    mapInPandas slot as extract_features, re-encoded as P6."""
    if not fake:
        out_schema = df.schema

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out_media = []
                for m in pdf[media_col]:
                    if m is None:
                        out_media.append(None)
                        continue
                    w, h, rgb = decode_image(m["content"])
                    resized = _resize_nearest(w, h, rgb, width, height)
                    meta = dict(m["meta"])
                    meta.update(
                        {"mime": "image/x-portable-pixmap", "width": width, "height": height}
                    )
                    out_media.append(
                        {"content": encode_ppm(width, height, resized), "meta": meta}
                    )
                pdf = pdf.copy()
                pdf[media_col] = out_media
                yield pdf

        return df.mapInPandas(kernel, schema=out_schema)
    m = F.col(media_col)
    new_meta = F.struct(
        m.getField("meta").getField("mime").alias("mime"),
        F.lit(width).alias("width"),
        F.lit(height).alias("height"),
        m.getField("meta").getField("n_frames").alias("n_frames"),
        m.getField("meta").getField("sample_rate").alias("sample_rate"),
    )
    return df.withColumn(
        media_col, F.struct(m.getField("content").alias("content"), new_meta.alias("meta"))
    )


# ------------------------------------------------------------ audio codec


def encode_wav(sample_rate: int, samples, n_channels: int = 1) -> bytes:
    """Minimal RIFF/WAVE writer: canonical 44-byte header + PCM16LE data
    (the WAVE spec's PCM layout — public format documentation)."""
    import struct

    data = b"".join(
        struct.pack("<h", max(-32768, min(32767, int(s)))) for s in samples
    )
    byte_rate = sample_rate * n_channels * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH", 16, 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16
        )
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(data: bytes) -> Tuple[int, int, list]:
    """(sample_rate, n_channels, samples) of a PCM RIFF/WAVE blob: a
    chunk-walking parser (fmt/data in any order, unknown chunks skipped,
    odd-sized chunks pad to even per the RIFF spec); 8-bit unsigned and
    16-bit signed PCM only — anything else raises honestly, like
    decode_image."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE blob")
    i, fmt, raw = 12, None, None
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        (sz,) = struct.unpack("<I", data[i + 4 : i + 8])
        body = data[i + 8 : i + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            raw = body
        i += 8 + sz + (sz & 1)
    if fmt is None or raw is None or len(fmt) < 16:
        raise NotImplementedError("missing fmt/data chunk")
    audio_fmt, n_ch, sr, _br, _ba, bits = struct.unpack("<HHIIHH", fmt[:16])
    if audio_fmt != 1 or bits not in (8, 16):
        raise NotImplementedError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
    if bits == 8:
        samples = [(b - 128) * 256 for b in raw]  # center + widen to 16-bit range
    else:
        n = len(raw) // 2
        samples = list(struct.unpack(f"<{n}h", raw[: n * 2]))
    return sr, n_ch, samples


def attach_generated_wav(
    df: DataFrame, text_col: str = "text", sample_rate: int = 8000, n_samples: int = 256
) -> DataFrame:
    """Deterministic REAL audio: a PCM16 WAV per row whose samples derive
    from the row's text digest — the genuine decode path runs end-to-end
    without audio libraries or fixtures. JVM-side like
    attach_generated_ppm: the header is one literal (sizes are fixed by
    n_samples) and the PCM bytes come from repeated sha2 hex."""
    nbytes = n_samples * 2
    reps = (nbytes * 2 + 63) // 64  # sha2-256 hex chars per rep
    hexpcm = F.substring(
        F.concat(
            *[F.sha2(F.concat(F.col(text_col), F.lit(f"wav{r}")), 256) for r in range(reps)]
        ),
        1,
        nbytes * 2,
    )
    # header sizes are fixed by n_samples: take the canonical 44 bytes of
    # an all-zero clip of the same length
    header = encode_wav(sample_rate, [0] * n_samples)[:44]
    content = F.concat(F.lit(header).cast("binary"), F.unhex(hexpcm))
    meta = F.struct(
        F.lit("audio/wav").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(n_samples).alias("n_frames"),
        F.lit(sample_rate).alias("sample_rate"),
    )
    return df.withColumn("media", F.struct(content.alias("content"), meta.alias("meta")))


def _audio_feature_values(sr: int, samples: list) -> list:
    """Library-free audio features of one PCM clip: duration, RMS level,
    zero-crossing rate, peak, DC mean — all normalized to [-1, 1] full
    scale."""
    import math

    n = len(samples)
    if n == 0:
        return [0.0] * 5
    rms = math.sqrt(sum(s * s for s in samples) / n) / 32768.0
    zc = sum(1 for a, b in zip(samples, samples[1:]) if (a < 0) != (b < 0))
    peak = max(abs(s) for s in samples) / 32768.0
    mean = sum(samples) / n / 32768.0
    return [
        round(n / sr, 6),
        round(rms, 6),
        round(zc / max(1, n - 1), 6),
        round(peak, 6),
        round(mean, 6),
    ]


def audio_features(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Arrow-batched audio feature extraction: decode each WAV blob and
    append ``audio_features`` (duration_sec, rms, zcr, peak, dc_mean).
    Same mapInPandas slot as extract_features — binary stays columnar,
    no shuffle."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("audio_features", T.ArrayType(T.DoubleType()))]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for m in pdf[media_col]:
                if m is None:
                    feats.append(None)
                    continue
                sr, _nch, samples = decode_wav(m["content"])
                feats.append(_audio_feature_values(sr, samples))
            pdf = pdf.copy()
            pdf["audio_features"] = feats
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)


def frame_sample_plan(df: DataFrame, media_col: str = "media", every_n: int = 10) -> DataFrame:
    """Frame-sampling *plan*: one row per sampled frame index (JVM-side
    explode of a sequence; the decode of each frame would happen in
    extract_features). Shows the shuffle-free fan-out shape for video."""
    n_frames = F.col(f"{media_col}.meta.n_frames")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return df.withColumn("frame_index", F.explode(idx))


# ------------------------------------------------------------ video codec


def encode_y4m(width: int, height: int, frames, fps: int = 25) -> bytes:
    """Minimal YUV4MPEG2 writer: C444 planar frames (the Y4M stream
    header + per-frame FRAME markers — public format documentation)."""
    hdr = f"YUV4MPEG2 W{width} H{height} F{fps}:1 Ip A1:1 C444\n".encode()
    body = b"".join(b"FRAME\n" + f for f in frames)
    return hdr + body


def decode_y4m(data: bytes) -> Tuple[int, int, int, list]:
    """(width, height, fps, frames) of a YUV4MPEG2 stream: header tokens
    parsed per the spec (unknown tags skipped), C444/C420(jpeg/paldv)
    plane sizes honored, per-frame parameter tails allowed.  Frames come
    back as raw planar bytes (Y plane first)."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(b"YUV4MPEG2"):
        raise NotImplementedError("not a YUV4MPEG2 stream")
    w = h = fps = None
    chroma = "444"
    for tok in data[:nl].split(b" ")[1:]:
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            fps = int(val.split(b":")[0])
        elif tag == b"C":
            chroma = val.decode("ascii", "replace")
    if not w or not h:
        raise NotImplementedError("Y4M header missing W/H")
    if chroma.startswith("444"):
        fsize = 3 * w * h
    elif chroma.startswith("420"):
        fsize = w * h + 2 * ((w // 2) * (h // 2))
    else:
        raise NotImplementedError(f"unsupported Y4M chroma C{chroma}")
    frames = []
    i = nl + 1
    while i < len(data):
        if not data[i:].startswith(b"FRAME"):
            raise NotImplementedError("malformed Y4M frame marker")
        j = data.find(b"\n", i)  # FRAME may carry parameters to EOL
        frames.append(data[j + 1 : j + 1 + fsize])
        i = j + 1 + fsize
    return w, h, fps or 25, frames


def attach_generated_y4m(
    df: DataFrame, text_col: str = "text", width: int = 8, height: int = 8,
    n_frames: int = 4, fps: int = 25,
) -> DataFrame:
    """Deterministic REAL video: a C444 Y4M clip per row whose planes
    derive from the row's text digest, assembled JVM-side (header literal
    + sha2-hex planes) like attach_generated_ppm/_wav."""
    fsize = 3 * width * height
    reps = (fsize * 2 + 63) // 64
    header = F.lit(
        f"YUV4MPEG2 W{width} H{height} F{fps}:1 Ip A1:1 C444\n".encode()
    ).cast("binary")
    parts = [header]
    for fr in range(n_frames):
        hexplane = F.substring(
            F.concat(
                *[
                    F.sha2(F.concat(F.col(text_col), F.lit(f"y4m{fr}_{r}")), 256)
                    for r in range(reps)
                ]
            ),
            1,
            fsize * 2,
        )
        parts.append(F.lit(b"FRAME\n").cast("binary"))
        parts.append(F.unhex(hexplane))
    meta = F.struct(
        F.lit("video/x-yuv4mpeg").alias("mime"),
        F.lit(width).alias("width"),
        F.lit(height).alias("height"),
        F.lit(n_frames).alias("n_frames"),
        F.lit(None).cast("int").alias("sample_rate"),
    )
    return df.withColumn(
        "media", F.struct(F.concat(*parts).alias("content"), meta.alias("meta"))
    )


def video_frame_features(
    df: DataFrame, media_col: str = "media", every_n: int = 2
) -> DataFrame:
    """REAL frame sampling: decode the Y4M stream, keep every Nth frame,
    and emit ONE ROW PER SAMPLED FRAME with luma statistics — the
    mapInPandas kernel both decodes and fans out, so the explode never
    leaves the Arrow batch and the binary column never shuffles."""
    import math

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("y_mean", T.DoubleType()),
            T.StructField("y_std", T.DoubleType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                m = row[media_col]
                if m is None:
                    continue
                w, h, _fps, frames = decode_y4m(m["content"])
                npix = w * h
                for idx in range(0, len(frames), every_n):
                    y = frames[idx][:npix]  # luma plane leads in planar Y4M
                    mean = sum(y) / npix
                    var = sum((b - mean) ** 2 for b in y) / npix
                    d = dict(row)
                    d.update(
                        frame_index=idx,
                        y_mean=round(mean / 255.0, 6),
                        y_std=round(math.sqrt(var) / 255.0, 6),
                    )
                    rows.append(d)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(kernel, schema=out_schema)
