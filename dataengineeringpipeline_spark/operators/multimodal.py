"""Multimodal (image/audio/video) column handling.

The pattern for binary media at 100 TB: payloads ride through the lake as
opaque ``binary`` columns next to a **typed metadata struct** (modality,
mime, byte size, checksum); decode/feature-extraction runs as
Arrow-batched ``mapInPandas`` so each task streams record batches through
Python once — never a row-at-a-time UDF, never a driver-side collect.

The container has no codec *libraries*, but three public byte formats
are decodable with numpy + stdlib alone, and :func:`decode_media` does:
uncompressed 24-bit **BMP** (BITMAPINFOHEADER), 8-bit truecolor **PNG**
(stdlib ``zlib`` inflate + all five spec scanline filters, CRC-checked),
16-bit PCM + G.711 μ-law mono **WAV** (RIFF), and baseline-sequential
**JPEG** (:mod:`.jpeg` — pure-numpy Huffman + dequant + IDCT).
:func:`encode_bmp` / :func:`encode_png` / :func:`encode_wav` /
``jpeg.encode_jpeg`` are the matching writers, so the decode path is
exercised with real container bytes end to end (``synthesize_media`` →
``decoded_media_features`` round-trips pixels/samples through actual
files). The remaining formats (progressive JPEG / video / perceptual
audio) still raise ``NotImplementedError`` — that is the
swap-in-PIL/ffmpeg boundary. Everything around the kernel — schema,
batch iteration, UDF signature, partitioning — is the real production
plumbing either way.

Payloads here are synthesized from ``documents.text`` (utf-8 bytes) so
the operators run against driver testdata without inventing new inputs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

#: Output schema of the feature extractor — fixed width, Arrow-friendly.
FEATURE_SCHEMA = (
    "doc_id bigint, modality string, byte_size bigint, sha256 string, "
    "mean_byte double, byte_entropy double, n_chunks int"
)

CHUNK_BYTES = 4096


def attach_payloads(docs: DataFrame) -> DataFrame:
    """Documents → multimodal rows: binary payload + typed metadata struct.

    ``modality`` is assigned deterministically from the doc id so every
    modality path gets exercised; real pipelines carry it from ingest.
    """
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            modality.alias("modality"),
            F.concat(F.lit("application/x-fake-"), modality).alias("mime"),
            F.length(payload).alias("byte_size"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("media_meta"),
    )


def encode_bmp(pixels) -> bytes:
    """Minimal 24-bit uncompressed BMP writer (``BITMAPFILEHEADER`` +
    ``BITMAPINFOHEADER``) — public format, pure numpy/struct. ``pixels``
    is an ``H×W×3 uint8`` array in RGB order; rows are stored bottom-up
    in BGR with 4-byte padding, exactly as the format specifies."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + img_size, 0, 0, offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    pad = b"\x00" * (row_size - w * 3)
    rows = [px[r, :, ::-1].tobytes() + pad for r in range(h - 1, -1, -1)]
    return header + info + b"".join(rows)


def decode_bmp(payload: bytes):
    """Decode an uncompressed 24-bit BMP into an ``H×W×3 uint8`` RGB
    array. Raises ``NotImplementedError`` for any other BMP variant
    (compressed, paletted, other bit depths, top-down) — those are the
    real-codec boundary, not silent misreads."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise NotImplementedError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0 or h <= 0:
        raise NotImplementedError(
            f"only uncompressed bottom-up 24-bit BMP supported (bpp={bpp})"
        )
    row_size = (w * 3 + 3) & ~3
    rows = []
    for r in range(h):
        start = offset + (h - 1 - r) * row_size
        row = np.frombuffer(payload, dtype=np.uint8, count=w * 3, offset=start)
        rows.append(row.reshape(w, 3)[:, ::-1])  # BGR -> RGB
    return np.stack(rows)


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """Minimal 16-bit PCM mono WAV writer (RIFF) — public format, pure
    numpy/struct. ``samples`` is an int16 array."""
    import struct

    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _mulaw_compress(samples) -> "np.ndarray":
    """G.711 μ-law compression of int16 samples to uint8 codes — the
    public ITU telephony codec, pure integer arithmetic (segment = top
    set bit of the biased magnitude, 4-bit mantissa, complemented on the
    wire). The first COMPRESSED audio format in the codec set."""
    import numpy as np

    x = np.asarray(samples, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0).astype(np.int32)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    # segment 0..7: biased-magnitude bit length minus 8 (seg s starts
    # where the magnitude needs bit 7+s)
    seg = np.zeros_like(mag)
    for s in range(1, 8):
        seg = np.where(mag >= (0x80 << s), s, seg)
    mantissa = (mag >> (seg + 3)) & 0x0F
    return (~(sign | (seg << 4) | mantissa) & 0xFF).astype(np.uint8)


def _mulaw_expand(codes) -> "np.ndarray":
    """Inverse of :func:`_mulaw_compress`: uint8 μ-law codes to int16
    codebook samples. Codebook points are FIXED POINTS of the
    compress∘expand pair (tested for all 256 codes), which is what lets
    the decode-report oracle predict μ-law payload contents exactly."""
    import numpy as np

    u = (~np.asarray(codes, dtype=np.uint8)).astype(np.int32) & 0xFF
    seg = (u >> 4) & 7
    mag = (((u & 0x0F) << 3) + 0x84) << seg
    val = mag - 0x84
    return np.where(u & 0x80, -val, val).astype(np.int16)


def encode_wav_mulaw(samples, sample_rate: int = 8000) -> bytes:
    """Mono μ-law (G.711) WAV writer — RIFF format code 7, 8 bits per
    sample: the int16 input is μ-law-compressed to one byte per sample
    (2× smaller than PCM; the compression IS lossy — feed codebook
    values for an exact round trip)."""
    import struct

    data = _mulaw_compress(samples).tobytes()
    fmt = struct.pack("<HHIIHH", 7, 1, sample_rate, sample_rate, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes):
    """Decode a mono WAV — 16-bit PCM or 8-bit μ-law (G.711) — into
    ``(int16 samples, sample_rate)``. Raises ``NotImplementedError``
    for other compression codes / multi-channel / other bit depths."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", payload, pos + 8)
        elif cid == b"data":
            if fmt is None:
                raise NotImplementedError("WAV data chunk before fmt chunk")
            audio_format, channels, rate, _, _, bits = fmt
            if audio_format == 1 and channels == 1 and bits == 16:
                data = np.frombuffer(
                    payload, dtype="<i2", count=size // 2, offset=pos + 8
                )
                return data, rate
            if audio_format == 7 and channels == 1 and bits == 8:
                codes = np.frombuffer(payload, dtype=np.uint8, count=size, offset=pos + 8)
                return _mulaw_expand(codes), rate
            raise NotImplementedError(
                f"only PCM-16 or mu-law mono WAV supported (fmt={fmt})"
            )
        pos += 8 + size + (size & 1)
    raise NotImplementedError("WAV payload has no data chunk")


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def encode_png(pixels) -> bytes:
    """Minimal PNG writer: 8-bit truecolor (color type 2), no
    interlace, filter 0 scanlines, one zlib IDAT — pure stdlib
    ``zlib``/``struct`` + numpy. ``pixels`` is an ``H×W×3 uint8`` RGB
    array."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    raw = b"".join(b"\x00" + px[r].tobytes() for r in range(h))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """Decode an 8-bit truecolor non-interlaced PNG into an
    ``H×W×3 uint8`` RGB array — pure stdlib ``zlib`` inflate plus
    per-row unfiltering (all five spec filters: None/Sub/Up/Average/
    Paeth), with chunk CRCs verified. Other color types / bit depths /
    interlacing raise ``NotImplementedError`` — the remaining
    real-codec boundary, not silent misreads."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != PNG_MAGIC:
        raise NotImplementedError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 12 <= len(payload):
        length, typ = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8 : pos + 8 + length]
        crc = struct.unpack_from(">I", payload, pos + 8 + length)[0]
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise NotImplementedError("PNG payload missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or ctype != 2 or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit truecolor non-interlaced PNG supported "
            f"(depth={depth}, color_type={ctype}, interlace={interlace})"
        )
    raw = zlib.decompress(b"".join(idat))
    stride, bpp = w * 3, 3
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG scanline data has the wrong length")
    out = np.zeros((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        f = raw[r * (stride + 1)]
        line = np.frombuffer(raw, np.uint8, stride, r * (stride + 1) + 1).astype(np.int32)
        prev = out[r - 1].astype(np.int32) if r else zero
        if f == 0:
            cur = line
        elif f == 2:  # Up: vectorized over the scanline
            cur = (line + prev) % 256
        elif f in (1, 3, 4):  # Sub/Average/Paeth need the left neighbor
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (line[x] + pred) % 256
        else:
            raise NotImplementedError(f"PNG filter type {f}")
        out[r] = cur.astype(np.uint8)
    return out.reshape(h, w, 3)


def decode_media(payload: bytes, modality: str):
    """Decode a media payload by container magic.

    Implemented here with pure numpy/stdlib (no codec libraries):
    uncompressed 24-bit BMP, 8-bit truecolor PNG, and baseline
    sequential JPEG (:mod:`.jpeg` — Huffman + dequant + IDCT) →
    ``H×W×3 uint8`` RGB array; 16-bit PCM and G.711 μ-law mono WAV →
    ``(int16 samples, sample_rate)``. Every other container —
    progressive JPEG, perceptual audio, video — raises
    ``NotImplementedError``: that is where ``PIL.Image.open`` /
    ``soundfile.read`` / ffmpeg frame-sampling slots in. Everything
    calling this is already batch-shaped, so widening codec support
    changes only this dispatch.
    """
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == PNG_MAGIC:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    raise NotImplementedError(
        f"no codec for modality={modality!r} payload in this environment; "
        "swap in PIL/soundfile/ffmpeg here"
    )


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched byte-level feature extraction over ``mapInPandas``.

    Deterministic stand-in for a real decoder: byte-size, sha256,
    mean byte value, byte entropy, chunk count. Shapes match production
    exactly — per-batch numpy kernels, fixed output schema, no state.
    """
    import math

    import numpy as np
    import pandas as pd

    def feats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "modality": pdf["modality"],
                "byte_size": [], "sha256": [], "mean_byte": [],
                "byte_entropy": [], "n_chunks": [],
            }
            for payload in pdf["payload"]:
                buf = np.frombuffer(payload, dtype=np.uint8)
                out["byte_size"].append(len(buf))
                out["sha256"].append(hashlib.sha256(payload).hexdigest())
                if len(buf):
                    counts = np.bincount(buf, minlength=256)
                    p = counts[counts > 0] / len(buf)
                    out["mean_byte"].append(float(buf.mean()))
                    out["byte_entropy"].append(float(-(p * np.log2(p)).sum()))
                else:
                    out["mean_byte"].append(None)
                    out["byte_entropy"].append(None)
                out["n_chunks"].append(math.ceil(len(buf) / CHUNK_BYTES))
            yield pd.DataFrame(out)

    flat = media.select(
        "doc_id", F.col("media_meta.modality").alias("modality"), "payload"
    )
    return flat.mapInPandas(feats, schema=FEATURE_SCHEMA)


def multimodal_features(docs: DataFrame) -> DataFrame:
    """Driver-contract query: payload attach → Arrow-batched extraction.

    Every output column is reproduced independently by the DuckDB oracle
    — including ``mean_byte``, where numpy's uint8 mean is exact (integer
    partial sums stay below 2^53, so sum/n is one correctly-rounded
    divide in both engines). ``byte_entropy`` is excluded: log2 is
    transcendental and libm-dependent; it is covered by unit tests.
    """
    return (
        extract_features(attach_payloads(docs))
        .select("doc_id", "modality", "byte_size", "sha256", "mean_byte", "n_chunks")
        .orderBy("doc_id")
    )


#: Output schema of the decode-features pass: union of image and audio
#: columns, nulls where a modality has no such dimension.
DECODE_SCHEMA = (
    "doc_id bigint, modality string, width int, height int, "
    "sample_rate int, n_samples bigint, duration_s double, mean_value double"
)

WAV_RATE = 8000


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL media payloads for the decode path: even doc
    ids become 24-bit BMP images, odd ids 16-bit PCM WAV clips, with
    pixel/sample values closed-form in ``doc_id`` — so an independent
    engine can predict every decoded feature without parsing a byte:

    - image: ``W=8``, ``H=4+doc_id%4``, flat pixel ``i`` (RGB scan
      order) = ``(doc_id*31 + i) % 256`` — containerized as PNG when
      ``doc_id % 4 == 0`` and BMP otherwise (same pixels either way,
      so decoded features are container-independent and the oracle
      needs no container awareness); EXCEPT ``doc_id % 8 == 2`` docs,
      which become baseline JPEG: an 8×6 FLAT grayscale image of even
      value ``2·((doc_id·17) % 128)`` — a quantizer fixed point of the
      lossy DCT path (DC = 8·(v−128) divisible by the Annex-K quantum
      16, AC exactly zero; see :mod:`.jpeg`), so even the compressed
      container's decoded mean is closed-form in ``doc_id``
    - audio: ``n=64+doc_id%32`` samples at 8 kHz, sample ``i`` = the
      μ-law EXPANSION of code ``(doc_id*7 + i*13) % 256`` — codebook
      fixed points, so the lossy μ-law container round-trips them
      exactly — containerized as μ-law (G.711) WAV when
      ``doc_id % 4 == 1`` and 16-bit PCM WAV otherwise (same sample
      values either way, mirroring the PNG/BMP pair: decoded features
      are container-independent and the oracle needs only the
      expansion arithmetic)

    Encoding runs as an Arrow-batched ``mapInPandas`` — the same shape a
    production ingest uses to wrap raw arrays into container bytes.
    """
    import numpy as np
    import pandas as pd

    def build(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads, modalities = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                if d % 2 == 0:
                    if d % 8 == 2:
                        from .jpeg import encode_jpeg

                        v = 2 * ((d * 17) % 128)
                        px = np.full((6, 8), v, dtype=np.uint8)
                        payloads.append(encode_jpeg(px))
                    else:
                        h = 4 + d % 4
                        n = h * 8 * 3
                        flat = (d * 31 + np.arange(n)) % 256
                        px = flat.astype(np.uint8).reshape(h, 8, 3)
                        payloads.append(
                            encode_png(px) if d % 4 == 0 else encode_bmp(px)
                        )
                    modalities.append("image")
                else:
                    n = 64 + d % 32
                    codes = ((d * 7 + np.arange(n) * 13) % 256).astype(np.uint8)
                    samples = _mulaw_expand(codes)
                    payloads.append(
                        encode_wav_mulaw(samples, WAV_RATE)
                        if d % 4 == 1
                        else encode_wav(samples, WAV_RATE)
                    )
                    modalities.append("audio")
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "modality": modalities, "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(
        build, schema="doc_id bigint, modality string, payload binary"
    )


def decoded_media_features(media: DataFrame) -> DataFrame:
    """Real-decode feature extraction: each payload is parsed from its
    container bytes (:func:`decode_media` — BMP pixels / WAV samples)
    and reduced to typed features. Arrow-batched ``mapInPandas``, one
    pass, no shuffle; the decode kernel is per-payload numpy.

    ``mean_value`` is the pixel mean (image) or sample mean (audio),
    computed as exact-integer sum ÷ count — one correctly-rounded double
    divide, reproducible in any engine."""
    import numpy as np
    import pandas as pd

    def feats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"], "modality": pdf["modality"],
                "width": [], "height": [], "sample_rate": [],
                "n_samples": [], "duration_s": [], "mean_value": [],
            }
            for payload, modality in zip(pdf["payload"], pdf["modality"]):
                decoded = decode_media(bytes(payload), modality)
                if modality == "image":
                    px = decoded
                    h, w, _ = px.shape
                    out["width"].append(w)
                    out["height"].append(h)
                    out["sample_rate"].append(None)
                    out["n_samples"].append(None)
                    out["duration_s"].append(None)
                    out["mean_value"].append(float(int(px.sum())) / px.size)
                else:
                    samples, rate = decoded
                    out["width"].append(None)
                    out["height"].append(None)
                    out["sample_rate"].append(rate)
                    out["n_samples"].append(len(samples))
                    out["duration_s"].append(float(len(samples)) / rate)
                    out["mean_value"].append(
                        float(int(samples.astype(np.int64).sum())) / len(samples)
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(feats, schema=DECODE_SCHEMA)


def multimodal_decode_report(docs: DataFrame, sample_mod: int = 5) -> DataFrame:
    """Driver-contract query: synthesize real BMP/WAV containers for a
    doc sample, round-trip them through :func:`decode_media`, and report
    the decoded dimensions — every value independently reproducible from
    ``doc_id`` arithmetic (see :func:`synthesize_media`), so the DuckDB
    oracle checks the decode without parsing a byte. ``sample_mod`` must
    be odd so the sample hits both parities (both modalities)."""
    sample = docs.filter(F.col("doc_id") % sample_mod == 0)
    return decoded_media_features(synthesize_media(sample)).orderBy("doc_id")


def frame_sample_plan(media: DataFrame, every_n_chunks: int = 4) -> DataFrame:
    """Frame/segment sampling *plan*: one row per (doc, chunk offset) to
    decode — the explode that fans a 100 TB decode job into uniform tasks.
    The decode itself would map :func:`decode_media` over this plan."""
    n_chunks = F.ceil(F.col("media_meta.byte_size") / CHUNK_BYTES).cast("int")
    return (
        media.select("doc_id", F.col("media_meta.modality").alias("modality"), n_chunks.alias("n_chunks"))
        .withColumn(
            "chunk_idx",
            F.explode(F.sequence(F.lit(0), F.greatest(F.col("n_chunks") - 1, F.lit(0)), F.lit(every_n_chunks))),
        )
        .select("doc_id", "modality", "chunk_idx")
    )
