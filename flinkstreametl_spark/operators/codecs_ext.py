"""[EXT] Real compressed-image codec for the multimodal decoder seam
(VERDICT r10 item 7): a pure-Python PNG coder over stdlib zlib.

The multimodal path's built-in decoders cover the codec-free container
formats (PPM/BMP/RIFF-WAVE); compressed formats were documented as "a
codec library plugs into the seam" but the seam had never carried one.
PNG is the honest minimal proof: real DEFLATE entropy coding (RFC 1951
via zlib), real per-scanline predictive filtering (None/Sub/Up/
Average/Paeth — the same prediction family JPEG-LS/WebP lossless use),
real chunk framing with CRCs — yet implementable without any
third-party dependency, so the test is never environment-gated in
practice.

Scope: 8-bit-depth, non-interlaced, color type 2 (truecolor RGB) and
0 (grayscale, expanded to RGB on decode so downstream feature/
fingerprint folds see one pixel shape). All five scanline filter types
decode; the encoder can emit None/Sub/Up so round-trip tests exercise
the defilter paths a foreign encoder would hit. Anything else
(palette, alpha, 16-bit, interlace) raises ValueError — same contract
as decode_image for unsupported inputs.

``png_decoder`` matches the seam signature
``(payload bytes) -> (width, height, feature)`` exactly, reusing
``multimodal.feature_map`` so PNG payloads flow through the identical
feature chain as PPM/BMP ones (tests/test_codec_seam.py proves the
fingerprint chain is payload-format-invariant).
"""

from __future__ import annotations

import struct
import zlib

from flinkstreametl_spark.operators.multimodal import feature_map

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> tuple[int, int, list[float]]:
    """PNG bytes -> (width, height, flat RGB floats) — the decode_image
    contract. 8-bit RGB/grayscale, non-interlaced; all 5 filters.
    EVERY malformed input raises ValueError (truncated chunks, CRC
    mismatches, corrupt DEFLATE streams included) so a caller
    dispatching codecs by catching ValueError — the decode_image
    pattern — falls through instead of crashing on zlib/struct
    internals."""
    if payload is None or len(payload) < 8 or bytes(payload[:8]) != _PNG_SIG:
        raise ValueError("not a PNG payload")
    payload = bytes(payload)
    pos = 8
    w = h = color = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length or pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if crc != zlib.crc32(ctype + data) & 0xFFFFFFFF:
            raise ValueError(f"PNG chunk {ctype!r} fails its CRC")
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            if length != 13:
                raise ValueError("malformed PNG IHDR")
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8 or color not in (0, 2) or comp != 0 or filt != 0 or interlace != 0:
                raise ValueError(
                    f"unsupported PNG variant (depth={depth} color={color} "
                    f"interlace={interlace}): this codec decodes 8-bit "
                    "non-interlaced RGB/grayscale"
                )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG DEFLATE stream: {e}") from e
    bpp = 3 if color == 2 else 1
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload has the wrong length")
    prev = bytearray(stride)
    out: list[float] = []
    for row in range(h):
        base = row * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        if bpp == 3:
            out.extend(float(v) for v in line)
        else:  # grayscale -> RGB triplets, matching decode_image's shape
            for v in line:
                out.extend((float(v), float(v), float(v)))
        prev = line
    return w, h, out


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(w: int, h: int, pixels: list[float], filter_type: int = 0) -> bytes:
    """(w, h, flat RGB floats) -> real PNG bytes (8-bit truecolor,
    DEFLATE-compressed). ``filter_type`` 0/1/2 (None/Sub/Up) selects the
    per-scanline predictor so round-trips exercise the decoder's
    defilter paths, not just the trivial one.

    Fails loudly on malformed input — a pixel buffer whose length
    disagrees with (w, h) or values outside [0, 255] — instead of
    silently wrapping/truncating into a PNG whose IDAT payload
    contradicts its IHDR (which this module's own ``decode_png`` would
    then reject): the encoder honors the same fail-loud contract as
    the decoder (ADVICE r11)."""
    if filter_type not in (0, 1, 2):
        raise ValueError("encoder supports filter types 0 (None), 1 (Sub), 2 (Up)")
    if len(pixels) != w * h * 3:
        raise ValueError(
            f"pixel buffer length {len(pixels)} != w*h*3 = {w * h * 3} "
            f"for a {w}x{h} RGB image"
        )
    stride = w * 3
    flat = [int(p) for p in pixels]
    bad = next((p for p in flat if not 0 <= p <= 255), None)
    if bad is not None:
        raise ValueError(f"pixel value {bad} outside [0, 255]")
    raw = bytearray()
    prev = [0] * stride
    for row in range(h):
        line = flat[row * stride : (row + 1) * stride]
        raw.append(filter_type)
        if filter_type == 0:
            raw.extend(line)
        elif filter_type == 1:
            raw.extend(
                (v - (line[i - 3] if i >= 3 else 0)) & 0xFF for i, v in enumerate(line)
            )
        else:
            raw.extend((v - prev[i]) & 0xFF for i, v in enumerate(line))
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + _chunk(b"IEND", b"")
    )


def png_decoder(payload: bytes) -> tuple[int, int, list[float]]:
    """The seam-shaped callable: PNG decode + the SHARED feature fold —
    drop-in for ``extract_features(decoder=...)``."""
    return feature_map(*decode_png(payload))
