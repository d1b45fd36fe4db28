"""REAL GIF codec — pure stdlib/numpy, both directions.

GIF87a/89a decode and encode with the actual LZW entropy coder (no
image library): variable-width LSB-first codes, clear/EOI handling,
the KwKwK case, 12-bit table cap with mid-stream clear, interlace
(both directions), global and local color tables, frame composition
with disposal methods 0/1/2/3 and transparency, and Graphic Control
delays. GIF is the one ANIMATED container fully decodable without
ffmpeg, which makes it the first REAL end-to-end video path in the
pipeline: :func:`split_gif_frames` satisfies ``MediaProcessor``'s
``splitter=`` contract (container bytes → list of single-frame
netpbm payloads), so tick-based frame sampling runs on real
compressed animations.

Encode accepts (h, w) grayscale or (h, w, 3) RGB uint8 frames with
≤ 256 distinct colors per frame (the format's palette limit — the
palette is built from the frame, deterministically sorted; dithering
or quantizing richer inputs is the caller's job). Encode→decode is
bit-lossless, which is what makes the ``q_gif_decode`` contract
query hash-gateable end to end.

No reference counterpart (LLM-pipeline multimodal extension, same
tier as the PNG/JPEG codecs).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gif", "encode_gif", "decode_gif_frames",
           "split_gif_frames"]

_GIF_MAGICS = (b"GIF87a", b"GIF89a")

# interlace passes: (first row, step)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


# -- LZW ------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, npix: int) -> bytearray:
    """GIF-variant LZW: variable-width LSB-first codes."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    bits = int.from_bytes(data, "little")
    total = len(data) * 8
    pos = 0
    width = min_code_size + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev = None
    while pos + width <= total and len(out) < npix:
        code = (bits >> pos) & ((1 << width) - 1)
        pos += width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt LZW stream (first code)")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt LZW stream (code gap)")
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        out.extend(entry)
        prev = entry
    if len(out) < npix:
        raise ValueError(
            f"LZW stream ended early: {len(out)} of {npix} pixels"
        )
    del out[npix:]
    return out


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    acc = 0
    acc_bits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, acc_bits
        acc |= code << acc_bits
        acc_bits += width
        while acc_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            acc_bits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    w = b""
    for k in indices:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:  # table full: clear and restart (decoder mirrors)
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([k])
    if w:
        emit(table[w])
    emit(eoi)
    if acc_bits:
        out.append(acc & 0xFF)
    return bytes(out)


# -- decode ---------------------------------------------------------------


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            break
        chunks.append(data[pos : pos + n])
        if len(chunks[-1]) != n:
            raise ValueError("truncated GIF sub-block")
        pos += n
    return b"".join(chunks), pos


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    rows = [r for first, step in _INTERLACE for r in range(first, h, step)]
    out = np.empty_like(idx)
    out[rows] = idx
    return out


def decode_gif_frames(payload: bytes) -> tuple[list, list]:
    """Decode every frame: returns ``(frames, delays_ms)`` where each
    frame is the COMPOSED (h, w, 3) RGB uint8 canvas after that
    image (GIF animation semantics: disposal 0/1 keep, 2 restore
    background, 3 restore previous; transparent pixels leave the
    canvas untouched)."""
    if payload is None or bytes(payload[:6]) not in _GIF_MAGICS:
        raise ValueError("not a GIF payload")
    data = bytes(payload)
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    w, h, packed, bg_index, _ = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8)
        gct = gct.reshape(n, 3).copy()
        pos += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg_index < len(gct):
        canvas[:, :] = gct[bg_index]
    background = canvas.copy()
    frames: list = []
    delays: list = []
    transparent = None
    disposal = 0
    delay_ms = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            raw, pos = _read_subblocks(data, pos)
            if label == 0xF9 and len(raw) >= 4:  # graphic control
                flags, delay_cs, tindex = struct.unpack("<BHB", raw[:4])
                disposal = (flags >> 2) & 0x07
                transparent = tindex if flags & 0x01 else None
                delay_ms = delay_cs * 10
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        fx, fy, fw, fh, fpacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        palette = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            palette = np.frombuffer(
                data[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3).copy()
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF image with no color table")
        min_code = data[pos]
        pos += 1
        raw, pos = _read_subblocks(data, pos)
        idx = np.frombuffer(
            _lzw_decode(raw, min_code, fw * fh), dtype=np.uint8
        ).reshape(fh, fw)
        if fpacked & 0x40:
            idx = _deinterlace(idx)
        if idx.max(initial=0) >= len(palette):
            raise ValueError("GIF pixel index outside color table")
        prior = canvas.copy() if disposal == 3 else None
        rgb = palette[idx]
        region = canvas[fy : fy + fh, fx : fx + fw]
        if transparent is not None:
            mask = (idx != transparent)[..., None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(delay_ms)
        if disposal == 2:
            canvas[fy : fy + fh, fx : fx + fw] = background[
                fy : fy + fh, fx : fx + fw
            ]
        elif disposal == 3 and prior is not None:
            canvas = prior
    if not frames:
        raise ValueError("GIF has no image data")
    return frames, delays


def decode_gif(payload: bytes) -> np.ndarray:
    """First composed frame as (h, w, 3) RGB uint8."""
    return decode_gif_frames(payload)[0][0]


# -- encode ---------------------------------------------------------------


def _palettize(frame: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(palette (n,3) uint8 sorted, index array) — deterministic."""
    arr = np.asarray(frame, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"cannot GIF-encode array of shape {frame.shape}")
    flat = arr.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"frame has {len(palette)} distinct colors; GIF caps at 256 "
            "(quantize first)"
        )
    return palette, inverse.astype(np.uint8).reshape(arr.shape[:2])


def _interlace_rows(h: int) -> list:
    return [r for first, step in _INTERLACE for r in range(first, h, step)]


def encode_gif(
    frames,
    delays_ms=None,
    interlace: bool = False,
    loop: bool = True,
) -> bytes:
    """Encode one frame ((h, w) or (h, w, 3) uint8) or a list of
    same-shape frames into GIF89a. Per-frame local color tables (so
    frames palette independently), optional interlacing, per-frame
    delays (ms, stored in centiseconds), NETSCAPE loop block for
    multi-frame output. Lossless for ≤ 256-color frames."""
    if isinstance(frames, np.ndarray) and frames.ndim in (2, 3) and (
        frames.ndim == 2 or frames.shape[2] == 3
    ):
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty frame")
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share dimensions")
    if delays_ms is None:
        delays_ms = [100] * len(frames)
    if len(delays_ms) != len(frames):
        raise ValueError("delays_ms length mismatch")

    out = bytearray(b"GIF89a")
    pal0, _ = _palettize(frames[0])
    gct_bits = max(1, int(len(pal0) - 1).bit_length())
    gct_n = 1 << gct_bits
    out += struct.pack("<HHBBB", w, h, 0x80 | (gct_bits - 1), 0, 0)
    gct = np.zeros((gct_n, 3), dtype=np.uint8)
    gct[: len(pal0)] = pal0
    out += gct.tobytes()
    if loop and len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f, delay in zip(frames, delays_ms):
        palette, idx = _palettize(f)
        out += b"\x21\xf9\x04" + struct.pack(
            "<BHB", 0, max(0, int(delay)) // 10, 0
        ) + b"\x00"
        lct_bits = max(1, int(len(palette) - 1).bit_length())
        lct_n = 1 << lct_bits
        out += struct.pack(
            "<BHHHHB", 0x2C, 0, 0, w, h,
            0x80 | (0x40 if interlace else 0) | (lct_bits - 1),
        )
        lct = np.zeros((lct_n, 3), dtype=np.uint8)
        lct[: len(palette)] = palette
        out += lct.tobytes()
        if interlace:
            idx = idx[_interlace_rows(h)]
        min_code = max(2, lct_bits)
        out.append(min_code)
        compressed = _lzw_encode(idx.tobytes(), min_code)
        for i in range(0, len(compressed), 255):
            chunk = compressed[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


# -- pipeline adapters ----------------------------------------------------


def split_gif_frames(payload: bytes) -> list:
    """``MediaProcessor`` ``splitter=`` contract over a REAL animated
    container: composed GIF frames re-encoded as single-frame binary
    netpbm (P6) payloads, exactly what the tick-sampling video path
    consumes. Pure stdlib — the first container video decode that
    needs no external ffmpeg."""
    from replay_spark.multimodal import encode_ppm

    frames, _ = decode_gif_frames(payload)
    return [encode_ppm(f) for f in frames]
