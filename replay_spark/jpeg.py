"""REAL baseline JPEG codec — pure numpy + stdlib, no codec libs.

Scope (the honest contract):

* ``decode_jpeg``: the full huffman JPEG family — baseline
  sequential (SOF0/1) and progressive (SOF2) with BOTH spectral
  selection and successive approximation (DC point transforms and
  refinement bits, AC refinement with correction bits, multi-block
  EOBRUN, ZRL-with-corrections), 8-bit, grayscale or YCbCr at the
  common sampling factors (4:4:4, 4:2:2, 4:2:0 — chroma
  nearest-neighbour upsampled), restart markers, mid-stream DHT
  redefinition, and 12-BIT precision for grayscale frames (SOF1/2,
  16-bit DQT entries, extended Huffman categories — the
  medical/scientific shape). Arithmetic coding, 12-bit color, and
  hierarchical (SOF3+) raise ValueError — the remaining boundary.
* ``encode_jpeg``: grayscale or YCbCr 4:4:4/4:2:0 with the standard
  Annex-K tables (scaled by ``quality``); baseline, a
  spectral-selection progressive script (``progressive=True``), or a
  successive-approximation script (``progressive="sa"``) — the
  latter exists chiefly so the SA decode paths are test-backed.

JPEG is lossy, so unlike the PNG/netpbm/WAV codecs there is no
bit-exact round-trip oracle; correctness is pinned by round-trip
PSNR tests, a DC-only analytical case (solid-colour images recover
exactly), and cross-checks between the two directions. The entropy
loop is per-block Python over numpy blocks — adequate for the
executor-side thumbnail/feature work this engine does with payload
columns; wire a libjpeg-backed callable into
``MediaProcessor(decoder=...)`` when throughput matters.

Format reference: ITU-T T.81 (public spec); tables from its Annex K.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg", "jpeg_image_decoder"]

# -- shared helpers ----------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1 luminance / K.2 chrominance quantization tables (natural order)
STD_LUMA_Q = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
STD_CHROMA_Q = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 standard huffman tables: (bits per code length 1..16, values)
STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


# Extended Huffman tables for 12-bit precision: DC difference
# categories reach 16 and AC sizes 15, beyond the Annex-K 8-bit
# tables. Flat canonical assignments (17 DC codes at length 6, 242
# AC codes at length 8) are valid Huffman tables — inefficient but
# legal, and the all-ones code of each length stays unused as the
# spec requires.
EXT12_DC = ([0, 0, 0, 0, 0, 17] + [0] * 10, list(range(17)))
EXT12_AC = (
    [0] * 7 + [242] + [0] * 8,
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 16) if s <= 15],
)


def _dct_matrix() -> np.ndarray:
    """8x8 orthonormal DCT-II basis matrix C: dct = C @ block @ C.T"""
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c[0, :] = 1.0
    scale = np.full(8, np.sqrt(2.0 / 8.0))
    scale[0] = np.sqrt(1.0 / 8.0)
    return c * scale[:, None]


_C = _dct_matrix()


def _build_code_table(bits, values):
    """(length, code) per symbol, canonical JPEG ordering."""
    codes = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[idx]] = (length, code)
            code += 1
            idx += 1
        code <<= 1
    return codes


def _build_decode_table(bits, values):
    """{(length, code): symbol} for the decoder."""
    out = {}
    for sym, (length, code) in _build_code_table(bits, values).items():
        out[(length, code)] = sym
    return out


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category + offset bits for a signed coefficient."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    if v < 0:
        v = v + (1 << size) - 1
    return size, v


def _extend(bits_val: int, size: int) -> int:
    """Inverse of _magnitude."""
    if size == 0:
        return 0
    if bits_val < (1 << (size - 1)):
        return bits_val - (1 << size) + 1
    return bits_val


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int):
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


class _BitReader:
    """Reads the entropy-coded segment, un-stuffing 0xFF00 and
    stopping (transparently) at RST markers via ``sync_restart``."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.pos = start
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0xFF  # spec: pad with 1s
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
                # a real marker: stop feeding (pad with 1s)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict) -> int:
        length, code = 0, 0
        for _ in range(16):
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG huffman code")

    def sync_restart(self):
        """Skip to just past the next RSTn marker, discard bit state."""
        d = self.data
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected JPEG restart marker")


# -- encoder -----------------------------------------------------------------


def _scaled_q(table: np.ndarray, quality: int) -> np.ndarray:
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * s + 50) // 100
    return np.clip(q, 1, 255)


def _encode_block(
    block: np.ndarray, q: np.ndarray, dc_codes, ac_codes, writer, dc_pred,
    level: float = 128.0,
):
    """Entropy-encode one level-shifted 8x8 block; updates dc_pred."""
    coef = _C @ (block.astype(np.float64) - level) @ _C.T
    quant = np.round(coef / q.reshape(8, 8)).astype(np.int64)
    zz = quant.flatten()[ZIGZAG]
    diff = int(zz[0]) - dc_pred[0]
    dc_pred[0] = int(zz[0])
    size, bits_val = _magnitude(diff)
    length, code = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(bits_val, size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size, bits_val = _magnitude(v)
        length, code = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(bits_val, size)
        run = 0
    if run:
        length, code = ac_codes[0x00]  # EOB
        writer.write(code, length)


def _pad_replicate(p: np.ndarray, ph: int, pw: int, maxv: int = 255) -> np.ndarray:
    h, w = p.shape
    pp = np.empty((ph, pw))
    pp[:h, :w] = p
    pp[h:, :w] = p[h - 1 : h, :]
    pp[:, w:] = pp[:, w - 1 : w]
    return np.clip(np.round(pp), 0, maxv)


def encode_jpeg(
    array: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
    precision: int = 8,
) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 as JPEG with
    the standard tables scaled by ``quality``.
    ``subsampling``: "444" (every pixel) or "420" (chroma box-averaged
    2x2 — the common web shape). ``restart_interval`` > 0 emits
    DRI/RSTn markers every N MCUs (baseline only).
    ``progressive=True`` emits a spectral-selection SOF2 script (DC
    scan, then AC bands 1–5 and 6–63 per component, Ah=Al=0) — the
    same pixels, decodable by this module's progressive decoder.
    ``precision=12`` encodes GRAYSCALE uint16 samples (0..4095) as
    SOF1 (sequential) or SOF2 (any progressive script) with flat
    extended Huffman tables (DC categories to 16, AC sizes to 15) —
    the medical/scientific shape; 12-bit color raises."""
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    if precision == 12:
        arr = np.asarray(array)
        if arr.ndim != 2:
            raise ValueError("12-bit encode supports grayscale only")
        arr = np.clip(arr, 0, 4095).astype(np.uint16)
    else:
        arr = np.asarray(array, dtype=np.uint8)
    gray = arr.ndim == 2
    if not gray and not (arr.ndim == 3 and arr.shape[2] == 3):
        raise ValueError(f"cannot encode array of shape {arr.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    if progressive and restart_interval:
        raise ValueError("restart markers unsupported with progressive")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")

    ql = _scaled_q(STD_LUMA_Q, quality)
    qc = _scaled_q(STD_CHROMA_Q, quality)
    if precision == 12:
        dc_l = _build_code_table(*EXT12_DC)
        ac_l = _build_code_table(*EXT12_AC)
    else:
        dc_l = _build_code_table(*STD_DC_LUMA)
        ac_l = _build_code_table(*STD_AC_LUMA)
    dc_c = _build_code_table(*STD_DC_CHROMA)
    ac_c = _build_code_table(*STD_AC_CHROMA)

    # component planes + sampling factors
    if gray:
        comps = [
            {"id": 1, "hs": 1, "vs": 1, "qid": 0, "plane": arr.astype(np.float64),
             "q": ql, "dc": dc_l, "ac": ac_l}
        ]
    else:
        r, g, b = (arr[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            # box-average 2x2 (pad odd dims by edge replication first)
            def down(p):
                hh, ww = p.shape
                p2 = _pad_replicate(p, hh + hh % 2, ww + ww % 2)
                return (
                    p2[0::2, 0::2] + p2[1::2, 0::2]
                    + p2[0::2, 1::2] + p2[1::2, 1::2]
                ) / 4.0

            cb, cr = down(cb), down(cr)
            lhs, lvs = 2, 2
        else:
            lhs, lvs = 1, 1
        comps = [
            {"id": 1, "hs": lhs, "vs": lvs, "qid": 0, "plane": y,
             "q": ql, "dc": dc_l, "ac": ac_l},
            {"id": 2, "hs": 1, "vs": 1, "qid": 1, "plane": cb,
             "q": qc, "dc": dc_c, "ac": ac_c},
            {"id": 3, "hs": 1, "vs": 1, "qid": 1, "plane": cr,
             "q": qc, "dc": dc_c, "ac": ac_c},
        ]
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    maxv = (1 << precision) - 1
    for c in comps:
        c["plane"] = _pad_replicate(
            c["plane"], mcus_y * c["vs"] * 8, mcus_x * c["hs"] * 8, maxv
        )

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, payload: bytes):
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    # DQT (zigzag order per spec)
    seg(0xDB, bytes([0]) + bytes(int(v) for v in ql[ZIGZAG]))
    if not gray:
        seg(0xDB, bytes([1]) + bytes(int(v) for v in qc[ZIGZAG]))
    sof = struct.pack(">BHHB", precision, h, w, len(comps))
    for c in comps:
        sof += bytes([c["id"], (c["hs"] << 4) | c["vs"], c["qid"]])
    if progressive:
        sof_marker = 0xC2
    elif precision == 12:
        sof_marker = 0xC1  # extended sequential (baseline is 8-bit only)
    else:
        sof_marker = 0xC0
    seg(sof_marker, sof)
    dc_spec = EXT12_DC if precision == 12 else STD_DC_LUMA
    ac_spec = EXT12_AC if precision == 12 else STD_AC_LUMA
    for cls, tid, (bits, values) in (
        (0, 0, dc_spec),
        (1, 0, ac_spec),
    ) + (() if gray else ((0, 1, STD_DC_CHROMA), (1, 1, STD_AC_CHROMA))):
        seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    if progressive:
        if progressive == "sa":
            _emit_sa_scans(
                out, seg, comps, hmax, vmax, mcus_x, mcus_y, h, w,
                level=float(1 << (precision - 1)),
            )
        else:
            _emit_progressive_scans(
                out, seg, comps, hmax, vmax, mcus_x, mcus_y, h, w,
                dc_interleaved=(progressive != "nidc"),
                level=float(1 << (precision - 1)),
            )
        out.extend(b"\xff\xd9")
        return bytes(out)

    sos = bytes([len(comps)])
    for c in comps:
        tid = 0 if c["qid"] == 0 else 1
        sos += bytes([c["id"], (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    writer = _BitWriter()
    preds = {c["id"]: [0] for c in comps}
    rst = 0
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                writer.flush()
                out.extend(writer.out)
                out.extend(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) % 8
                writer = _BitWriter()
                preds = {c["id"]: [0] for c in comps}
            for c in comps:
                for v in range(c["vs"]):
                    for u in range(c["hs"]):
                        py = (my * c["vs"] + v) * 8
                        px = (mx * c["hs"] + u) * 8
                        _encode_block(
                            c["plane"][py : py + 8, px : px + 8],
                            c["q"],
                            c["dc"],
                            c["ac"],
                            writer,
                            preds[c["id"]],
                            level=float(1 << (precision - 1)),
                        )
            mcu_count += 1
    writer.flush()
    out.extend(writer.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)



def _emit_progressive_scans(
    out, seg, comps, hmax, vmax, mcus_x, mcus_y, h, w, dc_interleaved=True,
    level=128.0,
):
    """Spectral-selection progressive scan script: DC scan(s), then
    AC bands [1..5] and [6..63] per component over the component's
    OWN ceil block grid (per spec for non-interleaved scans). EOB is
    emitted as the EOBRUN-of-1 symbol 0x00.

    ``dc_interleaved=False`` (``progressive="nidc"``) emits ONE DC
    scan per component over its own block grid instead of the single
    interleaved MCU-walk DC scan — the shape some foreign encoders
    produce, and the regression surface for the decoder's
    non-interleaved-DC walk."""
    coefs = _coef_grids(comps, level)

    if dc_interleaved:
        # scan 1: interleaved DC
        sos = bytes([len(comps)])
        for c in comps:
            tid = 0 if c["qid"] == 0 else 1
            sos += bytes([c["id"], tid << 4])
        sos += bytes([0, 0, 0])
        seg(0xDA, sos)
        writer = _BitWriter()
        preds = {c["id"]: 0 for c in comps}
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for c in comps:
                    for v in range(c["vs"]):
                        for u in range(c["hs"]):
                            dc = int(
                                coefs[c["id"]][my * c["vs"] + v, mx * c["hs"] + u, 0]
                            )
                            diff = dc - preds[c["id"]]
                            preds[c["id"]] = dc
                            size, bits_val = _magnitude(diff)
                            length, code = c["dc"][size]
                            writer.write(code, length)
                            if size:
                                writer.write(bits_val, size)
        writer.flush()
        out.extend(writer.out)
    else:
        # one non-interleaved DC scan per component: walks the
        # component's ceil(sample/8) grid, own DC predictor per scan
        for c in comps:
            cw_blocks = -(-(-(-w * c["hs"] // hmax)) // 8)
            ch_blocks = -(-(-(-h * c["vs"] // vmax)) // 8)
            tid = 0 if c["qid"] == 0 else 1
            sos = bytes([1, c["id"], tid << 4]) + bytes([0, 0, 0])
            seg(0xDA, sos)
            writer = _BitWriter()
            pred = 0
            for by in range(ch_blocks):
                for bx in range(cw_blocks):
                    dc = int(coefs[c["id"]][by, bx, 0])
                    diff = dc - pred
                    pred = dc
                    size, bits_val = _magnitude(diff)
                    length, code = c["dc"][size]
                    writer.write(code, length)
                    if size:
                        writer.write(bits_val, size)
            writer.flush()
            out.extend(writer.out)

    # per-component AC band scans
    # reconstruct frame pixel dims from the luma plane (hs==hmax)
    for ss, se in ((1, 5), (6, 63)):
        for c in comps:
            # per spec, non-interleaved scans cover the component's
            # OWN ceil block grid (sample dims, not MCU padding)
            cw_blocks = -(-(-(-w * c["hs"] // hmax)) // 8)
            ch_blocks = -(-(-(-h * c["vs"] // vmax)) // 8)
            tid = 0 if c["qid"] == 0 else 1
            sos = bytes([1, c["id"], tid]) + bytes([ss, se, 0])
            seg(0xDA, sos)
            writer = _BitWriter()
            for by in range(ch_blocks):
                for bx in range(cw_blocks):
                    zz = coefs[c["id"]][by, bx]
                    run = 0
                    for k in range(ss, se + 1):
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            length, code = c["ac"][0xF0]
                            writer.write(code, length)
                            run -= 16
                        size, bits_val = _magnitude(v)
                        length, code = c["ac"][(run << 4) | size]
                        writer.write(code, length)
                        writer.write(bits_val, size)
                        run = 0
                    if run:
                        length, code = c["ac"][0x00]  # EOBRUN of 1
                        writer.write(code, length)
            writer.flush()
            out.extend(writer.out)



def _coef_grids(comps, level: float = 128.0):
    """Quantized zigzag coefficients for every block of every comp."""
    coefs = {}
    for c in comps:
        plane = c["plane"]
        brows, bcols = plane.shape[0] // 8, plane.shape[1] // 8
        zz = np.empty((brows, bcols, 64), dtype=np.int64)
        for by in range(brows):
            for bx in range(bcols):
                block = (
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(
                        np.float64
                    )
                    - level
                )
                quant = np.round(
                    (_C @ block @ _C.T) / c["q"].reshape(8, 8)
                ).astype(np.int64)
                zz[by, bx] = quant.flatten()[ZIGZAG]
        coefs[c["id"]] = zz
    return coefs


def _emit_sa_scans(out, seg, comps, hmax, vmax, mcus_x, mcus_y, h, w, level=128.0):
    """Successive-approximation script (tests the refinement decoder):
    DC first at Al=1, AC first per comp at Al=1, DC refinement, AC
    refinement per comp — T.81 G.1.2.3 semantics, WITH multi-block
    EOBRUN batching. EOBn (n>0) symbols do not exist in the Annex-K
    baseline tables, so the AC tables are redefined via DHT as a
    uniform 9-bit code over all 256 symbols (canonically valid,
    deliberately simple — compression is not the point of this
    script)."""
    coefs = _coef_grids(comps, level)
    # a DHT bits entry is one byte, so 256 symbols split 255@9 + 1@10
    uni_bits = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
    uni_values = list(range(256))
    uniform = _build_code_table(uni_bits, uni_values)
    # redefine AC tables 0 and 1 (decoders read DHT sequentially,
    # later definitions win) so every comp's AC scans use it
    for tid in (0, 1):
        seg(0xC4, bytes([0x10 | tid]) + bytes(uni_bits) + bytes(uni_values))

    def dc_scan(ah, al):
        sos = bytes([len(comps)])
        for c in comps:
            tid = 0 if c["qid"] == 0 else 1
            sos += bytes([c["id"], tid << 4])
        sos += bytes([0, 0, (ah << 4) | al])
        seg(0xDA, sos)
        writer = _BitWriter()
        preds = {c["id"]: 0 for c in comps}
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for c in comps:
                    for v in range(c["vs"]):
                        for u in range(c["hs"]):
                            dc = int(
                                coefs[c["id"]][
                                    my * c["vs"] + v, mx * c["hs"] + u, 0
                                ]
                            )
                            if ah == 0:
                                t = dc >> al  # arithmetic shift per spec
                                diff = t - preds[c["id"]]
                                preds[c["id"]] = t
                                size, bits_val = _magnitude(diff)
                                length, code = c["dc"][size]
                                writer.write(code, length)
                                if size:
                                    writer.write(bits_val, size)
                            else:
                                writer.write((dc >> al) & 1, 1)
        writer.flush()
        out.extend(writer.out)

    def ac_first_scan(c, al):
        tid = 0 if c["qid"] == 0 else 1
        seg(0xDA, bytes([1, c["id"], tid]) + bytes([1, 63, al]))
        writer = _BitWriter()
        bw = -(-(-(-w * c["hs"] // hmax)) // 8)
        bh = -(-(-(-h * c["vs"] // vmax)) // 8)
        eobrun = 0

        def flush_eobrun():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                length, code = uniform[r << 4]
                writer.write(code, length)
                if r:
                    writer.write(eobrun - (1 << r), r)
                eobrun = 0

        for by in range(bh):
            for bx in range(bw):
                zz = coefs[c["id"]][by, bx]
                run = 0
                emitted = False
                for k in range(1, 64):
                    v = int(zz[k])
                    t = (abs(v) >> al) * (1 if v >= 0 else -1)
                    if t == 0:
                        run += 1
                        continue
                    if not emitted:
                        flush_eobrun()
                        emitted = True
                    while run > 15:
                        length, code = uniform[0xF0]
                        writer.write(code, length)
                        run -= 16
                    size, bits_val = _magnitude(t)
                    length, code = uniform[(run << 4) | size]
                    writer.write(code, length)
                    writer.write(bits_val, size)
                    run = 0
                if run:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eobrun()
        flush_eobrun()
        writer.flush()
        out.extend(writer.out)

    def ac_refine_scan(c, ah, al):
        tid = 0 if c["qid"] == 0 else 1
        seg(0xDA, bytes([1, c["id"], tid]) + bytes([1, 63, (ah << 4) | al]))
        writer = _BitWriter()
        bw = -(-(-(-w * c["hs"] // hmax)) // 8)
        bh = -(-(-(-h * c["vs"] // vmax)) // 8)
        eobrun = 0
        eob_bits = []  # corrections owed by EOB-run-covered blocks

        def flush_eobrun():
            nonlocal eobrun, eob_bits
            if eobrun:
                r = eobrun.bit_length() - 1
                length, code = uniform[r << 4]
                writer.write(code, length)
                if r:
                    writer.write(eobrun - (1 << r), r)
                for b in eob_bits:
                    writer.write(b, 1)
                eobrun = 0
                eob_bits = []

        for by in range(bh):
            for bx in range(bw):
                zz = coefs[c["id"]][by, bx]
                run = 0
                buffered = []  # correction bits pending emission
                emitted = False
                for k in range(1, 64):
                    v = int(zz[k])
                    t = abs(v) >> al
                    if t == 0:
                        run += 1
                        continue
                    # at ANY nonzero (correction or new), pending
                    # ZRLs flush FIRST — otherwise a buffered
                    # correction could lie beyond the 16-zero span a
                    # later ZRL covers and the decoder would consume
                    # its bit in the wrong place
                    while run > 15:
                        if not emitted:
                            flush_eobrun()
                            emitted = True
                        length, code = uniform[0xF0]
                        writer.write(code, length)
                        run -= 16
                        for b in buffered:
                            writer.write(b, 1)
                        buffered = []
                    if t > 1:
                        # history-nonzero: correction bit, buffered
                        buffered.append(t & 1)
                        continue
                    # newly nonzero at this level (t == 1)
                    if not emitted:
                        flush_eobrun()
                        emitted = True
                    length, code = uniform[(run << 4) | 1]
                    writer.write(code, length)
                    writer.write(1 if v > 0 else 0, 1)
                    run = 0
                    for b in buffered:
                        writer.write(b, 1)
                    buffered = []
                if run or buffered or not emitted:
                    eobrun += 1
                    eob_bits.extend(buffered)
                    if eobrun == 0x7FFF:
                        flush_eobrun()
        flush_eobrun()
        writer.flush()
        out.extend(writer.out)

    dc_scan(0, 1)
    for c in comps:
        ac_first_scan(c, 1)
    dc_scan(1, 0)
    for c in comps:
        ac_refine_scan(c, 1, 0)


# -- decoder -----------------------------------------------------------------


def _find_scan_end(data: bytes, start: int) -> int:
    """Position of the first real marker (not stuffing, not RSTn)
    after ``start`` — the end of an entropy-coded segment."""
    i = start
    while i + 1 < len(data):
        if data[i] == 0xFF:
            nxt = data[i + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                i += 2
                continue
            return i
        i += 1
    return len(data)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode baseline-sequential (SOF0/1) or FULL progressive (SOF2:
    spectral selection AND successive approximation, both DC and AC
    refinement scans) JPEG to (h, w) grayscale or (h, w, 3) RGB
    uint8 — or, for 12-bit grayscale frames (SOF1/SOF2), (h, w)
    uint16 in 0..4095. Raises ValueError only for arithmetic coding,
    12-bit color, and hierarchical frames."""
    if payload is None or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    progressive = False
    restart_interval = 0
    store: dict = {}
    saw_scan = False
    data = bytes(payload)
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG marker stream")
        # spec-legal 0xFF fill bytes may pad before any marker
        # (B.1.1.2): skip them so the marker id and the 2-byte
        # segment length that follows are read from the right offset
        while pos + 4 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + length]
        if marker == 0xDB:
            s = 0
            while s < len(seg):
                prec_id = seg[s]
                tbl = np.zeros(64, dtype=np.int64)
                if prec_id >> 4:  # 16-bit entries (12-bit frames)
                    tbl[ZIGZAG] = np.frombuffer(
                        seg[s + 1 : s + 129], dtype=">u2"
                    ).astype(np.int64)
                    qtables[prec_id & 0x0F] = tbl
                    s += 129
                else:
                    tbl[ZIGZAG] = np.frombuffer(
                        seg[s + 1 : s + 65], dtype=np.uint8
                    ).astype(np.int64)
                    qtables[prec_id & 0x0F] = tbl
                    s += 65
        elif marker == 0xC4:
            s = 0
            while s < len(seg):
                cls_id = seg[s]
                bits = list(seg[s + 1 : s + 17])
                n = sum(bits)
                values = list(seg[s + 17 : s + 17 + n])
                htables[(cls_id >> 4, cls_id & 0x0F)] = _build_decode_table(
                    bits, values
                )
                s += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):
            progressive = marker == 0xC2
            precision, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if precision not in (8, 12):
                raise ValueError(f"unsupported JPEG precision {precision}")
            if precision == 12 and marker == 0xC0:
                raise ValueError("12-bit requires SOF1/SOF2, not baseline")
            comps = []
            for i in range(ncomp):
                cid, sampling, qid = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {
                        "id": cid,
                        "hs": sampling >> 4,
                        "vs": sampling & 0x0F,
                        "q": qid,
                    }
                )
            frame = (h, w, comps)
            hmax = max(c["hs"] for c in comps)
            vmax = max(c["vs"] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            for c in comps:
                store[c["id"]] = np.zeros(
                    (mcus_y * c["vs"], mcus_x * c["hs"], 64), dtype=np.int64
                )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                "only baseline (SOF0/1) and progressive (SOF2) "
                "huffman JPEG are supported"
            )
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cid, tsel = seg[1 + 2 * i : 3 + 2 * i]
                scan.append((cid, tsel >> 4, tsel & 0x0F))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            entropy_start = pos + 2 + length
            _fill_scan(
                data,
                entropy_start,
                frame,
                scan,
                htables,
                restart_interval,
                store,
                progressive,
                ss,
                se,
                ah,
                al,
            )
            saw_scan = True
            pos = _find_scan_end(data, entropy_start)
            continue
        pos += 2 + length
    if frame is None or not saw_scan:
        raise ValueError("JPEG has no scan data")
    return _reconstruct(frame, store, qtables, precision)


def _fill_scan(
    data,
    start,
    frame,
    scan,
    htables,
    restart_interval,
    store,
    progressive,
    ss,
    se,
    ah,
    al,
):
    """Decode one entropy-coded scan into the coefficient store
    (natural-order int coefficients, pre-dequantization)."""
    h, w, comps = frame
    by_id = {c["id"]: c for c in comps}
    reader = _BitReader(data, start)

    if progressive and ah != 0:
        _fill_refinement_scan(
            reader, data, frame, scan, htables, restart_interval,
            store, ss, se, ah, al,
        )
        return

    if not progressive or ss == 0:
        # interleaved walk (baseline full-band, or progressive DC)
        hmax = max(c["hs"] for c in comps)
        vmax = max(c["vs"] for c in comps)
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        if len(scan) == 1:
            # ANY single-component scan is non-interleaved per spec
            # (baseline full-band OR progressive DC-first): it walks
            # the component's OWN ceil(sample/8) block grid, not the
            # MCU-padded grid — with sampling factors > 1 the MCU walk
            # decodes extra padding blocks and desyncs the bitstream
            # on externally-encoded files
            cid = scan[0][0]
            c = by_id[cid]
            cw = -(-w * c["hs"] // hmax)
            ch = -(-h * c["vs"] // vmax)
            walk = [
                (cid, by, bx)
                for by in range(-(-ch // 8))
                for bx in range(-(-cw // 8))
            ]
        else:
            walk = None
        preds = {c["id"]: 0 for c in comps}
        count = 0

        def maybe_restart():
            nonlocal preds
            if (
                restart_interval
                and count
                and count % restart_interval == 0
            ):
                reader.sync_restart()
                preds = {c["id"]: 0 for c in comps}

        if walk is not None:
            for cid, by, bx in walk:
                maybe_restart()
                c = by_id[cid]
                preds[cid] = _decode_block_into(
                    reader,
                    htables,
                    scan[0],
                    store[cid][by, bx],
                    preds[cid],
                    0,
                    0 if progressive else 63,
                    al if progressive else 0,
                )
                count += 1
            return
        for my in range(mcus_y):
            for mx in range(mcus_x):
                maybe_restart()
                for cid, dc_sel, ac_sel in scan:
                    c = by_id[cid]
                    for v in range(c["vs"]):
                        for u in range(c["hs"]):
                            by = my * c["vs"] + v
                            bx = mx * c["hs"] + u
                            preds[cid] = _decode_block_into(
                                reader,
                                htables,
                                (cid, dc_sel, ac_sel),
                                store[cid][by, bx],
                                preds[cid],
                                0,
                                0 if progressive else 63,
                                al if progressive else 0,
                            )
                count += 1
        return

    # progressive AC scan: single component, its own block grid,
    # EOBRUN semantics
    if len(scan) != 1:
        raise ValueError("progressive AC scans must be non-interleaved")
    cid, _, ac_sel = scan[0]
    c = by_id[cid]
    hmax = max(cc["hs"] for cc in comps)
    vmax = max(cc["vs"] for cc in comps)
    cw = -(-w * c["hs"] // hmax)
    ch = -(-h * c["vs"] // vmax)
    ac_tab = htables.get((1, ac_sel))
    if ac_tab is None:
        raise ValueError("JPEG scan references missing AC table")
    eobrun = 0
    count = 0
    for by in range(-(-ch // 8)):
        for bx in range(-(-cw // 8)):
            if (
                restart_interval
                and count
                and count % restart_interval == 0
            ):
                reader.sync_restart()
                eobrun = 0
            count += 1
            zz = store[cid][by, bx]
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                sym = reader.decode_symbol(ac_tab)
                r, size = sym >> 4, sym & 0x0F
                if size == 0:
                    if r == 15:
                        k += 16  # ZRL
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                k += r
                if k > se:
                    raise ValueError("JPEG AC run overflow")
                zz[ZIGZAG[k]] = _extend(reader.read_bits(size), size) << al
                k += 1


def _fill_refinement_scan(
    reader, data, frame, scan, htables, restart_interval, store,
    ss, se, ah, al,
):
    """Successive-approximation REFINEMENT scans (Ah>0): DC scans
    append one bit per block; AC scans run the T.81 G.1.2 correction
    algorithm — newly-nonzero coefficients arrive as ±1<<Al via
    run/size-1 symbols, zero runs count only zero-history positions,
    and every nonzero-history position traversed (including inside
    EOB runs) consumes a correction bit."""
    h, w, comps = frame
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)

    if ss == 0:
        # DC refinement: interleaved MCU walk, one raw bit per block
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        count = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if (
                    restart_interval
                    and count
                    and count % restart_interval == 0
                ):
                    reader.sync_restart()
                count += 1
                for cid, _, _ in scan:
                    c = by_id[cid]
                    for v in range(c["vs"]):
                        for u in range(c["hs"]):
                            blk = store[cid][my * c["vs"] + v, mx * c["hs"] + u]
                            if reader.read_bit():
                                blk[0] |= 1 << al
        return

    if len(scan) != 1:
        raise ValueError("progressive AC scans must be non-interleaved")
    cid, _, ac_sel = scan[0]
    c = by_id[cid]
    cw = -(-w * c["hs"] // hmax)
    ch = -(-h * c["vs"] // vmax)
    ac_tab = htables.get((1, ac_sel))
    if ac_tab is None:
        raise ValueError("JPEG scan references missing AC table")
    p1 = 1 << al
    eobrun = 0
    count = 0

    def correct(blk, k):
        """Consume a correction bit for the nonzero coef at zz pos k."""
        if reader.read_bit():
            v = blk[ZIGZAG[k]]
            if v > 0 and not (v & p1):
                blk[ZIGZAG[k]] = v + p1
            elif v < 0 and not (-v & p1):
                blk[ZIGZAG[k]] = v - p1

    for by in range(-(-ch // 8)):
        for bx in range(-(-cw // 8)):
            if (
                restart_interval
                and count
                and count % restart_interval == 0
            ):
                reader.sync_restart()
                eobrun = 0
            count += 1
            blk = store[cid][by, bx]
            k = ss
            if eobrun > 0:
                # this block is covered by a pending EOB run: no
                # symbols, but its nonzero-history coefficients still
                # take correction bits (the loop below)
                eobrun -= 1
            else:
                while k <= se:
                    sym = reader.decode_symbol(ac_tab)
                    r, size = sym >> 4, sym & 0x0F
                    newval = 0
                    if size == 0:
                        if r < 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.read_bits(r)
                            break
                        # ZRL: skip 16 zero-history positions
                    elif size == 1:
                        newval = p1 if reader.read_bit() else -p1
                    else:
                        raise ValueError(
                            "invalid size in AC refinement scan"
                        )
                    # advance r zero-history positions, correcting
                    # nonzero-history coefficients on the way
                    while k <= se:
                        if blk[ZIGZAG[k]] != 0:
                            correct(blk, k)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval and k <= se:
                        blk[ZIGZAG[k]] = newval
                    k += 1
            # EOB (or end-of-band): correction bits for remaining
            # nonzero-history coefficients in the band
            while k <= se:
                if blk[ZIGZAG[k]] != 0:
                    correct(blk, k)
                k += 1


def _decode_block_into(
    reader, htables, scan_comp, block, pred, ss, se, al
):
    """Decode one block's [ss..se] band into ``block`` (natural
    order); returns the updated DC predictor."""
    cid, dc_sel, ac_sel = scan_comp
    if ss == 0:
        dc_tab = htables.get((0, dc_sel))
        if dc_tab is None:
            raise ValueError("JPEG scan references missing DC table")
        size = reader.decode_symbol(dc_tab)
        pred += _extend(reader.read_bits(size), size)
        block[0] = pred << al
    if se >= 1:
        ac_tab = htables.get((1, ac_sel))
        if ac_tab is None:
            raise ValueError("JPEG scan references missing AC table")
        k = max(ss, 1)
        while k <= se:
            sym = reader.decode_symbol(ac_tab)
            if sym == 0x00:  # EOB
                break
            r, size = sym >> 4, sym & 0x0F
            if size == 0:
                if r == 15:
                    k += 16
                    continue
                break
            k += r
            if k > se:
                raise ValueError("JPEG AC run overflow")
            block[ZIGZAG[k]] = _extend(reader.read_bits(size), size)
            k += 1
    return pred


def _reconstruct(frame, store, qtables, precision=8):
    """Dequantize + IDCT every stored block, upsample chroma, crop,
    color-convert — shared by the baseline and progressive paths.
    12-bit (SOF1/SOF2) is supported for GRAYSCALE frames — the shape
    12-bit is used for in practice (medical/scientific imagery);
    12-bit color raises."""
    h, w, comps = frame
    level = float(1 << (precision - 1))
    maxv = (1 << precision) - 1
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    full = []
    for c in comps:
        grid = store[c["id"]]
        q = qtables[c["q"]].astype(np.float64)
        brows, bcols, _ = grid.shape
        plane = np.zeros((brows * 8, bcols * 8), dtype=np.float64)
        for by in range(brows):
            for bx in range(bcols):
                coef = grid[by, bx].astype(np.float64) * q
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _C.T @ coef.reshape(8, 8) @ _C + level
                )
        ry, rx = vmax // c["vs"], hmax // c["hs"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        out = np.clip(np.round(full[0]), 0, maxv)
        return out.astype(np.uint16 if precision > 8 else np.uint8)
    if precision != 8:
        raise ValueError("12-bit color JPEG unsupported (grayscale only)")
    if len(full) != 3:
        raise ValueError(f"unsupported JPEG component count {len(full)}")
    y, cb, cr = full
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def jpeg_image_decoder(payload: bytes) -> dict:
    """``MediaProcessor``-shaped REAL JPEG decode: dimensions + the
    16-bin normalized grayscale histogram (12-bit samples are
    binned on their top 8 bits so the feature space is
    precision-independent)."""
    img = decode_jpeg(payload)
    if img.dtype == np.uint16:
        img = (img >> 4).astype(np.uint8)
    if img.ndim == 3:
        gray = (
            0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
        )
    else:
        gray = img.astype(np.float64)
    hist, _ = np.histogram(gray, bins=16, range=(0.0, 256.0))
    total = max(int(hist.sum()), 1)
    return {
        "width": int(img.shape[1]),
        "height": int(img.shape[0]),
        "features": [float(v) / total for v in hist],
    }
