"""IMA ADPCM (DVI4) audio codec — pure stdlib + numpy.

The 4-bit adaptive-differential PCM codec that WAV format tag 0x0011
carries (the classic 4:1 speech/telemetry compression): a per-sample
state machine over the public 89-entry step table, with the standard
block layout — each block opens with a 4-byte header (int16 seed
sample, step index, reserved) followed by packed nibbles, low nibble
first. Encode and decode are the textbook integer algorithm, so the
output is bit-identical to any conforming implementation.

This completes the real-codec family (images: PPM/PGM, PNG, JPEG,
GIF; audio: PCM WAV, now ADPCM WAV; containers: netpbm streams, GIF,
AVI/MJPEG). Mono only — the WAV stereo interleave (4-byte nibble
groups per channel) raises cleanly. The codec runs executor-side via
``mapInPandas`` adapters in :mod:`replay_spark.multimodal`; payloads
never touch the driver. No reference counterpart (LLM-pipeline
multimodal tier).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_adpcm",
    "encode_adpcm",
    "decode_adpcm_wav",
    "encode_adpcm_wav",
    "adpcm_audio_decoder",
]

STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
INDEX_ADJUST = (-1, -1, -1, -1, 2, 4, 6, 8)


def decode_adpcm(
    nibbles, predictor: int, index: int
) -> tuple[list, int, int]:
    """Run the IMA decoder state machine over a nibble sequence from
    ``(predictor, index)``; returns (samples, predictor', index')."""
    out = []
    for nib in nibbles:
        step = STEP_TABLE[index]
        delta = nib & 7
        vpdiff = step >> 3
        if delta & 4:
            vpdiff += step
        if delta & 2:
            vpdiff += step >> 1
        if delta & 1:
            vpdiff += step >> 2
        if nib & 8:
            predictor -= vpdiff
        else:
            predictor += vpdiff
        predictor = max(-32768, min(32767, predictor))
        index = max(0, min(88, index + INDEX_ADJUST[delta]))
        out.append(predictor)
    return out, predictor, index


def encode_adpcm(
    samples, predictor: int, index: int
) -> tuple[list, int, int]:
    """Run the IMA encoder state machine (the spec's threshold
    quantizer) from ``(predictor, index)``; returns (nibbles,
    predictor', index'). Exact inverse of :func:`decode_adpcm` on
    clamp-free signals: re-encoding a decoded signal from the same
    state reproduces the nibble stream bit-for-bit (property-tested)."""
    nibbles = []
    for s in samples:
        step = STEP_TABLE[index]
        diff = int(s) - predictor
        sign = 8 if diff < 0 else 0
        if diff < 0:
            diff = -diff
        delta = 0
        vpdiff = step >> 3
        if diff >= step:
            delta = 4
            diff -= step
            vpdiff += step
        step >>= 1
        if diff >= step:
            delta |= 2
            diff -= step
            vpdiff += step
        step >>= 1
        if diff >= step:
            delta |= 1
            vpdiff += step
        if sign:
            predictor -= vpdiff
        else:
            predictor += vpdiff
        predictor = max(-32768, min(32767, predictor))
        index = max(0, min(88, index + INDEX_ADJUST[delta]))
        nibbles.append(sign | delta)
    return nibbles, predictor, index


def encode_adpcm_wav(
    samples,
    sample_rate: int = 8000,
    block_align: int = 256,
    initial_index: int = 0,
) -> bytes:
    """Encode int16 mono samples as an IMA-ADPCM WAV (format tag
    0x0011): RIFF(fmt + fact + data). Each block's first sample
    seeds the 4-byte header verbatim (lossless); the step index
    carries across blocks from ``initial_index``. The fact chunk
    records the exact sample count so decode drops nibble padding."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim != 1 or arr.size == 0:
        raise ValueError("samples must be a non-empty 1-D int16 array")
    if block_align < 8 or block_align % 4:
        raise ValueError("block_align must be >= 8 and a multiple of 4")
    if not 0 <= initial_index <= 88:
        raise ValueError("initial_index must be in [0, 88]")
    spb = (block_align - 4) * 2 + 1  # samples per block, mono
    index = initial_index
    blocks = []
    for start in range(0, arr.size, spb):
        chunk = arr[start : start + spb]
        predictor = int(chunk[0])
        header = struct.pack("<hBB", predictor, index, 0)
        nibbles, _, index = encode_adpcm(
            chunk[1:].tolist(), predictor, index
        )
        if len(nibbles) % 2:
            nibbles.append(0)
        data = bytes(
            nibbles[i] | (nibbles[i + 1] << 4)
            for i in range(0, len(nibbles), 2)
        )
        blocks.append((header + data).ljust(block_align, b"\x00"))
    payload = b"".join(blocks)
    fmt = struct.pack(
        "<HHIIHHHH",
        0x0011,               # wFormatTag = IMA ADPCM
        1,                    # channels (mono)
        sample_rate,
        sample_rate * block_align // spb,  # nominal byte rate
        block_align,
        4,                    # bits per sample
        2,                    # cbSize
        spb,                  # wSamplesPerBlock
    )
    fact = struct.pack("<I", arr.size)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_adpcm_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode an IMA-ADPCM WAV (format tag 0x0011, mono) to
    (int16 samples, sample_rate). Stereo and other format tags
    raise — PCM WAVs go through ``decode_wav`` instead."""
    data = bytes(payload or b"")
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    fmt = fact_samples = None
    frames = None
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"fact" and size >= 4:
            (fact_samples,) = struct.unpack("<I", body[:4])
        elif cid == b"data":
            frames = body
        pos += 8 + size + (size % 2)
    if fmt is None or frames is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    tag, channels, rate, _brate, block_align, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if tag != 0x0011:
        raise ValueError(f"not IMA ADPCM (format tag 0x{tag:04x})")
    if channels != 1:
        raise ValueError("only mono IMA ADPCM is supported")
    if bits != 4:
        raise ValueError(f"unsupported ADPCM bit depth {bits}")
    spb = (block_align - 4) * 2 + 1
    samples: list = []
    for start in range(0, len(frames), block_align):
        block = frames[start : start + block_align]
        if len(block) < 4:
            break
        predictor, index, _ = struct.unpack("<hBB", block[:4])
        if index > 88:
            raise ValueError(f"corrupt ADPCM step index {index}")
        samples.append(predictor)
        nibbles = []
        for b in block[4:]:
            nibbles.append(b & 0x0F)
            nibbles.append(b >> 4)
        want = min(spb - 1, (fact_samples or 1 << 62) - len(samples))
        decoded, _, _ = decode_adpcm(nibbles[:want], predictor, index)
        samples.extend(decoded)
        if fact_samples is not None and len(samples) >= fact_samples:
            break
    if fact_samples is not None:
        samples = samples[:fact_samples]
    return np.asarray(samples, dtype=np.int16), rate


def adpcm_audio_decoder(payload: bytes) -> dict:
    """``MediaProcessor``-shaped adapter for ADPCM WAV payloads
    (width carries the sample rate, height the channel count),
    feature layout identical to ``wav_audio_decoder``: RMS per 16
    equal segments, scaled to [0, 1]."""
    samples, rate = decode_adpcm_wav(payload)
    arr = samples.astype(np.float64)
    segs = np.array_split(arr, 16) if arr.size else []
    features = [
        float(np.sqrt(np.mean(s**2)) / 32768.0) if s.size else 0.0
        for s in segs
    ]
    return {"width": int(rate), "height": 1, "features": features}
