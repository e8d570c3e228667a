"""Deterministic synthetic multimodal fixture table.

Real image/audio/video codecs aren't installable in this sandbox, so payloads
use a tiny deterministic container format ("RAW1" rasters / PCM / frame
stacks) whose *decode step is real parsing* — the Spark-side plumbing
(binary columns, Arrow batches, pandas-UDF signatures, frame sampling) is
production-shaped, and swapping the parser for Pillow/ffmpeg is a one-function
change (clearly marked in operators/multimodal.py).

Schema: media(media_id BIGINT, kind STRING{image,audio,video},
payload BINARY, meta STRING-json) — meta is the *planted ground truth* the
decode operators are oracle-checked against.

Payload formats (big-endian):
* image: b"IMG1" + u16 width + u16 height + u8 channels + raster bytes
* audio: b"AUD1" + u32 sample_rate + u32 n_samples + signed-i8 PCM
* video: b"VID1" + u16 n_frames + u16 width + u16 height + frames (gray8)
"""

from __future__ import annotations

import json
import os
import random
import struct
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = {"smoke": 500, "correctness": 2000, "bench": 10000}


def _image(rng: random.Random) -> tuple[bytes, dict]:
    w, h, c = rng.randint(8, 64), rng.randint(8, 64), rng.choice([1, 3])
    raster = bytes(rng.getrandbits(8) for _ in range(w * h * c))
    payload = b"IMG1" + struct.pack(">HHB", w, h, c) + raster
    return payload, {"width": w, "height": h, "channels": c,
                     "format": "raw1-image"}


# Sampling stride the frame-sample operator is oracle-checked at; the
# generator plants the md5 of every FRAME_SAMPLE_K-th frame so the operator's
# byte-level output has fixture-side ground truth (exactly as image meta
# plants width/height for the decode oracle).
FRAME_SAMPLE_K = 4


def _audio(rng: random.Random) -> tuple[bytes, dict]:
    sr = rng.choice([8000, 16000, 44100])
    n = rng.randint(100, 2000)
    pcm = bytes((rng.getrandbits(8)) for _ in range(n))
    payload = b"AUD1" + struct.pack(">II", sr, n) + pcm
    # Planted PCM ground truth, signed-i8 interpretation. Integer sums are
    # exact in float64 (magnitudes << 2^53), so this Python arithmetic is
    # bit-identical to the operator's numpy mean/RMS regardless of
    # summation order.
    samples = [b - 256 if b >= 128 else b for b in pcm]
    s, sq = sum(samples), sum(v * v for v in samples)
    import math
    return payload, {"sample_rate": sr, "n_samples": n,
                     "duration_ms": round(n * 1000 / sr, 3),
                     "mean_amp": round(s / n, 4),
                     "rms_amp": round(math.sqrt(sq / n), 4),
                     "format": "raw1-audio"}


def _video(rng: random.Random) -> tuple[bytes, dict]:
    import hashlib
    nf, w, h = rng.randint(4, 24), rng.randint(4, 16), rng.randint(4, 16)
    frames = bytes(rng.getrandbits(8) for _ in range(nf * w * h))
    payload = b"VID1" + struct.pack(">HHH", nf, w, h) + frames
    fsz = w * h
    idx = list(range(0, nf, FRAME_SAMPLE_K))
    dig = [hashlib.md5(frames[i * fsz:(i + 1) * fsz]).hexdigest()
           for i in idx]
    return payload, {"n_frames": nf, "width": w, "height": h,
                     "frame_idx_k4": idx, "frame_dig_k4": dig,
                     "format": "raw1-video"}


def gen_media(n: int, seed: int = 42) -> pa.Table:
    rng = random.Random(seed)
    ids, kinds, payloads, metas = [], [], [], []
    makers = [("image", _image), ("audio", _audio), ("video", _video)]
    for i in range(n):
        kind, fn = makers[rng.randrange(3)]
        payload, meta = fn(rng)
        ids.append(i)
        kinds.append(kind)
        payloads.append(payload)
        metas.append(json.dumps(meta, sort_keys=True))
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "meta": pa.array(metas, pa.string()),
    })


def materialize(scale: str, outdir: str, seed: int = 42) -> str:
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, f"media_{scale}.parquet")
    pq.write_table(gen_media(SCALES[scale], seed), path, compression="zstd")
    return path


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=sorted(SCALES), default="smoke")
    ap.add_argument("--outdir", default=os.path.join(os.path.dirname(__file__), "data"))
    args = ap.parse_args()
    print(materialize(args.scale, args.outdir))
