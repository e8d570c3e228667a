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


def _audio(rng: random.Random) -> tuple[bytes, dict]:
    sr = rng.choice([8000, 16000, 44100])
    n = rng.randint(100, 2000)
    pcm = bytes((rng.getrandbits(8)) for _ in range(n))
    payload = b"AUD1" + struct.pack(">II", sr, n) + pcm
    return payload, {"sample_rate": sr, "n_samples": n,
                     "duration_ms": round(n * 1000 / sr, 3),
                     "format": "raw1-audio"}


def _video(rng: random.Random) -> tuple[bytes, dict]:
    nf, w, h = rng.randint(4, 24), rng.randint(4, 16), rng.randint(4, 16)
    frames = bytes(rng.getrandbits(8) for _ in range(nf * w * h))
    payload = b"VID1" + struct.pack(">HHH", nf, w, h) + frames
    return payload, {"n_frames": nf, "width": w, "height": h,
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
