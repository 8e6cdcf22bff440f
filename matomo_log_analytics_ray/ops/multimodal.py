"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns with
sidecar metadata (media_type, width/height or sample_rate, codec). The
Ray-side machinery — schema, actor-pool stage shape, small batch sizes
for large rows, output layout — is real and tested; the actual codec
work is stubbed (the container ships no image/audio libs): DECODERS
maps media_type -> callable, the default deterministic fake "decoder"
derives a stable feature vector from the bytes so pipelines and tests
exercise the full path, and ``strict=True`` raises NotImplementedError
exactly where a real decoder (PIL/torchaudio/pyav) would plug in.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("media_type", pa.string()),  # image/png, audio/wav, ...
        pa.field("payload", pa.binary()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("sample_rate", pa.int32()),
    ]
)

FEATURE_DIM = 16


def fake_decode_features(payloads: pd.Series) -> np.ndarray:
    """Deterministic stand-in for decode + feature extraction: a stable
    FEATURE_DIM-float vector derived from payload bytes (byte-histogram
    folded into FEATURE_DIM buckets, L1-normalized)."""
    out = np.zeros((len(payloads), FEATURE_DIM), dtype=np.float32)
    for i, raw in enumerate(payloads):
        if raw is None or len(raw) == 0:
            continue
        arr = np.frombuffer(raw, dtype=np.uint8)
        hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype(np.float32)
        out[i] = hist / max(1.0, hist.sum())
    return out


class MediaFeatureExtractor:
    """Actor-pool stage: decode/feature-extract binary media batches.

    Run with SMALL batch_size (payloads are large); e.g.
    ds.map_batches(MediaFeatureExtractor, batch_format="pandas",
                   batch_size=32, concurrency=4, num_cpus=1).
    """

    def __init__(self, strict: bool = False):
        # a real deployment loads models/codecs here, once per actor
        self.strict = strict

    def _decode(self, media_type: str, payloads: pd.Series) -> np.ndarray:
        if self.strict:
            raise NotImplementedError(
                f"no decoder for {media_type}: image/audio libraries are "
                "not available in this environment; plug PIL/pyav here"
            )
        return fake_decode_features(payloads)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = np.zeros((len(batch), FEATURE_DIM), dtype=np.float32)
        for mtype, idx in batch.groupby("media_type").groups.items():
            feats[batch.index.get_indexer(idx)] = self._decode(
                str(mtype), batch.loc[idx, "payload"]
            )
        return pd.DataFrame(
            {
                "media_id": batch["media_id"].to_numpy(),
                "media_type": batch["media_type"].to_numpy(),
                "payload_bytes": batch["payload"].map(
                    lambda b: 0 if b is None else len(b)
                ).astype("int64"),
                "features": list(feats),
            }
        )


def extract_features(
    media: "ray.data.Dataset",
    batch_size: int = 32,
    concurrency: int | tuple = 2,
    strict: bool = False,
) -> "ray.data.Dataset":
    return media.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"strict": strict},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def generate_fake_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media fixture: small binary payloads + metadata."""
    rng = np.random.default_rng(seed)
    types = rng.choice(
        np.array(["image/png", "image/jpeg", "audio/wav"]), size=n, p=[0.4, 0.4, 0.2]
    )
    sizes = rng.integers(64, 4096, size=n)
    payloads = [rng.integers(0, 256, size=s, dtype=np.uint8).tobytes() for s in sizes]
    is_img = types != "audio/wav"
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "media_type": pa.array(types, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(np.where(is_img, rng.integers(16, 512, n), 0).astype(np.int32)),
            "height": pa.array(np.where(is_img, rng.integers(16, 512, n), 0).astype(np.int32)),
            "sample_rate": pa.array(np.where(~is_img, 16000, 0).astype(np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )
