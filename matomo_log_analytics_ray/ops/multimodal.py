"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns with
sidecar metadata (media_type, width/height or sample_rate, codec). The
Ray-side machinery — schema, actor-pool stage shape, small batch sizes
for large rows, output layout — is real and tested; the codec work is
an OPTIONAL-DEPENDENCY adapter: when PIL (images) / pyav (video) are
importable they are loaded once per actor and used for real
decode/resize/frame-sampling; otherwise a deterministic fake path
derives stable outputs from the payload bytes so pipelines and tests
exercise the full shape, and ``strict=True`` raises
NotImplementedError exactly where the missing codec would plug in
(this container ships neither lib, so the strict paths raise here).
"""

from __future__ import annotations

import io

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _load_pil():
    """PIL.Image if installed, else None — resolved once per actor."""
    try:
        from PIL import Image  # type: ignore

        return Image
    except ImportError:
        return None


def _load_av():
    """pyav if installed, else None — resolved once per actor."""
    try:
        import av  # type: ignore

        return av
    except ImportError:
        return None

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("media_type", pa.string()),  # image/png, audio/wav, ...
        pa.field("payload", pa.binary()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("sample_rate", pa.int32()),
        pa.field("duration_s", pa.float32()),
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
        # codecs resolved ONCE per actor (not per batch)
        self.strict = strict
        self.pil = _load_pil()

    def _pil_features(self, payloads: pd.Series) -> np.ndarray:
        """Real image features via PIL: 8x8 grayscale thumbnail folded
        to FEATURE_DIM means (per-payload decode is inherently row-wise;
        batch sizes are small by design)."""
        out = np.zeros((len(payloads), FEATURE_DIM), dtype=np.float32)
        for i, raw in enumerate(payloads):
            if not raw:
                continue
            img = self.pil.open(io.BytesIO(raw)).convert("L").resize((8, 8))
            px = np.asarray(img, dtype=np.float32).ravel()
            out[i] = px.reshape(FEATURE_DIM, -1).mean(axis=1) / 255.0
        return out

    def _decode(self, media_type: str, payloads: pd.Series) -> np.ndarray:
        if media_type.startswith("image/") and self.pil is not None:
            return self._pil_features(payloads)
        if self.strict:
            raise NotImplementedError(
                f"no decoder for {media_type}: the needed library "
                "(PIL for images, pyav/torchaudio for av) is not "
                "installed in this environment"
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
        np.array(["image/png", "image/jpeg", "audio/wav", "video/mp4"]),
        size=n,
        p=[0.35, 0.35, 0.15, 0.15],
    )
    sizes = rng.integers(64, 4096, size=n)
    payloads = [rng.integers(0, 256, size=s, dtype=np.uint8).tobytes() for s in sizes]
    is_img = np.isin(types, ["image/png", "image/jpeg"])
    is_aud = types == "audio/wav"
    is_vid = types == "video/mp4"
    has_dims = is_img | is_vid
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "media_type": pa.array(types, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(np.where(has_dims, rng.integers(16, 512, n), 0).astype(np.int32)),
            "height": pa.array(np.where(has_dims, rng.integers(16, 512, n), 0).astype(np.int32)),
            "sample_rate": pa.array(np.where(is_aud, 16000, 0).astype(np.int32)),
            "duration_s": pa.array(
                np.where(is_vid | is_aud, rng.uniform(0.5, 30.0, n), 0.0).astype(np.float32)
            ),
        },
        schema=MEDIA_SCHEMA,
    )


class MediaResizer:
    """Actor-pool stage: resize image payloads to (target_w, target_h).

    The geometry/metadata handling is real; the pixel work is stubbed —
    the fake "resize" derives a deterministic payload of w*h/64 bytes by
    tiling the source bytes, and ``strict=True`` raises where
    PIL.Image.resize would plug in. Non-image rows pass through
    untouched."""

    def __init__(self, target_w: int, target_h: int, strict: bool = False):
        self.target_w = int(target_w)
        self.target_h = int(target_h)
        self.strict = strict
        self.pil = _load_pil()  # once per actor

    def _resize_payload(self, raw: bytes) -> bytes:
        if self.pil is not None and raw:
            img = self.pil.open(io.BytesIO(raw))
            fmt = img.format or "PNG"
            buf = io.BytesIO()
            img.resize((self.target_w, self.target_h)).save(buf, format=fmt)
            return buf.getvalue()
        if self.strict:
            raise NotImplementedError(
                "PIL is not installed in this environment; the real "
                "resize path activates automatically when it is"
            )
        want = max(1, self.target_w * self.target_h // 64)
        if not raw:
            return b"\x00" * want
        reps = want // len(raw) + 1
        return (raw * reps)[:want]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        is_img = out["media_type"].str.startswith("image/")
        out.loc[is_img, "payload"] = out.loc[is_img, "payload"].map(self._resize_payload)
        out.loc[is_img, "width"] = self.target_w
        out.loc[is_img, "height"] = self.target_h
        return out


class FrameSampler:
    """Actor-pool stage: sample frames from video rows at ``fps`` —
    a fan-out transform (one video row -> ceil(duration * fps) frame
    rows; non-video rows emit nothing). Frame payloads are stubbed as
    deterministic byte slices of the source payload; ``strict=True``
    raises where a pyav demux/decode would plug in."""

    def __init__(self, fps: float = 1.0, max_frames: int = 64, strict: bool = False):
        self.fps = float(fps)
        self.max_frames = int(max_frames)
        self.strict = strict
        self.av = _load_av()  # once per actor

    def _real_frames(self, raw: bytes) -> list[tuple[int, float, bytes]]:
        """Demux/decode via pyav, keeping ~fps frames (active only when
        the lib is installed)."""
        out = []
        with self.av.open(io.BytesIO(raw)) as container:
            stream = container.streams.video[0]
            next_ts = 0.0
            for frame in container.decode(stream):
                t = float(frame.time or 0.0)
                if t + 1e-9 < next_ts:
                    continue
                out.append((len(out), t, frame.to_image().tobytes()))
                next_ts += 1.0 / self.fps
                if len(out) >= self.max_frames:
                    break
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        vids = batch[batch["media_type"] == "video/mp4"]
        rows = {"media_id": [], "frame_idx": [], "frame_ts_s": [], "frame_payload": []}
        for r in vids.itertuples():
            raw = r.payload or b""
            if self.av is not None and raw:
                for k, ts, payload in self._real_frames(raw):
                    rows["media_id"].append(r.media_id)
                    rows["frame_idx"].append(k)
                    rows["frame_ts_s"].append(ts)
                    rows["frame_payload"].append(payload)
                continue
            if self.strict:
                raise NotImplementedError(
                    "pyav is not installed in this environment; the real "
                    "frame-sampling path activates automatically when it is"
                )
            n = min(self.max_frames, max(1, int(np.ceil(r.duration_s * self.fps))))
            step = max(1, len(raw) // max(1, n))
            for k in range(n):
                rows["media_id"].append(r.media_id)
                rows["frame_idx"].append(k)
                rows["frame_ts_s"].append(k / self.fps)
                rows["frame_payload"].append(raw[k * step : k * step + step])
        return pd.DataFrame(
            {
                "media_id": pd.Series(rows["media_id"], dtype="int64"),
                "frame_idx": pd.Series(rows["frame_idx"], dtype="int32"),
                "frame_ts_s": pd.Series(rows["frame_ts_s"], dtype="float64"),
                "frame_payload": pd.Series(rows["frame_payload"], dtype=object),
            }
        )


def resize_images(
    media: "ray.data.Dataset",
    target_w: int,
    target_h: int,
    batch_size: int = 32,
    concurrency: int | tuple = (1, 4),
    strict: bool = False,
) -> "ray.data.Dataset":
    return media.map_batches(
        MediaResizer,
        fn_constructor_kwargs={"target_w": target_w, "target_h": target_h, "strict": strict},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(
    media: "ray.data.Dataset",
    fps: float = 1.0,
    max_frames: int = 64,
    batch_size: int = 16,
    concurrency: int | tuple = (1, 4),
    strict: bool = False,
) -> "ray.data.Dataset":
    return media.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"fps": fps, "max_frames": max_frames, "strict": strict},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )
