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

# ---------------------------------------------------------------------
# Built-in pure-python codecs (no optional dependency): uncompressed
# 24-bit BMP and PCM16 WAV (stdlib ``wave``).  These make one REAL
# decode path executable in any environment — strict mode passes for
# image/bmp and audio/wav; PIL/pyav remain the adapters for compressed
# formats.
# ---------------------------------------------------------------------

import struct
import wave


def encode_bmp(rgb: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24-bit
    BMP (BI_RGB, bottom-up rows, 4-byte row padding)."""
    h, w, _ = rgb.shape
    stride = (w * 3 + 3) & ~3
    img_size = stride * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = np.zeros((h, stride), dtype=np.uint8)
    # bottom-up, BGR
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)
    return header + rows.tobytes()


def decode_bmp(raw: bytes) -> tuple[int, int, np.ndarray]:
    """Decode an uncompressed 24-bit BMP; returns (width, height,
    (h, w, 3) uint8 RGB top-down). Raises ValueError on any other BMP
    flavor (compressed, other bit depths) — that is PIL's job."""
    if len(raw) < 54 or raw[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", raw, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", raw, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", raw, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    px = np.frombuffer(raw, dtype=np.uint8, count=stride * h, offset=offset)
    rows = px.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return w, h, rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 mono samples as a PCM16 WAV via stdlib ``wave``."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(int(sample_rate))
        f.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(raw: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM16 WAV; returns (sample_rate, int16 samples of the
    first channel)."""
    with wave.open(io.BytesIO(raw), "rb") as f:
        rate = f.getframerate()
        n = f.getnframes()
        ch = f.getnchannels()
        data = np.frombuffer(f.readframes(n), dtype="<i2")
    return rate, data[::ch].copy()


def _l1_normalize(m: np.ndarray) -> np.ndarray:
    s = m.sum(axis=1, keepdims=True)
    return m / np.maximum(s, 1e-12)


def bmp_features(payloads) -> np.ndarray:
    """Real image features from the built-in BMP decoder: 8x8
    nearest-neighbor grayscale thumbnail folded to FEATURE_DIM means,
    L1-normalized (the same feature contract as the fake path)."""
    out = np.zeros((len(payloads), FEATURE_DIM), dtype=np.float32)
    for i, raw in enumerate(payloads):
        if not raw:
            continue
        w, h, rgb = decode_bmp(raw)
        gray = rgb.astype(np.float32).mean(axis=2)
        yi = (np.arange(8) * h) // 8
        xi = (np.arange(8) * w) // 8
        thumb = gray[np.ix_(yi, xi)].ravel()
        out[i] = thumb.reshape(FEATURE_DIM, -1).mean(axis=1) / 255.0
    return _l1_normalize(out)


def wav_features(payloads) -> np.ndarray:
    """Real audio features from the built-in WAV decoder: FEATURE_DIM
    mean-|amplitude| envelope buckets, L1-normalized."""
    out = np.zeros((len(payloads), FEATURE_DIM), dtype=np.float32)
    for i, raw in enumerate(payloads):
        if not raw:
            continue
        _, samples = decode_wav(raw)
        if len(samples) == 0:
            continue
        k = len(samples) // FEATURE_DIM
        if k == 0:
            pad = np.zeros(FEATURE_DIM, dtype=np.float32)
            pad[: len(samples)] = np.abs(samples.astype(np.float32))
            out[i] = pad / 32768.0
        else:
            env = (
                np.abs(samples[: k * FEATURE_DIM].astype(np.float32))
                .reshape(FEATURE_DIM, k)
                .mean(axis=1)
            )
            out[i] = env / 32768.0
    return _l1_normalize(out)


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
        # built-in pure-python codecs first: REAL decode with no
        # optional dependency (strict mode passes for these types)
        if media_type == "image/bmp":
            try:
                return bmp_features(payloads)
            except ValueError:
                if self.strict:
                    raise
                return fake_decode_features(payloads)
        if media_type == "audio/wav":
            try:
                return wav_features(payloads)
            except (wave.Error, EOFError, ValueError):
                if self.strict:
                    raise
                return fake_decode_features(payloads)
        if media_type.startswith("image/") and self.pil is not None:
            return self._pil_features(payloads)
        if self.strict:
            raise NotImplementedError(
                f"no decoder for {media_type}: the needed library "
                "(PIL for compressed images, pyav/torchaudio for av) "
                "is not installed in this environment"
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
    """Deterministic media fixture: binary payloads + metadata.

    image/bmp and audio/wav rows carry REAL payloads (built-in codecs
    above) whose decoded dimensions equal the metadata columns — the
    cross-check the ``media_decode_dims`` gate replays; png/jpeg/mp4
    payloads stay opaque random bytes (their codecs are the optional
    PIL/pyav adapters)."""
    rng = np.random.default_rng(seed)
    types = rng.choice(
        np.array(
            ["image/bmp", "image/png", "image/jpeg", "audio/wav", "video/mp4"]
        ),
        size=n,
        p=[0.25, 0.2, 0.2, 0.2, 0.15],
    )
    is_bmp = types == "image/bmp"
    is_img = np.isin(types, ["image/bmp", "image/png", "image/jpeg"])
    is_aud = types == "audio/wav"
    is_vid = types == "video/mp4"
    has_dims = is_img | is_vid
    # BMP dims kept small (<=64) so the fixture stays KB-sized
    width = np.where(
        is_bmp, rng.integers(8, 64, n), np.where(has_dims, rng.integers(16, 512, n), 0)
    ).astype(np.int32)
    height = np.where(
        is_bmp, rng.integers(8, 64, n), np.where(has_dims, rng.integers(16, 512, n), 0)
    ).astype(np.int32)
    n_samples = rng.integers(1_000, 32_000, size=n)
    duration = np.where(
        is_aud,
        n_samples / 16_000.0,
        np.where(is_vid, rng.uniform(0.5, 30.0, n), 0.0),
    ).astype(np.float32)
    sizes = rng.integers(64, 4096, size=n)
    payloads = []
    for i in range(n):
        if is_bmp[i]:
            rgb = rng.integers(
                0, 256, size=(height[i], width[i], 3), dtype=np.uint8
            )
            payloads.append(encode_bmp(rgb))
        elif is_aud[i]:
            samples = rng.integers(
                -20_000, 20_000, size=n_samples[i], dtype=np.int64
            ).astype(np.int16)
            payloads.append(encode_wav_pcm16(samples, 16_000))
        else:
            payloads.append(
                rng.integers(0, 256, size=sizes[i], dtype=np.uint8).tobytes()
            )
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "media_type": pa.array(types, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(width),
            "height": pa.array(height),
            "sample_rate": pa.array(np.where(is_aud, 16000, 0).astype(np.int32)),
            "duration_s": pa.array(duration),
        },
        schema=MEDIA_SCHEMA,
    )


def decode_dims(
    media: "ray.data.Dataset",
    batch_size: int = 64,
    concurrency: int | tuple = 2,
) -> "ray.data.Dataset":
    """REAL-decode verification stage: for every built-in-codec row
    (image/bmp, audio/wav) decode the payload and report the DECODED
    geometry — (media_id, media_type, dec_width, dec_height,
    dec_sample_rate, dec_n_samples). Strict by construction: a decode
    failure raises. Rows of other media types are dropped (their
    codecs are optional adapters)."""

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in b.itertuples():
            if r.media_type == "image/bmp":
                w, h, _ = decode_bmp(r.payload)
                rows.append((r.media_id, r.media_type, w, h, 0, 0))
            elif r.media_type == "audio/wav":
                rate, samples = decode_wav(r.payload)
                rows.append(
                    (r.media_id, r.media_type, 0, 0, rate, len(samples))
                )
        return pd.DataFrame(
            rows,
            columns=[
                "media_id",
                "media_type",
                "dec_width",
                "dec_height",
                "dec_sample_rate",
                "dec_n_samples",
            ],
        ).astype(
            {
                "media_id": "int64",
                "dec_width": "int64",
                "dec_height": "int64",
                "dec_sample_rate": "int64",
                "dec_n_samples": "int64",
            }
        )

    return media.map_batches(
        fn,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
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

    def _resize_payload(self, raw: bytes, media_type: str = "") -> bytes:
        if media_type == "image/bmp" and raw:
            # built-in real path: decode, nearest-neighbor resample,
            # re-encode — no optional dependency
            try:
                _, _, rgb = decode_bmp(raw)
            except ValueError:
                if self.strict:
                    raise
            else:
                h, w = rgb.shape[:2]
                yi = (np.arange(self.target_h) * h) // self.target_h
                xi = (np.arange(self.target_w) * w) // self.target_w
                return encode_bmp(rgb[np.ix_(yi, xi)])
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
        sub = out.loc[is_img]
        out.loc[is_img, "payload"] = pd.Series(
            [
                self._resize_payload(p, t)
                for p, t in zip(sub["payload"], sub["media_type"])
            ],
            index=sub.index,
            dtype=object,
        )
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
