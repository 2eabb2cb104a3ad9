"""Multimodal (image/audio/video) column operators.

Binary payloads ride as opaque ``large_binary`` columns with typed metadata
(the lake's ``html`` column is the live example). Decode / feature-extract /
resize / frame-sample are actor-pool map_batches stages: heavy codec/model
state in __init__ (once per actor), small batches because rows are KB-MB.

Real decoders implemented with the stdlib (this container has no PIL/ffmpeg):
  * ``WavDecoder``  — PCM WAV parse via the ``wave`` module → sample-rate /
    duration / RMS / peak + a per-window RMS feature vector;
  * ``PpmDecoder``  — binary P6 PPM image parse → width / height / channel
    means + a luminance-histogram feature vector.
Compressed codecs (JPEG/PNG/MP3/H.264) need external libraries and stay
behind ``LibraryDecoder`` which raises NotImplementedError for them;
``DeterministicFakeDecoder`` remains for plumbing tests.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _emit(batch: pa.Table, col: str, cols: dict[str, pa.Array]) -> pa.Table:
    for name, arr in cols.items():
        batch = batch.append_column(name, arr)
    # the wide payload never travels past the decode stage
    return batch.drop_columns([col])


class WavDecoder:
    """Actor-pool PCM WAV decoder (stdlib ``wave``): per-payload audio
    features. Undecodable/empty payloads yield zeros with media_len=0 —
    the dirty-tolerant stance of the decode stage."""

    def __init__(self, binary_col: str = "payload", n_windows: int = 8):
        self.col = binary_col
        self.n = n_windows

    def decode_one(self, b: bytes):
        try:
            with wave.open(io.BytesIO(b)) as w:
                nch, sw, rate, nframes = (w.getnchannels(), w.getsampwidth(),
                                          w.getframerate(), w.getnframes())
                raw = w.readframes(nframes)
        except (wave.Error, EOFError):
            return None
        if sw == 2:
            samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif sw == 1:  # 8-bit WAV is unsigned
            samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        else:
            return None
        if nch > 1:
            samples = samples.reshape(-1, nch).mean(axis=1)
        return rate, nframes, samples

    def features(self, samples: np.ndarray) -> np.ndarray:
        """Per-window RMS over n equal chunks — a fixed-dim summary vector."""
        out = np.zeros(self.n, dtype=np.float32)
        if len(samples) == 0:
            return out
        bounds = np.linspace(0, len(samples), self.n + 1, dtype=np.int64)
        for i in range(self.n):
            seg = samples[bounds[i]:bounds[i + 1]]
            if len(seg):
                out[i] = np.float32(np.sqrt(np.mean(seg * seg)))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        media_len = np.zeros(n, dtype=np.int64)
        rate = np.zeros(n, dtype=np.int64)
        nframes = np.zeros(n, dtype=np.int64)
        dur_ms = np.zeros(n, dtype=np.float64)
        rms = np.zeros(n, dtype=np.float64)
        peak = np.zeros(n, dtype=np.float64)
        feats = []
        for i, b in enumerate(batch[self.col].to_pylist()):
            dec = self.decode_one(b) if b else None
            if dec is None:
                feats.append(np.zeros(self.n, dtype=np.float32))
                continue
            r, nf, samples = dec
            media_len[i] = len(b)
            rate[i] = r
            nframes[i] = nf
            dur_ms[i] = 1000.0 * nf / r if r else 0.0
            if len(samples):
                rms[i] = float(np.sqrt(np.mean(samples * samples)))
                peak[i] = float(np.max(np.abs(samples)))
            feats.append(self.features(samples))
        return _emit(batch, self.col, {
            "media_len": pa.array(media_len),
            "sample_rate": pa.array(rate),
            "n_frames": pa.array(nframes),
            "duration_ms": pa.array(dur_ms),
            "rms": pa.array(rms),
            "peak": pa.array(peak),
            "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
        })


class PpmDecoder:
    """Actor-pool binary-P6 PPM image decoder (pure stdlib parse): width /
    height / per-channel means + an 8-bin luminance histogram feature."""

    def __init__(self, binary_col: str = "payload", n_bins: int = 8):
        self.col = binary_col
        self.bins = n_bins

    @staticmethod
    def decode_one(b: bytes):
        """Parse P6: 'P6' <ws> width <ws> height <ws> maxval <single ws> raw
        RGB bytes. '#' comments allowed in the header."""
        if not b.startswith(b"P6"):
            return None
        pos, fields = 2, []
        while len(fields) < 3 and pos < len(b):
            while pos < len(b) and b[pos:pos + 1].isspace():
                pos += 1
            if b[pos:pos + 1] == b"#":
                while pos < len(b) and b[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(b) and not b[pos:pos + 1].isspace():
                pos += 1
            fields.append(b[start:pos])
        try:
            w, h, maxval = (int(f) for f in fields)
        except ValueError:
            return None
        pos += 1  # single whitespace after maxval
        raw = b[pos:pos + w * h * 3]
        if maxval > 255 or len(raw) < w * h * 3:
            return None
        img = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
        return w, h, img

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        width = np.zeros(n, dtype=np.int64)
        height = np.zeros(n, dtype=np.int64)
        means = np.zeros((n, 3), dtype=np.float64)
        feats = []
        for i, b in enumerate(batch[self.col].to_pylist()):
            dec = self.decode_one(b) if b else None
            if dec is None:
                feats.append(np.zeros(self.bins, dtype=np.float32))
                continue
            w, h, img = dec
            width[i], height[i] = w, h
            means[i] = img.reshape(-1, 3).mean(axis=0)
            lum = img.reshape(-1, 3).astype(np.float64) @ np.array([0.299, 0.587, 0.114])
            hist, _ = np.histogram(lum, bins=self.bins, range=(0.0, 256.0))
            feats.append((hist / max(lum.size, 1)).astype(np.float32))
        return _emit(batch, self.col, {
            "width": pa.array(width),
            "height": pa.array(height),
            "mean_r": pa.array(means[:, 0]),
            "mean_g": pa.array(means[:, 1]),
            "mean_b": pa.array(means[:, 2]),
            "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
        })


DECODERS = {"wav": WavDecoder, "ppm": PpmDecoder}


class LibraryDecoder:
    """Decoder dispatch: stdlib-decodable media types resolve to a real
    decoder; compressed codecs need libraries this container lacks."""

    def __new__(cls, media_type: str = "image", **kwargs):
        if media_type in DECODERS:
            return DECODERS[media_type](**kwargs)
        raise NotImplementedError(
            f"no codec for {media_type!r} in this environment (stdlib decodes "
            f"{sorted(DECODERS)}); install PIL/ffmpeg/soundfile and register "
            "the decoder in DECODERS"
        )


class DeterministicFakeDecoder:
    """Plumbing-test 'decoder': deterministic fixed-size feature vector from
    the payload bytes. Output schema mirrors a real decoder:
    (key cols…, media_len, feature: list<float>)."""

    def __init__(self, binary_col: str = "html", feature_dim: int = 16):
        self.col = binary_col
        self.dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.col].to_pylist()
        feats = np.zeros((len(payloads), self.dim), dtype=np.float32)
        lens = np.zeros(len(payloads), dtype=np.int64)
        for i, b in enumerate(payloads):
            if not b:
                continue
            lens[i] = len(b)
            head = np.frombuffer(b[: self.dim], dtype=np.uint8)
            feats[i, : len(head)] = head / 255.0
        return _emit(batch, self.col, {
            "media_len": pa.array(lens),
            "feature": pa.array([f for f in feats.tolist()], pa.list_(pa.float32())),
        })


def extract_features(ds, binary_col: str = "html", feature_dim: int = 16,
                     concurrency: int = 4, batch_size: int = 256,
                     decoder: str = "fake"):
    """The canonical multimodal stage shape: small batches (payloads are
    KB-MB), actor pool, zero-copy Arrow in/out, binary column dropped after
    decode so the wide payload doesn't travel further than it must.

    decoder: "fake" (plumbing), "wav" or "ppm" (real stdlib codecs)."""
    if decoder == "fake":
        cls, args = DeterministicFakeDecoder, (binary_col, feature_dim)
    elif decoder in DECODERS:
        cls, args = DECODERS[decoder], (binary_col, feature_dim)
    else:
        raise NotImplementedError(f"unknown decoder {decoder!r}")
    return ds.map_batches(
        cls,
        fn_constructor_args=args,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# deterministic payload synthesis (test/bench inputs: no media files ship
# with the testdata, so payloads derive from row keys — same spirit as gen.py)
# ---------------------------------------------------------------------------


def synth_wav_bytes(key: int, rate: int = 8000, ms: int = 50) -> bytes:
    """Sine-burst WAV derived from an integer key: freq/amplitude are
    deterministic functions of the key. Proper RIFF container via ``wave``."""
    n = rate * ms // 1000
    freq = 200.0 + (key % 40) * 20.0
    amp = 0.2 + (key % 7) * 0.1
    t = np.arange(n, dtype=np.float64) / rate
    samples = (amp * np.sin(2 * np.pi * freq * t) * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def synth_ppm_bytes(key: int, w: int = 16, h: int = 12) -> bytes:
    """Deterministic P6 image: RGB gradient offset by the key."""
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(w - 1, 1) + key) % 256
    g = (yy * 255 // max(h - 1, 1) + key * 3) % 256
    b = (xx + yy + key * 7) % 256
    img = np.stack([r, g, b], axis=-1).astype(np.uint8)
    return b"P6\n" + f"{w} {h}\n255\n".encode() + img.tobytes()


class PpmResizer:
    """Actor-pool image RESIZE stage — real, library-free: decode binary-P6
    PPM, nearest-neighbor resample to (out_w, out_h) with pure numpy index
    arithmetic, re-encode as P6. The canonical 'media transform' shape:
    binary column in, binary column out, metadata alongside — a PIL/ffmpeg
    decoder drops into the same signature for compressed codecs.

    Nearest-neighbor index: src_i = floor((i + 0.5) * src/dst) — the
    standard center-aligned mapping, reproducible by any reference
    implementation."""

    def __init__(self, binary_col: str = "payload", out_w: int = 16,
                 out_h: int = 16, out_col: str = "resized"):
        self.col = binary_col
        self.w, self.h = out_w, out_h
        self.out_col = out_col

    def resize_one(self, b: bytes) -> bytes | None:
        dec = PpmDecoder.decode_one(b) if b else None
        if dec is None:
            return None
        w, h, img = dec
        xi = np.minimum(((np.arange(self.w) + 0.5) * w / self.w)
                        .astype(np.int64), w - 1)
        yi = np.minimum(((np.arange(self.h) + 0.5) * h / self.h)
                        .astype(np.int64), h - 1)
        small = img[yi[:, None], xi[None, :]]
        header = f"P6\n{self.w} {self.h}\n255\n".encode()
        return header + small.tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [self.resize_one(b)
               for b in batch[self.col].to_pylist()]
        ok = np.array([o is not None for o in out])
        return _emit(batch, self.col, {
            "decoded_ok": pa.array(ok),
            self.out_col: pa.array([o if o is not None else b"" for o in out],
                                   pa.large_binary()),
        })


def resize_images(ds, binary_col: str = "payload", out_w: int = 16,
                  out_h: int = 16, concurrency: int = 4,
                  batch_size: int = 256):
    """Distributed image resize: actor pool (setup once per actor), small
    batches because rows are binary payloads."""
    return ds.map_batches(
        PpmResizer, fn_constructor_args=(binary_col, out_w, out_h),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


# ---------------------------------------------------------------------------
# Video: concatenated-P6 container + frame sampling
# ---------------------------------------------------------------------------


def synth_ppmvid_bytes(key: int, w: int = 16, h: int = 12,
                       n_frames: int = 24) -> bytes:
    """Deterministic 'video': back-to-back P6 frames (an MJPEG-style
    concatenated-stills container, library-free). Frame f varies content
    by key*31 + f so temporal sampling is observable."""
    return b"".join(synth_ppm_bytes(key * 31 + f, w, h)
                    for f in range(n_frames))


def split_ppmvid(b: bytes) -> list[bytes]:
    """Split a concatenated-P6 stream into frame byte slices with a
    positional header parse (width/height per frame → payload length);
    stops at the first unparsable frame (trailing garbage tolerated)."""
    frames = []
    pos = 0
    while pos < len(b):
        if b[pos:pos + 2] != b"P6":
            break
        p, fields = pos + 2, []
        while len(fields) < 3 and p < len(b):
            while p < len(b) and b[p:p + 1].isspace():
                p += 1
            if b[p:p + 1] == b"#":
                while p < len(b) and b[p] != 0x0A:
                    p += 1
                continue
            start = p
            while p < len(b) and not b[p:p + 1].isspace():
                p += 1
            fields.append(b[start:p])
        try:
            w, h, maxval = (int(f) for f in fields)
        except ValueError:
            break
        p += 1  # single whitespace after maxval
        end = p + w * h * 3
        if maxval > 255 or end > len(b):
            break
        frames.append(b[pos:end])
        pos = end
    return frames


class VideoFrameSampler:
    """Actor-pool FRAME-SAMPLE stage: parse the concatenated-P6 container,
    take ``num_samples`` uniformly spaced frames (idx = i·n//k — the
    deterministic strided pick), and emit ONE ROW PER SAMPLED FRAME with
    the frame index, dimensions, and mean luma (exact integer sums →
    double). Binary in, rows out — an ffmpeg/PyAV decoder drops into the
    same signature for real codecs (reference has no media ops at all;
    this is the §2.4 training-data surface). Batch sizes stay SMALL for
    video payloads — the actor pool bounds decoded bytes in flight."""

    def __init__(self, binary_col: str = "payload", id_col: str = "doc_id",
                 num_samples: int = 4):
        self.col = binary_col
        self.id_col = id_col
        self.k = num_samples

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, ws, hs, luma = [], [], [], [], []
        for vid, b in zip(
                pc.cast(batch[self.id_col], pa.int64()).to_pylist(),
                batch[self.col].to_pylist()):
            frames = split_ppmvid(b) if b else []
            n = len(frames)
            if n == 0:
                continue
            picks = sorted({i * n // self.k for i in range(min(self.k, n))})
            for f in picks:
                w, h, img = PpmDecoder.decode_one(frames[f])
                # exact: integer channel sums, one float division at the end
                s = img.astype(np.int64).sum(axis=(0, 1))
                lum = (299 * s[0] + 587 * s[1] + 114 * s[2]) / (
                    1000.0 * w * h)
                ids.append(vid)
                fidx.append(f)
                ws.append(w)
                hs.append(h)
                luma.append(lum)
        return pa.table({
            self.id_col: pa.array(ids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int64()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "mean_luma": pa.array(luma, pa.float64()),
        })
