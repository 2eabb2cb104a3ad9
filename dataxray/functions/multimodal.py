"""Multimodal (image/audio/video) column plumbing.

Binary payloads ride as opaque ``large_binary`` columns with typed metadata
(the lake's ``html`` column is the live example). Decode / feature-extract /
resize / frame-sample are actor-pool map_batches stages: heavy codec/model
state in __init__ (once per actor), small batches because rows are KB-MB.

The image/audio codec libraries are NOT in this container, so the decode
kernels are STUBS — ``DeterministicFakeDecoder`` produces a seeded fake
"decode" from the payload bytes so the Ray-side plumbing (schema, batch
sizing, actor signature, output layout) is real and tested, and
``LibraryDecoder`` raises NotImplementedError until a codec is installed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class LibraryDecoder:
    """Real-decoder slot: plug PIL/ffmpeg/soundfile here when available."""

    def __init__(self, media_type: str = "image"):
        self.media_type = media_type
        raise NotImplementedError(
            "no codec library in this environment; use DeterministicFakeDecoder "
            "for plumbing tests, or install a codec and implement __call__"
        )


class DeterministicFakeDecoder:
    """Actor-pool 'decoder': derives a deterministic fixed-size feature vector
    from the payload bytes (first/last bytes + length), standing in for a real
    decode→embed stage. Output schema matches what a real decoder would emit:
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
        batch = batch.append_column("media_len", pa.array(lens))
        batch = batch.append_column(
            "feature", pa.array([f for f in feats.tolist()], pa.list_(pa.float32()))
        )
        return batch.drop_columns([self.col])


def extract_features(ds, binary_col: str = "html", feature_dim: int = 16,
                     concurrency: int = 4, batch_size: int = 256):
    """The canonical multimodal stage shape: small batches (payloads are
    KB-MB), actor pool, zero-copy Arrow in/out, binary column dropped after
    decode so the wide payload doesn't travel further than it must."""
    return ds.map_batches(
        DeterministicFakeDecoder,
        fn_constructor_args=(binary_col, feature_dim),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
