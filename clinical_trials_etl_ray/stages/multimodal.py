"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a ``kind`` tag and
a metadata struct; decode / feature-extraction / resize / frame-sample run as
actor-pool ``map_batches`` stages with SMALL batch sizes (large payload rows
→ keep batch_size modest so batch × concurrency fits worker heap; SURVEY
§7.4 "wide text rows" applies doubly here).

The actual codec libraries (PIL/ffmpeg/soundfile) are NOT present in this
environment, so the decode kernel is STUBBED: ``RealDecoder`` raises
NotImplementedError unless the library import succeeds, and
``DeterministicFakeDecoder`` derives stable pseudo-features from the payload
bytes so the Ray-side plumbing (schema, batch sizing, actor lifecycle, output
layout) is real and tested end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),        # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field(
            "meta",
            pa.struct(
                [
                    pa.field("width", pa.int32()),
                    pa.field("height", pa.int32()),
                    pa.field("duration_ms", pa.int32()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16


def synth_media_table(n: int, seed: int = 42, dup_rate: float = 0.0) -> pa.Table:
    """Deterministic fake media corpus (payload bytes from a seeded RNG).

    ``dup_rate`` plants verbatim payload copies (media_id differs) so
    downstream near-dup detection has known ground truth."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[np.arange(n) % 3]
    sizes = rng.integers(256, 4096, size=n)
    payloads = [rng.integers(0, 256, size=s, dtype=np.uint8).tobytes() for s in sizes]
    k = int(n * dup_rate)
    if k:
        src = rng.choice(n, size=k, replace=False)
        dst = rng.choice(np.setdiff1d(np.arange(n), src), size=k, replace=False)
        for s, d in zip(src, dst):
            payloads[d] = payloads[s]
            kinds[d] = kinds[s]
    meta = [
        {"width": int(64 + (i % 8) * 32), "height": int(64 + (i % 5) * 32),
         "duration_ms": int(1000 + (i % 11) * 500)}
        for i in range(n)
    ]
    return pa.Table.from_pydict(
        {
            "media_id": np.arange(n, dtype=np.int64),
            "kind": kinds,
            "payload": payloads,
            "meta": meta,
        },
        schema=MEDIA_SCHEMA,
    )


class DeterministicFakeDecoder:
    """Stub decoder: md5-seeded pseudo-features per payload.

    Mirrors the real actor's shape exactly — heavy init once per actor,
    per-batch feature extraction, fixed-dim float32 output column."""

    def __init__(self, feature_dim: int = FEATURE_DIM):
        self.feature_dim = feature_dim
        self.init_count = 1  # tests assert amortized init (once per actor)

    def _features(self, payload: bytes) -> np.ndarray:
        digest = hashlib.md5(payload).digest()
        seed = int.from_bytes(digest[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.standard_normal(self.feature_dim).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.stack([self._features(p) for p in payloads])
        n_bytes = np.fromiter((len(p) for p in payloads), dtype=np.int64)
        return pa.Table.from_pydict(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "n_bytes": n_bytes,
                "feature": list(feats),
            }
        )


class RealDecoder:
    """Gated real decoder: requires PIL (absent here) — import-try stub."""

    def __init__(self):
        try:
            from PIL import Image  # noqa: F401

            self.backend = Image
        except ImportError as e:
            raise NotImplementedError(
                "image decode requires PIL, which is not available in this "
                "environment; use DeterministicFakeDecoder for plumbing tests"
            ) from e

    def __call__(self, batch: pa.Table) -> pa.Table:  # pragma: no cover
        raise NotImplementedError("real decode path not exercised in sandbox")


def media_features_ds(n: int = 300, batch_size: int = 32, concurrency=2,
                      dup_rate: float = 0.0):
    """The full plumbing: synth corpus → actor-pool decode → features.

    batch_size is deliberately small: payload rows are wide, and the batch ×
    concurrency product must fit the worker heap at real payload sizes."""
    import ray.data

    ds = ray.data.from_arrow(synth_media_table(n, dup_rate=dup_rate))
    return ds.map_batches(
        DeterministicFakeDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
