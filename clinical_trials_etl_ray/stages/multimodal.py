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
    """Real image decoder, gated on PIL availability (absent in this
    sandbox). When PIL imports, ``__call__`` is a REAL kernel with the same
    output layout as ``DeterministicFakeDecoder``: decode payload bytes →
    grayscale → resize to feature_dim^0.5 square → normalized float32
    feature vector. Rows whose payload PIL cannot decode (the synth corpus's
    random bytes, any corrupt file) get a zero vector rather than failing
    the batch — quarantine-style tolerance for dirty media at scale."""

    def __init__(self, feature_dim: int = FEATURE_DIM):
        try:
            from PIL import Image

            self.backend = Image
        except ImportError as e:
            raise NotImplementedError(
                "image decode requires PIL, which is not available in this "
                "environment; use DeterministicFakeDecoder for plumbing tests"
            ) from e
        self.feature_dim = feature_dim
        side = int(feature_dim**0.5)
        if side * side != feature_dim:
            raise ValueError("feature_dim must be a perfect square")
        self.side = side

    def _features(self, payload: bytes) -> np.ndarray:
        import io

        try:
            img = self.backend.open(io.BytesIO(payload)).convert("L")
            img = img.resize((self.side, self.side))
            arr = np.asarray(img, dtype=np.float32).ravel() / 255.0
            return arr
        except Exception:
            return np.zeros(self.feature_dim, dtype=np.float32)

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


def make_decoder(feature_dim: int = FEATURE_DIM):
    """The decode stage factory: the real PIL kernel when the codec library
    exists, else the deterministic stub — callers' pipeline shape (actor
    pool, batch size, output schema) is identical either way."""
    try:
        return RealDecoder(feature_dim=feature_dim)
    except NotImplementedError:
        return DeterministicFakeDecoder(feature_dim=feature_dim)


class FakeResizer:
    """Resize stage over decoded fake pixels: deterministically derives a
    (target, target) float32 "image" from the payload (the stub decode), then
    mean-pools it to the target size — the real PIL/cv2 kernel drops in here
    unchanged. Output replaces ``payload`` with a fixed-size ``pixels``
    column (target², float32), metadata updated to the new dims."""

    def __init__(self, target: int = 8, source: int = 32):
        self.target = target
        self.source = source
        if source % target:
            raise ValueError("source must be a multiple of target")

    def _pixels(self, payload: bytes) -> np.ndarray:
        digest = hashlib.md5(payload).digest()
        rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
        img = rng.random((self.source, self.source), dtype=np.float32)
        f = self.source // self.target
        # mean-pool resize, fully vectorized per image
        return img.reshape(self.target, f, self.target, f).mean(axis=(1, 3))

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        pixels = [self._pixels(p).ravel() for p in payloads]
        meta = [
            {"width": self.target, "height": self.target, "duration_ms": 0}
            for _ in payloads
        ]
        return pa.Table.from_pydict(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "pixels": pa.array(pixels, pa.list_(pa.float32())),
                "meta": pa.array(meta, MEDIA_SCHEMA.field("meta").type),
            }
        )


class FrameSampler:
    """Frame-sampling stage for ``video`` rows: emits ``n_frames`` evenly
    spaced frame features per video (one output row per frame, FK back to
    media_id) and passes non-video rows through with frame_idx 0 — the
    standard explode-with-FK layout a real ffmpeg sampler would produce."""

    def __init__(self, n_frames: int = 4, feature_dim: int = FEATURE_DIM):
        self.n_frames = n_frames
        self.feature_dim = feature_dim

    def _frame_features(self, payload: bytes, k: int) -> np.ndarray:
        digest = hashlib.md5(payload).digest()
        rng = np.random.default_rng(int.from_bytes(digest[:8], "little") ^ k)
        return rng.standard_normal(self.feature_dim).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds, fidx, feats, ts_ms = [], [], [], [], []
        for mid, kind, payload, meta in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("meta").to_pylist(),
        ):
            n = self.n_frames if kind == "video" else 1
            dur = (meta or {}).get("duration_ms") or 0
            for k in range(n):
                ids.append(mid)
                kinds.append(kind)
                fidx.append(k)
                ts_ms.append(dur * k // max(1, n))
                feats.append(self._frame_features(payload, k))
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "frame_ts_ms": pa.array(ts_ms, pa.int32()),
                "feature": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


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
