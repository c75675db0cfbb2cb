"""Multimodal column plumbing (task mandate).

Images / audio / video are opaque ``binary`` columns plus typed
metadata columns flowing through the same Arrow pipeline as text. The
decode kernels themselves are STUBS — no image/audio libraries exist
in this container — but everything Ray-side is real and tested:
schemas, small-batch actor-pool stages, deterministic fake decode for
plumbing tests, output layout.

Batch-size guidance baked into the stage defaults: binary payloads are
large (MBs/row), so these stages run with small ``batch_size`` and an
actor pool sized to memory, unlike the 10k+-row text stages.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("url", pa.string()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),  # -1 until decoded
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


class DecodeImage:
    """Actor-pool stage: binary payload -> decoded pixel tensor column.

    Real decode requires an image library that is NOT in this
    container; constructing with ``backend="real"`` raises
    NotImplementedError (clearly-marked stub). ``backend="fake"``
    produces a deterministic pseudo-decode (seeded from a payload
    digest) with the exact schema/layout the real decoder would emit —
    used to test the Ray-side plumbing end-to-end."""

    def __init__(self, backend: str = "fake", out_hw: tuple[int, int] = (8, 8)):
        if backend == "real":
            raise NotImplementedError(
                "image decode backend not available in this environment; "
                "install Pillow/opencv and implement _decode_real()"
            )
        self.backend = backend
        self.out_hw = out_hw

    def _decode_fake(self, payload: bytes) -> np.ndarray:
        h, w = self.out_hw
        digest = hashlib.sha256(payload).digest()
        seed = int.from_bytes(digest[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        h, w = self.out_hw
        pix = np.stack([self._decode_fake(p) for p in payloads])  # (n, h, w, 3)
        flat = pix.reshape(len(payloads), -1)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(flat.ravel(), pa.uint8()), h * w * 3
        )
        out = batch.set_column(
            batch.schema.get_field_index("width"),
            "width",
            pa.array(np.full(len(payloads), w, dtype=np.int32)),
        )
        out = out.set_column(
            out.schema.get_field_index("height"),
            "height",
            pa.array(np.full(len(payloads), h, dtype=np.int32)),
        )
        return out.append_column("pixels", arr)


def resize_stage(batch: pa.Table, out_hw: tuple[int, int] = (4, 4)) -> pa.Table:
    """Nearest-neighbour resize on the decoded pixel tensor — a real
    computable kernel (no library needed): demonstrates post-decode
    vectorized image ops on fixed-size-list columns."""
    h_out, w_out = out_hw
    n = batch.num_rows
    w = batch["width"].to_numpy(zero_copy_only=False)[0]
    h = batch["height"].to_numpy(zero_copy_only=False)[0]
    col = batch["pixels"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    pix = col.flatten().to_numpy(zero_copy_only=False).reshape(n, h, w, 3)
    ri = (np.arange(h_out) * h // h_out)[:, None]
    ci = (np.arange(w_out) * w // w_out)[None, :]
    small = pix[:, ri, ci, :]  # (n, h_out, w_out, 3)
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(small.reshape(n, -1).ravel(), pa.uint8()), h_out * w_out * 3
    )
    return batch.append_column("pixels_small", arr)


def image_features_stage(batch: pa.Table) -> pa.Table:
    """Feature extraction on decoded pixels: per-channel mean + a
    16-bin grayscale histogram (all real numpy, no stub)."""
    n = batch.num_rows
    w = batch["width"].to_numpy(zero_copy_only=False)[0]
    h = batch["height"].to_numpy(zero_copy_only=False)[0]
    col = batch["pixels"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    pix = col.flatten().to_numpy(zero_copy_only=False).reshape(n, h, w, 3).astype(np.float64)
    means = pix.mean(axis=(1, 2))  # (n, 3)
    gray = pix.mean(axis=3)
    bins = np.clip((gray / 16).astype(np.int64), 0, 15)
    hist = np.zeros((n, 16), dtype=np.int64)
    for b in range(16):
        hist[:, b] = (bins == b).sum(axis=(1, 2))
    feat = np.concatenate([means, hist.astype(np.float64)], axis=1)
    arr = pa.FixedSizeListArray.from_arrays(pa.array(feat.ravel(), pa.float64()), feat.shape[1])
    return batch.append_column("image_feat", arr)


def frame_sample_stage(batch: pa.Table, every_ms: int = 1000) -> pa.Table:
    """Video frame-sampling STUB: emits the (media_id, frame_ts_ms)
    plan the real decoder would execute — the Ray-side fan-out shape
    (one row per sampled frame via a batch-level explode) is real."""
    ids = batch["media_id"].to_numpy(zero_copy_only=False)
    dur = batch["duration_ms"].to_numpy(zero_copy_only=False)
    counts = np.maximum(dur // every_ms, 1)
    out_ids = np.repeat(ids, counts)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    local = np.arange(counts.sum()) - np.repeat(starts, counts)
    ts = local * every_ms
    return pa.table(
        {
            "media_id": pa.array(out_ids),
            "frame_ts_ms": pa.array(ts.astype(np.int64)),
        }
    )


def make_fake_media_table(n: int, seed: int = 7) -> pa.Table:
    """Deterministic fake media corpus for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, int(s), dtype=np.uint8).tobytes() for s in rng.integers(64, 512, n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "url": pa.array([f"https://media.example/{i}.jpg" for i in range(n)]),
            "media_type": pa.array(["image"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(np.full(n, -1, dtype=np.int32)),
            "height": pa.array(np.full(n, -1, dtype=np.int32)),
            "duration_ms": pa.array(rng.integers(1000, 10000, n).astype(np.int32)),
        }
    )


class DecodeAudio:
    """Actor-pool stage: binary payload -> waveform column. Same stub
    contract as DecodeImage: ``backend="real"`` raises (no audio lib in
    this container); ``backend="fake"`` emits a deterministic payload-
    digest-seeded waveform with the real schema (fixed sample count at
    ``rate_hz`` over a fixed window)."""

    def __init__(self, backend: str = "fake", n_samples: int = 256):
        if backend == "real":
            raise NotImplementedError(
                "audio decode backend not available in this environment; "
                "install soundfile/librosa and implement _decode_real()"
            )
        self.n_samples = n_samples

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n = len(payloads)
        wav = np.empty((n, self.n_samples), dtype=np.float32)
        for i, p in enumerate(payloads):
            digest = hashlib.sha256(p).digest()
            rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
            wav[i] = rng.standard_normal(self.n_samples, dtype=np.float32)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(wav.ravel(), pa.float32()), self.n_samples
        )
        return batch.append_column("waveform", arr)


def audio_features_stage(batch: pa.Table) -> pa.Table:
    """Real numpy features over the decoded waveform: RMS energy
    (milli-units, exact int) + zero-crossing count."""
    col = batch["waveform"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = batch.num_rows
    ns = col.type.list_size
    wav = col.flatten().to_numpy(zero_copy_only=False).reshape(n, ns).astype(np.float64)
    rms = np.sqrt((wav * wav).mean(axis=1))
    zc = (np.signbit(wav[:, 1:]) != np.signbit(wav[:, :-1])).sum(axis=1)
    return batch.append_column(
        "rms_milli", pa.array(np.floor(rms * 1000 + 0.5).astype(np.int64))
    ).append_column("zero_crossings", pa.array(zc.astype(np.int64)))
