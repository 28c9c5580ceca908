"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, decoded / feature-extracted by actor-pool stages.

The image/audio libraries are absent in this environment, so the DECODE
step is stubbed (clearly-marked deterministic fake; real decode raises
``NotImplementedError``) — but the Ray-side plumbing is real and tested:
binary columns stay in ``batch_format="pyarrow"`` end-to-end (binary
round-trips poorly through pandas), payload batches are kept small via
``batch_size``, the decoder is a callable CLASS whose "model" loads once
per actor, and outputs are flat feature columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def attach_binary_payload(batch: pa.Table, source_col: str = "text") -> pa.Table:
    """Turn a string column into an opaque binary payload + metadata
    (content_type, n_bytes) — the shape an image/audio column takes."""
    payload = pc.cast(batch[source_col], pa.binary())
    n_bytes = pc.binary_length(payload)
    return (
        batch.append_column("payload", payload)
        .append_column("content_type", pa.array(["application/octet-stream"] * batch.num_rows))
        .append_column("n_bytes", pc.cast(n_bytes, pa.int64()))
    )


class PayloadDecoder:
    """Actor-pool decode stage. ``mode="fake"`` computes deterministic
    pseudo-features from the raw bytes (numpy over the buffer — no row
    loop); ``mode="image"``/``"audio"`` are the real hooks and raise
    ``NotImplementedError`` until the codec libraries exist in the image.
    """

    def __init__(self, mode: str = "fake", feature_dim: int = 8):
        if mode not in ("fake", "image", "audio"):
            raise ValueError(mode)
        self.mode = mode
        self.dim = feature_dim
        # "model load" happens once per actor:
        self.mixer = np.linspace(1.0, 2.0, feature_dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode != "fake":
            raise NotImplementedError(
                f"{self.mode} decode requires codec libraries not present in "
                "this container; plug a real decoder here."
            )
        payload = batch["payload"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        buf = np.frombuffer(payload.buffers()[2], dtype=np.uint8)
        offs = np.frombuffer(payload.buffers()[1], dtype=np.int32)
        sums = np.add.reduceat(
            buf.astype(np.int64), offs[:-1].astype(np.int64), dtype=np.int64
        ) if len(buf) else np.zeros(batch.num_rows, dtype=np.int64)
        lens = (offs[1:] - offs[:-1]).astype(np.int64)
        checksum = np.where(lens > 0, sums, 0)
        feats = (checksum[:, None] % 251 + lens[:, None] % 97) * self.mixer[None, :]
        return (
            batch.drop_columns(["payload"])
            .append_column("checksum", pa.array(checksum))
            .append_column(
                "features",
                pa.FixedSizeListArray.from_arrays(
                    pa.array(np.round(feats, 4).ravel(), type=pa.float32()), self.dim
                ),
            )
        )


def multimodal_pipeline(
    docs: rd.Dataset,
    *,
    concurrency: int = 2,
    batch_size: int = 512,
) -> rd.Dataset:
    """documents → binary payloads → actor-pool decode → flat features.
    ``batch_size`` is small because payload batches are byte-heavy — the
    memory-aware sizing rule for binary columns."""
    with_payload = docs.map_batches(attach_binary_payload, batch_format="pyarrow")
    return with_payload.map_batches(
        PayloadDecoder,
        fn_constructor_kwargs={"mode": "fake"},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampler:
    """Actor-pool frame-sampling stage — the video-shaped transform
    (decode → sample every Nth frame → per-frame features) with the
    EXPLODE output shape: one input payload row fans out to one row per
    sampled frame.

    The payload is treated as a sequence of fixed-size ``frame_bytes``
    frames (the deterministic stand-in for decoded video frames — real
    codecs are absent from this container, same policy as
    :class:`PayloadDecoder`); every ``step``-th full frame is kept and
    summarized by a byte checksum. The kernel is fully vectorized: one
    cumulative sum over the batch's concatenated payload buffer, frame
    checksums by prefix-sum differences — no per-frame Python loop.
    """

    def __init__(self, frame_bytes: int = 64, step: int = 4):
        self.frame_bytes = frame_bytes
        self.step = step

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch["payload"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        buf = np.frombuffer(payload.buffers()[2], dtype=np.uint8)
        offs = np.frombuffer(payload.buffers()[1], dtype=np.int32).astype(np.int64)
        doc_start, doc_len = offs[:-1], offs[1:] - offs[:-1]
        n_frames = doc_len // self.frame_bytes
        sampled_per_doc = (n_frames + self.step - 1) // self.step
        total = int(sampled_per_doc.sum())
        if total == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "frame_idx": pa.array([], pa.int64()),
                             "frame_checksum": pa.array([], pa.int64())})
        out_doc = np.repeat(ids, sampled_per_doc)
        # frame_idx within each doc: 0, step, 2*step, ... (vectorized
        # ragged arange via global cumsum offsets)
        seg_end = np.cumsum(sampled_per_doc)
        seg_start = seg_end - sampled_per_doc
        local = np.arange(total, dtype=np.int64) - np.repeat(seg_start, sampled_per_doc)
        frame_idx = local * self.step
        starts = np.repeat(doc_start, sampled_per_doc) + frame_idx * self.frame_bytes
        cs = np.concatenate(([0], np.cumsum(buf, dtype=np.int64)))
        checksum = cs[starts + self.frame_bytes] - cs[starts]
        return pa.table(
            {
                "doc_id": pa.array(out_doc),
                "frame_idx": pa.array(frame_idx),
                "frame_checksum": pa.array(checksum),
            }
        )


def frame_sample_pipeline(
    docs: rd.Dataset,
    *,
    frame_bytes: int = 64,
    step: int = 4,
    concurrency: int = 2,
    batch_size: int = 512,
) -> rd.Dataset:
    """documents → binary payloads → actor-pool frame sampling (explode)."""
    with_payload = docs.map_batches(attach_binary_payload, batch_format="pyarrow")
    return with_payload.select_columns(["doc_id", "payload"]).map_batches(
        FrameSampler,
        fn_constructor_kwargs={"frame_bytes": frame_bytes, "step": step},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
