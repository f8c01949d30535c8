"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the decode kernel is STUBBED:
``MediaDecoder`` tries to import PIL and, when absent (always, here),
falls back to a deterministic fake decode that derives metadata purely
from the payload bytes.  Everything around the stub — binary schema, actor
pool signature, batch sizing, output layout — is real Ray plumbing and is
exercised by tests and queries.

``documents.text`` (utf-8 bytes) stands in for the binary payload column.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("payload", pa.binary()),
        pa.field("media_type", pa.string()),
    ]
)

_FORMATS = ("png", "jpeg", "webp", "gif")


def to_media(docs: ray.data.Dataset) -> ray.data.Dataset:
    """documents -> (doc_id, payload: binary, media_type) — the opaque
    binary-column representation."""

    def fn(t: pa.Table) -> pa.Table:
        payload = pa.compute.cast(t["text"], pa.binary())
        return pa.table(
            {
                "doc_id": pa.compute.cast(t["doc_id"], pa.int64()),
                "payload": payload,
                "media_type": pa.array(["image"] * len(t), pa.string()),
            },
            schema=MEDIA_SCHEMA,
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class MediaDecoder:
    """Actor-pool decode stage: codec loaded once per actor in __init__
    (the reference's load-once LevelDB/model pattern,
    /root/reference/code/run.py:41).  Use small ``batch_size`` for large
    payloads so batch x concurrency fits the worker heap."""

    def __init__(self):
        try:  # pragma: no cover - PIL absent in this container
            import PIL.Image  # noqa: F401

            self._real = True
        except ImportError:
            self._real = False

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._real:  # pragma: no cover
            raise NotImplementedError(
                "real image decode requires PIL; container provides none"
            )
        # deterministic fake decode: metadata from payload bytes only
        payload = t["payload"]
        n_bytes = pa.compute.binary_length(payload).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        width = 64 + (n_bytes % 512)
        height = 64 + ((n_bytes * 7) % 512)
        fmt = np.array(_FORMATS, dtype=object)[(n_bytes % 4).astype(np.int64)]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bytes": pa.array(n_bytes),
                "width": pa.array(width),
                "height": pa.array(height),
                "format": pa.array(fmt, pa.string()),
            }
        )


def media_meta(docs: ray.data.Dataset, concurrency: int = 2) -> ray.data.Dataset:
    """Full multimodal pipeline: binary wrap -> actor-pool decode."""
    return to_media(docs).map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency,
    )
