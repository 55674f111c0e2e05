"""Deterministic synthetic image+caption table — the ``input_hint`` table.

Schema (authoritative, from BASELINE.json.input_hint):

    image_id: string   "img-{i:010d}"
    bytes:    binary   encoded pixels (ppm/bmp/png, all lossless)
    w:        int32
    h:        int32
    fmt:      string
    caption:  string   deterministic template over word lists
    phash:    int64    64-bit average-hash of the pixels

Everything derives from the integer image index ``i`` (seeded mixing,
no RNG state), so any worker can materialize any row independently —
the property that lets both the synthetic web's image endpoints and
the conformance oracle agree on pixels without shipping them.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .codecs import FORMATS, average_hash64, encode_image

IMAGES_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
])

_WIDTHS = (16, 32, 64, 128)
_HEIGHTS = (16, 32, 48, 96)

_COLORS = ("red", "blue", "green", "golden", "silver", "purple", "orange", "black")
_NOUNS = ("fox", "crane", "otter", "lantern", "bridge", "sailboat", "teapot", "glacier")
_VERBS = ("resting", "gliding", "spinning", "glowing", "drifting", "standing", "leaping", "floating")
_SURFACES = ("a wooden table", "the river bank", "fresh snow", "a stone wall",
             "the harbor", "a mossy rock", "the night sky", "a sand dune")


def _mix(i: int, salt: int) -> int:
    # splitmix64-style deterministic mixing (public-domain constant set)
    z = (i * 0x9E3779B97F4A7C15 + salt * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    z ^= z >> 30
    z = (z * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z ^= z >> 27
    z = (z * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def image_spec(i: int) -> tuple:
    """(w, h, fmt) for image index i."""
    m = _mix(i, 1)
    return (_WIDTHS[m & 3], _HEIGHTS[(m >> 2) & 3], FORMATS[i % 3])


def caption_for(i: int) -> str:
    m = _mix(i, 2)
    return (f"a {_COLORS[m & 7]} {_NOUNS[(m >> 3) & 7]} "
            f"{_VERBS[(m >> 6) & 7]} on {_SURFACES[(m >> 9) & 7]}")


def render_pixels(i: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 pattern for image index i —
    gradient + interference bands, fully vectorized."""
    w, h, _ = image_spec(i)
    m = _mix(i, 3)
    a, b, c = (m & 0xFF) | 1, ((m >> 8) & 0xFF) | 1, ((m >> 16) & 0xFF) | 1
    y = np.arange(h, dtype=np.uint32)[:, None]
    x = np.arange(w, dtype=np.uint32)[None, :]
    r = (x * a + y * b + (m & 0xFFFF)) % 256
    g = (x * b + y * c + ((m >> 16) & 0xFFFF)) % 256
    bl = ((x + y) * c + ((m >> 32) & 0xFFFF)) % 256
    return np.stack([r, g, bl], axis=2).astype(np.uint8)


def render_encoded(i: int) -> bytes:
    w, h, fmt = image_spec(i)
    return encode_image(render_pixels(i), fmt)


def build_images_batch(start: int, count: int) -> pa.Table:
    """Materialize rows [start, start+count) of the images table."""
    ids, blobs, ws, hs, fmts, captions, hashes = [], [], [], [], [], [], []
    for i in range(start, start + count):
        w, h, fmt = image_spec(i)
        px = render_pixels(i)
        ids.append(f"img-{i:010d}")
        blobs.append(encode_image(px, fmt))
        ws.append(w)
        hs.append(h)
        fmts.append(fmt)
        captions.append(caption_for(i))
        hashes.append(average_hash64(px))
    return pa.Table.from_arrays([
        pa.array(ids, pa.string()),
        pa.array(blobs, pa.binary()),
        pa.array(ws, pa.int32()),
        pa.array(hs, pa.int32()),
        pa.array(fmts, pa.string()),
        pa.array(captions, pa.string()),
        pa.array(hashes, pa.int64()),
    ], schema=IMAGES_SCHEMA)


def generate_images_lance(root: str, n: int, rows_per_fragment: int = 10_000) -> int:
    """Write the n-row images table as a Lance-layout table (resumable:
    existing fragments are skipped).  Driver-side helper for small
    scales; the Ray path is a ``ray.data.range(n)`` → ``map_batches``
    over ``build_images_batch`` writing one fragment per block."""
    from ..storage.lance_layout import LanceLayoutTable

    table = LanceLayoutTable(root)
    names = []
    for start in range(0, n, rows_per_fragment):
        count = min(rows_per_fragment, n - start)
        name = f"images-{start:012d}"
        if not table.has_fragment(name):
            table.write_fragment(build_images_batch(start, count), name)
        names.append(f"frag-{name}.parquet")
    return table.commit(names, metadata={"rows": n, "table": "images"})
