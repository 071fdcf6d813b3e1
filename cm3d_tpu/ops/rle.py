"""COCO RLE mask codec: C fast path + numpy fallback.

Drop-in for the reference's pycocotools usage: `encode` takes a
Fortran-contiguous uint8 [h, w] array and returns {"size": [h, w],
"counts": bytes}; `decode` inverts it. Byte-compatible with pycocotools, so
mask artifacts interoperate with the reference's .pkl files
(gen_2d_masks_detic.py:471, 2d_to_3d.py:425).
"""

from __future__ import annotations

import ctypes
from typing import Dict, List, Optional

import numpy as np

_LIB = None
_LIB_TRIED = False


def _lib():
    global _LIB, _LIB_TRIED
    if not _LIB_TRIED:
        _LIB_TRIED = True
        from cm3d_tpu.native import build_shared_lib

        lib = build_shared_lib(["rle.c"], "librle")
        if lib is not None:
            lib.rle_runs_encode.restype = ctypes.c_long
            lib.rle_runs_decode.restype = None
            lib.rle_string_encode.restype = ctypes.c_long
            lib.rle_string_decode.restype = ctypes.c_long
            lib.rle_decode_packed.restype = ctypes.c_long
            lib.rle_packed_count_runs.restype = None
            lib.rle_packed_fill_runs.restype = ctypes.c_long
            _LIB = lib
    return _LIB


def encode(mask: np.ndarray) -> Dict:
    """Encode a binary mask. mask: [h, w] uint8/bool (column-major scan)."""
    assert mask.ndim == 2
    h, w = mask.shape
    flat = np.asfortranarray(mask.astype(np.uint8)).ravel(order="F")
    lib = _lib()
    if lib is not None:
        counts = np.empty(h * w + 1, np.uint32)
        m = lib.rle_runs_encode(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_long(h),
            ctypes.c_long(w),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        )
        out = ctypes.create_string_buffer(int(m) * 7 + 1)
        n = lib.rle_string_encode(
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            ctypes.c_long(m),
            out,
        )
        return {"size": [h, w], "counts": out.raw[:n]}
    return {"size": [h, w], "counts": _string_encode_np(_runs_encode_np(flat))}


def decode(rle: Dict) -> np.ndarray:
    """Decode to an [h, w] uint8 mask (inverse of `encode`)."""
    h, w = rle["size"]
    counts_b = rle["counts"]
    if isinstance(counts_b, str):
        counts_b = counts_b.encode()
    lib = _lib()
    if lib is not None:
        cbuf = np.empty(max(len(counts_b), 1), np.uint32)
        m = lib.rle_string_decode(
            ctypes.c_char_p(counts_b),
            ctypes.c_long(len(counts_b)),
            cbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        )
        flat = np.zeros(h * w, np.uint8)
        lib.rle_runs_decode(
            cbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            ctypes.c_long(m),
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_long(h * w),
        )
    else:
        counts = _string_decode_np(counts_b)
        flat = _runs_decode_np(counts, h * w)
    return flat.reshape((h, w), order="F")


def encode_many(masks: np.ndarray) -> List[Dict]:
    """Encode [M, h, w] stacked masks."""
    return [encode(m) for m in masks]


def decode_many(rles: List[Dict]) -> np.ndarray:
    """Decode a list of same-size RLEs to [M, h, w]."""
    if not rles:
        return np.zeros((0, 0, 0), np.uint8)
    return np.stack([decode(r) for r in rles], axis=0)


# ---------------------------------------------------------------------------
# numpy fallback (byte-identical output)
# ---------------------------------------------------------------------------

def _runs_encode_np(flat: np.ndarray) -> np.ndarray:
    if len(flat) == 0:
        return np.array([0], np.int64)
    changes = np.flatnonzero(np.diff(flat)) + 1
    bounds = np.concatenate([[0], changes, [len(flat)]])
    counts = np.diff(bounds)
    if flat[0] != 0:  # runs start with the zero-run, possibly empty
        counts = np.concatenate([[0], counts])
    return counts.astype(np.int64)


def _runs_decode_np(counts: np.ndarray, n: int) -> np.ndarray:
    flat = np.zeros(n, np.uint8)
    pos = 0
    v = 0
    for c in counts:
        c = min(int(c), n - pos)
        if v:
            flat[pos : pos + c] = 1
        pos += c
        v ^= 1
        if pos >= n:
            break
    return flat


def _string_encode_np(counts: np.ndarray) -> bytes:
    out = bytearray()
    for i, cnt in enumerate(counts):
        x = int(cnt)
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(c + 48)
    return bytes(out)


def _string_decode_np(s: bytes) -> np.ndarray:
    counts = []
    p = 0
    while p < len(s):
        x = 0
        k = 0
        more = True
        while more and p < len(s):
            c = s[p] - 48
            p += 1
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return np.asarray(counts, np.int64)


def encode_packed_many(
    words: np.ndarray, n_masks: int, layout: str = "xy"
) -> List[Dict]:
    """Encode the first n_masks bit-planes straight to COCO RLE dicts (no
    dense [M, W, H] intermediate — the dense unpack + per-mask rescan cost
    ~760 ms/keyframe at production scale). Byte-identical to encode() on
    the unpacked masks.

    layout "xy": words is [W, H, mw] (the lift-side layout) — transposed
    here because the COCO Fortran scan is only sequential in y-major.
    layout "yx": words is [H, W, mw] (ops.maskpack layout="yx") — zero-copy.

    Falls back to the numpy path when the C library is unavailable."""
    if n_masks <= 0:
        return []
    if n_masks > words.shape[-1] * 32:
        # The C scanner clamps to the plane width, so out-of-range masks
        # would come back as silently-empty RLEs; fail loudly instead.
        raise ValueError(
            f"n_masks={n_masks} exceeds plane capacity "
            f"{words.shape[-1] * 32} (words.shape={words.shape})"
        )
    # The C scanner tracks at most 64 words (2048 masks) of per-pixel state;
    # beyond that it would SILENTLY emit empty RLEs — use the dense path
    # (checked BEFORE the layout transpose so the fallback pays no copy).
    lib = None if n_masks > 64 * 32 else _lib()
    if layout == "xy":
        if lib is not None:
            words = np.ascontiguousarray(np.swapaxes(words, 0, 1), np.uint32)
    elif layout == "yx":
        if lib is None:
            words = np.swapaxes(words, 0, 1)  # dense path expects [W, H, mw]
    else:
        raise ValueError(f"layout must be 'xy' or 'yx', got {layout!r}")
    if lib is None:
        from cm3d_tpu.ops.bitmask import unpack_masks_np

        # words is already [W, H, mw] on this branch (both layouts), which
        # is exactly what unpack_masks_np expects — no transpose. A
        # contiguity copy of the plane stack (hundreds of MB at the
        # production canvas) still happens, unavoidably, INSIDE
        # unpack_masks_np (ascontiguousarray + astype before unpackbits);
        # this path is the rare >2048-mask / no-C-library fallback, so
        # that cost is accepted rather than optimized.
        return encode_many(
            unpack_masks_np(np.asarray(words, np.uint32), n_masks)
            .astype(np.uint8)
        )
    # the C scanner requires contiguous memory
    words = np.ascontiguousarray(words, np.uint32)
    H, W, mw = words.shape
    n_runs = np.empty(n_masks, np.uint32)
    wp = words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
    lib.rle_packed_count_runs(
        wp, ctypes.c_long(W), ctypes.c_long(H), ctypes.c_long(mw),
        ctypes.c_long(n_masks),
        n_runs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    offsets = np.zeros(n_masks, np.int64)
    np.cumsum(n_runs[:-1], out=offsets[1:])
    counts_buf = np.empty(int(n_runs.sum()), np.uint32)
    lib.rle_packed_fill_runs(
        wp, ctypes.c_long(W), ctypes.c_long(H), ctypes.c_long(mw),
        ctypes.c_long(n_masks),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        counts_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    out: List[Dict] = []
    for m in range(n_masks):
        cnts = counts_buf[offsets[m] : offsets[m] + n_runs[m]]
        sbuf = ctypes.create_string_buffer(int(n_runs[m]) * 7 + 1)
        slen = lib.rle_string_encode(
            cnts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            ctypes.c_long(int(n_runs[m])), sbuf,
        )
        out.append({"size": [W, H], "counts": sbuf.raw[:slen]})
    return out


def decode_many_packed(rles: List[Dict], num_words: int) -> Optional[np.ndarray]:
    """Decode same-size RLEs straight into packed bit-planes.

    Returns [W, H, num_words] uint32 (artifact masks are stored [W, H]), or
    None when the C library is unavailable (callers fall back to
    decode_many + pack_masks_np)."""
    lib = _lib()
    if lib is None or not rles:
        return None
    h, w = rles[0]["size"]  # artifact layout: h = mask W, w = mask H
    words = np.zeros((h, w, num_words), np.uint32)
    for m, r in enumerate(rles):
        if m >= num_words * 32:
            break
        counts_b = r["counts"]
        if isinstance(counts_b, str):
            counts_b = counts_b.encode()
        if list(r["size"]) != [h, w]:
            return None  # mixed sizes: let the caller use the dense path
        lib.rle_decode_packed(
            ctypes.c_char_p(counts_b),
            ctypes.c_long(len(counts_b)),
            ctypes.c_long(h),
            ctypes.c_long(w),
            ctypes.c_long(m),
            words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            ctypes.c_long(num_words),
        )
    return words
