"""Perceptual hash: 8x8-DCT pHash, from the public algorithm description
(Zauner 2010 / the classic pHash scheme), in pure numpy.

luma -> 32x32 area-mean resize -> 2D DCT-II -> top-left 8x8 block ->
bit i set iff coeff_i > median(coeffs excluding DC) -> 64-bit int
(stored as signed int64, two's complement, to fit Arrow int64).
"""

from __future__ import annotations

import numpy as np

_DCT_N = 32


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.sqrt(2.0 / n) * np.cos((2 * i + 1) * k * np.pi / (2 * n))
    m[0, :] = np.sqrt(1.0 / n)
    return m


_DCT_M = _dct_matrix(_DCT_N)


def _resize_area(img: np.ndarray, n: int) -> np.ndarray:
    """Area-mean downsample to (n, n); nearest-neighbor fallback when the
    source dimensions don't divide evenly."""
    h, w = img.shape
    if h % n == 0 and w % n == 0:
        return img.reshape(n, h // n, n, w // n).mean(axis=(1, 3))
    yi = (np.arange(n) * h // n).clip(0, h - 1)
    xi = (np.arange(n) * w // n).clip(0, w - 1)
    return img[np.ix_(yi, xi)].astype(np.float64)


def phash64(img: np.ndarray) -> int:
    """img: (h, w, 3) uint8 -> signed 64-bit perceptual hash."""
    img = np.asarray(img, dtype=np.float64)
    luma = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    small = _resize_area(luma, _DCT_N)
    dct = _DCT_M @ small @ _DCT_M.T
    block = dct[:8, :8].ravel()
    med = np.median(block[1:])  # exclude DC term
    bits = block > med
    val = np.uint64(0)
    for i, b in enumerate(bits):
        if b:
            val |= np.uint64(1) << np.uint64(i)
    return int(val.astype(np.int64))


def phash64_batch(imgs: list[np.ndarray]) -> np.ndarray:
    return np.array([phash64(im) for im in imgs], dtype=np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise Hamming distance between int64 hashes (vectorized popcount)."""
    x = np.asarray(a, dtype=np.int64) ^ np.asarray(b, dtype=np.int64)
    bits = np.unpackbits(x.view(np.uint64).view(np.uint8).reshape(-1, 8), axis=1)
    return bits.sum(axis=1).astype(np.int64)
