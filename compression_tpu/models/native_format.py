"""Stream layout for the TPU-native (sidecar) container.

The native container splits a latent [1, H, W, C] into independent coder
streams so the wide Pallas kernels have lanes to fill.  Rows alone are
not enough at real image sizes: a 512x512 bls2017 latent row is
32*128 = 4096 symbols, far past the VMEM budget of the indexed decode
kernel (and sublane tiles below 8 do not lower).  Rows therefore split
into 2^j column blocks until each stream holds <= MAX_ELEMS symbols —
the verified kernel regime (bench/verify run at 512 symbols/stream) —
and stream count grows correspondingly (more lanes, the axis the design
scales on).

The split factor is a pure function of (W, C), so encoder and decoder
derive it independently from the container's shape fields; w that does
not divide by 2 keeps k = 1 (correct everywhere, the coder just falls
back to wider streams).
"""

import jax.numpy as jnp

MAX_ELEMS = 512


def split_factor(w: int, c: int, max_elems: int = MAX_ELEMS) -> int:
    """Number of column blocks per row (power of 2 dividing w)."""
    k = 1
    while (w // k) * c > max_elems and w % (2 * k) == 0:
        k *= 2
    return k


def to_streams(lat):
    """[1, H, W, C] -> [H*k, 1, W//k, C] coder streams."""
    _, h, w, c = lat.shape
    k = split_factor(int(w), int(c))
    return lat[0].reshape(h * k, 1, w // k, c)


def stream_broadcast_shape(w: int, c: int):
    """broadcast_shape arg for decompress_sidecar of such streams."""
    return (1, w // split_factor(int(w), int(c)))


def from_streams(rows, h: int, w: int, c: int):
    """[H*k, 1, W//k, C] decoded rows -> [1, H, W, C]."""
    return jnp.asarray(rows).reshape(1, h, w, c)
