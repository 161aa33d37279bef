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
import numpy as np

MAX_ELEMS = 512


def split_factor(w: int, c: int, max_elems: int = MAX_ELEMS) -> int:
    """Number of column blocks per row (power of 2 dividing w)."""
    k = 1
    while (w // k) * c > max_elems and w % (2 * k) == 0:
        k *= 2
    return k


def split_factor_from_streams(num_streams: int, h: int) -> int:
    """Split factor a container was actually written with.

    Decoders derive k from the container's stream COUNT rather than
    re-deriving it from (W, C): containers written before the stream-split
    landed (always k=1) and any future retuning of MAX_ELEMS stay
    decodable (ADVICE r3).
    """
    k, rem = divmod(int(num_streams), int(h))
    if rem or k < 1:
        raise ValueError(
            f"Native container stream count {num_streams} is not a "
            f"positive multiple of the latent height {h}.")
    return k


def to_streams(lat):
    """[1, H, W, C] -> [H*k, 1, W//k, C] coder streams."""
    _, h, w, c = lat.shape
    k = split_factor(int(w), int(c))
    return lat[0].reshape(h * k, 1, w // k, c)


def stream_broadcast_shape(w: int, c: int):
    """broadcast_shape arg for decompress_sidecar of such streams."""
    return (1, w // split_factor(int(w), int(c)))


def stream_broadcast_shape_k(w: int, k: int):
    """broadcast_shape for streams written with a known split factor."""
    return (1, int(w) // int(k))


def from_streams(rows, h: int, w: int, c: int):
    """[H*k, 1, W//k, C] decoded rows -> [1, H, W, C]."""
    return jnp.asarray(rows).reshape(1, h, w, c)


def esc_to_pairs(esc_idx, esc_val, count, num_elements: int):
    """Device sidecar (flat, budget-padded) -> container (pairs, vals).

    Inverse of jax_coder.sidecar_pad: keeps the first ``count`` entries
    and splits flat positions into (stream, element) pairs — the exact
    layout the host compress_sidecar writes (np.nonzero order).
    """
    k = int(count)
    idx = np.asarray(esc_idx)[:k].astype(np.int64)
    pairs = np.stack(
        [idx // int(num_elements), idx % int(num_elements)],
        axis=1).astype(np.int32)
    return pairs, np.asarray(esc_val)[:k].astype(np.int32)
