"""Single-transfer packing for the axon/remote-TPU tunnel.

Through the remote-TPU tunnel every host<->device transfer pays a
round-trip latency of ~15-25 ms regardless of size (measured: a 4 KB
upload costs ~25 ms, 3 MB ~65 ms).  The fused codec paths therefore pack
ALL of a program's host-bound inputs into ONE int32 vector (and all of
its outputs into another) so each direction pays exactly one transfer.

uint8 arrays are padded to a multiple of 4 bytes and bit-cast to int32;
uint32 arrays are reinterpreted as int32; scalars ride along as single
elements.  Shapes are static (they key the jit cache), so offsets are
compile-time constants on the device side and plain ints on the host
side.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pack_spec", "pack_host", "unpack_jit", "pack_jit",
           "unpack_host"]


def pack_spec(arrays):
    """Returns the (shape, kind) spec list for a sequence of arrays.

    kind is one of "u8", "i32", "u32", "bool" — the set the fused codec
    paths use.
    """
    spec = []
    for a in arrays:
        dt = np.dtype(a.dtype) if hasattr(a, "dtype") else np.dtype(
            type(a))
        if dt == np.uint8:
            kind = "u8"
        elif dt == np.uint32:
            kind = "u32"
        elif dt == np.bool_:
            kind = "bool"
        elif dt == np.int32:
            kind = "i32"
        else:
            raise TypeError(f"Unsupported pack dtype {dt}")
        spec.append((tuple(a.shape), kind))
    return spec


def _words(shape, kind):
    n = int(np.prod(shape)) if shape else 1
    if kind == "u8":
        return (n + 3) // 4
    return n


def pack_host(arrays):
    """Host-side: packs numpy arrays into one int32 vector (one upload)."""
    parts = []
    for a in arrays:
        a = np.asarray(a)
        if a.dtype == np.uint8:
            flat = a.reshape(-1)
            pad = (-flat.size) % 4
            if pad:
                flat = np.concatenate([flat, np.zeros(pad, np.uint8)])
            parts.append(flat.view(np.int32))
        elif a.dtype == np.uint32:
            parts.append(a.reshape(-1).view(np.int32))
        elif a.dtype == np.bool_:
            parts.append(a.reshape(-1).astype(np.int32))
        elif a.dtype == np.int32:
            parts.append(a.reshape(-1))
        else:
            # Mirror pack_spec: a silent astype(int32) would truncate
            # int64/float inputs that pack_spec already rejects.
            raise TypeError(f"Unsupported pack dtype {a.dtype}")
    return np.concatenate(parts) if parts else np.zeros(0, np.int32)


def unpack_jit(flat, spec):
    """Device-side (traced): slices a packed int32 vector back to arrays."""
    out = []
    off = 0
    for shape, kind in spec:
        w = _words(shape, kind)
        seg = jax.lax.dynamic_slice_in_dim(flat, off, w)
        if kind == "u8":
            b = jax.lax.bitcast_convert_type(seg, jnp.uint8).reshape(-1)
            out.append(b[: int(np.prod(shape))].reshape(shape))
        elif kind == "u32":
            out.append(jax.lax.bitcast_convert_type(
                seg, jnp.uint32).reshape(shape))
        elif kind == "bool":
            out.append(seg.reshape(shape).astype(jnp.bool_))
        else:
            out.append(seg.reshape(shape))
        off += w
    return out


def pack_jit(arrays):
    """Device-side (traced): packs arrays into one int32 vector (one
    fetch).  Mirrors pack_host's layout."""
    parts = []
    for a in arrays:
        a = jnp.asarray(a)
        if a.dtype == jnp.uint8:
            flat = a.reshape(-1)
            pad = (-flat.size) % 4
            if pad:
                flat = jnp.concatenate(
                    [flat, jnp.zeros(pad, jnp.uint8)])
            parts.append(jax.lax.bitcast_convert_type(
                flat.reshape(-1, 4), jnp.int32).reshape(-1))
        elif a.dtype == jnp.uint32:
            parts.append(jax.lax.bitcast_convert_type(
                a.reshape(-1), jnp.int32))
        elif a.dtype == jnp.bool_:
            parts.append(a.reshape(-1).astype(jnp.int32))
        elif a.dtype == jnp.int32:
            parts.append(a.reshape(-1))
        else:
            raise TypeError(f"Unsupported pack dtype {a.dtype}")
    return jnp.concatenate(parts) if parts else jnp.zeros(0, jnp.int32)


def unpack_host(flat, spec):
    """Host-side: slices a fetched int32 vector back to numpy arrays."""
    flat = np.asarray(flat)
    out = []
    off = 0
    for shape, kind in spec:
        w = _words(shape, kind)
        seg = flat[off: off + w]
        if kind == "u8":
            b = seg.view(np.uint8)
            out.append(b[: int(np.prod(shape))].reshape(shape))
        elif kind == "u32":
            out.append(seg.view(np.uint32).reshape(shape))
        elif kind == "bool":
            out.append(seg.astype(bool).reshape(shape))
        else:
            out.append(seg.reshape(shape))
        off += w
    return out
