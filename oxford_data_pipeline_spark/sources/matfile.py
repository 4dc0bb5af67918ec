"""Minimal pure-python MAT-file Level 5 reader/writer.

Scope: numeric real matrices (mxDOUBLE_CLASS and the integer classes
scipy promotes from), uncompressed and zlib-compressed (miCOMPRESSED)
top-level elements — the subset the reference's `.mat` session files
need when saved without `-v7.3`.  v7.3 files are HDF5 containers and
stay behind the h5py seam in `mat_ingest.decode_mat_bytes`.

Format per the published MATLAB MAT-File Format (Level 5) spec:
128-byte header (116-byte text, 8-byte subsys offset, version 0x0100,
endian tag 'IM'), then tagged data elements — 8-byte (type, nbytes)
tags, 8-byte padding, small-data-element packing for sub-elements
≤ 4 bytes, miMATRIX sub-elements in the order array-flags /
dimensions / name / real data, column-major numeric payload.
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

miINT8, miUINT8, miINT16, miUINT16, miINT32, miUINT32 = 1, 2, 3, 4, 5, 6
miSINGLE, miDOUBLE, miINT64, miUINT64 = 7, 9, 12, 13
miMATRIX, miCOMPRESSED = 14, 15
mxDOUBLE_CLASS, mxSINGLE_CLASS = 6, 7
mxINT8_CLASS, mxUINT8_CLASS, mxINT16_CLASS, mxUINT16_CLASS = 8, 9, 10, 11
mxINT32_CLASS, mxUINT32_CLASS = 12, 13

_NUMERIC_DTYPES = {
    miINT8: "<i1", miUINT8: "<u1", miINT16: "<i2", miUINT16: "<u2",
    miINT32: "<i4", miUINT32: "<u4", miSINGLE: "<f4", miDOUBLE: "<f8",
    miINT64: "<i8", miUINT64: "<u8",
}
_NUMERIC_CLASSES = {
    mxDOUBLE_CLASS, mxSINGLE_CLASS, mxINT8_CLASS, mxUINT8_CLASS,
    mxINT16_CLASS, mxUINT16_CLASS, mxINT32_CLASS, mxUINT32_CLASS,
}


def _pad8(n: int) -> int:
    return (8 - n % 8) % 8


def write_mat5(arrays: dict[str, np.ndarray], *, compress: bool = False) -> bytes:
    """Serialize named 1-D/2-D float arrays as a MAT v5 byte blob."""
    buf = io.BytesIO()
    text = b"MATLAB 5.0 MAT-file, written by oxford_data_pipeline_spark"
    buf.write(text.ljust(116, b" "))
    buf.write(b"\x00" * 8)                      # subsystem offset
    buf.write(struct.pack("<H", 0x0100) + b"IM")  # version, little-endian tag
    for name, arr in arrays.items():
        a = np.asarray(arr, dtype=np.float64)
        if a.ndim == 1:
            a = a.reshape(-1, 1)
        if a.ndim != 2:
            raise ValueError(f"{name}: only 1-D/2-D arrays supported")
        body = io.BytesIO()
        body.write(struct.pack("<II", miUINT32, 8))          # array flags
        body.write(struct.pack("<II", mxDOUBLE_CLASS, 0))
        body.write(struct.pack("<II", miINT32, 8))           # dimensions
        body.write(struct.pack("<ii", a.shape[0], a.shape[1]))
        nb = name.encode("ascii")
        body.write(struct.pack("<II", miINT8, len(nb)))      # array name
        body.write(nb + b"\x00" * _pad8(len(nb)))
        data = a.ravel(order="F").tobytes()                  # column-major
        body.write(struct.pack("<II", miDOUBLE, len(data)))
        body.write(data)
        el = body.getvalue()
        if compress:
            # Spec: miCOMPRESSED elements are exempt from the 8-byte
            # alignment rule — MATLAB/scipy write them back-to-back.
            comp = zlib.compress(struct.pack("<II", miMATRIX, len(el)) + el)
            buf.write(struct.pack("<II", miCOMPRESSED, len(comp)))
            buf.write(comp)
        else:
            buf.write(struct.pack("<II", miMATRIX, len(el)))
            buf.write(el)
    return buf.getvalue()


def _read_subelement(buf: bytes, pos: int) -> tuple[int, bytes, int]:
    """One tagged sub-element, handling the small-data-element packing
    (≤4-byte payloads live inside the 8-byte tag itself)."""
    (type_word,) = struct.unpack_from("<I", buf, pos)
    small_n = type_word >> 16
    if small_n:
        data = buf[pos + 4 : pos + 4 + small_n]
        return type_word & 0xFFFF, data, pos + 8
    (nbytes,) = struct.unpack_from("<I", buf, pos + 4)
    data = buf[pos + 8 : pos + 8 + nbytes]
    return type_word, data, pos + 8 + nbytes + _pad8(nbytes)


def _parse_matrix(data: bytes) -> tuple[str, np.ndarray]:
    pos = 0
    t, flags, pos = _read_subelement(data, pos)
    if t != miUINT32 or len(flags) < 8:
        raise ValueError("malformed array-flags sub-element")
    cls = flags[0]
    if cls not in _NUMERIC_CLASSES:
        raise NotImplementedError(f"unsupported mxCLASS {cls} (numeric-only reader)")
    if flags[1] & 0x08:
        raise NotImplementedError("complex matrices not supported")
    t, dims_b, pos = _read_subelement(data, pos)
    dims = np.frombuffer(dims_b, dtype="<i4")
    t, name_b, pos = _read_subelement(data, pos)
    name = name_b.rstrip(b"\x00").decode("ascii")
    t, real_b, pos = _read_subelement(data, pos)
    if t not in _NUMERIC_DTYPES:
        raise NotImplementedError(f"unsupported data element type {t}")
    arr = np.frombuffer(real_b, dtype=_NUMERIC_DTYPES[t]).astype(np.float64)
    return name, arr.reshape(tuple(dims), order="F")


def read_mat5(payload: bytes) -> dict[str, np.ndarray]:
    """Parse a MAT v5 blob into {variable name: float64 ndarray}."""
    if len(payload) < 128:
        raise ValueError("not a MAT v5 file (short header)")
    version, endian = struct.unpack_from("<H2s", payload, 124)
    if endian == b"MI":
        raise NotImplementedError("big-endian MAT files not supported")
    if endian != b"IM" or version != 0x0100:
        raise ValueError("not a MAT v5 file (bad version/endian tag)")
    out: dict[str, np.ndarray] = {}
    pos = 128
    while pos + 8 <= len(payload):
        dtype_w, nbytes = struct.unpack_from("<II", payload, pos)
        data = payload[pos + 8 : pos + 8 + nbytes]
        # miCOMPRESSED is exempt from the 8-byte alignment rule (the
        # spec pads every OTHER top-level element): MATLAB and scipy
        # write compressed elements back-to-back, so padding here would
        # misalign the second variable of a multi-variable file.
        pos += 8 + nbytes + (0 if dtype_w == miCOMPRESSED else _pad8(nbytes))
        if dtype_w == miCOMPRESSED:
            sub = zlib.decompress(data)
            sub_t, sub_n = struct.unpack_from("<II", sub, 0)
            if sub_t != miMATRIX:
                raise NotImplementedError(f"compressed element of type {sub_t}")
            name, arr = _parse_matrix(sub[8 : 8 + sub_n])
        elif dtype_w == miMATRIX:
            name, arr = _parse_matrix(data)
        else:
            raise NotImplementedError(f"unsupported top-level element type {dtype_w}")
        out[name] = arr
    return out
