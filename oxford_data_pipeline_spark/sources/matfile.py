"""Minimal pure-python MAT-file Level 5 reader/writer.

Scope: numeric real matrices (mxDOUBLE_CLASS and the integer classes
scipy promotes from) plus the non-numeric classes the reference's
metadata actually uses — char arrays, cell arrays (incl. cellstr like
``cell_metrics.brainRegion_final``), and structs (e.g. ``t_approach``
event-label tables, ``Matlab_part/extract_session_data_mdl.m:86-141``)
— uncompressed and zlib-compressed (miCOMPRESSED) top-level elements.
v7.3 files are HDF5 containers handled by `sources.hdf5mat`.

Decoded value mapping: numeric matrix -> float64 ndarray; 1xN char ->
str; MxN char -> object ndarray of M row strings; cell -> object
ndarray (column-major dims preserved); struct (1x1) -> dict of field
values; struct array -> object ndarray of dicts.

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
miMATRIX, miCOMPRESSED, miUTF8, miUTF16 = 14, 15, 16, 17
mxCELL_CLASS, mxSTRUCT_CLASS, mxCHAR_CLASS = 1, 2, 4
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


def _sub(t: int, data: bytes) -> bytes:
    """One padded tagged sub-element."""
    return struct.pack("<II", t, len(data)) + data + b"\x00" * _pad8(len(data))


def _matrix_header(cls: int, dims: tuple[int, int], name: str) -> bytes:
    nb = name.encode("ascii")
    return (
        struct.pack("<IIII", miUINT32, 8, cls, 0)          # array flags
        + _sub(miINT32, struct.pack("<ii", *dims))          # dimensions
        + _sub(miINT8, nb)                                  # array name
    )


def _matrix_body(name: str, value) -> bytes:
    """One miMATRIX element body (recursive for cell/struct)."""
    if isinstance(value, str):
        data = value.encode("utf-16-le")
        return _matrix_header(mxCHAR_CLASS, (1, len(value)), name) + _sub(
            miUINT16, data
        )
    if isinstance(value, dict):
        flen = max((len(f) for f in value), default=0) + 1
        names = b"".join(f.encode("ascii").ljust(flen, b"\x00") for f in value)
        body = (
            _matrix_header(mxSTRUCT_CLASS, (1, 1), name)
            + _sub(miINT32, struct.pack("<i", flen))        # field-name length
            + _sub(miINT8, names)                           # field names
        )
        for v in value.values():                            # fields are unnamed
            body += _sub(miMATRIX, _matrix_body("", v))
        return body
    if isinstance(value, (list, tuple)) or (
        isinstance(value, np.ndarray) and value.dtype == object
    ):
        cells = list(np.asarray(value, dtype=object).ravel(order="F"))
        dims = (
            value.shape if isinstance(value, np.ndarray) and value.ndim == 2
            else (len(cells), 1)
        )
        body = _matrix_header(mxCELL_CLASS, dims, name)
        for v in cells:                                     # cells are unnamed
            body += _sub(miMATRIX, _matrix_body("", v))
        return body
    a = np.asarray(value, dtype=np.float64)
    if a.ndim == 0:
        a = a.reshape(1, 1)
    if a.ndim == 1:
        a = a.reshape(-1, 1)
    if a.ndim != 2:
        raise ValueError(f"{name}: only 1-D/2-D arrays supported")
    return _matrix_header(mxDOUBLE_CLASS, a.shape, name) + _sub(
        miDOUBLE, a.ravel(order="F").tobytes()              # column-major
    )


def write_mat5(arrays: dict[str, object], *, compress: bool = False) -> bytes:
    """Serialize named values (float arrays, str, cell list, struct
    dict — nested arbitrarily) as a MAT v5 byte blob."""
    buf = io.BytesIO()
    text = b"MATLAB 5.0 MAT-file, written by oxford_data_pipeline_spark"
    buf.write(text.ljust(116, b" "))
    buf.write(b"\x00" * 8)                      # subsystem offset
    buf.write(struct.pack("<H", 0x0100) + b"IM")  # version, little-endian tag
    for name, value in arrays.items():
        el = _matrix_body(name, value)
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


_CHAR_CODECS = {
    miUINT8: ("S1", "latin-1"), miUTF8: (None, "utf-8"),
    miUINT16: ("<u2", "utf-16-le"), miUTF16: ("<u2", "utf-16-le"),
    miINT16: ("<u2", "utf-16-le"),
}


def _parse_char(dims: np.ndarray, t: int, data: bytes):
    if t not in _CHAR_CODECS:
        raise NotImplementedError(f"unsupported char data element type {t}")
    unit, codec = _CHAR_CODECS[t]
    if unit is None:  # miUTF8: variable-width, only 1-row arrays decode flat
        return data.decode(codec)
    units = np.frombuffer(data, dtype=unit)
    m = int(dims[0]) if len(dims) else 1
    if m <= 1:
        return units.tobytes().decode(codec)
    # MxN char matrix: column-major code units; each ROW is a string
    grid = units.reshape(tuple(dims), order="F")
    rows = np.empty(m, dtype=object)
    for i in range(m):
        rows[i] = grid[i].tobytes().decode(codec)
    return rows


def _parse_matrix(data: bytes) -> tuple[str, object]:
    pos = 0
    t, flags, pos = _read_subelement(data, pos)
    if t != miUINT32 or len(flags) < 8:
        raise ValueError("malformed array-flags sub-element")
    cls = flags[0]
    if flags[1] & 0x08:
        raise NotImplementedError("complex matrices not supported")
    t, dims_b, pos = _read_subelement(data, pos)
    dims = np.frombuffer(dims_b, dtype="<i4")
    t, name_b, pos = _read_subelement(data, pos)
    name = name_b.rstrip(b"\x00").decode("ascii")
    if cls == mxCHAR_CLASS:
        t, char_b, pos = _read_subelement(data, pos)
        return name, _parse_char(dims, t, char_b)
    if cls == mxCELL_CLASS:
        n = int(np.prod(dims)) if len(dims) else 0
        cells = np.empty(n, dtype=object)
        for i in range(n):
            t, el, pos = _read_subelement(data, pos)
            if t != miMATRIX:
                raise ValueError(f"cell element {i} is not miMATRIX")
            cells[i] = _parse_matrix(el)[1]
        return name, cells.reshape(tuple(dims), order="F")
    if cls == mxSTRUCT_CLASS:
        t, flen_b, pos = _read_subelement(data, pos)
        (flen,) = struct.unpack_from("<i", flen_b)
        t, names_b, pos = _read_subelement(data, pos)
        fields = [
            names_b[i : i + flen].rstrip(b"\x00").decode("ascii")
            for i in range(0, len(names_b), flen)
        ]
        n = int(np.prod(dims)) if len(dims) else 1
        elems = np.empty(n, dtype=object)
        for i in range(n):  # element-major: all fields of element i
            d = {}
            for f in fields:
                t, el, pos = _read_subelement(data, pos)
                if t != miMATRIX:
                    raise ValueError(f"struct field {f} is not miMATRIX")
                d[f] = _parse_matrix(el)[1]
            elems[i] = d
        if n == 1:
            return name, elems[0]
        return name, elems.reshape(tuple(dims), order="F")
    if cls not in _NUMERIC_CLASSES:
        raise NotImplementedError(f"unsupported mxCLASS {cls}")
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
