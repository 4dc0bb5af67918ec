"""Minimal pure-python MAT-file Level 5 reader/writer.

Scope: numeric matrices (mxDOUBLE_CLASS and the integer classes scipy
promotes from, real AND complex) plus the non-numeric classes the
reference's metadata actually uses — char arrays, cell arrays (incl.
cellstr like ``cell_metrics.brainRegion_final``), and structs (e.g.
``t_approach`` event-label tables,
``Matlab_part/extract_session_data_mdl.m:86-141``) — uncompressed and
zlib-compressed (miCOMPRESSED) top-level elements, in BOTH byte
orders (little-endian 'IM' and big-endian 'MI' files).  v7.3 files
are HDF5 containers handled by `sources.hdf5mat`.

Decoded value mapping: real numeric matrix -> float64 ndarray;
complex matrix -> complex128 ndarray; 1xN char -> str; MxN char ->
object ndarray of M row strings; cell -> object ndarray (column-major
dims preserved); struct (1x1) -> dict of field values; struct array
-> object ndarray of dicts.

Format per the published MATLAB MAT-File Format (Level 5) spec:
128-byte header (116-byte text, 8-byte subsys offset, version 0x0100,
endian tag 'IM'/'MI'), then tagged data elements — 8-byte (type,
nbytes) tags, 8-byte padding, small-data-element packing for
sub-elements ≤ 4 bytes, miMATRIX sub-elements in the order
array-flags / dimensions / name / real data [/ imaginary data],
column-major numeric payload.  All multi-byte fields (tags, flags,
dims, payloads) follow the file's endian tag; the small-element
packing formula (count in the high 16 bits of the tag word) is
byte-order-invariant once the word is read in file order.
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

_COMPLEX_FLAG = 0x08

_NUMERIC_DTYPES = {
    miINT8: "i1", miUINT8: "u1", miINT16: "i2", miUINT16: "u2",
    miINT32: "i4", miUINT32: "u4", miSINGLE: "f4", miDOUBLE: "f8",
    miINT64: "i8", miUINT64: "u8",
}
_NUMERIC_CLASSES = {
    mxDOUBLE_CLASS, mxSINGLE_CLASS, mxINT8_CLASS, mxUINT8_CLASS,
    mxINT16_CLASS, mxUINT16_CLASS, mxINT32_CLASS, mxUINT32_CLASS,
}


def _pad8(n: int) -> int:
    return (8 - n % 8) % 8


def _sub(t: int, data: bytes, bo: str = "<") -> bytes:
    """One padded tagged sub-element."""
    return struct.pack(f"{bo}II", t, len(data)) + data + b"\x00" * _pad8(len(data))


def _matrix_header(
    cls: int, dims: tuple[int, int], name: str, bo: str = "<", flags: int = 0
) -> bytes:
    nb = name.encode("ascii")
    # array-flags word: class in the low byte, flag bits in the second
    return (
        struct.pack(f"{bo}IIII", miUINT32, 8, cls | (flags << 8), 0)
        + _sub(miINT32, struct.pack(f"{bo}ii", *dims), bo)   # dimensions
        + _sub(miINT8, nb, bo)                               # array name
    )


def _matrix_body(name: str, value, bo: str = "<") -> bytes:
    """One miMATRIX element body (recursive for cell/struct)."""
    if isinstance(value, str):
        codec = "utf-16-le" if bo == "<" else "utf-16-be"
        data = value.encode(codec)
        return _matrix_header(mxCHAR_CLASS, (1, len(value)), name, bo) + _sub(
            miUINT16, data, bo
        )
    if isinstance(value, dict):
        flen = max((len(f) for f in value), default=0) + 1
        names = b"".join(f.encode("ascii").ljust(flen, b"\x00") for f in value)
        body = (
            _matrix_header(mxSTRUCT_CLASS, (1, 1), name, bo)
            + _sub(miINT32, struct.pack(f"{bo}i", flen), bo)  # field-name length
            + _sub(miINT8, names, bo)                         # field names
        )
        for v in value.values():                              # fields are unnamed
            body += _sub(miMATRIX, _matrix_body("", v, bo), bo)
        return body
    if isinstance(value, (list, tuple)) or (
        isinstance(value, np.ndarray) and value.dtype == object
    ):
        cells = list(np.asarray(value, dtype=object).ravel(order="F"))
        dims = (
            value.shape if isinstance(value, np.ndarray) and value.ndim == 2
            else (len(cells), 1)
        )
        body = _matrix_header(mxCELL_CLASS, dims, name, bo)
        for v in cells:                                       # cells are unnamed
            body += _sub(miMATRIX, _matrix_body("", v, bo), bo)
        return body
    a = np.asarray(value)
    is_complex = np.iscomplexobj(a)
    a = a.astype(np.complex128 if is_complex else np.float64)
    if a.ndim == 0:
        a = a.reshape(1, 1)
    if a.ndim == 1:
        a = a.reshape(-1, 1)
    if a.ndim != 2:
        raise ValueError(f"{name}: only 1-D/2-D arrays supported")
    flat = a.ravel(order="F")
    hdr = _matrix_header(
        mxDOUBLE_CLASS, a.shape, name, bo, flags=_COMPLEX_FLAG if is_complex else 0
    )
    if is_complex:
        return (
            hdr
            + _sub(miDOUBLE, flat.real.astype(f"{bo}f8").tobytes(), bo)
            + _sub(miDOUBLE, flat.imag.astype(f"{bo}f8").tobytes(), bo)
        )
    return hdr + _sub(miDOUBLE, flat.astype(f"{bo}f8").tobytes(), bo)


def write_mat5(
    arrays: dict[str, object], *, compress: bool = False, byte_order: str = "<"
) -> bytes:
    """Serialize named values (float/complex arrays, str, cell list,
    struct dict — nested arbitrarily) as a MAT v5 byte blob, in either
    byte order ('<' little-endian default, '>' big-endian)."""
    bo = byte_order
    if bo not in ("<", ">"):
        raise ValueError("byte_order must be '<' or '>'")
    buf = io.BytesIO()
    text = b"MATLAB 5.0 MAT-file, written by oxford_data_pipeline_spark"
    buf.write(text.ljust(116, b" "))
    buf.write(b"\x00" * 8)                      # subsystem offset
    # endian indicator: the two bytes read back as 'IM' iff the
    # reader's assumed order matches the writer's
    buf.write(struct.pack(f"{bo}H", 0x0100) + (b"IM" if bo == "<" else b"MI"))
    for name, value in arrays.items():
        el = _matrix_body(name, value, bo)
        if compress:
            # Spec: miCOMPRESSED elements are exempt from the 8-byte
            # alignment rule — MATLAB/scipy write them back-to-back.
            comp = zlib.compress(struct.pack(f"{bo}II", miMATRIX, len(el)) + el)
            buf.write(struct.pack(f"{bo}II", miCOMPRESSED, len(comp)))
            buf.write(comp)
        else:
            buf.write(struct.pack(f"{bo}II", miMATRIX, len(el)))
            buf.write(el)
    return buf.getvalue()


def _read_subelement(buf: bytes, pos: int, bo: str = "<") -> tuple[int, bytes, int]:
    """One tagged sub-element, handling the small-data-element packing
    (≤4-byte payloads live inside the 8-byte tag itself).  The packing
    formula (count in the high 16 bits) holds in either byte order
    once the tag word is read in FILE order."""
    if pos + 8 > len(buf):
        raise ValueError("truncated MAT sub-element tag")
    (type_word,) = struct.unpack_from(f"{bo}I", buf, pos)
    small_n = type_word >> 16
    if small_n:
        data = buf[pos + 4 : pos + 4 + small_n]
        return type_word & 0xFFFF, data, pos + 8
    (nbytes,) = struct.unpack_from(f"{bo}I", buf, pos + 4)
    if pos + 8 + nbytes > len(buf):
        raise ValueError("MAT sub-element length past end of buffer")
    data = buf[pos + 8 : pos + 8 + nbytes]
    return type_word, data, pos + 8 + nbytes + _pad8(nbytes)


# char payload type -> (code-unit numpy dtype suffix, codec stem)
_CHAR_CODECS = {
    miUINT8: ("S1", "latin-1"), miUTF8: (None, "utf-8"),
    miUINT16: ("u2", "utf-16"), miUTF16: ("u2", "utf-16"),
    miINT16: ("u2", "utf-16"),
}


def _parse_char(dims: np.ndarray, t: int, data: bytes, bo: str = "<"):
    if t not in _CHAR_CODECS:
        raise NotImplementedError(f"unsupported char data element type {t}")
    unit, codec = _CHAR_CODECS[t]
    if codec == "utf-16":  # code-unit width follows the file byte order
        codec = "utf-16-le" if bo == "<" else "utf-16-be"
        unit = f"{bo}{unit}"
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


def _parse_matrix(data: bytes, bo: str = "<") -> tuple[str, object]:
    pos = 0
    t, flags_b, pos = _read_subelement(data, pos, bo)
    if t != miUINT32 or len(flags_b) < 8:
        raise ValueError("malformed array-flags sub-element")
    (flags_word,) = struct.unpack_from(f"{bo}I", flags_b, 0)
    cls = flags_word & 0xFF
    is_complex = bool((flags_word >> 8) & _COMPLEX_FLAG)
    t, dims_b, pos = _read_subelement(data, pos, bo)
    dims = np.frombuffer(dims_b, dtype=f"{bo}i4")
    t, name_b, pos = _read_subelement(data, pos, bo)
    name = name_b.rstrip(b"\x00").decode("ascii")
    if cls == mxCHAR_CLASS:
        t, char_b, pos = _read_subelement(data, pos, bo)
        return name, _parse_char(dims, t, char_b, bo)
    if cls == mxCELL_CLASS:
        n = int(np.prod(dims)) if len(dims) else 0
        cells = np.empty(n, dtype=object)
        for i in range(n):
            t, el, pos = _read_subelement(data, pos, bo)
            if t != miMATRIX:
                raise ValueError(f"cell element {i} is not miMATRIX")
            cells[i] = _parse_matrix(el, bo)[1]
        return name, cells.reshape(tuple(dims), order="F")
    if cls == mxSTRUCT_CLASS:
        t, flen_b, pos = _read_subelement(data, pos, bo)
        (flen,) = struct.unpack_from(f"{bo}i", flen_b)
        t, names_b, pos = _read_subelement(data, pos, bo)
        fields = [
            names_b[i : i + flen].rstrip(b"\x00").decode("ascii")
            for i in range(0, len(names_b), flen)
        ]
        n = int(np.prod(dims)) if len(dims) else 1
        elems = np.empty(n, dtype=object)
        for i in range(n):  # element-major: all fields of element i
            d = {}
            for f in fields:
                t, el, pos = _read_subelement(data, pos, bo)
                if t != miMATRIX:
                    raise ValueError(f"struct field {f} is not miMATRIX")
                d[f] = _parse_matrix(el, bo)[1]
            elems[i] = d
        if n == 1:
            return name, elems[0]
        return name, elems.reshape(tuple(dims), order="F")
    if cls not in _NUMERIC_CLASSES:
        raise NotImplementedError(f"unsupported mxCLASS {cls}")

    def _numeric_part(pos: int) -> tuple[np.ndarray, int]:
        t, part_b, pos = _read_subelement(data, pos, bo)
        if t not in _NUMERIC_DTYPES:
            raise NotImplementedError(f"unsupported data element type {t}")
        dt = _NUMERIC_DTYPES[t]
        dt = dt if dt in ("i1", "u1") else f"{bo}{dt}"
        return np.frombuffer(part_b, dtype=dt).astype(np.float64), pos

    real, pos = _numeric_part(pos)
    if is_complex:
        imag, pos = _numeric_part(pos)
        return name, (real + 1j * imag).reshape(tuple(dims), order="F")
    return name, real.reshape(tuple(dims), order="F")


def read_mat5(payload: bytes) -> dict[str, np.ndarray]:
    """Parse a MAT v5 blob (either byte order) into {variable name:
    float64/complex128 ndarray | str | cell | struct dict}."""
    if len(payload) < 128:
        raise ValueError("not a MAT v5 file (short header)")
    endian = payload[126:128]
    if endian == b"IM":
        bo = "<"
    elif endian == b"MI":
        bo = ">"
    else:
        raise ValueError("not a MAT v5 file (bad endian tag)")
    (version,) = struct.unpack_from(f"{bo}H", payload, 124)
    if version != 0x0100:
        raise ValueError("not a MAT v5 file (bad version)")
    out: dict[str, np.ndarray] = {}
    pos = 128
    while pos + 8 <= len(payload):
        dtype_w, nbytes = struct.unpack_from(f"{bo}II", payload, pos)
        if pos + 8 + nbytes > len(payload):
            raise ValueError("MAT top-level element length past end of file")
        data = payload[pos + 8 : pos + 8 + nbytes]
        # miCOMPRESSED is exempt from the 8-byte alignment rule (the
        # spec pads every OTHER top-level element): MATLAB and scipy
        # write compressed elements back-to-back, so padding here would
        # misalign the second variable of a multi-variable file.
        pos += 8 + nbytes + (0 if dtype_w == miCOMPRESSED else _pad8(nbytes))
        if dtype_w == miCOMPRESSED:
            try:
                sub = zlib.decompress(data)
            except zlib.error as exc:
                raise ValueError(f"corrupt MAT compressed element ({exc})") from exc
            if len(sub) < 8:
                raise ValueError("truncated MAT compressed element")
            sub_t, sub_n = struct.unpack_from(f"{bo}II", sub, 0)
            if sub_t != miMATRIX:
                raise NotImplementedError(f"compressed element of type {sub_t}")
            payload_parse = lambda: _parse_matrix(sub[8 : 8 + sub_n], bo)  # noqa: E731
        elif dtype_w == miMATRIX:
            payload_parse = lambda: _parse_matrix(data, bo)  # noqa: E731
        else:
            raise NotImplementedError(f"unsupported top-level element type {dtype_w}")
        try:
            name, arr = payload_parse()
        except (struct.error, UnicodeDecodeError) as exc:
            # untrusted-bytes boundary: malformed element internals must
            # quarantine as typed errors, never raw struct/codec errors
            raise ValueError(f"malformed MAT matrix element ({exc})") from exc
        out[name] = arr
    return out
