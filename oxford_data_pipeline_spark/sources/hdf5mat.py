"""Minimal pure-python HDF5 reader/writer for MAT v7.3 files.

MATLAB's ``save -v7.3`` (the reference's primary archive format —
``Matlab_part/single_session_oxford_CCA_mdl.m:313``) emits an HDF5
container behind a 512-byte MATLAB userblock header.  The sandbox has
no h5py, so this module implements — from the published HDF5 File
Format Specification — the exact subset those session files need when
written without chunking/compression:

- superblock version 0 with a 512-byte userblock,
- one root group (v1 object header + symbol-table B-tree v1 +
  local heap + SNOD symbol node, all at level 0),
- per-variable datasets: v1 object headers (with continuation-block
  support — real MATLAB headers overflow into continuations once the
  ``MATLAB_class`` attributes are added) carrying dataspace /
  IEEE-little-endian-f64 datatype / data layout messages,
- **contiguous** (class-1 v3) AND **chunked** (class-2 v3) layouts —
  MATLAB writes anything non-tiny chunked — with a v1 chunk B-tree
  (any depth) and the filter pipeline MATLAB actually uses:
  deflate (zlib), byte-shuffle, and fletcher32 (checksum stripped).

Non-numeric MATLAB classes decode natively: char variables (uint16
UTF-16 datasets, contiguous OR chunked/deflated) to str /
object-array-of-row-strings; structs (HDF5 GROUPS, one member per
field, any nesting) to dicts via the recursive group walk; cell
arrays (datasets of 8-byte object references into the root
``#refs#`` bookkeeping group) to object arrays.  Both object-header
generations parse: v1 (what MATLAB writes, with continuation blocks)
and v2 ("OHDR" signature, "OCHK" continuations, gap/checksum layout —
generic HDF5 writers emit these).  Out of scope (raises
NotImplementedError): non-f64/char/reference datatypes, chunked
reference datasets, group B-trees deeper than one SNOD level.

MATLAB orientation: an m×n MATLAB matrix is stored as an HDF5 dataset
of dims (n, m) in C order (i.e. the transpose), matching what h5py
shows for real v7.3 files; ``read_mat73`` transposes back.
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

_HDF5_MAGIC = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF
_USERBLOCK = 512

# object-header message types
_MSG_NIL, _MSG_DATASPACE, _MSG_DATATYPE = 0x0000, 0x0001, 0x0003
_MSG_LAYOUT, _MSG_FILTER = 0x0008, 0x000B
_MSG_CONTINUATION, _MSG_SYMBOL_TABLE = 0x0010, 0x0011

# filter pipeline ids (HDF5 registered filters)
_FILTER_DEFLATE, _FILTER_SHUFFLE, _FILTER_FLETCHER32 = 1, 2, 3


def _pad8(n: int) -> int:
    return (8 - n % 8) % 8


# --------------------------------------------------------------------------
# writer
# --------------------------------------------------------------------------
def _dataspace_datatype_msgs(
    dims: tuple[int, ...], *, char: bool = False
) -> list[tuple[int, bytes]]:
    msgs = []
    # dataspace: version 1, rank, flags 0, 5 reserved, dims (8 bytes each)
    body = struct.pack("<BBB5x", 1, len(dims), 0) + b"".join(
        struct.pack("<Q", d) for d in dims
    )
    msgs.append((_MSG_DATASPACE, body))
    if char:
        # datatype: version 1 class 0 (fixed-point), uint16 little-endian —
        # how MATLAB stores char data in v7.3 (UTF-16 code units);
        # bitfield: LE, unsigned; properties: bit offset 0, precision 16
        body = struct.pack("<B3B", 0x10, 0x00, 0x00, 0x00) + struct.pack(
            "<I", 2
        ) + struct.pack("<HH", 0, 16)
    else:
        # datatype: version 1 class 1 (float), IEEE f64 little-endian
        #   bitfield: byte order LE (bit0=0), mantissa normalization 2
        #   (bits 4-5), sign location 63; properties: offset 0, precision 64,
        #   exponent loc 52 size 11, mantissa loc 0 size 52, bias 1023
        body = (
            struct.pack("<B3B", 0x11, 0x20, 0x3F, 0x00)
            + struct.pack("<I", 8)
            + struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
        )
    msgs.append((_MSG_DATATYPE, body))
    return msgs


def _dataset_header(
    dims: tuple[int, int], data_addr: int, data_size: int, *, char: bool = False
) -> bytes:
    """v1 object header for a contiguous float64 (or uint16 char) dataset."""
    msgs = _dataspace_datatype_msgs(dims, char=char)
    # data layout: version 3, class 1 = contiguous, address + size
    msgs.append((_MSG_LAYOUT, struct.pack("<BBQQ", 3, 1, data_addr, data_size)))
    return _object_header(msgs)


def _filter_msg(filters: list[tuple[int, bytes, tuple[int, ...]]]) -> bytes:
    """Filter-pipeline message v1 from [(id, name, client values)]."""
    body = struct.pack("<BB6x", 1, len(filters))
    for fid, name, cli in filters:
        name = name + b"\x00"
        name += b"\x00" * _pad8(len(name))
        body += struct.pack("<HHHH", fid, len(name), 0, len(cli))
        body += name + struct.pack(f"<{len(cli)}I", *cli)
        if len(cli) % 2:
            body += b"\x00" * 4
    return body


def _chunked_dataset_header(
    dims: tuple[int, ...],
    chunk_shape: tuple[int, ...],
    btree_addr: int,
    filters: list[tuple[int, bytes, tuple[int, ...]]],
    *,
    char: bool = False,
) -> bytes:
    """v1 object header for a chunked (optionally filtered) f64 or
    uint16-char dataset."""
    msgs = _dataspace_datatype_msgs(dims, char=char)
    if filters:
        msgs.append((_MSG_FILTER, _filter_msg(filters)))
    ndims = len(dims) + 1  # trailing dim = element size
    body = (
        struct.pack("<BBB", 3, 2, ndims)
        + struct.pack("<Q", btree_addr)
        + struct.pack(f"<{ndims}I", *chunk_shape, 2 if char else 8)
    )
    msgs.append((_MSG_LAYOUT, body))
    return _object_header(msgs)


def _chunk_blobs(
    stored: np.ndarray,
    chunk_shape: tuple[int, ...],
    compress: int | None,
    shuffle: bool,
) -> list[tuple[tuple[int, ...], bytes]]:
    """Split a C-order array into full-size (zero-padded) chunks, apply
    the write-order filter pipeline, return [(offsets, blob)]."""
    out: list[tuple[tuple[int, ...], bytes]] = []
    ranges = [range(0, d, c) for d, c in zip(stored.shape, chunk_shape)]
    offsets_list = [()]
    for r in ranges:
        offsets_list = [o + (i,) for o in offsets_list for i in r]
    for offs in offsets_list:
        block = np.zeros(chunk_shape, dtype=stored.dtype)
        sel = tuple(
            slice(o, min(o + c, d))
            for o, c, d in zip(offs, chunk_shape, stored.shape)
        )
        block[tuple(slice(0, s.stop - s.start) for s in sel)] = stored[sel]
        raw = block.tobytes()
        if shuffle:
            raw = np.frombuffer(raw, np.uint8).reshape(-1, stored.itemsize).T.tobytes()
        if compress is not None:
            raw = zlib.compress(raw, compress)
        out.append((offs + (0,), raw))
    return out


def _object_header(msgs: list[tuple[int, bytes]]) -> bytes:
    """v1 object header: 12-byte prefix + 4 pad, messages 8-byte aligned."""
    enc = b""
    for mtype, body in msgs:
        padded = body + b"\x00" * _pad8(len(body))
        enc += struct.pack("<HHB3x", mtype, len(padded), 0) + padded
    return struct.pack("<BxHII4x", 1, len(msgs), 1, len(enc)) + enc


def write_mat73(
    arrays: dict[str, np.ndarray],
    *,
    chunks: tuple[int, int] | None = None,
    compress: int | None = None,
    shuffle: bool = False,
    btree_fanout: int | None = None,
) -> bytes:
    """Serialize named 1-D/2-D float arrays as a MAT v7.3 (HDF5) blob.

    ``chunks`` (a shape over the STORED/transposed layout) switches every
    dataset to a class-2 chunked layout with a v1 chunk B-tree —
    the layout MATLAB itself writes for non-tiny variables; ``compress``
    (zlib level) and ``shuffle`` add the matching filter pipeline.
    ``btree_fanout`` caps entries per B-tree node (HDF5's 2K split rule),
    producing a two-level tree when a dataset has more chunks than that —
    how large real v7.3 files index their chunks.
    """
    if (compress is not None or shuffle) and chunks is None:
        raise ValueError("filters require a chunked layout")
    filters: list[tuple[int, bytes, tuple[int, ...]]] = []
    if any(
        isinstance(v, (dict, list, tuple))
        or (isinstance(v, np.ndarray) and v.dtype == object)
        for v in arrays.values()
    ):
        if chunks is not None:
            raise NotImplementedError("nested variables are contiguous-only")
        return _write_mat73_nested(arrays)
    if shuffle:  # write order: shuffle, then deflate
        filters.append((_FILTER_SHUFFLE, b"shuffle", (8,)))
    if compress is not None:
        filters.append((_FILTER_DEFLATE, b"deflate", (compress,)))
    names = sorted(arrays)  # SNOD entries must be in name order
    if len(names) > 8:
        raise NotImplementedError("single-SNOD writer: at most 8 variables")
    mats: dict[str, np.ndarray] = {}
    for name in names:
        v = arrays[name]
        if isinstance(v, str):  # MATLAB char: uint16 UTF-16 code units, 1xN
            if chunks is not None and shuffle:
                raise NotImplementedError(
                    "shuffle filter is f64-only (client value 8); chunked "
                    "char supports deflate"
                )
            mats[name] = np.frombuffer(v.encode("utf-16-le"), "<u2").reshape(1, -1)
            continue
        a = np.asarray(v, dtype=np.float64)
        if a.ndim == 1:
            a = a.reshape(-1, 1)
        if a.ndim != 2:
            raise ValueError(f"{name}: only 1-D/2-D arrays supported")
        mats[name] = a

    # ---- local heap data: offset 0 = empty name, then each link name
    heap_data = io.BytesIO(b"\x00" * 8)
    heap_data.seek(8)
    name_off: dict[str, int] = {}
    for name in names:
        name_off[name] = heap_data.tell()
        nb = name.encode("ascii") + b"\x00"
        heap_data.write(nb + b"\x00" * _pad8(len(nb)))
    heap_bytes = heap_data.getvalue()

    # ---- address layout (all addresses relative to base = userblock end)
    sb_size = 24 + 32 + 40              # fixed superblock + root STE
    root_oh_addr = sb_size
    root_oh = _object_header(
        [(_MSG_SYMBOL_TABLE, struct.pack("<QQ", 0, 0))]  # patched below
    )
    heap_hdr_addr = root_oh_addr + len(root_oh)
    heap_seg_addr = heap_hdr_addr + 32
    btree_addr = heap_seg_addr + len(heap_bytes)
    btree_size = 24 + 8 + 8 + 8         # 1 entry: key0, child0, key1
    snod_addr = btree_addr + btree_size
    snod_size = 8 + 40 * len(names)
    cursor = snod_addr + snod_size
    ds_oh_addr: dict[str, int] = {}
    plans: dict[str, dict] = {}
    for name in names:
        stored = np.ascontiguousarray(mats[name].T)  # MATLAB orientation
        p: dict = {"stored": stored}
        ds_oh_addr[name] = cursor
        if chunks is None:
            is_char = stored.dtype == np.uint16
            cursor += len(
                _dataset_header(stored.shape, 0, 0, char=is_char)
            )  # size probe
            p["data_addr"] = cursor
            cursor += stored.size * stored.itemsize
        else:
            cshape = tuple(
                max(1, min(c, d)) for c, d in zip(chunks, stored.shape)
            )
            blobs = _chunk_blobs(stored, cshape, compress, shuffle)
            cursor += len(
                _chunked_dataset_header(
                    stored.shape, cshape, 0, filters,
                    char=stored.dtype == np.uint16,
                )
            )
            ndims = stored.ndim + 1
            p.update(cshape=cshape, blobs=blobs, btree_addr=cursor, ndims=ndims)
            key_size = 8 + 8 * ndims
            node_size = lambda g: 24 + g * (key_size + 8) + key_size  # noqa: E731
            fan = btree_fanout or max(len(blobs), 1)
            groups = [blobs[i : i + fan] for i in range(0, len(blobs), fan)]
            p["groups"] = groups
            if len(groups) <= 1:
                cursor += node_size(len(blobs))
            else:
                cursor += node_size(len(groups))  # level-1 root
                leaf_addrs = []
                for g in groups:
                    leaf_addrs.append(cursor)
                    cursor += node_size(len(g))
                p["leaf_addrs"] = leaf_addrs
            addrs = []
            for _, raw in blobs:
                addrs.append(cursor)
                cursor += len(raw)
            p["chunk_addrs"] = addrs
        plans[name] = p
    eof = cursor

    # ---- emit
    out = io.BytesIO()
    text = b"MATLAB 7.3 MAT-file, written by oxford_data_pipeline_spark"
    out.write(text.ljust(116, b" "))
    out.write(b"\x00" * 8)                        # subsystem offset
    out.write(struct.pack("<H", 0x0200) + b"IM")  # v7.3 version tag
    out.write(b"\x00" * (_USERBLOCK - out.tell()))

    sb = io.BytesIO()
    sb.write(_HDF5_MAGIC)
    sb.write(struct.pack("<BBBxB", 0, 0, 0, 0))   # sb/fs/root/shm versions
    sb.write(struct.pack("<BBx", 8, 8))           # offset/length sizes
    sb.write(struct.pack("<HH", 4, 16))           # leaf k, internal k
    sb.write(struct.pack("<I", 0))                # consistency flags
    sb.write(struct.pack("<QQQQ", _USERBLOCK, _UNDEF, eof, _UNDEF))
    # root symbol-table entry: cached btree+heap addrs (cache type 1)
    sb.write(struct.pack("<QQI4xQQ", 0, root_oh_addr, 1, btree_addr, heap_hdr_addr))
    assert sb.tell() == sb_size
    out.write(sb.getvalue())

    out.write(
        _object_header([(_MSG_SYMBOL_TABLE, struct.pack("<QQ", btree_addr, heap_hdr_addr))])
    )
    out.write(b"HEAP" + struct.pack("<B3xQQQ", 0, len(heap_bytes), 0, heap_seg_addr))
    out.write(heap_bytes)
    # B-tree v1, group node, level 0, one SNOD child
    out.write(b"TREE" + struct.pack("<BBHQQ", 0, 0, 1, _UNDEF, _UNDEF))
    out.write(struct.pack("<QQQ", name_off[names[0]], snod_addr, name_off[names[-1]]))
    out.write(b"SNOD" + struct.pack("<BxH", 1, len(names)))
    for name in names:
        out.write(struct.pack("<QQI4x16x", name_off[name], ds_oh_addr[name], 0))
    for name in names:
        p = plans[name]
        stored = p["stored"]
        if chunks is None:
            out.write(
                _dataset_header(
                    stored.shape, p["data_addr"],
                    stored.size * stored.itemsize,
                    char=stored.dtype == np.uint16,
                )
            )
            out.write(stored.tobytes())
        else:
            out.write(
                _chunked_dataset_header(
                    stored.shape, p["cshape"], p["btree_addr"], filters,
                    char=stored.dtype == np.uint16,
                )
            )
            blobs, addrs, ndims = p["blobs"], p["chunk_addrs"], p["ndims"]
            groups = p["groups"]

            def chunk_key(offs: tuple[int, ...], raw: bytes) -> bytes:
                return struct.pack("<II", len(raw), 0) + struct.pack(
                    f"<{ndims}Q", *offs
                )

            upper_key = struct.pack("<II", 0, 0) + struct.pack(
                f"<{ndims}Q", *stored.shape, 0
            )

            def node(level: int, entries, left: int, right: int) -> bytes:
                buf = b"TREE" + struct.pack(
                    "<BBHQQ", 1, level, len(entries), left, right
                )
                for key, child in entries:
                    buf += key + struct.pack("<Q", child)
                return buf + upper_key

            if len(groups) <= 1:
                out.write(
                    node(
                        0,
                        [
                            (chunk_key(offs, raw), addr)
                            for (offs, raw), addr in zip(blobs, addrs)
                        ],
                        _UNDEF,
                        _UNDEF,
                    )
                )
            else:  # two-level tree: root keyed by each leaf's first chunk
                leafs = p["leaf_addrs"]
                out.write(
                    node(
                        1,
                        [
                            (chunk_key(g[0][0], g[0][1]), la)
                            for g, la in zip(groups, leafs)
                        ],
                        _UNDEF,
                        _UNDEF,
                    )
                )
                i = 0
                for gi, g in enumerate(groups):
                    ents = [
                        (chunk_key(offs, raw), addrs[i + j])
                        for j, (offs, raw) in enumerate(g)
                    ]
                    out.write(
                        node(
                            0,
                            ents,
                            leafs[gi - 1] if gi else _UNDEF,
                            leafs[gi + 1] if gi + 1 < len(leafs) else _UNDEF,
                        )
                    )
                    i += len(g)
            for _, raw in blobs:
                out.write(raw)
    assert out.tell() == _USERBLOCK + eof
    return out.getvalue()


def _write_mat73_nested(arrays: dict[str, object]) -> bytes:
    """Bottom-up emitter for v7.3 files with nested variables — the
    layout MATLAB uses for its non-numeric classes:

    - struct  -> HDF5 GROUP, one member (dataset or sub-group) per field
    - cell    -> dataset of 8-byte object references; referenced
                 objects live in the root ``#refs#`` bookkeeping group
    - char    -> uint16 (UTF-16 code unit) dataset
    - numeric -> contiguous little-endian f64 dataset

    Children are emitted before parents (append-only allocator), so
    every address is known when its referencing structure is written;
    the fixed-size superblock slot is reserved first and patched last.
    Metadata variables are small, so layouts are contiguous-only here;
    the flat fast-path writer keeps the chunk/filter machinery.
    """
    buf = bytearray(24 + 32 + 40)  # reserved: superblock + root STE

    def alloc(data: bytes) -> int:
        addr = len(buf)
        buf.extend(data)
        return addr

    refs_members: dict[str, int] = {}  # name in #refs# -> oh addr

    def emit_dataset(value) -> int:
        if isinstance(value, str):
            stored = np.ascontiguousarray(
                np.frombuffer(value.encode("utf-16-le"), "<u2").reshape(1, -1).T
            )
            char = True
        else:
            a = np.asarray(value, dtype=np.float64)
            if a.ndim == 0:
                a = a.reshape(1, 1)
            if a.ndim == 1:
                a = a.reshape(-1, 1)
            if a.ndim != 2:
                raise ValueError("only 1-D/2-D arrays supported")
            stored = np.ascontiguousarray(a.T)  # MATLAB orientation
            char = False
        data_addr = alloc(stored.tobytes())
        return alloc(
            _dataset_header(
                stored.shape, data_addr, stored.size * stored.itemsize, char=char
            )
        )

    def emit_cell(values: list) -> int:
        addrs = []
        for v in values:
            oh = emit_value(v)
            refs_members[chr(ord("a") + len(refs_members) % 26)
                         + str(len(refs_members))] = oh
            addrs.append(oh)
        data = np.asarray(addrs, dtype="<u8").tobytes()
        data_addr = alloc(data)
        # MATLAB (n, 1) cell column -> stored dims (1, n)
        msgs = [
            (
                _MSG_DATASPACE,
                struct.pack("<BBB5x", 1, 2, 0)
                + struct.pack("<QQ", 1, len(values)),
            ),
            # datatype: version 1 class 7 (reference), type 0 = object
            (
                _MSG_DATATYPE,
                struct.pack("<B3B", 0x17, 0x00, 0x00, 0x00) + struct.pack("<I", 8),
            ),
            (_MSG_LAYOUT, struct.pack("<BBQQ", 3, 1, data_addr, len(data))),
        ]
        return alloc(_object_header(msgs))

    max_members = 0

    def emit_group(members: dict[str, int]) -> tuple[int, int, int]:
        """Returns (group oh addr, btree addr, heap header addr)."""
        nonlocal max_members
        names = sorted(members)
        if len(names) > 2048:
            raise NotImplementedError("single-SNOD writer: at most 2048 members")
        max_members = max(max_members, len(names))
        heap_data = io.BytesIO(b"\x00" * 8)
        heap_data.seek(8)
        name_off: dict[str, int] = {}
        for n in names:
            name_off[n] = heap_data.tell()
            nb = n.encode("ascii") + b"\x00"
            heap_data.write(nb + b"\x00" * _pad8(len(nb)))
        heap_bytes = heap_data.getvalue()
        heap_seg_addr = alloc(heap_bytes)
        heap_hdr_addr = alloc(
            b"HEAP" + struct.pack("<B3xQQQ", 0, len(heap_bytes), 0, heap_seg_addr)
        )
        snod = io.BytesIO()
        snod.write(b"SNOD" + struct.pack("<BxH", 1, len(names)))
        for n in names:
            snod.write(struct.pack("<QQI4x16x", name_off[n], members[n], 0))
        snod_addr = alloc(snod.getvalue())
        btree_addr = alloc(
            b"TREE"
            + struct.pack("<BBHQQ", 0, 0, 1, _UNDEF, _UNDEF)
            + struct.pack(
                "<QQQ",
                name_off[names[0]] if names else 0,
                snod_addr,
                name_off[names[-1]] if names else 0,
            )
        )
        oh_addr = alloc(
            _object_header(
                [(_MSG_SYMBOL_TABLE, struct.pack("<QQ", btree_addr, heap_hdr_addr))]
            )
        )
        return oh_addr, btree_addr, heap_hdr_addr

    def emit_value(value) -> int:
        if isinstance(value, dict):
            return emit_group({f: emit_value(v) for f, v in value.items()})[0]
        if isinstance(value, (list, tuple)) or (
            isinstance(value, np.ndarray) and value.dtype == object
        ):
            cells = (
                list(value.ravel(order="F"))
                if isinstance(value, np.ndarray)
                else list(value)
            )
            return emit_cell(cells)
        return emit_dataset(value)

    top = {name: emit_value(v) for name, v in arrays.items()}
    if refs_members:
        top["#refs#"] = emit_group(refs_members)[0]
    root_oh, root_btree, root_heap = emit_group(top)
    eof = len(buf)

    sb = io.BytesIO()
    sb.write(_HDF5_MAGIC)
    sb.write(struct.pack("<BBBxB", 0, 0, 0, 0))
    sb.write(struct.pack("<BBx", 8, 8))
    # group-leaf k sized so the largest single SNOD stays within the
    # spec's 2k-entries-per-node rule (#refs# collects every cell
    # element, so it can far exceed the default k=4)
    sb.write(struct.pack("<HH", max(4, (max_members + 1) // 2), 16))
    sb.write(struct.pack("<I", 0))
    sb.write(struct.pack("<QQQQ", _USERBLOCK, _UNDEF, eof, _UNDEF))
    sb.write(struct.pack("<QQI4xQQ", 0, root_oh, 1, root_btree, root_heap))
    assert sb.tell() == 24 + 32 + 40
    buf[: sb.tell()] = sb.getvalue()

    out = io.BytesIO()
    text = b"MATLAB 7.3 MAT-file, written by oxford_data_pipeline_spark"
    out.write(text.ljust(116, b" "))
    out.write(b"\x00" * 8)
    out.write(struct.pack("<H", 0x0200) + b"IM")
    out.write(b"\x00" * (_USERBLOCK - out.tell()))
    out.write(bytes(buf))
    return out.getvalue()


# --------------------------------------------------------------------------
# reader
# --------------------------------------------------------------------------
def _find_base(payload: bytes) -> int:
    """HDF5 signature lives at offset 0 or a power-of-2 userblock ≥ 512."""
    off = 0
    while off + 8 <= len(payload):
        if payload[off : off + 8] == _HDF5_MAGIC:
            return off
        off = 512 if off == 0 else off * 2
    raise ValueError("not an HDF5 file (no signature found)")


def _read_ste(payload: bytes, pos: int) -> tuple[int, int, int, int, int]:
    """Symbol-table entry → (name_off, oh_addr, cache_type, scratch0, scratch1)."""
    name_off, oh_addr, cache = struct.unpack_from("<QQI4x", payload, pos)
    s0, s1 = struct.unpack_from("<QQ", payload, pos + 24)
    return name_off, oh_addr, cache, s0, s1


def _parse_object_header(payload: bytes, base: int, addr: int) -> dict[int, bytes]:
    """v1 object header → {message type: first body}; NILs skipped.

    Follows continuation messages (0x0010): real MATLAB headers carry
    MATLAB_class/MATLAB_int_decode attributes that overflow the first
    header block into one or more continuation blocks.
    """
    pos = base + addr
    if payload[pos : pos + 4] == b"OHDR":  # version-2 header (signature-led)
        return _parse_object_header_v2(payload, base, pos)
    version, nmsgs, _refs, hsize = struct.unpack_from("<BxHII", payload, pos)
    if version != 1:
        raise NotImplementedError(f"object header version {version}")
    blocks = [(pos + 16, pos + 16 + hsize)]  # 12-byte prefix + 4 pad
    msgs: dict[int, bytes] = {}
    seen = 0
    while blocks and seen < nmsgs:
        pos, end = blocks.pop(0)
        while seen < nmsgs and pos + 8 <= end:
            mtype, msize, _flags = struct.unpack_from("<HHB3x", payload, pos)
            body = payload[pos + 8 : pos + 8 + msize]
            pos += 8 + msize
            seen += 1
            if mtype == _MSG_CONTINUATION:
                c_off, c_len = struct.unpack_from("<QQ", body, 0)
                blocks.append((base + c_off, base + c_off + c_len))
            elif mtype != _MSG_NIL and mtype not in msgs:
                msgs[mtype] = body
    return msgs


def _parse_object_header_v2(payload: bytes, base: int, pos: int) -> dict[int, bytes]:
    """v2 ("OHDR") object header -> {message type: first body}.

    Differences from v1 handled here: signature-led prefix with a flag
    byte, optional time/phase-change fields, variable-width chunk-0
    size, 4-byte (not 8-byte) unaligned message prefixes with optional
    2-byte creation-order, "OCHK"-signed continuation blocks whose
    length includes signature + trailing checksum.  Checksums are not
    verified (this is a salvage reader, not a validator)."""
    version, flags = struct.unpack_from("<BB", payload, pos + 4)
    if version != 2:
        raise NotImplementedError(f"OHDR version {version}")
    p = pos + 6
    if flags & 0x20:  # access/mod/change/birth times
        p += 16
    if flags & 0x10:  # max-compact / min-dense phase-change values
        p += 4
    csize = 1 << (flags & 0x3)
    hsize = int.from_bytes(payload[p : p + csize], "little")
    p += csize
    corder = 2 if flags & 0x04 else 0  # per-message creation-order field
    msgs: dict[int, bytes] = {}
    blocks = [(p, p + hsize)]
    while blocks:
        mp, end = blocks.pop(0)
        while mp + 4 + corder <= end:  # trailing gap < one message prefix
            mtype, msize, _mflags = struct.unpack_from("<BHB", payload, mp)
            mp += 4 + corder
            body = payload[mp : mp + msize]
            mp += msize
            if mtype == _MSG_CONTINUATION:
                c_off, c_len = struct.unpack_from("<QQ", body, 0)
                s0 = base + c_off
                if payload[s0 : s0 + 4] != b"OCHK":
                    raise ValueError("bad v2 continuation-block signature")
                blocks.append((s0 + 4, s0 + c_len - 4))  # minus checksum
            elif mtype != _MSG_NIL and mtype not in msgs:
                msgs[mtype] = body
    return msgs


def _object_header_v2(
    msgs: list[tuple[int, bytes]], *, chunk0_extra: int = 0
) -> bytes:
    """Minimal v2 object header (4-byte chunk-0 size, no times, no
    creation order).  Checksum written as zero — the reader ignores it.
    Used by round-trip tests; the production writer stays v1 (what
    MATLAB emits)."""
    enc = b""
    for mtype, body in msgs:
        enc += struct.pack("<BHB", mtype, len(body), 0) + body
    return (
        b"OHDR"
        + struct.pack("<BB", 2, 0x02)  # version 2, chunk0-size = 4 bytes
        + struct.pack("<I", len(enc) + chunk0_extra)
        + enc
        + struct.pack("<I", 0)  # unverified checksum
    )


def _parse_filters(body: bytes) -> list[tuple[int, tuple[int, ...]]]:
    """Filter-pipeline message (v1) → [(filter id, client values)] in
    write order (apply reversed when reading)."""
    version, nfilters = struct.unpack_from("<BB", body, 0)
    if version != 1:
        raise NotImplementedError(f"filter pipeline version {version}")
    pos = 8  # 6 reserved bytes after version/count
    out: list[tuple[int, tuple[int, ...]]] = []
    for _ in range(nfilters):
        fid, namelen, _flags, ncli = struct.unpack_from("<HHHH", body, pos)
        pos += 8 + namelen + _pad8(namelen)
        cli = struct.unpack_from(f"<{ncli}I", body, pos)
        pos += 4 * ncli + (4 if ncli % 2 else 0)  # pad odd counts to 8
        out.append((fid, cli))
    return out


def _defilter(raw: bytes, filters: list[tuple[int, tuple[int, ...]]],
              mask: int, elsize: int) -> bytes:
    """Undo the filter pipeline for one chunk (reverse write order);
    bit i of ``mask`` set means filter i was skipped for this chunk."""
    for i in reversed(range(len(filters))):
        if mask & (1 << i):
            continue
        fid, _cli = filters[i]
        if fid == _FILTER_DEFLATE:
            raw = zlib.decompress(raw)
        elif fid == _FILTER_SHUFFLE:
            raw = (
                np.frombuffer(raw, np.uint8)
                .reshape(elsize, -1)
                .T.tobytes()
            )
        elif fid == _FILTER_FLETCHER32:
            raw = raw[:-4]  # checksum trailer; integrity re-checked by use
        else:
            raise NotImplementedError(f"unsupported HDF5 filter id {fid}")
    return raw


def _walk_chunk_btree(
    payload: bytes, base: int, addr: int, ndims: int
) -> list[tuple[tuple[int, ...], int, int, int]]:
    """v1 chunk B-tree (node type 1, any depth) →
    [(chunk offsets, stored nbytes, filter mask, data addr)]."""
    pos = base + addr
    if payload[pos : pos + 4] != b"TREE":
        raise ValueError("bad chunk B-tree signature")
    ntype, level, nentries = struct.unpack_from("<BBH", payload, pos + 4)
    if ntype != 1:
        raise ValueError(f"expected chunk B-tree node, got type {ntype}")
    key_size = 8 + 8 * ndims
    out: list[tuple[tuple[int, ...], int, int, int]] = []
    p = pos + 24
    for _ in range(nentries):
        nbytes, mask = struct.unpack_from("<II", payload, p)
        offsets = struct.unpack_from(f"<{ndims}Q", payload, p + 8)
        (child,) = struct.unpack_from("<Q", payload, p + key_size)
        if level > 0:
            out.extend(_walk_chunk_btree(payload, base, child, ndims))
        else:
            out.append((offsets, nbytes, mask, child))
        p += key_size + 8
    return out


def _char_mat(mat: np.ndarray):
    """uint16 code-unit matrix -> str (single row) or object array of
    per-row strings (MATLAB char-matrix convention)."""
    if mat.ndim <= 1 or mat.shape[0] == 1:
        return mat.ravel().astype("<u2").tobytes().decode("utf-16-le")
    rows = np.empty(mat.shape[0], dtype=object)
    for i in range(mat.shape[0]):
        rows[i] = mat[i].astype("<u2").tobytes().decode("utf-16-le")
    return rows


def _read_dataset(payload: bytes, base: int, oh_addr: int) -> np.ndarray:
    msgs = _parse_object_header(payload, base, oh_addr)
    for needed in (_MSG_DATASPACE, _MSG_DATATYPE, _MSG_LAYOUT):
        if needed not in msgs:
            raise NotImplementedError(f"dataset missing message {needed:#06x}")
    sp = msgs[_MSG_DATASPACE]
    sp_ver, rank = struct.unpack_from("<BB", sp, 0)
    if sp_ver != 1:
        raise NotImplementedError(f"dataspace version {sp_ver}")
    dims = struct.unpack_from(f"<{rank}Q", sp, 8)
    dt = msgs[_MSG_DATATYPE]
    dt_cls, size = dt[0] & 0x0F, struct.unpack_from("<I", dt, 4)[0]
    if dt[1] & 0x01:
        raise NotImplementedError("big-endian datasets not supported")
    if dt_cls == 1 and size == 8:
        dtype, is_char = "<f8", False
    elif dt_cls == 0 and size == 2 and not dt[1] & 0x08:
        # unsigned 16-bit fixed-point = MATLAB char (UTF-16 code units)
        dtype, is_char = "<u2", True
    elif dt_cls == 7 and size == 8:
        # object references — MATLAB cell arrays: each element is the
        # address of a subsidiary object (under /#refs# in real files)
        lay = msgs[_MSG_LAYOUT]
        if lay[0] != 3 or lay[1] != 1:
            raise NotImplementedError("reference datasets must be contiguous")
        addr, nbytes = struct.unpack_from("<QQ", lay, 2)
        n = int(np.prod(dims)) if rank else 1
        if nbytes != n * 8:
            raise ValueError("layout size does not match dataspace")
        refs = np.frombuffer(payload, "<u8", count=n, offset=base + addr)
        cells = np.empty(n, dtype=object)
        for i, r in enumerate(refs):
            # _read_object, not _read_dataset: a referenced object can
            # itself be a GROUP (MATLAB cell-of-struct), which must
            # recurse like any other struct member
            cells[i] = _read_object(payload, base, int(r))
        # stored dims are the MATLAB transpose; C-order reshape then
        # transpose restores (m, n) cell orientation
        return cells.reshape(dims).transpose()
    else:
        raise NotImplementedError(
            f"unsupported datatype class {dt_cls} size {size} "
            "(float64 / uint16-char / object-reference reader)"
        )
    lay = msgs[_MSG_LAYOUT]
    lay_ver, lay_cls = lay[0], lay[1]
    n = int(np.prod(dims)) if rank else 1
    if lay_ver == 3 and lay_cls == 1:  # contiguous
        addr, nbytes = struct.unpack_from("<QQ", lay, 2)
        if nbytes != n * size:
            raise ValueError("layout size does not match dataspace")
        arr = np.frombuffer(payload, dtype, count=n, offset=base + addr)
        mat = arr.reshape(dims).transpose()  # back to MATLAB orientation
        return _char_mat(mat) if is_char else mat
    if lay_ver == 3 and lay_cls == 2:  # chunked (what MATLAB writes)
        ndims = lay[2]  # rank + 1: trailing dim is the element size
        (btree_addr,) = struct.unpack_from("<Q", lay, 3)
        chunk_dims = struct.unpack_from(f"<{ndims}I", lay, 11)
        if ndims != rank + 1 or chunk_dims[-1] != size:
            raise NotImplementedError("chunk rank/element size mismatch")
        filters = (
            _parse_filters(msgs[_MSG_FILTER]) if _MSG_FILTER in msgs else []
        )
        full = np.zeros(dims, dtype=np.dtype(dtype))
        if btree_addr != _UNDEF:  # undefined = no chunk written yet
            for offsets, nbytes, mask, addr in _walk_chunk_btree(
                payload, base, btree_addr, ndims
            ):
                raw = _defilter(
                    payload[base + addr : base + addr + nbytes], filters, mask, size
                )
                chunk = np.frombuffer(raw, dtype).reshape(chunk_dims[:-1])
                sel = tuple(
                    slice(o, min(o + c, d))
                    for o, c, d in zip(offsets[:-1], chunk_dims[:-1], dims)
                )  # edge chunks are stored full-size, zero-padded past bounds
                full[sel] = chunk[tuple(slice(0, s.stop - s.start) for s in sel)]
        mat = full.transpose()
        return _char_mat(mat) if is_char else mat
    raise NotImplementedError(
        f"data layout v{lay_ver} class {lay_cls} unsupported — "
        "needs the h5py decoder seam"
    )


def _heap_name(payload: bytes, base: int, heap_hdr: int, off: int) -> str:
    if payload[base + heap_hdr : base + heap_hdr + 4] != b"HEAP":
        raise ValueError("bad local heap signature")
    (seg_addr,) = struct.unpack_from("<Q", payload, base + heap_hdr + 24)
    start = base + seg_addr + off
    end = payload.index(b"\x00", start)
    return payload[start:end].decode("ascii")


def _read_object(payload: bytes, base: int, oh_addr: int):
    """Dataset OR group at an object-header address.  A group (e.g. a
    MATLAB struct variable, stored as one dataset per field) carries a
    symbol-table message and recurses into `_read_group`, returning a
    dict of member values."""
    msgs = _parse_object_header(payload, base, oh_addr)
    if _MSG_SYMBOL_TABLE in msgs:
        btree_addr, heap_addr = struct.unpack_from("<QQ", msgs[_MSG_SYMBOL_TABLE], 0)
        return _read_group(payload, base, btree_addr, heap_addr)
    return _read_dataset(payload, base, oh_addr)


def _read_group(payload: bytes, base: int, btree_addr: int, heap_addr: int) -> dict:
    """Walk one group's symbol-table B-tree (level 0) into
    {member name: value}, recursing into sub-groups."""
    pos = base + btree_addr
    if payload[pos : pos + 4] != b"TREE":
        raise ValueError("bad B-tree signature")
    ntype, level, nentries = struct.unpack_from("<BBH", payload, pos + 4)
    if ntype != 0 or level != 0:
        raise NotImplementedError("only level-0 group B-trees supported")
    snods = [
        struct.unpack_from("<Q", payload, pos + 24 + 8 + i * 16)[0]
        for i in range(nentries)
    ]
    out: dict = {}
    for snod_addr in snods:
        pos = base + snod_addr
        if payload[pos : pos + 4] != b"SNOD":
            raise ValueError("bad symbol-node signature")
        (nsyms,) = struct.unpack_from("<H", payload, pos + 6)
        for i in range(nsyms):
            name_off, oh_addr, _, _, _ = _read_ste(payload, pos + 8 + i * 40)
            name = _heap_name(payload, base, heap_addr, name_off)
            out[name] = _read_object(payload, base, oh_addr)
    return out


def read_mat73(payload: bytes) -> dict[str, np.ndarray]:
    """Parse a MAT v7.3 / plain-HDF5 blob into {name: float64 ndarray
    | str (char variable) | object array (cell, via references) |
    dict (struct, via sub-group)}.  The `#refs#` bookkeeping group —
    where MATLAB stores cell-referenced objects — is not itself a
    variable and is dropped from the result.

    Untrusted-bytes boundary: a corrupt file (bad offsets, lengths,
    string payloads, compressed chunks) must quarantine as a typed
    ValueError, never a raw struct/zlib/codec error or an int-width
    overflow — the contract the decode tier's mapInPandas kernels
    rely on to keep one bad blob from failing a 100 TB job."""
    try:
        return _read_mat73_inner(payload)
    except (struct.error, OverflowError, UnicodeDecodeError,
            zlib.error, IndexError) as exc:
        raise ValueError(
            f"malformed HDF5/MAT v7.3 payload ({type(exc).__name__}: {exc})"
        ) from exc


def _read_mat73_inner(payload: bytes) -> dict[str, np.ndarray]:
    base = _find_base(payload)
    if struct.unpack_from("<B", payload, base + 8)[0] != 0:
        raise NotImplementedError("only superblock version 0 supported")
    off_size, len_size = struct.unpack_from("<BBx", payload, base + 13)
    if (off_size, len_size) != (8, 8):
        raise NotImplementedError("only 8-byte offsets/lengths supported")
    _, root_oh, cache, s0, s1 = _read_ste(payload, base + 24 + 32)
    if cache == 1:
        btree_addr, heap_addr = s0, s1
    else:  # uncached: fetch from the root group's symbol-table message
        msgs = _parse_object_header(payload, base, root_oh)
        if _MSG_SYMBOL_TABLE not in msgs:
            raise NotImplementedError("root group has no symbol-table message")
        btree_addr, heap_addr = struct.unpack_from("<QQ", msgs[_MSG_SYMBOL_TABLE], 0)
    out = _read_group(payload, base, btree_addr, heap_addr)
    out.pop("#refs#", None)
    return out
