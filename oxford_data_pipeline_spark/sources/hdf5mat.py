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
- per-variable datasets: v1 object headers carrying dataspace /
  IEEE-little-endian-f64 datatype / **contiguous** (class-1 v3) data
  layout messages.

Out of scope (raises NotImplementedError): chunked/filtered layouts,
non-f64 datatypes, nested groups, B-trees deeper than one SNOD level —
the documented seam in ``mat_ingest.ingest_mat_files`` accepts a
custom decoder (e.g. h5py-backed) for those.

MATLAB orientation: an m×n MATLAB matrix is stored as an HDF5 dataset
of dims (n, m) in C order (i.e. the transpose), matching what h5py
shows for real v7.3 files; ``read_mat73`` transposes back.
"""

from __future__ import annotations

import io
import struct

import numpy as np

_HDF5_MAGIC = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF
_USERBLOCK = 512

# object-header message types
_MSG_NIL, _MSG_DATASPACE, _MSG_DATATYPE = 0x0000, 0x0001, 0x0003
_MSG_LAYOUT, _MSG_SYMBOL_TABLE = 0x0008, 0x0011


def _pad8(n: int) -> int:
    return (8 - n % 8) % 8


# --------------------------------------------------------------------------
# writer
# --------------------------------------------------------------------------
def _dataset_header(dims: tuple[int, int], data_addr: int, data_size: int) -> bytes:
    """v1 object header for a contiguous float64 dataset."""
    msgs = []
    # dataspace: version 1, rank, flags 0, 5 reserved, dims (8 bytes each)
    body = struct.pack("<BBB5x", 1, len(dims), 0) + b"".join(
        struct.pack("<Q", d) for d in dims
    )
    msgs.append((_MSG_DATASPACE, body))
    # datatype: version 1 class 1 (float), IEEE f64 little-endian
    #   bitfield: byte order LE (bit0=0), mantissa normalization 2 (bits 4-5),
    #   sign location 63; properties: offset 0, precision 64,
    #   exponent loc 52 size 11, mantissa loc 0 size 52, bias 1023
    body = (
        struct.pack("<B3B", 0x11, 0x20, 0x3F, 0x00)
        + struct.pack("<I", 8)
        + struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
    )
    msgs.append((_MSG_DATATYPE, body))
    # data layout: version 3, class 1 = contiguous, address + size
    body = struct.pack("<BBQQ", 3, 1, data_addr, data_size)
    msgs.append((_MSG_LAYOUT, body))
    return _object_header(msgs)


def _object_header(msgs: list[tuple[int, bytes]]) -> bytes:
    """v1 object header: 12-byte prefix + 4 pad, messages 8-byte aligned."""
    enc = b""
    for mtype, body in msgs:
        padded = body + b"\x00" * _pad8(len(body))
        enc += struct.pack("<HHB3x", mtype, len(padded), 0) + padded
    return struct.pack("<BxHII4x", 1, len(msgs), 1, len(enc)) + enc


def write_mat73(arrays: dict[str, np.ndarray]) -> bytes:
    """Serialize named 1-D/2-D float arrays as a MAT v7.3 (HDF5) blob."""
    names = sorted(arrays)  # SNOD entries must be in name order
    if len(names) > 8:
        raise NotImplementedError("single-SNOD writer: at most 8 variables")
    mats: dict[str, np.ndarray] = {}
    for name in names:
        a = np.asarray(arrays[name], dtype=np.float64)
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
    data_addr: dict[str, int] = {}
    for name in names:
        a = mats[name]
        oh = _dataset_header((a.shape[1], a.shape[0]), 0, 0)  # size probe
        ds_oh_addr[name] = cursor
        cursor += len(oh)
        data_addr[name] = cursor
        cursor += a.size * 8
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
        a = mats[name]
        out.write(
            _dataset_header((a.shape[1], a.shape[0]), data_addr[name], a.size * 8)
        )
        out.write(np.ascontiguousarray(a.T).tobytes())  # MATLAB orientation
    assert out.tell() == _USERBLOCK + eof
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
    """v1 object header → {message type: first body}; NILs skipped."""
    pos = base + addr
    version, nmsgs, _refs, hsize = struct.unpack_from("<BxHII", payload, pos)
    if version != 1:
        raise NotImplementedError(f"object header version {version}")
    pos += 16  # 12-byte prefix + 4 alignment pad
    end = pos + hsize
    msgs: dict[int, bytes] = {}
    for _ in range(nmsgs):
        if pos + 8 > end:
            break
        mtype, msize, _flags = struct.unpack_from("<HHB3x", payload, pos)
        body = payload[pos + 8 : pos + 8 + msize]
        pos += 8 + msize
        if mtype != _MSG_NIL and mtype not in msgs:
            msgs[mtype] = body
    return msgs


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
    cls_ver, size = dt[0], struct.unpack_from("<I", dt, 4)[0]
    if cls_ver & 0x0F != 1 or size != 8 or dt[1] & 0x01:
        raise NotImplementedError("only little-endian float64 datasets supported")
    lay = msgs[_MSG_LAYOUT]
    lay_ver, lay_cls = lay[0], lay[1]
    if lay_ver != 3 or lay_cls != 1:
        raise NotImplementedError(
            "only contiguous (class-1, v3) data layout supported — "
            "chunked/compressed v7.3 files need the h5py decoder seam"
        )
    addr, nbytes = struct.unpack_from("<QQ", lay, 2)
    n = int(np.prod(dims)) if rank else 1
    if nbytes != n * 8:
        raise ValueError("layout size does not match dataspace")
    arr = np.frombuffer(payload, "<f8", count=n, offset=base + addr)
    return arr.reshape(dims).transpose()  # back to MATLAB orientation


def _heap_name(payload: bytes, base: int, heap_hdr: int, off: int) -> str:
    if payload[base + heap_hdr : base + heap_hdr + 4] != b"HEAP":
        raise ValueError("bad local heap signature")
    (seg_addr,) = struct.unpack_from("<Q", payload, base + heap_hdr + 24)
    start = base + seg_addr + off
    end = payload.index(b"\x00", start)
    return payload[start:end].decode("ascii")


def read_mat73(payload: bytes) -> dict[str, np.ndarray]:
    """Parse a MAT v7.3 / plain-HDF5 blob into {name: float64 ndarray}."""
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

    out: dict[str, np.ndarray] = {}
    for snod_addr in snods:
        pos = base + snod_addr
        if payload[pos : pos + 4] != b"SNOD":
            raise ValueError("bad symbol-node signature")
        (nsyms,) = struct.unpack_from("<H", payload, pos + 6)
        for i in range(nsyms):
            name_off, oh_addr, _, _, _ = _read_ste(payload, pos + 8 + i * 40)
            name = _heap_name(payload, base, heap_addr, name_off)
            out[name] = _read_dataset(payload, base, oh_addr)
    return out
