#!/usr/bin/env python3
"""Independent HDF5 *writer* (dev tool): emits a SPEC-layout file from a
parquet table using nothing but struct — written separately from the
Scala writer against the same public format document, so the Scala
READER gets validated against independently produced bytes (the
mirror-image of scripts/h5check.py, which validates the Scala WRITER
with an independent Python reader).

Two modes:

  default   — the libver='earliest' layout the reference datasets use:
              superblock v0, v1 object headers, symbol-table groups,
              contiguous little-endian datasets, v1 'unit' attributes.
  --latest  — the libver='latest' layout newer toolchains emit:
              superblock v3 (lookup3-checksummed), v2 object headers
              (OHDR, checksummed), compact link messages, layout-v4
              datasets (contiguous, Single Chunk, and deflate-filtered
              Fixed Array chunk indexes), v3 attributes.

Usage: python3 scripts/h5make.py [--latest] <table.parquet> <out.hdf5>
"""
import struct
import sys
import zlib

import pyarrow.parquet as pq

UNDEF = 0xFFFFFFFFFFFFFFFF
M32 = 0xFFFFFFFF


def _rot(x, k):
    return ((x << k) | (x >> (32 - k))) & M32


def lookup3(data, init=0):
    """Bob Jenkins' hashlittle (public domain, burtleburtle.net/bob/c/
    lookup3.c) — HDF5's checksum for v2/v3 superblocks, OHDR/OCHK and
    the v4 chunk-index structures."""
    a = b = c = (0xDEADBEEF + len(data) + init) & M32
    i = 0
    while len(data) - i > 12:
        a = (a + int.from_bytes(data[i:i + 4], "little")) & M32
        b = (b + int.from_bytes(data[i + 4:i + 8], "little")) & M32
        c = (c + int.from_bytes(data[i + 8:i + 12], "little")) & M32
        a = (a - c) & M32; a ^= _rot(c, 4); c = (c + b) & M32
        b = (b - a) & M32; b ^= _rot(a, 6); a = (a + c) & M32
        c = (c - b) & M32; c ^= _rot(b, 8); b = (b + a) & M32
        a = (a - c) & M32; a ^= _rot(c, 16); c = (c + b) & M32
        b = (b - a) & M32; b ^= _rot(a, 19); a = (a + c) & M32
        c = (c - b) & M32; c ^= _rot(b, 4); b = (b + a) & M32
        i += 12
    tail = data[i:]
    if not tail:
        return c
    a = (a + int.from_bytes(tail[0:4], "little")) & M32
    b = (b + int.from_bytes(tail[4:8], "little")) & M32
    c = (c + int.from_bytes(tail[8:12], "little")) & M32
    c ^= b; c = (c - _rot(b, 14)) & M32
    a ^= c; a = (a - _rot(c, 11)) & M32
    b ^= a; b = (b - _rot(a, 25)) & M32
    c ^= b; c = (c - _rot(b, 16)) & M32
    a ^= c; a = (a - _rot(c, 4)) & M32
    b ^= a; b = (b - _rot(a, 14)) & M32
    c ^= b; c = (c - _rot(b, 24)) & M32
    return c


def dtype_bytes(kind):
    if kind == "i64":
        return struct.pack("<BBBBIHH", 0x10, 0x08, 0, 0, 8, 0, 64)
    if kind == "f64":
        return struct.pack("<BBBBIHHBBBBI", 0x11, 0x20, 0x3F, 0, 8,
                           0, 64, 52, 11, 0, 52, 1023)
    width = kind[1]
    return struct.pack("<BBBBI", 0x13, 0, 0, 0, width)


def encode_values(values, kind):
    if kind == "i64":
        return b"".join(struct.pack("<q", v) for v in values), 8
    if kind == "f64":
        return b"".join(struct.pack("<d", v) for v in values), 8
    width = kind[1]
    return (b"".join(v.encode()[:width].ljust(width, b"\0") for v in values),
            width)


class W:
    """libver='earliest' writer: superblock v0 + v1 object headers."""

    superblock_size = 96

    def __init__(self):
        self.parts = []
        self.pos = self.superblock_size

    def block(self, b):
        at = self.pos
        self.parts.append((at, b))
        self.pos += len(b)
        return at

    def object_header(self, msgs):
        body = b""
        for typ, data in msgs:
            pad = (-len(data)) % 8
            data = data + b"\0" * pad
            body += struct.pack("<HHBBBB", typ, len(data), 0, 0, 0, 0) + data
        hdr = struct.pack("<BBHIII", 1, 0, len(msgs), 1, len(body), 0)
        return self.block(hdr + body)

    def dataset(self, values, kind, attrs=()):
        """kind: 'i64' | 'f64' | ('s', width)"""
        data, _ = encode_values(values, kind)
        dt = dtype_bytes(kind)
        addr = self.block(data)
        ds = struct.pack("<BBB5x", 1, 1, 0) + struct.pack("<Q", len(values))
        layout = struct.pack("<BBQQ", 3, 1, addr, len(data))
        msgs = [(0x01, ds), (0x03, dt), (0x08, layout)]
        for name, val in attrs:
            msgs.append((0x0C, self.attr(name, val)))
        return self.object_header(msgs)

    def attr(self, name, val):
        nb = name.encode() + b"\0"
        if isinstance(val, str):
            vb = val.encode() + b"\0"
            dt = struct.pack("<BBBBI", 0x13, 0, 0, 0, len(vb))
        else:
            vb = struct.pack("<d", float(val))
            dt = struct.pack("<BBBBIHHBBBBI", 0x11, 0x20, 0x3F, 0, 8,
                             0, 64, 52, 11, 0, 52, 1023)
        ds = struct.pack("<BBB5x", 1, 0, 0)  # scalar

        def pad8(b):
            return b + b"\0" * ((-len(b)) % 8)

        return (struct.pack("<BBHHH", 1, 0, len(nb), len(dt), len(ds))
                + pad8(nb) + pad8(dt) + pad8(ds) + vb)

    def group(self, children, attrs=()):
        children = sorted(children)
        heap_data = bytearray(8)
        offs = []
        for name, _ in children:
            offs.append(len(heap_data))
            nb = name.encode() + b"\0"
            heap_data += nb + b"\0" * ((-len(nb)) % 8)
        hd_addr = self.block(bytes(heap_data))
        heap = (b"HEAP" + struct.pack("<B3x", 0)
                + struct.pack("<QQQ", len(heap_data), UNDEF, hd_addr))
        heap_addr = self.block(heap)
        snod = b"SNOD" + struct.pack("<BBH", 1, 0, len(children))
        for (name, addr), off in zip(children, offs):
            snod += struct.pack("<QQII16x", off, addr, 0, 0)
        snod_addr = self.block(snod)
        btree = (b"TREE" + struct.pack("<BBH", 0, 0, 1)
                 + struct.pack("<QQ", UNDEF, UNDEF)
                 + struct.pack("<QQQ", 0, snod_addr, offs[-1] if offs else 0))
        bt_addr = self.block(btree)
        msgs = [(0x11, struct.pack("<QQ", bt_addr, heap_addr))]
        for name, val in attrs:
            msgs.append((0x0C, self.attr(name, val)))
        return self.object_header(msgs)

    def write(self, path, root):
        sb = (b"\x89HDF\r\n\x1a\n"
              + struct.pack("<BBBBBBBB", 0, 0, 0, 0, 0, 8, 8, 0)
              + struct.pack("<HHI", 4, 16, 0)
              + struct.pack("<QQQQ", 0, UNDEF, self.pos, UNDEF)
              + struct.pack("<QQII16x", 0, root, 0, 0))
        assert len(sb) == 96, len(sb)
        with open(path, "wb") as f:
            f.write(sb)
            for at, b in sorted(self.parts):
                f.seek(at)
                f.write(b)


class WLatest(W):
    """libver='latest' writer: superblock v3, checksummed v2 object
    headers, compact link messages, layout-v4 datasets."""

    superblock_size = 48
    fa_page_bits = 10  # HDF5's default fixed-array page (1024 entries)

    def object_header(self, msgs):
        body = b""
        for typ, data in msgs:
            body += struct.pack("<BHB", typ, len(data), 0) + data
        # flags 0x02: 4-byte chunk-0 size, no times/phase/creation-order
        prefix = b"OHDR" + struct.pack("<BBI", 2, 0x02, len(body))
        csum = lookup3(prefix + body)
        return self.block(prefix + body + struct.pack("<I", csum))

    def attr(self, name, val):
        nb = name.encode() + b"\0"
        if isinstance(val, str):
            vb = val.encode() + b"\0"
            dt = struct.pack("<BBBBI", 0x13, 0, 0, 0, len(vb))
        else:
            vb = struct.pack("<d", float(val))
            dt = struct.pack("<BBBBIHHBBBBI", 0x11, 0x20, 0x3F, 0, 8,
                             0, 64, 52, 11, 0, 52, 1023)
        ds = struct.pack("<BBBB", 2, 0, 0, 0)  # dataspace v2, scalar
        # attribute message v3: unpadded, name-charset byte (0 = ASCII)
        return (struct.pack("<BBHHHB", 3, 0, len(nb), len(dt), len(ds), 0)
                + nb + dt + ds + vb)

    def dataset(self, values, kind, attrs=(), chunk_rows=None):
        data, elem = encode_values(values, kind)
        rows = len(values)
        dt = dtype_bytes(kind)
        ds = struct.pack("<BBBB", 2, 1, 0, 1) + struct.pack("<Q", rows)
        msgs = [(0x01, ds), (0x03, dt)]
        if chunk_rows is None:
            addr = self.block(data)
            msgs.append((0x08, struct.pack("<BBQQ", 4, 1, addr, len(data))))
        elif chunk_rows >= rows:
            # Single Chunk index (type 1), deflate-filtered; dims use
            # HDF5's minimal encoding width (1 byte for small fixtures)
            comp = zlib.compress(data, 6)
            addr = self.block(comp)
            msgs.append((0x0B, self._deflate_msg()))
            enc = self._enc_width(max(rows, elem))
            lay = (struct.pack("<BBBBB", 4, 2, 0x02, 2, enc)
                   + rows.to_bytes(enc, "little") + elem.to_bytes(enc, "little")
                   + struct.pack("<B", 1)
                   + struct.pack("<QIQ", len(comp), 0, addr))
            msgs.append((0x08, lay))
        else:
            # Fixed Array index (type 3), deflate-filtered chunks.
            # page_bits below forces PAGING once the chunk count
            # exceeds 2^page_bits (the shape modern toolchains emit for
            # datasets past ~1024 chunks; small here so fixtures
            # exercise it): prefix + initialized-page bitmap +
            # checksum, then per-page element runs with own checksums.
            page_bits = self.fa_page_bits
            page = 1 << page_bits
            row_bytes = len(data) // rows if rows else elem
            chunks = []
            for r0 in range(0, rows, chunk_rows):
                raw = data[r0 * row_bytes:(r0 + chunk_rows) * row_bytes]
                chunks.append(zlib.compress(raw, 6))
            entries = [(self.block(c), len(c)) for c in chunks]
            # stored-size field width mirrors HDF5's minimal encoding
            # (H5D__farray_idx_create: 1 + (log2(max chunk bytes)+8)//8)
            # so fixtures exercise the 2/3-byte widths real files carry
            max_chunk = chunk_rows * row_bytes
            size_w = min(8, 1 + ((max(max_chunk, 1).bit_length() - 1 + 8) // 8))
            entry_size = 8 + size_w + 4
            n = len(entries)
            packed = [struct.pack("<Q", a) + c.to_bytes(size_w, "little")
                      + struct.pack("<i", 0) for a, c in entries]
            # FADB precedes FAHD on disk; addresses are sequential
            fadb_addr = self.pos
            if n <= page:
                fadb_len = 14 + n * entry_size + 4
                fahd_addr = fadb_addr + fadb_len
                fadb = (b"FADB" + struct.pack("<BB", 0, 1)
                        + struct.pack("<Q", fahd_addr))
                fadb += b"".join(packed)
                fadb += struct.pack("<I", lookup3(fadb))
            else:
                npages = (n + page - 1) // page
                bitmap = bytearray((npages + 7) // 8)
                for p in range(npages):
                    bitmap[p // 8] |= 1 << (p % 8)
                body = b""
                for p in range(npages):
                    pe = b"".join(packed[p * page:(p + 1) * page])
                    body += pe + struct.pack("<I", lookup3(pe))
                fadb_len = 14 + len(bitmap) + 4 + len(body)
                fahd_addr = fadb_addr + fadb_len
                prefix = (b"FADB" + struct.pack("<BB", 0, 1)
                          + struct.pack("<Q", fahd_addr) + bytes(bitmap))
                fadb = prefix + struct.pack("<I", lookup3(prefix)) + body
            fahd = (b"FAHD" + struct.pack("<BBBB", 0, 1, entry_size, page_bits)
                    + struct.pack("<QQ", n, fadb_addr))
            fahd += struct.pack("<I", lookup3(fahd))
            assert self.block(fadb) == fadb_addr
            assert self.block(fahd) == fahd_addr
            msgs.append((0x0B, self._deflate_msg()))
            enc = self._enc_width(max(chunk_rows, elem))
            lay = (struct.pack("<BBBBB", 4, 2, 0, 2, enc)
                   + chunk_rows.to_bytes(enc, "little")
                   + elem.to_bytes(enc, "little")
                   + struct.pack("<BB", 3, page_bits)
                   + struct.pack("<Q", fahd_addr))
            msgs.append((0x08, lay))
        for name, val in attrs:
            msgs.append((0x0C, self.attr(name, val)))
        return self.object_header(msgs)

    @staticmethod
    def _enc_width(v):
        """HDF5's minimal unsigned encoding width (H5VM_limit_enc_size)."""
        return min(8, (max(v, 1).bit_length() - 1) // 8 + 1)

    @staticmethod
    def _deflate_msg():
        # filter pipeline v2: deflate (id 1), 1 client value (level 6)
        return (struct.pack("<BB", 2, 1)
                + struct.pack("<HHH", 1, 0, 1) + struct.pack("<I", 6))

    def group(self, children, attrs=()):
        # link info: no creation tracking, compact (fractal heap UNDEF)
        msgs = [(0x02, struct.pack("<BBQQ", 0, 0, UNDEF, UNDEF)),
                (0x0A, struct.pack("<BB", 0, 0))]
        for name, addr in sorted(children):
            nb = name.encode()
            assert len(nb) < 256
            msgs.append((0x06, struct.pack("<BBB", 1, 0, len(nb)) + nb
                         + struct.pack("<Q", addr)))
        for name, val in attrs:
            msgs.append((0x0C, self.attr(name, val)))
        return self.object_header(msgs)

    def write(self, path, root):
        sb = (b"\x89HDF\r\n\x1a\n"
              + struct.pack("<BBBB", 3, 8, 8, 0)
              + struct.pack("<QQQQ", 0, UNDEF, self.pos, root))
        sb += struct.pack("<I", lookup3(sb))
        assert len(sb) == 48, len(sb)
        with open(path, "wb") as f:
            f.write(sb)
            for at, b in sorted(self.parts):
                f.seek(at)
                f.write(b)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    latest = "--latest" in sys.argv[1:]
    paged = "--paged" in sys.argv[1:]  # implies --latest
    latest = latest or paged
    t = pq.read_table(args[0])
    w = WLatest() if latest else W()
    if paged:
        # tiny pages + tiny chunks force the PAGED fixed-array shape
        # (bitmap + per-page checksums) with a small fixture table
        w.fa_page_bits = 2
    cols = []
    first_numeric = True
    for name in t.column_names:
        vals = t[name].to_pylist()
        ty = str(t.schema.field(name).type)
        if ty in ("int64", "int32", "int16"):
            kind = "i64"
            vals = [int(v) for v in vals]
        elif ty == "double":
            kind = "f64"
        elif ty == "string":
            kind = ("s", max(len(v.encode()) for v in vals) + 1)
        else:
            raise SystemExit(f"unsupported type {ty} for {name}")
        if latest and kind in ("i64", "f64"):
            if paged:
                cr = 2  # 13 chunks on the 25-row fixture -> 4 pages
            elif first_numeric:
                # whole column in one chunk -> Single Chunk index
                cr = len(vals)
                first_numeric = False
            else:
                # ~3 chunks -> Fixed Array index
                cr = max(1, (len(vals) + 2) // 3)
            cols.append((name, w.dataset(vals, kind, attrs=[("unit", "None")],
                                         chunk_rows=cr)))
        else:
            cols.append((name, w.dataset(vals, kind, attrs=[("unit", "None")])))
    data = w.group(cols)
    sim = w.group([], attrs=[("box_size", 123.0), ("redshift", 0.25)])
    header = w.group([("simulation", sim)])
    root = w.group([("data", data), ("header", header)])
    w.write(args[1], root)
    mode = ("latest paged-FA (sb v3, OHDR)" if paged
            else "latest (sb v3, OHDR)" if latest else "earliest (sb v0)")
    print(f"wrote {args[1]} [{mode}]: {len(cols)} columns, {t.num_rows} rows")


if __name__ == "__main__":
    main()
