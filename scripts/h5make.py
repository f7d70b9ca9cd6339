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
    if kind in ("u32", "u16", "u8"):
        # class 0 fixed-point, bits0 bit 3 CLEAR = unsigned (the numpy
        # uint shapes h5py writes)
        size = {"u32": 4, "u16": 2, "u8": 1}[kind]
        return struct.pack("<BBBBIHH", 0x10, 0x00, 0, 0, size, 0, size * 8)
    width = kind[1]
    return struct.pack("<BBBBI", 0x13, 0, 0, 0, width)


def encode_values(values, kind):
    if kind == "i64":
        return b"".join(struct.pack("<q", v) for v in values), 8
    if kind == "f64":
        return b"".join(struct.pack("<d", v) for v in values), 8
    if kind == "u32":
        return b"".join(struct.pack("<I", v) for v in values), 4
    if kind == "u16":
        return b"".join(struct.pack("<H", v) for v in values), 2
    if kind == "u8":
        return bytes(values), 1
    width = kind[1]
    return (b"".join(v.encode()[:width].ljust(width, b"\0") for v in values),
            width)


def byte_shuffle(data, elem):
    """HDF5 shuffle filter: byte-transpose elements (byte plane b of
    every element, concatenated)."""
    n = len(data) // elem
    return bytes(data[i * elem + b] for b in range(elem) for i in range(n))


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

    def vlen_dataset(self, values, attrs=()):
        """list[str] as a class-9 VARIABLE-LENGTH string dataset: each
        16-byte element is (length u32, GCOL collection addr u64, heap
        object index u32) referencing a global heap collection — the
        encoding h5py emits for plain Python str columns (its default
        str mapping, independent of libver). Collections split at
        ~4 KiB like libhdf5's default, so a real multi-collection
        column shape is what readers see."""
        refs = []           # (len, collection ordinal, object index)
        heaps = [bytearray()]
        idx = 0
        for v in values:
            b = v.encode()
            if len(heaps[-1]) + 16 + len(b) > 4096 and idx > 0:
                heaps.append(bytearray())
                idx = 0
            idx += 1
            heaps[-1] += (struct.pack("<HH4xQ", idx, 1, len(b))
                          + b + b"\0" * ((-len(b)) % 8))
            refs.append((len(b), len(heaps) - 1, idx))
        gaddrs = []
        for heap in heaps:
            # free-space terminator: the spec stores the REMAINING free
            # space (including object 0's own 16-byte header) in the
            # size field — here the heap is exact-sized, so that is 16
            heap += struct.pack("<HH4xQ", 0, 0, 16)
            gcol = (b"GCOL" + struct.pack("<B3x", 1)
                    + struct.pack("<Q", 16 + len(heap)) + bytes(heap))
            gaddrs.append(self.block(gcol))
        data = b"".join(struct.pack("<IQI", ln, gaddrs[c], i)
                        for ln, c, i in refs)
        addr = self.block(data)
        # vlen dtype v1: class 9, type=string in the low flag nibble,
        # element size 16; base type = 1-byte string
        dt = (struct.pack("<BBBBI", 0x19, 0x01, 0, 0, 16)
              + struct.pack("<BBBBI", 0x13, 0, 0, 0, 1))
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
    ea_page_bits = 10  # HDF5's default EA data-block page (1024 elmts)

    @staticmethod
    def bit_set(bitmap, i):
        """Page-init bitmap bit addressing: MSB-first within each byte,
        mirroring libhdf5's H5VM_bit_set/get (1 << (7 - offset%8)) —
        the convention real FA/EA page bitmaps carry on disk."""
        bitmap[i // 8] |= 1 << (7 - (i % 8))

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

    @staticmethod
    def _shuffle_deflate_msg(elem):
        # filter pipeline v2, TWO descriptions (write order: shuffle id
        # 2 then deflate id 1) — for id < 256 the Name Length field is
        # ABSENT per spec, so each description is 6 bytes + client data
        return (struct.pack("<BB", 2, 2)
                + struct.pack("<HHH", 2, 0, 1) + struct.pack("<I", elem)
                + struct.pack("<HHH", 1, 0, 1) + struct.pack("<I", 6))

    def dataset_shuffle_deflate(self, values, kind, attrs=()):
        """Single Chunk dataset whose chunk rides the two-filter
        shuffle+deflate pipeline (v2 message) — the libver='latest'
        combination h5py emits for compression='gzip', shuffle=True."""
        data, elem = encode_values(values, kind)
        rows = len(values)
        ds = struct.pack("<BBBB", 2, 1, 0, 1) + struct.pack("<Q", rows)
        comp = zlib.compress(byte_shuffle(data, elem), 6)
        addr = self.block(comp)
        enc = self._enc_width(max(rows, elem))
        lay = (struct.pack("<BBBBB", 4, 2, 0x02, 2, enc)
               + rows.to_bytes(enc, "little") + elem.to_bytes(enc, "little")
               + struct.pack("<B", 1)
               + struct.pack("<QIQ", len(comp), 0, addr))
        msgs = [(0x01, ds), (0x03, dtype_bytes(kind)),
                (0x0B, self._shuffle_deflate_msg(elem)), (0x08, lay)]
        msgs.extend(self.attr_msgs(attrs, False))
        return self.object_header(msgs)

    def dataset(self, values, kind, attrs=(), chunk_rows=None, index="fa",
                edge_raw=False, bt2_node=None, dense_attrs=False):
        data, elem = encode_values(values, kind)
        rows = len(values)
        dt = dtype_bytes(kind)
        ds = struct.pack("<BBBB", 2, 1, 0, 1) + struct.pack("<Q", rows)
        msgs = [(0x01, ds), (0x03, dt)]
        if chunk_rows is not None and index in ("ea", "ea_filt",
                                                "bt2", "bt2_filt"):
            # Extensible Array / v2 B-tree chunk indexes — the shapes
            # h5py emits for appendable (maxshape=None) datasets
            filt = index.endswith("_filt")
            row_bytes = len(data) // rows if rows else elem
            chunk_bytes = chunk_rows * row_bytes
            chunks = []
            for r0 in range(0, rows, chunk_rows):
                raw = data[r0 * row_bytes:(r0 + chunk_rows) * row_bytes]
                mask = 0
                if filt and edge_raw and len(raw) < chunk_bytes:
                    # partial trailing chunk stored RAW with filter-mask
                    # bit 0 set (filter 0 = deflate skipped) — the shape
                    # H5D_CHUNK_DONT_FILTER_PARTIAL_BOUND_CHUNKS and
                    # optional-filter skips produce in real files
                    mask = 1
                elif filt:
                    raw = zlib.compress(raw, 6)
                else:
                    # unfiltered chunks are FULL chunk size on disk
                    # (the trailing partial chunk is zero-padded)
                    raw = raw.ljust(chunk_bytes, b"\0")
                chunks.append((self.block(raw), len(raw), mask))
            if filt:
                msgs.append((0x0B, self._deflate_msg()))
            enc = self._enc_width(max(chunk_rows, elem))
            if index.startswith("ea"):
                hdr = self._ea_index(chunks, chunk_bytes, filt)
                cparam = struct.pack("<BBBBB", 32, 4, 4, 16,
                                     self.ea_page_bits)
                # flag 0x02 means "filtered SINGLE CHUNK" — libhdf5
                # leaves it clear for every other index type
                lay = (struct.pack("<BBBBB", 4, 2, 0, 2, enc)
                       + chunk_rows.to_bytes(enc, "little")
                       + elem.to_bytes(enc, "little")
                       + struct.pack("<B", 4) + cparam
                       + struct.pack("<Q", hdr))
            else:
                # 64 B nodes force a deep tree on few chunks
                node_size = bt2_node or (64 if not filt else 512)
                hdr = self._bt2_chunk_index(chunks, chunk_bytes, chunk_rows,
                                            filt, node_size)
                # flag 0x02 means "filtered SINGLE CHUNK" — libhdf5
                # leaves it clear for every other index type
                lay = (struct.pack("<BBBBB", 4, 2, 0, 2, enc)
                       + chunk_rows.to_bytes(enc, "little")
                       + elem.to_bytes(enc, "little")
                       + struct.pack("<B", 5)
                       + struct.pack("<IBB", node_size, 100, 40)
                       + struct.pack("<Q", hdr))
            msgs.append((0x08, lay))
            msgs.extend(self.attr_msgs(attrs, dense_attrs))
            return self.object_header(msgs)
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
                    self.bit_set(bitmap, p)
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
        msgs.extend(self.attr_msgs(attrs, dense_attrs))
        return self.object_header(msgs)

    @staticmethod
    def _enc_width(v):
        """HDF5's minimal unsigned encoding width (H5VM_limit_enc_size)."""
        return min(8, (max(v, 1).bit_length() - 1) // 8 + 1)

    def _ea_index(self, chunks, chunk_bytes, filt):
        """Write an Extensible Array chunk index over `chunks`
        ([(addr, stored_size)]). Returns the EAHD address. Geometry is
        libhdf5's chunk-EA default (32-bit element space, 4 inline
        index-block elements, 16-element starting data blocks, 4
        min super-block pointers, 2^ea_page_bits-element pages): the
        first 4 chunks inline in the EAIB, later chunks in EADB data
        blocks per the super-block doubling rule; past the index
        block's 6 direct data-block pointers (244 elements), data
        blocks hang off EASB super blocks. Super-block data blocks
        larger than one page are PAGED: the data block stores only its
        prefix + checksum, followed by per-page element runs with own
        checksums, and the owning EASB carries the page-init bitmap
        (MSB-first bits, libhdf5 H5VM_bit_get order) — the shape an
        appendable catalog reaches past ~100k chunks at default
        geometry (reachable small here via ea_page_bits)."""
        max_bits, idx_elmts, min_elmts, min_ptrs = 32, 4, 16, 4
        page_bits = self.ea_page_bits
        page = 1 << page_bits
        client = 1 if filt else 0
        off_w = (max_bits + 7) // 8
        if filt:
            sz_w = self._enc_width(chunk_bytes)
            elem_size = 8 + sz_w + 4
        else:
            elem_size = 8

        def elem(c):
            if c is None:
                return (struct.pack("<Q", UNDEF)
                        + (b"\0" * (sz_w + 4) if filt else b""))
            addr, size, mask = c
            if filt:
                return (struct.pack("<Q", addr)
                        + size.to_bytes(sz_w, "little")
                        + struct.pack("<I", mask))
            return struct.pack("<Q", addr)

        n = len(chunks)
        ndblk_addrs = 2 * (min_ptrs - 1)
        nsblks = 1 + (max_bits - (min_elmts.bit_length() - 1)) // 2
        k, tot = 0, 0
        while tot < ndblk_addrs:
            tot += 2 ** (k // 2); k += 1
        assert tot == ndblk_addrs
        nsblk_addrs = nsblks - k
        # assign post-inline chunks to data blocks (doubling rule),
        # tracking each block's super-block row u
        dblocks = []  # (u, nelmts, first_elem_index, [chunk or None])
        rest = max(0, n - idx_elmts)
        covered, u, first = 0, 0, idx_elmts
        while covered < rest:
            ne = min_elmts * 2 ** ((u + 1) // 2)
            for _ in range(2 ** (u // 2)):
                if covered >= rest:
                    break
                cs = chunks[idx_elmts + covered: idx_elmts + covered + ne]
                cs = cs + [None] * (ne - len(cs))
                dblocks.append((u, ne, first, cs))
                covered += ne; first += ne
            u += 1
        assert all(ne <= page for _, ne, _, _ in dblocks[:ndblk_addrs]), \
            "index-block-pointed data blocks must stay unpaged (as in libhdf5)"
        direct = dblocks[:ndblk_addrs]
        # group the overflow by super-block row: EASB s covers row
        # k + s with 2^(row//2) data-block pointers
        sblks = {}  # s -> (row, first_elem, [dblock index or None])
        for di, (du, _, dfirst, _) in enumerate(dblocks[ndblk_addrs:],
                                                start=ndblk_addrs):
            s = du - k
            assert 0 <= s < nsblk_addrs
            if s not in sblks:
                sblks[s] = (du, dfirst, [None] * (2 ** (du // 2)))
            row, sfirst, ptrs = sblks[s]
            ne = min_elmts * 2 ** ((du + 1) // 2)
            ptrs[(dfirst - sfirst) // ne] = di
        # addresses: data blocks, then super blocks, then index block,
        # then header
        def npages_of(ne):
            return ne // page if ne > page else 0

        def page_init(cs, p):
            return any(c is not None for c in cs[p * page:(p + 1) * page])

        base = self.pos
        dblk_sizes = [
            (14 + off_w + 4 + npages_of(ne) * (page * elem_size + 4))
            if npages_of(ne) else (14 + off_w + ne * elem_size + 4)
            for _, ne, _, _ in dblocks]
        dblk_addrs = [base + sum(dblk_sizes[:i]) for i in range(len(dblocks))]
        sblk_sizes = {}
        for s, (row, _, ptrs) in sblks.items():
            np_ = npages_of(min_elmts * 2 ** ((row + 1) // 2))
            bl = (len(ptrs) * np_ + 7) // 8 if np_ else 0
            sblk_sizes[s] = 14 + off_w + bl + len(ptrs) * 8
        sblk_base = base + sum(dblk_sizes)
        sblk_addrs = {}
        pos = sblk_base
        for s in sorted(sblks):
            sblk_addrs[s] = pos
            pos += sblk_sizes[s] + 4
        ib_addr = pos
        ib_size = 14 + idx_elmts * elem_size + (ndblk_addrs + nsblk_addrs) * 8 + 4
        hdr_addr = ib_addr + ib_size
        for (du, ne, first, cs), want in zip(dblocks, dblk_addrs):
            np_ = npages_of(ne)
            head = (b"EADB" + struct.pack("<BB", 0, client)
                    + struct.pack("<Q", hdr_addr)
                    + first.to_bytes(off_w, "little"))
            if np_:
                # paged: prefix + its checksum, then per-page element
                # runs each with own checksum; uninitialized pages are
                # allocated file space that was never written
                b = head + struct.pack("<I", lookup3(head))
                for p in range(np_):
                    if page_init(cs, p):
                        pe = b"".join(elem(c)
                                      for c in cs[p * page:(p + 1) * page])
                        b += pe + struct.pack("<I", lookup3(pe))
                    else:
                        b += b"\0" * (page * elem_size + 4)
            else:
                b = head + b"".join(elem(c) for c in cs)
                b += struct.pack("<I", lookup3(b))
            assert self.block(b) == want
        for s in sorted(sblks):
            row, sfirst, ptrs = sblks[s]
            np_ = npages_of(min_elmts * 2 ** ((row + 1) // 2))
            bm = b""
            if np_:
                # page-init bitmap for ALL this super block's data-block
                # pages (bit = dblk_in_sblk * npages + page, MSB-first)
                bitmap = bytearray((len(ptrs) * np_ + 7) // 8)
                for k2, di in enumerate(ptrs):
                    if di is None:
                        continue
                    for p in range(np_):
                        if page_init(dblocks[di][3], p):
                            self.bit_set(bitmap, k2 * np_ + p)
                bm = bytes(bitmap)
            b = (b"EASB" + struct.pack("<BB", 0, client)
                 + struct.pack("<Q", hdr_addr)
                 + sfirst.to_bytes(off_w, "little") + bm
                 + b"".join(struct.pack(
                     "<Q", UNDEF if di is None else dblk_addrs[di])
                     for di in ptrs))
            b += struct.pack("<I", lookup3(b))
            assert self.block(b) == sblk_addrs[s]
        ib = (b"EAIB" + struct.pack("<BB", 0, client)
              + struct.pack("<Q", hdr_addr))
        for i in range(idx_elmts):
            ib += elem(chunks[i] if i < n else None)
        for i in range(ndblk_addrs):
            ib += struct.pack("<Q", dblk_addrs[i] if i < len(direct) else UNDEF)
        for s in range(nsblk_addrs):
            ib += struct.pack("<Q", sblk_addrs.get(s, UNDEF))
        ib += struct.pack("<I", lookup3(ib))
        assert self.block(ib) == ib_addr and len(ib) == ib_size
        ndb = len(dblocks)
        hdr = (b"EAHD" + struct.pack("<BB", 0, client)
               + struct.pack("<BBBBB", elem_size, max_bits, idx_elmts,
                             min_elmts, min_ptrs)
               + struct.pack("<B", page_bits)
               + struct.pack("<QQQQQQ", 0, 0, ndb,
                             sum(dblk_sizes), n, n)
               + struct.pack("<Q", ib_addr))
        assert len(hdr) == 68, len(hdr)
        hdr += struct.pack("<I", lookup3(hdr))
        assert self.block(hdr) == hdr_addr
        return hdr_addr

    def _bt2_chunk_index(self, chunks, chunk_bytes, chunk_rows, filt,
                         node_size=512):
        """Write a v2 B-tree chunk index (records sorted by scaled
        offset): type 10 = addr + scaled offset, type 11 = addr +
        stored size + filter mask + scaled offset. Returns BTHD addr."""
        if filt:
            sz_w = self._enc_width(chunk_bytes)
            bt_type, rec_size = 11, 8 + sz_w + 4 + 8
        else:
            bt_type, rec_size = 10, 16
        recs = []
        for i, (addr, size, mask) in enumerate(chunks):
            r = struct.pack("<Q", addr)
            if filt:
                r += size.to_bytes(sz_w, "little") + struct.pack("<I", mask)
            r += struct.pack("<Q", i)  # scaled row-axis offset
            recs.append(r)
        return self._btree2(recs, rec_size, bt_type, node_size)

    @staticmethod
    def _deflate_msg():
        # filter pipeline v2: deflate (id 1), 1 client value (level 6)
        return (struct.pack("<BB", 2, 1)
                + struct.pack("<HHH", 1, 0, 1) + struct.pack("<I", 6))

    def group(self, children, attrs=(), dense_attrs=False):
        # link info: no creation tracking, compact (fractal heap UNDEF)
        msgs = [(0x02, struct.pack("<BBQQ", 0, 0, UNDEF, UNDEF)),
                (0x0A, struct.pack("<BB", 0, 0))]
        for name, addr in sorted(children):
            nb = name.encode()
            assert len(nb) < 256
            msgs.append((0x06, struct.pack("<BBB", 1, 0, len(nb)) + nb
                         + struct.pack("<Q", addr)))
        msgs.extend(self.attr_msgs(attrs, dense_attrs))
        return self.object_header(msgs)

    @staticmethod
    def _link_msg(name, addr):
        nb = name.encode()
        assert len(nb) < 256
        return struct.pack("<BBB", 1, 0, len(nb)) + nb + struct.pack("<Q", addr)

    def _fractal_heap(self, objs, id_len=None):
        """Write a fractal heap holding `objs` (list of bytes) as
        managed objects. Returns (header address, [heap id bytes]).
        Geometry mirrors libhdf5's dense-link defaults: table width 4,
        512 B starting blocks doubling to 64 KiB, 32-bit heap space,
        4 KiB max managed object -> 7-byte heap IDs (dense-attribute
        heaps request 8-byte IDs, zero-padded past the managed flag/
        offset/length fields, per H5A_DENSE_FHEAP_ID_LEN); direct
        blocks are checksummed (flags 0x02, checksum computed with its
        own field zeroed). Root is a direct block while everything
        fits in one starting block, else a root indirect block of
        direct blocks.
        """
        width, start, max_direct = 4, 512, 65536
        max_heap_bits, max_man_obj = 32, 4096
        off_w = (max_heap_bits + 7) // 8            # 4
        len_w = self._enc_width(max_man_obj)        # 2
        heap_id_len = id_len or (1 + off_w + len_w)  # 7 (links) / 8 (attrs)
        assert heap_id_len >= 1 + off_w + len_w
        hdr_len = 4 + 1 + 8 + off_w + 4             # FHDB header (checksummed)

        def row_size(r):
            return start if r < 2 else start << (r - 1)

        blocks, offsets, sizes, ids = [], [], [], []
        huge = []  # (huge id, file addr, length)
        blk, blk_off, intra, cur = 0, 0, hdr_len, []
        for ob in objs:
            if len(ob) > max_man_obj:
                # HUGE object: raw block outside heap space, indirect
                # via the heap's type-1 v2 B-tree (address+length+id);
                # heap ID = flag 0x10 (type huge) + id. libhdf5 always
                # goes indirect here: addr+len never fit id_len-1.
                hid = len(huge) + 1
                huge.append((hid, self.block(ob), len(ob)))
                ids.append(struct.pack("<B", 0x10)
                           + hid.to_bytes(heap_id_len - 1, "little"))
                continue
            while intra + len(ob) > row_size(blk // width):
                blocks.append(cur); offsets.append(blk_off)
                sizes.append(row_size(blk // width))
                blk_off += sizes[-1]; blk += 1; intra = hdr_len; cur = []
            ids.append((struct.pack("<B", 0)
                        + (blk_off + intra).to_bytes(off_w, "little")
                        + len(ob).to_bytes(len_w, "little"))
                       .ljust(heap_id_len, b"\0"))
            cur.append((intra, ob)); intra += len(ob)
        blocks.append(cur); offsets.append(blk_off)
        sizes.append(row_size(blk // width))
        nblocks = len(blocks)

        # the huge-object b-tree references nothing downstream, so it
        # is written FIRST — direct blocks / FHIB / FRHP addresses are
        # pinned relative to self.pos below
        huge_bt = UNDEF
        if huge:
            recs = [struct.pack("<QQQ", a, ln, hid) for hid, a, ln in huge]
            huge_bt = self._btree2(recs, 24, 1)

        base = self.pos
        dblock_addrs = [base + sum(sizes[:i]) for i in range(nblocks)]
        after = base + sum(sizes)
        if nblocks == 1:
            root_addr, cur_rows, hdr_addr = dblock_addrs[0], 0, after
        else:
            cur_rows = (nblocks + width - 1) // width
            entries = cur_rows * width
            fhib_len = 13 + off_w + entries * 8 + 4
            root_addr, hdr_addr = after, after + fhib_len
        for i, cur in enumerate(blocks):
            b = bytearray(sizes[i])
            b[0:4] = b"FHDB"; b[4] = 0
            b[5:13] = struct.pack("<Q", hdr_addr)
            b[13:13 + off_w] = offsets[i].to_bytes(off_w, "little")
            for at, ob in cur:
                b[at:at + len(ob)] = ob
            b[13 + off_w:17 + off_w] = struct.pack("<I", lookup3(bytes(b)))
            assert self.block(bytes(b)) == dblock_addrs[i]
        if nblocks > 1:
            fhib = (b"FHIB" + struct.pack("<B", 0) + struct.pack("<Q", hdr_addr)
                    + (0).to_bytes(off_w, "little"))
            for i in range(cur_rows * width):
                fhib += struct.pack("<Q",
                                    dblock_addrs[i] if i < nblocks else UNDEF)
            fhib += struct.pack("<I", lookup3(fhib))
            assert self.block(fhib) == root_addr
        managed = sum(sizes)
        frhp = (b"FRHP" + struct.pack("<B", 0)
                + struct.pack("<HHB", heap_id_len, 0, 0x02)
                + struct.pack("<I", max_man_obj)
                + struct.pack("<Q", len(huge) + 1 if huge else 0)   # next huge id
                + struct.pack("<Q", huge_bt)
                + struct.pack("<Q", 0) + struct.pack("<Q", UNDEF)   # free space
                + struct.pack("<QQQ", managed, managed, managed)
                + struct.pack("<Q", len(objs) - len(huge))
                + struct.pack("<QQ", sum(h[2] for h in huge), len(huge))
                + struct.pack("<QQ", 0, 0)                          # tiny
                + struct.pack("<H", width)
                + struct.pack("<QQ", start, max_direct)
                + struct.pack("<HH", max_heap_bits, cur_rows)
                + struct.pack("<Q", root_addr)
                + struct.pack("<H", cur_rows))
        assert len(frhp) == 142, len(frhp)
        frhp += struct.pack("<I", lookup3(frhp))
        assert self.block(frhp) == hdr_addr
        return hdr_addr, ids

    def _btree2(self, records, rec_size, bt_type, node_size=512):
        """Write a v2 B-tree over pre-sorted fixed-size records at
        whatever depth the node capacities demand, using libhdf5's
        node geometry (H5B2hdr.c): leaf capacity (node_size-10)//rec,
        internal-node child pointers = address(8) + record count
        (width = minimal encoding of the LEAF capacity, uniform across
        depths) + total subtree records (width = minimal encoding of
        the child depth's cumulative capacity; absent over leaves),
        internal capacity solved from node_size against that pointer
        width. Returns the BTHD address."""
        n = len(records)
        max_leaf = (node_size - 10) // rec_size
        nrec_w = self._enc_width(max_leaf)
        # per-depth geometry: max records in a node, cumulative max in
        # a subtree, encoding width of the cumulative (0 over leaves)
        max_rec, cum_max, cum_w = [max_leaf], [max_leaf], [0]
        while cum_max[-1] < n:
            ptr = 8 + nrec_w + cum_w[-1]
            mr = (node_size - (10 + ptr)) // (rec_size + ptr)
            assert mr >= 1, f"node_size {node_size} too small for depth {len(max_rec)}"
            cm = (mr + 1) * cum_max[-1] + mr
            max_rec.append(mr); cum_max.append(cm)
            cum_w.append(self._enc_width(cm))
        depth = len(max_rec) - 1

        def leaf(recs):
            b = (b"BTLF" + struct.pack("<BB", 0, bt_type) + b"".join(recs))
            b += struct.pack("<I", lookup3(b))
            return self.block(b)

        def build(recs, d):
            """Subtree of uniform depth d -> (addr, node recs, total)."""
            if d == 0:
                return (leaf(recs), len(recs), len(recs))
            k = max(2, -(-(len(recs) + 1) // (cum_max[d - 1] + 1)))
            assert k - 1 <= max_rec[d], "internal node over capacity"
            m = len(recs) - (k - 1)
            per, extra = divmod(m, k)
            children, seps, i = [], [], 0
            for ci in range(k):
                sz = per + (1 if ci < extra else 0)
                children.append(build(recs[i:i + sz], d - 1))
                i += sz
                if ci < k - 1:
                    seps.append(recs[i]); i += 1
            assert i == len(recs)
            body = b"BTIN" + struct.pack("<BB", 0, bt_type) + b"".join(seps)
            for addr, cn, tot in children:
                body += struct.pack("<Q", addr) + cn.to_bytes(nrec_w, "little")
                if cum_w[d - 1]:  # absent over leaves (width 0)
                    body += tot.to_bytes(cum_w[d - 1], "little")
            assert len(body) + 4 <= node_size, "internal node oversized"
            body += struct.pack("<I", lookup3(body))
            return (self.block(body), len(seps), len(recs))

        if n == 0:
            root, root_n = UNDEF, 0
        else:
            root, root_n, _ = build(records, depth)
        hdr = (b"BTHD" + struct.pack("<BB", 0, bt_type)
               + struct.pack("<IHH", node_size, rec_size, depth)
               + struct.pack("<BB", 100, 40)
               + struct.pack("<Q", root) + struct.pack("<H", root_n)
               + struct.pack("<Q", n))
        assert len(hdr) == 34, len(hdr)
        hdr += struct.pack("<I", lookup3(hdr))
        return self.block(hdr)

    def dense_attrs_msg(self, attrs):
        """Dense attribute storage: attribute messages live as
        fractal-heap objects keyed by a v2 B-tree type-8 name index
        (record = 8-byte heap ID + message flags + creation order +
        lookup3 name hash), referenced from an Attribute Info message
        (0x15) — what libhdf5 emits once an object passes the
        compact-attribute threshold of 8."""
        objs = [self.attr(n, v) for n, v in attrs]
        heap_addr, ids = self._fractal_heap(objs, id_len=8)
        recs = [hid + b"\0" + struct.pack("<II", i, lookup3(n.encode()))
                for i, ((n, _), hid) in enumerate(zip(attrs, ids))]
        recs.sort(key=lambda r: struct.unpack("<I", r[13:17])[0])
        bt_addr = self._btree2(recs, 17, 8)
        return struct.pack("<BBQQ", 0, 0, heap_addr, bt_addr)

    def attr_msgs(self, attrs, dense=False):
        if dense and attrs:
            return [(0x15, self.dense_attrs_msg(attrs))]
        return [(0x0C, self.attr(n, v)) for n, v in attrs]

    def group_dense(self, children, attrs=()):
        """Dense link storage: links live as fractal-heap objects keyed
        by a v2 B-tree name index — what libhdf5 emits for a
        libver='latest' group past its compact-link threshold."""
        assert children, "dense group needs links"
        children = sorted(children)
        objs = [self._link_msg(n, a) for n, a in children]
        heap_addr, ids = self._fractal_heap(objs)
        recs = [struct.pack("<I", lookup3(n.encode())) + hid
                for (n, _), hid in zip(children, ids)]
        recs.sort(key=lambda r: struct.unpack("<I", r[:4])[0])
        bt_addr = self._btree2(recs, 4 + len(ids[0]), 5)
        msgs = [(0x02, struct.pack("<BBQQ", 0, 0, heap_addr, bt_addr)),
                (0x0A, struct.pack("<BB", 0, 0))]
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
    if "--ushuf" in sys.argv[1:]:
        # self-contained fixture (no parquet input): unsigned columns
        # crossing every sign boundary + a v2 TWO-FILTER (shuffle id 2,
        # deflate id 1) dataset. Usage: h5make.py --ushuf <out.hdf5>
        w = WLatest()
        cols = [
            ("u32col", w.dataset([0, 1, 2147483648, 3000000000, 4294967295],
                                 "u32", attrs=[("unit", "None")])),
            ("u16col", w.dataset([0, 1, 32768, 40000, 65535], "u16",
                                 attrs=[("unit", "None")])),
            ("u8col", w.dataset([0, 1, 128, 200, 255], "u8",
                                attrs=[("unit", "None")])),
            ("shufcol", w.dataset_shuffle_deflate(
                [-5, 0, 7, 1 << 40, -(1 << 52)], "i64",
                attrs=[("unit", "None")])),
        ]
        data = w.group(cols)
        sim = w.group([], attrs=[("box_size", 10.0), ("redshift", 0.0)])
        header = w.group([("simulation", sim)])
        root = w.group([("data", data), ("header", header)])
        w.write(args[0], root)
        print(f"wrote {args[0]} [latest unsigned + shuffle+deflate v2 "
              f"pipeline]: {len(cols)} columns, 5 rows")
        return
    latest = "--latest" in sys.argv[1:]
    paged = "--paged" in sys.argv[1:]          # implies --latest
    dense = "--dense" in sys.argv[1:]          # implies --latest
    ea = "--appendable" in sys.argv[1:]        # extensible-array chunks
    bt2 = "--bt2" in sys.argv[1:]              # v2-b-tree chunks
    edge = "--edge-raw" in sys.argv[1:]        # raw partial chunk, mask bit 0
    ea_paged = "--ea-paged" in sys.argv[1:]    # paged EA data blocks
    dattr = "--dense-attrs" in sys.argv[1:]    # dense attribute storage
    vlen = "--vlen" in sys.argv[1:]            # vlen string columns (legacy)
    # --repeat=N tiles the table N times — enough chunks to push the
    # EA index past its direct data-block pointers into EASB super
    # blocks (the realistic appendable-catalog regime) while keeping
    # the small fixture table
    rep = next((int(a.split("=", 1)[1]) for a in sys.argv[1:]
                if a.startswith("--repeat=")), 1)
    latest = latest or paged or dense or ea or bt2 or edge or ea_paged or dattr
    if ea_paged:
        ea = True
        # 64-element pages: super-block row 5's 128-element data
        # blocks are PAGED (2 pages each) while every index-block
        # direct block (<= 64) stays unpaged, as in libhdf5. 21x the
        # 25-row nation table with 1-row chunks = 525 chunks: 4 inline
        # + 240 direct + 256 in row 4 + 25 into row 5's first data
        # block -> page 0 initialized, page 1 allocated-but-uninit,
        # data blocks 1-3 of the row unallocated.
        rep = max(rep, 21)
    t = pq.read_table(args[0])
    w = WLatest() if latest else W()
    if ea_paged:
        w.ea_page_bits = 6
    if paged:
        # tiny pages + tiny chunks force the PAGED fixed-array shape
        # (bitmap + per-page checksums) with a small fixture table
        w.fa_page_bits = 2
    cols = []
    first_numeric = True
    for name in t.column_names:
        vals = t[name].to_pylist() * rep
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
        if vlen and ty == "string":
            cols.append((name, w.vlen_dataset(vals, attrs=[("unit", "None")])))
            continue
        if edge and kind == "i64":
            # nonzero filter masks: deflate-filtered columns whose
            # trailing PARTIAL chunk is stored raw with mask bit 0 set
            # (deflate skipped for that chunk only). First int column
            # through the extensible-array index (2-row chunks on 25
            # rows -> 13 chunks, last holds 1 row), second through the
            # v2 B-tree (4-row chunks -> 7 records, last holds 1 row).
            if first_numeric:
                cols.append((name, w.dataset(vals, kind,
                                             attrs=[("unit", "None")],
                                             chunk_rows=2, index="ea_filt",
                                             edge_raw=True)))
                first_numeric = False
            else:
                cols.append((name, w.dataset(vals, kind,
                                             attrs=[("unit", "None")],
                                             chunk_rows=4, index="bt2_filt",
                                             edge_raw=True)))
        elif ea and kind == "i64":
            # the h5py maxshape=(None,) shape: EA index. First int
            # column: unfiltered, 1-row chunks -> 25 chunks = 4 inline
            # + a full 16-element data block + a second (partial)
            # 32-element block. Second: deflate, 2-row chunks -> 13
            # chunks = 4 inline + 9 in one data block. Under
            # --ea-paged both use 1-row chunks so the unfiltered AND
            # filtered element encodings each reach a paged row.
            if first_numeric:
                cols.append((name, w.dataset(vals, kind,
                                             attrs=[("unit", "None")],
                                             chunk_rows=1, index="ea")))
                first_numeric = False
            else:
                cols.append((name, w.dataset(vals, kind,
                                             attrs=[("unit", "None")],
                                             chunk_rows=1 if ea_paged else 2,
                                             index="ea_filt")))
        elif bt2 and kind == "i64":
            # v2-b-tree chunk index. First int column: unfiltered,
            # 64 B nodes force a DEPTH-2 tree over 13 chunks (3-record
            # leaves, 1-record internals); second: deflate, 128 B
            # nodes -> depth 1. Depth 0 is covered by the edge-raw
            # fixture's t11 index.
            if first_numeric:
                cols.append((name, w.dataset(vals, kind,
                                             attrs=[("unit", "None")],
                                             chunk_rows=2, index="bt2")))
                first_numeric = False
            else:
                cols.append((name, w.dataset(vals, kind,
                                             attrs=[("unit", "None")],
                                             chunk_rows=2, index="bt2_filt",
                                             bt2_node=128)))
        elif dense and kind == "i64":
            # widen the table so the data group crosses the dense-link
            # threshold for real: 31 derived aliases per int column
            # (value-shifted so every column is distinct) -> 65 links
            # on the 3-column nation fixture, deep enough for a
            # depth-1 name B-tree and a multi-block fractal heap
            cols.append((name, w.dataset(vals, kind, attrs=[("unit", "None")])))
            for i in range(31):
                cols.append((f"{name}__d{i:02d}",
                             w.dataset([v + i + 1 for v in vals], kind,
                                       attrs=[("unit", "None")])))
        elif latest and not dense and kind in ("i64", "f64"):
            if paged:
                cr = 2  # 13 chunks on the 25-row fixture -> 4 pages
            elif first_numeric:
                # whole column in one chunk -> Single Chunk index
                cr = len(vals)
                first_numeric = False
            else:
                # ~3 chunks -> Fixed Array index
                cr = max(1, (len(vals) + 2) // 3)
            at = [("unit", "None")]
            if dattr:
                # 10 attributes push past libhdf5's compact threshold
                # (8) -> dense storage on every numeric column
                at += [("description", f"column {name}")]
                at += [(f"meta{i:02d}", float(i) * 1.25) for i in range(8)]
            cols.append((name, w.dataset(vals, kind, attrs=at,
                                         chunk_rows=cr, dense_attrs=dattr)))
        else:
            cols.append((name, w.dataset(vals, kind, attrs=[("unit", "None")])))
    data = w.group_dense(cols) if dense else w.group(cols)
    sim_attrs = [("box_size", 123.0), ("redshift", 0.25)]
    if dattr:
        # the attribute-heavy header shape real catalogs carry:
        # cosmology + provenance parameters past the compact limit
        sim_attrs += [(f"omega_{k}", 0.01 * i)
                      for i, k in enumerate(["m", "b", "l", "k", "r"])]
        sim_attrs += [("h0", 0.6766), ("n_s", 0.9665),
                      ("sigma_8", 0.8102), ("code", "fixture")]
        # a >4 KiB value (config/provenance blob shape) exceeds the
        # heap's max managed object size -> HUGE object, indirect via
        # the heap's type-1 v2 B-tree
        sim_attrs += [("provenance", "".join(
            f"param{i:04d}={i * 7 % 997};" for i in range(400)))]
        sim = w.group([], attrs=sim_attrs, dense_attrs=True)
    else:
        sim = w.group([], attrs=sim_attrs)
    header = w.group([("simulation", sim)])
    root = w.group([("data", data), ("header", header)])
    w.write(args[1], root)
    mode = ("latest dense-links (FRHP+BTHD)" if dense
            else "dense attributes (0x15 + FRHP + BTHD t8)" if dattr
            else "edge-raw chunks (filter mask bit 0)" if edge
            else "paged EA data blocks (EASB bitmap)" if ea_paged
            else "latest extensible-array chunks (EAHD)" if ea
            else "latest v2-btree chunks (BTHD t10/t11)" if bt2
            else "latest paged-FA (sb v3, OHDR)" if paged
            else "latest (sb v3, OHDR)" if latest
            else "earliest + vlen strings (GCOL)" if vlen
            else "earliest (sb v0)")
    print(f"wrote {args[1]} [{mode}]: {len(cols)} columns, "
          f"{t.num_rows * rep} rows")


if __name__ == "__main__":
    main()
