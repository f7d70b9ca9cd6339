#!/usr/bin/env python3
"""Independent validation of the MODERN-layout HDF5 fixtures (dev
tool): a second pure-Python decoder for the libver='latest' format
subset the fixture writer emits — superblock v3, v2 object headers,
compact + dense (fractal heap) links and attributes, layout-v4
datasets through every chunk index (Single Chunk, Fixed Array incl.
paged, Extensible Array incl. super blocks and paged data blocks, v2
B-tree at any depth), deflate+shuffle filter pipelines with per-chunk
filter masks.

Written from the published format spec with nothing but struct+zlib,
deliberately sharing NO code with scripts/h5make.py (the writer) or
the Scala reader, so a coding slip in either cannot hide behind a
shared implementation. Checksums are intentionally NOT verified here:
this tool's ground truth is the source parquet table — it decodes
every data column and compares values.

Usage: python3 scripts/h5check_latest.py <file.hdf5> <table.parquet> [repeat]
"""
import struct
import sys
import zlib

UNDEF = 0xFFFFFFFFFFFFFFFF


class H5L:
    def __init__(self, path):
        self.b = open(path, "rb").read()
        assert self.b[:8] == b"\x89HDF\r\n\x1a\n", "not an HDF5 file"
        ver = self.b[8]
        assert ver == 3, f"superblock version {ver} (want 3)"
        assert self.b[9] == 8 and self.b[10] == 8, "offset/length sizes"
        # sig(8) ver(1) offs(1) lens(1) flags(1) base(8) ext(8) eof(8)
        self.root = self.u64(36)

    def u8(self, o):
        return self.b[o]

    def u16(self, o):
        return struct.unpack_from("<H", self.b, o)[0]

    def u32(self, o):
        return struct.unpack_from("<I", self.b, o)[0]

    def u64(self, o):
        return struct.unpack_from("<Q", self.b, o)[0]

    def uvar(self, o, w):
        return int.from_bytes(self.b[o:o + w], "little")

    def sig(self, o):
        return self.b[o:o + 4]

    # ---- v2 object headers ------------------------------------------

    def messages(self, addr):
        """v2 (OHDR) message walk, following OCHK continuations.
        Returns [(type, data offset, data size)]."""
        assert self.sig(addr) == b"OHDR", f"no OHDR at {addr}"
        assert self.u8(addr + 4) == 2, "object header version"
        flags = self.u8(addr + 5)
        p = addr + 6
        if flags & 0x20:
            p += 8  # access/mod/change/birth times
        if flags & 0x10:
            p += 4  # max compact / min dense attrs
        szw = 1 << (flags & 0x3)
        size = self.uvar(p, szw)
        p += szw
        tracked = bool(flags & 0x04)
        # each queue entry is (start, usable message bytes): chunk 0's
        # size field already excludes sig/checksum; an OCHK block's
        # length includes its 4-byte signature and trailing checksum
        out, blocks = [], [(p, size)]
        while blocks:
            start, ln = blocks.pop(0)
            q = start
            while q + 4 <= start + ln:
                typ, sz, _ = self.u8(q), self.u16(q + 1), self.u8(q + 3)
                q += 4
                if tracked:
                    q += 2
                if typ == 0x10:
                    cont, clen = self.u64(q), self.u64(q + 8)
                    # continuation blocks open with an OCHK signature
                    assert self.sig(cont) == b"OCHK"
                    blocks.append((cont + 4, clen - 8))
                elif typ:
                    out.append((typ, q, sz))
                q += sz
        return out

    # ---- fractal heaps (dense links / attributes) -------------------

    def _heap_blocks(self, hdr):
        """FRHP -> [(file addr, heap-space offset, size)] direct blocks.
        Memoized per heap header — dense groups look up one object per
        link, which would otherwise rebuild the block list every time."""
        cached = getattr(self, "_hb_cache", {}).get(hdr)
        if cached is not None:
            return cached
        assert self.sig(hdr) == b"FRHP", f"no FRHP at {hdr}"
        id_len = self.u16(hdr + 5)
        table_width = self.u16(hdr + 110)
        start_sz = self.u64(hdr + 112)
        root = self.u64(hdr + 132)
        cur_rows = self.u16(hdr + 140)
        max_heap_bits = self.u16(hdr + 128)
        off_w = (max_heap_bits + 7) // 8
        if cur_rows == 0:  # root is a single direct block
            res = (id_len, off_w, [(root, 0, start_sz)])
        else:
            assert self.sig(root) == b"FHIB", f"no FHIB at {root}"
            out, pos = [], root + 13 + off_w
            heap_off = 0
            for i in range(cur_rows * table_width):
                row = i // table_width
                sz = start_sz if row < 2 else start_sz << (row - 1)
                a = self.u64(pos)
                pos += 8
                if a != UNDEF:
                    out.append((a, heap_off, sz))
                heap_off += sz
            res = (id_len, off_w, out)
        self.__dict__.setdefault("_hb_cache", {})[hdr] = res
        return res

    def heap_pos(self, hdr, hid):
        """Heap ID (managed or huge) -> (absolute file offset, length)."""
        id_len, off_w, blocks = self._heap_blocks(hdr)
        if (hid[0] >> 4) & 0x3 == 1:
            # HUGE: outside heap space, indirect via the heap's
            # type-1 v2 B-tree (record = addr + length + huge id)
            want = int.from_bytes(hid[1:id_len], "little")
            for rec in self.btree2(self.u64(hdr + 22)):
                a, ln, i = struct.unpack("<QQQ", rec)
                if i == want:
                    return a, ln
            raise AssertionError(f"huge object {want} not in b-tree")
        assert hid[0] & 0xF0 == 0, "non-managed heap object"
        off = int.from_bytes(hid[1:1 + off_w], "little")
        # trailing ID padding is zero, so parsing the rest of the ID as
        # the little-endian length is exact for any length width
        ln = int.from_bytes(hid[1 + off_w:id_len], "little")
        for a, hoff, sz in blocks:
            if hoff <= off < hoff + sz:
                return a + (off - hoff), ln
        raise AssertionError(f"heap offset {off} outside direct blocks")

    def heap_object(self, hdr, hid):
        pos, ln = self.heap_pos(hdr, hid)
        return self.b[pos:pos + ln]

    # ---- v2 B-trees --------------------------------------------------

    def btree2(self, hdr):
        """BTHD -> every record (raw bytes), tree order, any depth."""
        assert self.sig(hdr) == b"BTHD", f"no BTHD at {hdr}"
        node_sz = self.u32(hdr + 6)
        rec_sz = self.u16(hdr + 10)
        depth = self.u16(hdr + 12)
        root = self.u64(hdr + 16)
        root_n = self.u16(hdr + 24)
        total = self.u64(hdr + 26)
        if total == 0 or root == UNDEF:
            return []
        max_leaf = (node_sz - 10) // rec_sz
        nrec_w = max(1, (max_leaf.bit_length() + 7) // 8)
        cum_w = [0]
        cum = max_leaf
        for _ in range(depth):
            ptr = 8 + nrec_w + cum_w[-1]
            mr = (node_sz - (10 + ptr)) // (rec_sz + ptr)
            cum = (mr + 1) * cum + mr
            cum_w.append(max(1, (cum.bit_length() + 7) // 8))

        def node(addr, d, n):
            if d == 0:
                assert self.sig(addr) == b"BTLF", f"no BTLF at {addr}"
                base = addr + 6
                return [self.b[base + i * rec_sz: base + (i + 1) * rec_sz]
                        for i in range(n)]
            assert self.sig(addr) == b"BTIN", f"no BTIN at {addr}"
            recs = addr + 6
            ptrs = recs + n * rec_sz
            pw = 8 + nrec_w + cum_w[d - 1]
            out = []
            for i in range(n + 1):
                p = ptrs + i * pw
                out += node(self.u64(p), d - 1, self.uvar(p + 8, nrec_w))
                if i < n:
                    out.append(self.b[recs + i * rec_sz: recs + (i + 1) * rec_sz])
            return out

        return node(root, depth, root_n)

    # ---- links & attributes -----------------------------------------

    def _parse_link(self, o):
        assert self.u8(o) == 1, "link message version"
        flags = self.u8(o + 1)
        p = o + 2
        if flags & 0x08:
            p += 1  # link type (hard = 0 assumed)
        if flags & 0x04:
            p += 8  # creation order
        if flags & 0x10:
            p += 1  # charset
        lw = 1 << (flags & 0x3)
        ln = self.uvar(p, lw)
        p += lw
        name = self.b[p:p + ln].decode()
        return name, self.u64(p + ln)

    def links(self, addr):
        msgs = self.messages(addr)
        out = {}
        for typ, o, _ in msgs:
            if typ == 0x06:
                n, a = self._parse_link(o)
                out[n] = a
        for typ, o, _ in msgs:
            if typ == 0x02:  # link info: dense when the heap is defined
                flags = self.u8(o + 1)
                p = o + 2 + (8 if flags & 0x01 else 0)
                fheap, name_bt = self.u64(p), self.u64(p + 8)
                if fheap != UNDEF:
                    for rec in self.btree2(name_bt):
                        # type 5: hash(4) + heap ID; the heap object is
                        # a serialized link message, parsed in place
                        pos, _ = self.heap_pos(fheap, rec[4:])
                        n, a = self._parse_link(pos)
                        out[n] = a
        return out

    def _parse_attr(self, buf):
        assert buf[0] == 3, "attribute message version"
        name_sz = struct.unpack_from("<H", buf, 2)[0]
        dt_sz = struct.unpack_from("<H", buf, 4)[0]
        ds_sz = struct.unpack_from("<H", buf, 6)[0]
        p = 9  # v3: name-charset byte at 8
        name = buf[p:p + name_sz].split(b"\0")[0].decode()
        val = buf[p + name_sz + dt_sz + ds_sz:]
        cls = buf[p + name_sz] & 0x0F
        if cls == 1:
            return name, struct.unpack_from("<d", val, 0)[0]
        return name, val.split(b"\0")[0].decode(errors="replace")

    def attrs(self, addr):
        msgs = self.messages(addr)
        out = {}
        for typ, o, sz in msgs:
            if typ == 0x0C:
                n, v = self._parse_attr(self.b[o:o + sz])
                out[n] = v
        for typ, o, _ in msgs:
            if typ == 0x15:  # attribute info -> dense storage
                flags = self.u8(o + 1)
                p = o + 2 + (2 if flags & 0x01 else 0)
                fheap, name_bt = self.u64(p), self.u64(p + 8)
                if fheap != UNDEF:
                    for rec in self.btree2(name_bt):
                        # type 8: heap ID(8) + flags(1) + corder(4) + hash(4)
                        assert rec[8] == 0, "shared dense attribute"
                        n, v = self._parse_attr(self.heap_object(fheap, rec[:8]))
                        out[n] = v
        return out

    # ---- datasets ----------------------------------------------------

    def dataset(self, addr):
        """-> list of python values (ints / floats / strings)."""
        msgs = self.messages(addr)
        dt = ds = lay = None
        filters = []
        for typ, o, sz in msgs:
            if typ == 0x01:
                ds = o
            elif typ == 0x03:
                dt = o
            elif typ == 0x08:
                lay = (o, sz)
            elif typ == 0x0B:
                # filter pipeline v2 (standard filters carry no name):
                # id(2) flags(2) nclient(2) + 4-byte client values
                assert self.u8(o) == 2, "filter pipeline version"
                nf = self.u8(o + 1)
                q = o + 2
                for _ in range(nf):
                    fid = self.u16(q)
                    assert fid < 256, "named filter unsupported here"
                    ncli = self.u16(q + 4)
                    q += 6 + 4 * ncli
                    filters.append(fid)
        # dataspace v2: version, rank, flags, type, dims
        assert self.u8(ds) == 2
        rank = self.u8(ds + 1)
        dims = [self.u64(ds + 4 + 8 * i) for i in range(rank)]
        rows = dims[0] if dims else 1
        # datatype
        cls = self.u8(dt) & 0x0F
        esize = self.u32(dt + 4)
        per_row = 1
        for d in dims[1:]:
            per_row *= d
        raw = self._read_layout(lay, filters, rows, per_row, esize)

        def decode(i):
            o = i * esize
            if cls == 0:
                return int.from_bytes(raw[o:o + esize], "little", signed=True)
            if cls == 1:
                return struct.unpack_from("<d" if esize == 8 else "<f", raw, o)[0]
            if cls == 3:
                return raw[o:o + esize].split(b"\0")[0].decode()
            raise AssertionError(f"datatype class {cls}")

        return [decode(i) for i in range(rows * per_row)]

    def _defilter(self, data, filters, mask, out_len, esize):
        for i, fid in reversed(list(enumerate(filters))):
            if mask & (1 << i):
                continue
            if fid == 1:
                data = zlib.decompress(data)
            elif fid == 2:
                # shuffle: de-interleave byte planes
                n = len(data) // esize
                out = bytearray(len(data))
                for bpos in range(esize):
                    for j in range(n):
                        out[j * esize + bpos] = data[bpos * n + j]
                data = bytes(out)
            else:
                raise AssertionError(f"filter {fid}")
        return data[:out_len]

    def _read_layout(self, lay, filters, rows, per_row, esize):
        o, _ = lay
        version = self.u8(o)
        assert version == 4, f"layout version {version}"
        cls = self.u8(o + 1)
        if cls == 1:  # contiguous
            addr, ln = self.u64(o + 2), self.u64(o + 10)
            return self.b[addr:addr + ln]
        assert cls == 2, f"layout class {cls}"
        flags = self.u8(o + 2)
        rank = self.u8(o + 3)
        dw = self.u8(o + 4)
        p = o + 5
        cdims = [self.uvar(p + i * dw, dw) for i in range(rank)]
        p += rank * dw
        idx_type = self.u8(p)
        p += 1
        # chunk dims carry a trailing ELEMENT-SIZE dimension (dataset
        # rank + 1, as in the v1 chunk B-tree convention)
        chunk_rows = cdims[0]
        chunk_bytes = 1
        for c in cdims:
            chunk_bytes *= c
        # layout flag 0x02 marks a filtered SINGLE CHUNK only; every
        # other index signals filtering via the pipeline message
        filtered = bool(filters) if idx_type != 1 else bool(flags & 0x02)
        nchunks = (rows + chunk_rows - 1) // chunk_rows
        szw = None
        # (chunk index -> (addr, stored, mask))
        chunks = {}
        if idx_type == 1:  # single chunk
            if filtered:
                stored = self.u64(p)
                mask = self.u32(p + 8)
                chunks[0] = (self.u64(p + 12), stored, mask)
            else:
                chunks[0] = (self.u64(p), chunk_bytes, 0)
        elif idx_type == 3:  # fixed array
            self._fa_chunks(self.u64(p + 1), filtered, chunk_bytes, chunks)
        elif idx_type == 4:  # extensible array: 5 cparam bytes, addr
            self._ea_chunks(self.u64(p + 5), filtered, chunk_bytes, chunks)
        elif idx_type == 5:  # v2 b-tree
            nscaled = max(1, rank - 1)  # dataspace rank (no elem-size dim)
            for i, rec in enumerate(self.btree2(self.u64(p + 6))):
                if filtered:
                    w = len(rec) - 12 - 8 * nscaled
                    stored = int.from_bytes(rec[8:8 + w], "little")
                    mask = struct.unpack_from("<I", rec, 8 + w)[0]
                    scaled = struct.unpack_from("<Q", rec, 12 + w)[0]
                    chunks[scaled] = (struct.unpack_from("<Q", rec)[0], stored, mask)
                else:
                    scaled = struct.unpack_from("<Q", rec, 8)[0]
                    chunks[scaled] = (struct.unpack_from("<Q", rec)[0], chunk_bytes, 0)
        else:
            raise AssertionError(f"chunk index type {idx_type}")
        out = bytearray(rows * per_row * esize)
        row_bytes = per_row * esize
        for ci in range(nchunks):
            c = chunks.get(ci)
            if c is None or c[0] == UNDEF:
                continue
            addr, stored, mask = c
            data = self._defilter(self.b[addr:addr + stored],
                                  filters if filtered else [],
                                  mask, chunk_bytes, esize)
            r0 = ci * chunk_rows
            upto = min(chunk_rows, rows - r0)
            out[r0 * row_bytes:(r0 + upto) * row_bytes] = \
                data[:upto * row_bytes]
        return bytes(out)

    # fixed array
    def _fa_chunks(self, hdr, filtered, chunk_bytes, chunks):
        assert self.sig(hdr) == b"FAHD", f"no FAHD at {hdr}"
        entry_sz = self.u8(hdr + 6)
        page_bits = self.u8(hdr + 7)
        n = self.u64(hdr + 8)
        dblk = self.u64(hdr + 16)
        assert self.sig(dblk) == b"FADB"
        page = 1 << page_bits

        def entry(e, i):
            if not filtered:
                chunks[i] = (self.u64(e), chunk_bytes, 0)
            else:
                w = entry_sz - 12
                chunks[i] = (self.u64(e),
                             self.uvar(e + 8, w), self.u32(e + 8 + w))

        if n <= page:
            base = dblk + 14
            for i in range(n):
                entry(base + i * entry_sz, i)
        else:
            npages = (n + page - 1) // page
            bm = dblk + 14
            bm_len = (npages + 7) // 8
            pages = bm + bm_len + 4
            for pg in range(npages):
                # MSB-first page-init bits
                if not (self.b[bm + pg // 8] >> (7 - pg % 8)) & 1:
                    continue
                cnt = min(page, n - pg * page)
                pbase = pages + pg * (page * entry_sz + 4)
                for j in range(cnt):
                    entry(pbase + j * entry_sz, pg * page + j)

    # extensible array
    def _ea_chunks(self, hdr, filtered, chunk_bytes, chunks):
        assert self.sig(hdr) == b"EAHD", f"no EAHD at {hdr}"
        elem_sz = self.u8(hdr + 6)
        max_bits = self.u8(hdr + 7)
        idx_elems = self.u8(hdr + 8)
        min_elems = self.u8(hdr + 9)
        min_ptrs = self.u8(hdr + 10)
        page_bits = self.u8(hdr + 11)
        iblk = self.u64(hdr + 60)
        off_w = (max_bits + 7) // 8
        page = 1 << page_bits
        assert self.sig(iblk) == b"EAIB"

        def elem(e, i):
            a = self.u64(e)
            if a == UNDEF:
                return
            if not filtered:
                chunks[i] = (a, chunk_bytes, 0)
            else:
                w = elem_sz - 12
                chunks[i] = (a, self.uvar(e + 8, w), self.u32(e + 8 + w))

        ib_elems = iblk + 14
        for i in range(idx_elems):
            elem(ib_elems + i * elem_sz, i)
        ndblk_ptrs = 2 * (min_ptrs - 1)
        nsblks = 1 + (max_bits - (min_elems.bit_length() - 1)) // 2
        # how many leading super-block rows the index block inlines
        k, tot = 0, 0
        while tot < ndblk_ptrs:
            tot += 2 ** (k // 2)
            k += 1
        dptrs = ib_elems + idx_elems * elem_sz
        sptrs = dptrs + ndblk_ptrs * 8

        def dblock(addr, first, ne, pg_bitmap, pg_bit0):
            """decode a data block's elements (paged or not)."""
            if addr == UNDEF:
                return
            assert self.sig(addr) == b"EADB"
            if ne <= page:
                base = addr + 14 + off_w
                for j in range(ne):
                    elem(base + j * elem_sz, first + j)
            else:
                npg = ne // page
                pages = addr + 14 + off_w + 4
                for pg in range(npg):
                    bit = pg_bit0 + pg
                    if not (pg_bitmap[bit // 8] >> (7 - bit % 8)) & 1:
                        continue
                    pbase = pages + pg * (page * elem_sz + 4)
                    for j in range(page):
                        elem(pbase + j * elem_sz, first + pg * page + j)

        first = idx_elems
        d = 0
        for row in range(nsblks):
            ndb = 2 ** (row // 2)
            ne = min_elems * 2 ** ((row + 1) // 2)
            if row < k:  # direct pointers in the index block
                for j in range(ndb):
                    dblock(self.u64(dptrs + (d + j) * 8), first + j * ne,
                           ne, b"", 0)
            else:
                sa = self.u64(sptrs + (row - k) * 8)
                if sa != UNDEF:
                    assert self.sig(sa) == b"EASB"
                    npg = ne // page if ne > page else 0
                    bm_len = (ndb * npg + 7) // 8 if npg else 0
                    bm = self.b[sa + 14 + off_w: sa + 14 + off_w + bm_len]
                    ptrs = sa + 14 + off_w + bm_len
                    for j in range(ndb):
                        dblock(self.u64(ptrs + j * 8), first + j * ne,
                               ne, bm, j * npg)
            first += ndb * ne
            d += ndb


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    import pyarrow.parquet as pq
    h5 = H5L(sys.argv[1])
    t = pq.read_table(sys.argv[2])
    rep = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    root = h5.links(h5.root)
    data = h5.links(root["data"])
    hdr = h5.links(root["header"])
    sim_attrs = h5.attrs(hdr["simulation"])
    assert sim_attrs.get("box_size") == 123.0, sim_attrs
    if "provenance" in sim_attrs:
        # the dattr fixture's >4 KiB HUGE heap object — value-checked
        # here so the huge path is validated independently, not only
        # by the Scala reader
        want_prov = "".join(f"param{i:04d}={i * 7 % 997};"
                            for i in range(400))
        assert sim_attrs["provenance"] == want_prov, "huge attr mismatch"
    checked = 0
    for name in t.column_names:
        # every parquet column must resolve to a data link: a writer
        # bug dropping a column (or a checker link-walk gap) must FAIL,
        # not silently shrink coverage
        assert name in data, f"column {name} missing from data group"
        want = t[name].to_pylist() * rep
        got = h5.dataset(data[name])
        ty = str(t.schema.field(name).type)
        if ty == "double":
            ok = all(abs(a - b) < 1e-12 for a, b in zip(got, want))
        else:
            ok = got == want
        assert len(got) == len(want) and ok, \
            f"column {name}: {got[:5]}... != {want[:5]}..."
        checked += 1
        # unit attribute must survive whatever storage it uses
        assert h5.attrs(data[name]).get("unit") == "None", name
    assert checked == len(t.column_names), "incomplete column coverage"
    print(f"OK {sys.argv[1]}: {checked} columns match {sys.argv[2]} "
          f"(x{rep}), {len(sim_attrs)} header attrs")


if __name__ == "__main__":
    main()
