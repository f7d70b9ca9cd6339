#!/usr/bin/env python3
"""Independent HDF5 *writer* (dev tool): emits a SPEC-layout file from a
parquet table using nothing but struct — written separately from the
Scala writer against the same public format document, so the Scala
READER gets validated against independently produced bytes (the
mirror-image of scripts/h5check.py, which validates the Scala WRITER
with an independent Python reader).

Layout: superblock v0, v1 object headers, symbol-table groups,
contiguous little-endian datasets, v1 'unit' attributes.

Usage: python3 scripts/h5make.py <table.parquet> <out.hdf5>
"""
import struct
import sys

import pyarrow.parquet as pq

UNDEF = 0xFFFFFFFFFFFFFFFF


class W:
    def __init__(self):
        self.parts = []
        self.pos = 96  # superblock

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
        if kind == "i64":
            data = b"".join(struct.pack("<q", v) for v in values)
            dt = struct.pack("<BBBBIHH", 0x10, 0x08, 0, 0, 8, 0, 64)
        elif kind == "f64":
            data = b"".join(struct.pack("<d", v) for v in values)
            dt = struct.pack("<BBBBIHHBBBBI", 0x11, 0x20, 0x3F, 0, 8,
                             0, 64, 52, 11, 0, 52, 1023)
        else:
            width = kind[1]
            data = b"".join(v.encode()[:width].ljust(width, b"\0")
                            for v in values)
            dt = struct.pack("<BBBBI", 0x13, 0, 0, 0, width)
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


def main():
    t = pq.read_table(sys.argv[1])
    w = W()
    cols = []
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
        cols.append((name, w.dataset(vals, kind, attrs=[("unit", "None")])))
    data = w.group(cols)
    sim = w.group([], attrs=[("box_size", 123.0), ("redshift", 0.25)])
    header = w.group([("simulation", sim)])
    root = w.group([("data", data), ("header", header)])
    w.write(sys.argv[2], root)
    print(f"wrote {sys.argv[2]}: {len(cols)} columns, {t.num_rows} rows")


if __name__ == "__main__":
    main()
