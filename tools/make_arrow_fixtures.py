#!/usr/bin/env python3
"""Golden Arrow IPC fixtures written by pyarrow (the C++ reference
implementation) — the foreign-proof counterpart for ArrowIpcSpec.

Unlike tools/make_fixtures.py (deliberately Python-stdlib-only), this
generator REQUIRES pyarrow: the point is that the bytes come from the
reference Arrow implementation, not from any code we wrote. The Scala
side (graft.sources.ArrowIpc) must decode these exactly; its writer
output is separately cross-checked against arrow-java in the spec.

Emits into src/test/resources/fixtures/:
  golden.arrow        file (random-access) format, 3 record batches
  golden.arrows       stream format, same logical table
  golden_arrow_manifest.txt   expected rows, one per line (hash-free,
                              human-auditable like the avro manifest)
"""
import os
import datetime

import pyarrow as pa
import pyarrow.ipc as ipc

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "src", "test", "resources", "fixtures")


def utc(y, mo, d, h, mi, s, us=0):
    return datetime.datetime(y, mo, d, h, mi, s, us,
                             tzinfo=datetime.timezone.utc)


def table():
    schema = pa.schema([
        pa.field("id", pa.int64(), nullable=False),
        pa.field("small", pa.int32()),
        pa.field("name", pa.utf8()),
        pa.field("score", pa.float64()),
        pa.field("ratio", pa.float32()),
        pa.field("ok", pa.bool_()),
        pa.field("blob", pa.binary()),
        pa.field("ts", pa.timestamp("us", tz="UTC")),
        pa.field("ts_local", pa.timestamp("us")),
        pa.field("emb", pa.list_(pa.float32())),
        pa.field("tags", pa.list_(pa.int64())),
    ])
    rows = [
        (1, 10, "alpha", 1.5, 0.25, True, b"\x00\x01", utc(2020, 2, 2, 10, 0, 0),
         datetime.datetime(2020, 2, 2, 10, 0, 0), [1.0, 2.5], [7, 8, 9]),
        (2, -20, "bétaé", -2.25, -0.5, False, b"", utc(1999, 12, 31, 23, 59, 59, 999999),
         datetime.datetime(1970, 1, 1, 0, 0, 1), [], [0]),
        (3, None, None, None, None, True, None, None, None, None, None),
        (4, 40, "δ\U0001F600", 1e300, 3.5e37, False, b"\xff" * 5, utc(2026, 8, 14, 0, 0, 0),
         datetime.datetime(2026, 8, 14, 12, 30, 0), [float("inf"), -0.0], []),
        (5, 0, "", 0.0, 0.0, True, b"\x7f", utc(1970, 1, 1, 0, 0, 0),
         datetime.datetime(2000, 1, 1, 0, 0, 0), [3.25, None, -1.5], [-1]),
        (6, 66, "zeta", -0.125, 1.25, False, b"abc", utc(2010, 6, 15, 6, 30, 0),
         datetime.datetime(2010, 6, 15, 6, 30, 0), [9.0], [1, 2]),
        (7, 7, "eta", 42.0, -42.0, True, b"\x00", utc(2021, 1, 1, 1, 1, 1),
         datetime.datetime(2021, 1, 1, 1, 1, 1), [0.5, 0.75], [3]),
    ]
    cols = list(zip(*rows))
    arrays = [pa.array(c, type=f.type) for c, f in zip(cols, schema)]
    return pa.Table.from_arrays(arrays, schema=schema), rows


def uint_table():
    """uint8/16/32 + list<uint8> with boundary values and nulls — the
    physical-stride proof: these buffers hold 1/2/4-byte elements that a
    Spark-type-derived stride would misread after index 0."""
    schema = pa.schema([
        pa.field("id", pa.int64(), nullable=False),
        pa.field("u8", pa.uint8()),
        pa.field("u16", pa.uint16()),
        pa.field("u32", pa.uint32()),
        pa.field("pix", pa.list_(pa.uint8())),
    ])
    rows = [
        (1, 0, 0, 0, [0, 255, 1]),
        (2, 255, 65535, 4294967295, []),
        (3, None, None, None, None),
        (4, 128, 32768, 2147483648, [127, 128, 129]),
        (5, 1, 256, 65536, [None, 7]),
        (6, 254, 65534, 4294967294, [200]),
        (7, 42, 4242, 424242, [0]),
    ]
    cols = list(zip(*rows))
    arrays = [pa.array(c, type=f.type) for c, f in zip(cols, schema)]
    return pa.Table.from_arrays(arrays, schema=schema), rows


def fuzz_cases(fmt):
    """24 seeded random tables through pyarrow: random schema mixes of
    every supported type (uint widths, dictionaries, lists, timestamps),
    random null patterns, batch sizes and body compression. Values are
    constrained to exactly-representable numbers so the Scala compare is
    equality, not tolerance."""
    import random
    rng = random.Random(20260814)
    type_pool = [
        ("i64", pa.int64()), ("i32", pa.int32()), ("i16", pa.int16()),
        ("i8", pa.int8()), ("u8", pa.uint8()), ("u16", pa.uint16()),
        ("u32", pa.uint32()), ("f64", pa.float64()), ("f32", pa.float32()),
        ("bool", pa.bool_()), ("str", pa.utf8()), ("bin", pa.binary()),
        ("ts", pa.timestamp("us", tz="UTC")), ("tsn", pa.timestamp("us")),
        ("li64", pa.list_(pa.int64())), ("lf32", pa.list_(pa.float32())),
        ("lu8", pa.list_(pa.uint8())),
        ("dstr", pa.dictionary(pa.int8(), pa.utf8())),
        ("di32", pa.dictionary(pa.int32(), pa.int32())),
        ("date", pa.date32()), ("lgs", pa.large_utf8()),
        ("lgl", pa.large_list(pa.int64())),
        ("fsl", pa.list_(pa.float32(), 4)),
        ("dec", pa.decimal128(14, 3)),
        # round 13: uint64 (Decimal(20,0) widening), s/ms/ns timestamp
        # units, date64, struct, map
        ("u64", pa.uint64()),
        ("tss", pa.timestamp("s", tz="UTC")), ("tsms", pa.timestamp("ms")),
        ("tsns", pa.timestamp("ns", tz="UTC")), ("d64", pa.date64()),
        ("sxy", pa.struct([pa.field("x", pa.int64()),
                           pa.field("y", pa.float64())])),
        ("mkv", pa.map_(pa.utf8(), pa.int64())),
        ("dur", pa.duration("us")),
    ]
    strings = ["", "a", "héllo", "δοκιμή", "漢字テスト", "x" * 50, "tab\tnl\n"]

    class StructVal(dict):
        pass

    class MapVal(list):
        pass

    class U64Val(int):  # tokenizes as 'c' (Decimal) — may exceed int64
        pass

    def gen_val(kind):
        if kind == "i64":
            return rng.randrange(-2**62, 2**62)
        if kind == "i32":
            return rng.randrange(-2**31, 2**31)
        if kind == "i16":
            return rng.randrange(-2**15, 2**15)
        if kind == "i8":
            return rng.randrange(-128, 128)
        if kind == "u8":
            return rng.randrange(0, 256)
        if kind == "u16":
            return rng.randrange(0, 65536)
        if kind == "u32":
            return rng.randrange(0, 2**32)
        if kind == "f64":
            return rng.randrange(-10**9, 10**9) / 2.0
        if kind == "f32":
            return rng.randrange(-2**21, 2**21) / 4.0
        if kind == "bool":
            return rng.random() < 0.5
        if kind == "str":
            return rng.choice(strings)
        if kind == "bin":
            return bytes(rng.randrange(256) for _ in range(rng.randrange(6)))
        if kind in ("ts", "tsn"):
            dt = datetime.datetime(1970, 1, 1) + datetime.timedelta(
                microseconds=rng.randrange(0, 2 * 10**15))
            return dt.replace(tzinfo=datetime.timezone.utc) if kind == "ts" else dt
        if kind == "li64":
            return [rng.randrange(-2**40, 2**40) for _ in range(rng.randrange(5))]
        if kind == "lf32":
            return [None if rng.random() < 0.15 else rng.randrange(-2**20, 2**20) / 4.0
                    for _ in range(rng.randrange(5))]
        if kind == "lu8":
            return [rng.randrange(256) for _ in range(rng.randrange(5))]
        if kind == "dstr":
            return rng.choice(["red", "green", "blue", "cyan"])
        if kind == "di32":
            return rng.choice([7, 42, 9000, -3])
        if kind == "date":
            return datetime.date(1970, 1, 1) + datetime.timedelta(
                days=rng.randrange(-25000, 25000))
        if kind == "lgs":
            return rng.choice(strings)
        if kind == "lgl":
            return [rng.randrange(-2**40, 2**40) for _ in range(rng.randrange(5))]
        if kind == "fsl":
            return [rng.randrange(-2**20, 2**20) / 4.0 for _ in range(4)]
        if kind == "dec":
            import decimal
            return decimal.Decimal(rng.randrange(-10**11, 10**11)).scaleb(-3)
        if kind == "u64":
            return U64Val(rng.randrange(0, 2**64))
        if kind == "tss":
            return (datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
                    + datetime.timedelta(seconds=rng.randrange(0, 2 * 10**9)))
        if kind == "tsms":
            return (datetime.datetime(1970, 1, 1)
                    + datetime.timedelta(milliseconds=rng.randrange(0, 2 * 10**12)))
        if kind == "tsns":
            # microsecond-aligned (the reader rejects sub-us ns loudly)
            return (datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
                    + datetime.timedelta(microseconds=rng.randrange(0, 2 * 10**15)))
        if kind == "d64":
            return datetime.date(1970, 1, 1) + datetime.timedelta(
                days=rng.randrange(-25000, 25000))
        if kind == "sxy":
            return StructVal({
                "x": None if rng.random() < 0.2 else rng.randrange(-2**40, 2**40),
                "y": None if rng.random() < 0.2
                else rng.randrange(-2**30, 2**30) / 8.0})
        if kind == "mkv":
            keys = rng.sample(["a", "bb", "c", "dd", "ee"], rng.randrange(4))
            return MapVal([(k, None if rng.random() < 0.2
                            else rng.randrange(-2**40, 2**40)) for k in keys])
        if kind == "dur":
            return datetime.timedelta(
                microseconds=rng.randrange(-10**12, 10**12))
        raise AssertionError(kind)

    manifest = {}
    for case in range(24):
        picks = rng.sample(type_pool, rng.randrange(3, 7))
        fields = [pa.field("id", pa.int64(), nullable=False)] + [
            pa.field(f"c{i}_{k}", t) for i, (k, t) in enumerate(picks)]
        nrows = rng.choice([0, 1, 2] + [rng.randrange(3, 40) for _ in range(9)])
        nullp = rng.choice([0.0, 0.1, 0.4])
        rows = []
        for r in range(nrows):
            row = [r]
            for (k, t) in picks:
                row.append(None if rng.random() < nullp else gen_val(k))
            rows.append(tuple(row))
        cols = list(zip(*rows)) if rows else [[] for _ in fields]
        arrays = []
        for c, f in zip(cols, fields):
            if pa.types.is_dictionary(f.type):
                arrays.append(pa.array(list(c), f.type.value_type)
                              .dictionary_encode())
            else:
                arrays.append(pa.array(list(c), f.type))
        schema = pa.schema(fields)
        tbl = pa.Table.from_arrays(arrays, schema=schema)
        comp = rng.choice([None, "lz4", "zstd"])
        opts = ipc.IpcWriteOptions(compression=comp) if comp else None
        name = "arrowfuzz_%02d" % case
        path = os.path.join(OUT, "fuzz", name + ".arrows")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        kw = {"options": opts} if opts else {}
        with ipc.new_stream(path, schema, **kw) as w:
            bs = rng.randrange(1, 18)
            for b in tbl.to_batches(max_chunksize=bs):
                w.write_batch(b)
        import decimal as _dec

        def fmtv(v):
            if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
                return "D" + v.isoformat()
            if isinstance(v, _dec.Decimal):
                return "c" + str(v)
            if isinstance(v, U64Val):
                return "c" + str(int(v))
            if isinstance(v, StructVal):
                return "S" + ";".join(fmtv(v[k]) for k in ("x", "y"))
            if isinstance(v, MapVal):
                return "M" + ";".join(
                    "%s=%s" % (k, fmtv(x)) for k, x in sorted(v))
            if isinstance(v, datetime.timedelta):
                us = (v.days * 86400 + v.seconds) * 10**6 + v.microseconds
                return "i" + str(us)  # exact integer micros
            return fmt(v)

        manifest[name] = {
            "compression": comp or "none",
            "rows": [[fmtv(v) for v in r] for r in rows],
        }
    with open(os.path.join(OUT, "fuzz", "arrow_fuzz_manifest.json"), "w") as f:
        json.dump(manifest, f)
    print("wrote 24 arrowfuzz cases + arrow_fuzz_manifest.json")


import json


def main():
    os.makedirs(OUT, exist_ok=True)
    tbl, rows = table()
    # 3 batches: 3 + 3 + 1 rows — exercises the footer block map
    batches = tbl.to_batches(max_chunksize=3)
    assert len(batches) == 3

    with ipc.new_file(os.path.join(OUT, "golden.arrow"), tbl.schema) as w:
        for b in batches:
            w.write_batch(b)
    with ipc.new_stream(os.path.join(OUT, "golden.arrows"), tbl.schema) as w:
        for b in batches:
            w.write_batch(b)

    def fmt(v):
        if v is None:
            return "~"
        if isinstance(v, bytes):
            return "b" + v.hex()
        if isinstance(v, bool):
            return "t" if v else "u"
        if isinstance(v, list):
            return "[" + " ".join(fmt(x) for x in v) + "]"
        if isinstance(v, datetime.datetime):
            return "T" + v.strftime("%Y-%m-%dT%H:%M:%S.%f")
        if isinstance(v, float):
            return "d" + repr(v)
        if isinstance(v, str):
            return "s" + v.encode("utf-8").hex()
        return "i" + str(v)

    with open(os.path.join(OUT, "golden_arrow_manifest.txt"), "w") as f:
        for r in rows:
            f.write(";".join(fmt(v) for v in r) + "\n")

    utbl, urows = uint_table()
    ubatches = utbl.to_batches(max_chunksize=4)
    with ipc.new_file(os.path.join(OUT, "golden_uint.arrow"), utbl.schema) as w:
        for b in ubatches:
            w.write_batch(b)
    with ipc.new_stream(os.path.join(OUT, "golden_uint.arrows"), utbl.schema) as w:
        for b in ubatches:
            w.write_batch(b)
    with open(os.path.join(OUT, "golden_uint_manifest.txt"), "w") as f:
        for r in urows:
            f.write(";".join(fmt(v) for v in r) + "\n")

    # uint64 widens to Decimal(20, 0) — exact magnitude above 2^63
    u64_vals = [0, 1, 2 ** 63, 2 ** 64 - 1, None, 123456789012345678]
    u64_tbl = pa.table({
        "id": pa.array(range(1, len(u64_vals) + 1), pa.int64()),
        "u": pa.array(u64_vals, pa.uint64()),
    })
    with ipc.new_file(os.path.join(OUT, "golden_uint64.arrow"), u64_tbl.schema) as w:
        w.write_table(u64_tbl, max_chunksize=4)
    with ipc.new_stream(os.path.join(OUT, "golden_uint64.arrows"), u64_tbl.schema) as w:
        w.write_table(u64_tbl, max_chunksize=4)
    with open(os.path.join(OUT, "golden_uint64_manifest.txt"), "w") as f:
        for i, v in enumerate(u64_vals, 1):
            f.write("i%d;%s\n" % (i, "~" if v is None else "c" + str(v)))

    # LZ4_FRAME / ZSTD compressed bodies: same logical table as golden —
    # decode must agree with golden_arrow_manifest.txt
    for codec in ("lz4", "zstd"):
        opts = ipc.IpcWriteOptions(compression=codec)
        with ipc.new_file(os.path.join(OUT, f"golden_{codec}.arrow"),
                          tbl.schema, options=opts) as w:
            for b in batches:
                w.write_batch(b)
        with ipc.new_stream(os.path.join(OUT, f"golden_{codec}.arrows"),
                            tbl.schema, options=opts) as w:
            for b in batches:
                w.write_batch(b)

    # dictionary-encoded columns (pyarrow's categorical default): string
    # and int32 dictionaries, with nulls both in indices and usage
    dict_schema = pa.schema([
        pa.field("id", pa.int64(), nullable=False),
        pa.field("cat", pa.dictionary(pa.int8(), pa.utf8())),
        pa.field("code", pa.dictionary(pa.int32(), pa.int32())),
    ])
    drows = [
        (1, "apple", 100),
        (2, "banana", 200),
        (3, None, None),
        (4, "apple", 100),
        (5, "cherry", 300),
        (6, "banana", None),
        (7, "apple", 200),
    ]
    dcols = list(zip(*drows))
    darrays = [
        pa.array(dcols[0], pa.int64()),
        pa.array(dcols[1], pa.utf8()).dictionary_encode(),
        pa.array(dcols[2], pa.int32()).dictionary_encode(),
    ]
    dtbl = pa.Table.from_arrays(darrays, schema=dict_schema)
    with ipc.new_file(os.path.join(OUT, "golden_dict.arrow"), dtbl.schema) as w:
        w.write_table(dtbl)
    with ipc.new_stream(os.path.join(OUT, "golden_dict.arrows"), dtbl.schema) as w:
        w.write_table(dtbl)
    with open(os.path.join(OUT, "golden_dict_manifest.txt"), "w") as f:
        for r in drows:
            f.write(";".join(fmt(v) for v in r) + "\n")

    # extended types: date32, large offsets, fixed-size lists (the
    # numpy-embedding shape), decimal128
    import decimal
    ext_schema = pa.schema([
        pa.field("id", pa.int64(), nullable=False),
        pa.field("day", pa.date32()),
        pa.field("big_s", pa.large_utf8()),
        pa.field("big_b", pa.large_binary()),
        pa.field("big_l", pa.large_list(pa.int64())),
        pa.field("emb4", pa.list_(pa.float32(), 4)),
        pa.field("amount", pa.decimal128(12, 3)),
    ])
    D = decimal.Decimal
    ext_rows = [
        (1, datetime.date(2020, 2, 2), "alpha", b"\x00\x01", [1, 2, 3],
         [1.0, -2.5, 0.25, 8.0], D("123.456")),
        (2, datetime.date(1969, 12, 31), "δοκιμή", b"", [],
         [0.0, 0.0, 0.0, 0.0], D("-0.001")),
        (3, None, None, None, None, None, None),
        (4, datetime.date(1970, 1, 1), "x" * 40, b"\xff" * 3, [-(2**40)],
         [3.5, None, -1.25, 2.0], D("999999999.999")),
        (5, datetime.date(2038, 1, 19), "", b"\x7f", [7, 8],
         [-0.5, 0.75, 1.5, -3.0], D("0.000")),
    ]
    ext_cols = list(zip(*ext_rows))
    ext_arrays = [pa.array(c, type=f.type) for c, f in zip(ext_cols, ext_schema)]
    ext_tbl = pa.Table.from_arrays(ext_arrays, schema=ext_schema)
    with ipc.new_file(os.path.join(OUT, "golden_ext.arrow"), ext_schema) as w:
        w.write_table(ext_tbl, max_chunksize=2)
    with ipc.new_stream(os.path.join(OUT, "golden_ext.arrows"), ext_schema) as w:
        w.write_table(ext_tbl, max_chunksize=2)

    def fmt_ext(v):
        if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
            return "D" + v.isoformat()
        if isinstance(v, decimal.Decimal):
            return "c" + str(v)
        return fmt(v)

    with open(os.path.join(OUT, "golden_ext_manifest.txt"), "w") as f:
        for r in ext_rows:
            f.write(";".join(fmt_ext(v) for v in r) + "\n")

    # ---- struct columns (nested records: the HuggingFace-features
    # shape) — nulls at struct AND child level, nested struct,
    # struct<list<...>>, list<struct<...>> ----
    struct_schema = pa.schema([
        pa.field("id", pa.int64(), nullable=False),
        pa.field("info", pa.struct([
            pa.field("name", pa.utf8()),
            pa.field("score", pa.float64()),
            pa.field("n", pa.int32()),
        ])),
        pa.field("nested", pa.struct([
            pa.field("a", pa.struct([pa.field("x", pa.int64())])),
            pa.field("tags", pa.list_(pa.int64())),
        ])),
        pa.field("points", pa.list_(pa.struct([
            pa.field("x", pa.float64()),
            pa.field("y", pa.float64()),
        ]))),
    ])
    struct_rows = [
        (1, {"name": "alpha", "score": 1.5, "n": 10},
         {"a": {"x": 7}, "tags": [1, 2]}, [{"x": 0.5, "y": -1.0}]),
        (2, None, {"a": None, "tags": []}, []),
        (3, {"name": None, "score": None, "n": 3}, None, None),
        (4, {"name": "δ", "score": -2.25, "n": None},
         {"a": {"x": -1}, "tags": None}, [{"x": None, "y": 2.0}, None]),
        (5, {"name": "", "score": 0.0, "n": 0}, {"a": {"x": 0}, "tags": [0]},
         [{"x": 1.25, "y": 2.5}, {"x": -0.5, "y": 3.5}]),
    ]
    s_cols = list(zip(*struct_rows))
    s_arrays = [pa.array(c, type=f.type) for c, f in zip(s_cols, struct_schema)]
    s_tbl = pa.Table.from_arrays(s_arrays, schema=struct_schema)
    with ipc.new_file(os.path.join(OUT, "golden_struct.arrow"), struct_schema) as w:
        w.write_table(s_tbl, max_chunksize=2)
    with ipc.new_stream(os.path.join(OUT, "golden_struct.arrows"), struct_schema) as w:
        w.write_table(s_tbl, max_chunksize=2)
    # expected values are pinned as literals in ArrowIpcSpec (nested
    # manifests would need a nesting-aware parser for no extra proof)

    # ---- delta dictionaries: a stream whose second batch EXTENDS the
    # dictionary (pyarrow emits a delta batch carrying only the new
    # values, indexed past the base length) ----
    d_schema = pa.schema([
        pa.field("id", pa.int64(), nullable=False),
        pa.field("cat", pa.dictionary(pa.int32(), pa.utf8())),
    ])
    db1 = pa.record_batch([
        pa.array([1, 2, 3], pa.int64()),
        pa.DictionaryArray.from_arrays(pa.array([0, 1, 0], pa.int32()),
                                       pa.array(["apple", "banana"])),
    ], schema=d_schema)
    db2 = pa.record_batch([
        pa.array([4, 5, 6], pa.int64()),
        pa.DictionaryArray.from_arrays(pa.array([2, 3, 1], pa.int32()),
                                       pa.array(["apple", "banana",
                                                 "cherry", "date"])),
    ], schema=d_schema)
    dd_opts = ipc.IpcWriteOptions(emit_dictionary_deltas=True)
    dd_path = os.path.join(OUT, "golden_deltadict.arrows")
    with ipc.new_stream(dd_path, d_schema, options=dd_opts) as w:
        w.write_batch(db1)
        w.write_batch(db2)
    got = ipc.open_stream(dd_path).read_all()
    assert got.column("cat").to_pylist() == ["apple", "banana", "apple",
                                             "cherry", "date", "banana"]

    # ---- map columns + non-micros timestamp units + date64 ----
    # the pandas/HF shapes: map<utf8, int64>, timestamp[s|ms|ns],
    # date64[ms]. ns values are all microsecond-aligned here (Spark
    # timestamps are micros; a sub-us value must reject — see the
    # bad fixture below)
    map_schema = pa.schema([
        pa.field("id", pa.int64(), nullable=False),
        pa.field("attrs", pa.map_(pa.utf8(), pa.int64())),
        pa.field("ts_s", pa.timestamp("s", tz="UTC")),
        pa.field("ts_ms", pa.timestamp("ms")),
        pa.field("ts_ns", pa.timestamp("ns", tz="UTC")),
        pa.field("day64", pa.date64()),
    ])
    map_rows = [
        (1, [("len", 10), ("w", 3)], utc(2020, 2, 2, 10, 0, 0),
         datetime.datetime(2020, 2, 2, 10, 0, 0, 123000),
         utc(2020, 2, 2, 10, 0, 0, 123456), datetime.date(2020, 2, 2)),
        (2, [], utc(1970, 1, 1, 0, 0, 0),
         datetime.datetime(1970, 1, 1, 0, 0, 1),
         utc(1969, 12, 31, 23, 59, 59), datetime.date(1969, 12, 31)),
        (3, None, None, None, None, None),
        (4, [("a", -1), ("b", None), ("c", 7)], utc(2038, 1, 19, 3, 14, 7),
         datetime.datetime(2038, 1, 19, 3, 14, 7, 999000),
         utc(2038, 1, 19, 3, 14, 7, 999999), datetime.date(2038, 1, 19)),
    ]
    m_cols = list(zip(*map_rows))
    m_arrays = [pa.array(c, type=f.type) for c, f in zip(m_cols, map_schema)]
    m_tbl = pa.Table.from_arrays(m_arrays, schema=map_schema)
    with ipc.new_file(os.path.join(OUT, "golden_map.arrow"), map_schema) as w:
        w.write_table(m_tbl, max_chunksize=2)
    with ipc.new_stream(os.path.join(OUT, "golden_map.arrows"), map_schema) as w:
        w.write_table(m_tbl, max_chunksize=2)

    # sub-microsecond ns value -> the Scala reader must reject loudly
    bad_ns = pa.table({"t": pa.array([1500], pa.timestamp("ns"))})
    with ipc.new_stream(os.path.join(OUT, "bad_ns.arrows"), bad_ns.schema) as w:
        w.write_table(bad_ns)

    # ---- NESTED layout markers: map/list CHILDREN carrying physical
    # units/widths the Spark-facing type can't express (ts[ns], uint8,
    # date64, large_utf8). A reader that rebuilds the child fields with
    # empty metadata decodes ts[ns] values 1000x off and strides uint8
    # keys wrong — these pin the hoisted child-metadata path.
    nm_schema = pa.schema([
        pa.field("id", pa.int64(), nullable=False),
        pa.field("mts", pa.map_(pa.utf8(), pa.timestamp("ns", tz="UTC"))),
        pa.field("mu8", pa.map_(pa.uint8(), pa.int64())),
        pa.field("mdate", pa.map_(pa.utf8(), pa.date64())),
        pa.field("lts", pa.list_(pa.timestamp("ns", tz="UTC"))),
        pa.field("llu", pa.list_(pa.large_utf8())),
        pa.field("ld64", pa.list_(pa.date64())),
        # list<map>: the map's hoisted keys ride inside the ITEM metadata
        pa.field("lm", pa.list_(pa.map_(pa.utf8(), pa.int64()))),
    ])
    nm_rows = [
        (1,
         [("a", utc(2020, 2, 2, 10, 0, 0, 123456)),
          ("b", utc(1970, 1, 1, 0, 0, 1))],
         [(7, 70), (255, -1)],
         [("d", datetime.date(2020, 2, 2))],
         [utc(2020, 2, 2, 10, 0, 0, 123456), None],
         ["alpha", "beta-beta"],
         [datetime.date(1969, 12, 31), datetime.date(2038, 1, 19)],
         [[("k", 1)], [], [("m", -2), ("n", 3)]]),
        (2, [], [(0, 0)], [], [], [], [], []),
        (3, None, None, None, None, None, None, None),
    ]
    nm_cols = list(zip(*nm_rows))
    nm_arrays = [pa.array(c, type=f.type) for c, f in zip(nm_cols, nm_schema)]
    nm_tbl = pa.Table.from_arrays(nm_arrays, schema=nm_schema)
    with ipc.new_file(os.path.join(OUT, "golden_nestmark.arrow"), nm_schema) as w:
        w.write_table(nm_tbl, max_chunksize=2)
    with ipc.new_stream(os.path.join(OUT, "golden_nestmark.arrows"), nm_schema) as w:
        w.write_table(nm_tbl, max_chunksize=2)

    # ---- durations (pandas timedelta64) + time-of-day columns ----
    td = datetime.timedelta
    tm = datetime.time
    dur_schema = pa.schema([
        pa.field("id", pa.int64(), nullable=False),
        pa.field("d_us", pa.duration("us")),
        pa.field("d_ms", pa.duration("ms")),
        pa.field("d_ns", pa.duration("ns")),
        pa.field("t32s", pa.time32("s")),
        pa.field("t32ms", pa.time32("ms")),
        pa.field("t64us", pa.time64("us")),
        pa.field("t64ns", pa.time64("ns")),
    ])
    dur_rows = [
        (1, td(days=1, seconds=2, microseconds=3), td(milliseconds=-1500),
         td(microseconds=42), tm(0, 0, 0), tm(10, 30, 0, 500000),
         tm(23, 59, 59, 999999), tm(12, 0, 0, 123456)),
        (2, td(microseconds=-1), td(0), td(days=-2),
         tm(23, 59, 59), tm(0, 0, 0, 1000), tm(0, 0, 0, 1), tm(6, 30)),
        (3, None, None, None, None, None, None, None),
    ]
    d_cols = list(zip(*dur_rows))
    d_arrays = [pa.array(c, type=f.type) for c, f in zip(d_cols, dur_schema)]
    d_tbl = pa.Table.from_arrays(d_arrays, schema=dur_schema)
    with ipc.new_file(os.path.join(OUT, "golden_timedur.arrow"), dur_schema) as w:
        w.write_table(d_tbl, max_chunksize=2)
    with ipc.new_stream(os.path.join(OUT, "golden_timedur.arrows"), dur_schema) as w:
        w.write_table(d_tbl, max_chunksize=2)

    # sub-microsecond time64[ns] -> loud reject
    bad_tns = pa.table({"t": pa.array([1500], pa.time64("ns"))})
    with ipc.new_stream(os.path.join(OUT, "bad_time_ns.arrows"), bad_tns.schema) as w:
        w.write_table(bad_tns)

    # union columns are out of scope -> must reject loudly by tag
    u_arr = pa.UnionArray.from_dense(
        pa.array([0, 1, 0], pa.int8()),
        pa.array([0, 0, 1], pa.int32()),
        [pa.array([1, 2], pa.int64()), pa.array(["x"], pa.utf8())])
    u_tbl = pa.table({"u": u_arr})
    with ipc.new_stream(os.path.join(OUT, "bad_union.arrows"), u_tbl.schema) as w:
        w.write_table(u_tbl)

    # ---- block-LINKED LZ4 frames: pyarrow zero-inits the lz4frame
    # preferences, so compressed IPC bodies over 64KB carry linked
    # blocks whose match offsets cross block boundaries ----
    def lz4_frame_layout(buf):
        """Walk one LZ4 frame at buf[0:]: (block_independent, nblocks)."""
        assert buf[:4] == b"\x04\x22\x4d\x18", "not an LZ4 frame"
        flg = buf[4]
        indep = (flg & 0x20) != 0
        has_cs = (flg & 0x08) != 0
        has_bc = (flg & 0x10) != 0
        pos = 6 + (8 if has_cs else 0) + 1  # magic+FLG+BD [+content] +HC
        n = 0
        while True:
            raw = int.from_bytes(buf[pos:pos + 4], "little")
            pos += 4
            if raw == 0:
                return indep, n
            pos += (raw & 0x7FFFFFFF) + (4 if has_bc else 0)
            n += 1

    big_rows = ["%06d:" % i + "the-quick-brown-fox-jumps-over-the-lazy-dog|" * 3
                for i in range(4000)]
    big_tbl = pa.table({
        "id": pa.array(range(4000), pa.int64()),
        "txt": pa.array(big_rows, pa.utf8()),
    })
    lk_opts = ipc.IpcWriteOptions(compression="lz4")
    for ext in ("arrow", "arrows"):
        p = os.path.join(OUT, "golden_lz4_linked." + ext)
        ctor = ipc.new_file if ext == "arrow" else ipc.new_stream
        with ctor(p, big_tbl.schema, options=lk_opts) as w:
            w.write_table(big_tbl)  # one batch: the txt buffer is ~570KB
        raw = open(p, "rb").read()
        # the biggest embedded frame must be LINKED and multi-block
        layouts = []
        at = raw.find(b"\x04\x22\x4d\x18")
        while at != -1:
            try:
                layouts.append(lz4_frame_layout(raw[at:]))
            except Exception:
                pass
            at = raw.find(b"\x04\x22\x4d\x18", at + 1)
        assert any((not ind) and n > 1 for ind, n in layouts), \
            ("no linked multi-block frame in " + p + ": " + repr(layouts))

    # a bare linked multi-block frame for Lz4Spec (content regenerated
    # by the same formula on the Scala side)
    bare = b"".join(b"block%06d-the-quick-brown-fox|" % i for i in range(12000))
    frame = pa.Codec("lz4").compress(bare, asbytes=True)
    ind, n = lz4_frame_layout(frame)
    assert not ind and n > 1, ("bare frame not linked multi-block: "
                               + repr((ind, n)))
    with open(os.path.join(OUT, "lz4_linked.frame"), "wb") as f:
        f.write(frame)

    fuzz_cases(fmt)
    print("wrote golden.arrow / golden.arrows / golden_arrow_manifest.txt"
          " / golden_uint.{arrow,arrows} / golden_uint64.{arrow,arrows}"
          " / golden_struct.{arrow,arrows} / golden_deltadict.arrows"
          " / golden_lz4_linked.{arrow,arrows} / lz4_linked.frame")


if __name__ == "__main__":
    main()
