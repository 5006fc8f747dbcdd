#!/usr/bin/env python3
"""Independent golden-fixture writers (Python stdlib ONLY).

Purpose: the repo's binary codecs (HDF5, HDF4, netCDF3, zarr, WARC, WAV,
ONNX) were previously proven by round-trips against the repo's own Scala
writers — a shared reader/writer bug survives that (it happened once:
both sides of the HDF5 v4 layout agreed on a wrong rank+1 dims read).
No foreign library (h5py/pyhdf/zarr/onnxruntime) exists in this
container and there is no network egress, so true third-party fixtures
cannot be produced here. This script is the closest independent check
available: a SECOND implementation of each format's WRITE path, in a
different language, written directly from the public specs —
  - HDF5 File Format Specification (HDF Group)
  - HDF 4.x Specification (DD list + DFSD tags)
  - NetCDF Classic Format spec (CDF-1)
  - zarr v2 storage spec
  - ISO 28500 (WARC/1.0)
  - RIFF/WAVE (PCM)
  - ONNX IR + protobuf wire format (onnx.ai / protobuf.dev)
sharing zero code or constants tables with src/main/scala. A bug must
now be made twice, independently, in two languages, to slip through.

Output: src/test/resources/fixtures/* (asserted exactly by
ForeignFixturesSpec) and src/main/resources/graft/fixtures/
pool_encoder.onnx (executed by the q127 oracle query).

Deterministic: running it twice produces byte-identical files.
"""
import gzip
import io
import itertools
import json
import os
import random
import struct
import zlib

HERE = os.path.dirname(os.path.abspath(__file__))
TEST_FIX = os.path.join(HERE, "..", "src", "test", "resources", "fixtures")
MAIN_FIX = os.path.join(HERE, "..", "src", "main", "resources", "graft", "fixtures")

# ---------------------------------------------------------------------------
# protobuf wire-format encoder (spec: protobuf.dev/programming-guides/encoding)
# ---------------------------------------------------------------------------

def _varint(v):
    out = bytearray()
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)

def _tag(field, wire):
    return _varint((field << 3) | wire)

def pb_varint(field, v):
    return _tag(field, 0) + _varint(v)

def pb_bytes(field, b):
    return _tag(field, 2) + _varint(len(b)) + b

def pb_str(field, s):
    return pb_bytes(field, s.encode("utf-8"))

def pb_msg(field, body):
    return pb_bytes(field, body)

# ONNX schema field numbers (onnx/onnx.proto3)
def onnx_tensor(name, dims, dtype, raw):
    body = b"".join(pb_varint(1, d) for d in dims)
    body += pb_varint(2, dtype)
    body += pb_str(8, name)
    body += pb_bytes(9, raw)
    return body

def f32s(vals):
    return struct.pack("<%df" % len(vals), *vals)

def i64s(vals):
    return struct.pack("<%dq" % len(vals), *vals)

def onnx_attr_i(name, v):
    return pb_str(1, name) + pb_varint(3, v) + pb_varint(20, 2)  # type=INT

def onnx_attr_t(name, tensor_body):
    return pb_str(1, name) + pb_msg(5, tensor_body) + pb_varint(20, 4)  # TENSOR

def onnx_node(op, inputs, outputs, attrs=()):
    body = b"".join(pb_str(1, i) for i in inputs)
    body += b"".join(pb_str(2, o) for o in outputs)
    body += pb_str(4, op)
    body += b"".join(pb_msg(5, a) for a in attrs)
    return body

def onnx_value_info(name):
    return pb_str(1, name)

def onnx_attr_f(name, v):
    return pb_str(1, name) + _tag(2, 5) + struct.pack("<f", v) + pb_varint(20, 1)

def write_mini_encoder(path):
    """MiniLM-shaped one-block encoder, the full real-export graph: token
    Gather + position-embedding Add, single-head attention with the
    ADDITIVE mask bias ((1-mask)*-10000 broadcast into the scores),
    max-subtracted Softmax, residual, LayerNormalization, masked mean
    pooling. V=32, H=8, S=6. All weights exact eighths; verified against
    an independent loop reference in OnnxMiniEncoderSpec."""
    V, H, S = 32, 8, 6
    emb = [((t * 31 + h * 7) % 13 - 6) / 8.0 for t in range(V) for h in range(H)]
    pos = [((s * 11 + h * 3) % 9 - 4) / 8.0 for s in range(S) for h in range(H)]
    wq = [((i * 3 + j * 5) % 11 - 5) / 8.0 for i in range(H) for j in range(H)]
    wk = [((i * 5 + j * 3) % 13 - 6) / 8.0 for i in range(H) for j in range(H)]
    wv = [((i * 7 + j * 2) % 7 - 3) / 8.0 for i in range(H) for j in range(H)]
    wo = [((i * 2 + j * 7) % 9 - 4) / 8.0 for i in range(H) for j in range(H)]
    gamma = [((h % 3) + 1) / 4.0 for h in range(H)]
    beta = [((h % 5) - 2) / 8.0 for h in range(H)]
    inits = [
        onnx_tensor("emb_table", [V, H], 1, f32s(emb)),
        onnx_tensor("pos_table", [S, H], 1, f32s(pos)),
        onnx_tensor("wq", [H, H], 1, f32s(wq)),
        onnx_tensor("wk", [H, H], 1, f32s(wk)),
        onnx_tensor("wv", [H, H], 1, f32s(wv)),
        onnx_tensor("wo", [H, H], 1, f32s(wo)),
        onnx_tensor("ln_g", [H], 1, f32s(gamma)),
        onnx_tensor("ln_b", [H], 1, f32s(beta)),
        onnx_tensor("one_f", [], 1, f32s([1.0])),
        onnx_tensor("negbig", [], 1, f32s([-10000.0])),
        onnx_tensor("scale", [], 1, f32s([0.25])),
        onnx_tensor("zero_f", [], 1, f32s([0.0])),
        onnx_tensor("axes_u1", [1], 7, i64s([1])),
        onnx_tensor("axes_u2", [1], 7, i64s([2])),
        onnx_tensor("expand_shape", [3], 7, i64s([1, S, H])),
        onnx_tensor("axes_seq", [1], 7, i64s([1])),
    ]
    nodes = [
        onnx_node("Gather", ["emb_table", "input_ids"], ["te"],
                  [onnx_attr_i("axis", 0)]),
        onnx_node("Add", ["te", "pos_table"], ["x0"]),        # [B,S,H]+[S,H]
        onnx_node("MatMul", ["x0", "wq"], ["q"]),
        onnx_node("MatMul", ["x0", "wk"], ["k"]),
        onnx_node("MatMul", ["x0", "wv"], ["v"]),
        onnx_node("Transpose", ["k"], ["kt"],
                  [pb_str(1, "perm") + pb_varint(8, 0) + pb_varint(8, 2)
                   + pb_varint(8, 1) + pb_varint(20, 7)]),
        onnx_node("MatMul", ["q", "kt"], ["qk"]),             # [B,S,S]
        onnx_node("Mul", ["qk", "scale"], ["sc"]),
        onnx_node("Cast", ["attention_mask"], ["mask_f"], [onnx_attr_i("to", 1)]),
        onnx_node("Sub", ["one_f", "mask_f"], ["inv"]),
        onnx_node("Mul", ["inv", "negbig"], ["bias2"]),       # [B,S]
        onnx_node("Unsqueeze", ["bias2", "axes_u1"], ["bias3"]),  # [B,1,S]
        onnx_node("Add", ["sc", "bias3"], ["scb"]),
        onnx_node("Softmax", ["scb"], ["att"], [onnx_attr_i("axis", -1)]),
        onnx_node("MatMul", ["att", "v"], ["ctx"]),
        onnx_node("MatMul", ["ctx", "wo"], ["proj"]),
        onnx_node("Add", ["x0", "proj"], ["res"]),
        onnx_node("LayerNormalization", ["res", "ln_g", "ln_b"], ["ln"],
                  [onnx_attr_i("axis", -1), onnx_attr_f("epsilon", 0.25)]),
        # masked mean pooling (the sentence-transformers head)
        onnx_node("Unsqueeze", ["mask_f", "axes_u2"], ["mask_u"]),
        onnx_node("Expand", ["mask_u", "expand_shape"], ["mask_e"]),
        onnx_node("Equal", ["mask_e", "zero_f"], ["is_pad"]),
        onnx_node("Where", ["is_pad", "zero_f", "ln"], ["masked"]),
        onnx_node("ReduceSum", ["masked", "axes_seq"], ["summed"],
                  [onnx_attr_i("keepdims", 0)]),
        onnx_node("ReduceSum", ["mask_f", "axes_seq"], ["cnt"],
                  [onnx_attr_i("keepdims", 1)]),
        onnx_node("Div", ["summed", "cnt"], ["out"]),
    ]
    graph = b"".join(pb_msg(1, n) for n in nodes)
    graph += pb_str(2, "mini_encoder")
    graph += b"".join(pb_msg(5, t) for t in inits)
    graph += pb_msg(11, onnx_value_info("input_ids"))
    graph += pb_msg(11, onnx_value_info("attention_mask"))
    graph += pb_msg(12, onnx_value_info("out"))
    model = pb_varint(1, 8)
    model += pb_msg(8, pb_str(1, "") + pb_varint(2, 17))      # opset 17 (LN)
    model += pb_msg(7, graph)
    with open(path, "wb") as f:
        f.write(model)

def write_onnx(path):
    """Masked-mean-pooling encoder head: the exact op surface a real HF
    sentence-transformer export carries around its attention blocks —
    int64 input_ids + attention_mask, Gather token-embedding lookup,
    Cast/Unsqueeze/Expand/Equal/Where mask plumbing, ReduceSum pooling,
    Div, Slice. V=64 tokens, H=16 hidden, S=8 positions, output [B,8].

    emb[t][h] = ((t*31 + h*7) % 13 - 6) / 8.0  (exact eighths: every
    engine computes them bit-identically in f32 or f64)."""
    V, H, S = 64, 16, 8
    emb = [((t * 31 + h * 7) % 13 - 6) / 8.0 for t in range(V) for h in range(H)]
    inits = [
        onnx_tensor("emb_table", [V, H], 1, f32s(emb)),
        onnx_tensor("axes_u", [1], 7, i64s([2])),        # Unsqueeze axes
        onnx_tensor("expand_shape", [3], 7, i64s([1, S, H])),
        onnx_tensor("axes_seq", [1], 7, i64s([1])),      # ReduceSum over S
        onnx_tensor("sl_starts", [1], 7, i64s([0])),
        onnx_tensor("sl_ends", [1], 7, i64s([8])),
        onnx_tensor("sl_axes", [1], 7, i64s([1])),
    ]
    zero_scalar = onnx_tensor("zero_val", [], 1, f32s([0.0]))
    nodes = [
        onnx_node("Constant", [], ["zero_c"], [onnx_attr_t("value", zero_scalar)]),
        onnx_node("Gather", ["emb_table", "input_ids"], ["emb"],
                  [onnx_attr_i("axis", 0)]),
        onnx_node("Cast", ["attention_mask"], ["mask_f"], [onnx_attr_i("to", 1)]),
        onnx_node("Unsqueeze", ["mask_f", "axes_u"], ["mask_u"]),
        onnx_node("Expand", ["mask_u", "expand_shape"], ["mask_e"]),
        onnx_node("Equal", ["mask_e", "zero_c"], ["is_pad"]),
        onnx_node("Where", ["is_pad", "zero_c", "emb"], ["masked"]),
        onnx_node("ReduceSum", ["masked", "axes_seq"], ["summed"],
                  [onnx_attr_i("keepdims", 0)]),
        onnx_node("ReduceSum", ["mask_f", "axes_seq"], ["cnt"],
                  [onnx_attr_i("keepdims", 1)]),
        onnx_node("Div", ["summed", "cnt"], ["pooled"]),
        onnx_node("Slice", ["pooled", "sl_starts", "sl_ends", "sl_axes"], ["out"]),
    ]
    graph = b"".join(pb_msg(1, n) for n in nodes)
    graph += pb_str(2, "pool_encoder")
    graph += b"".join(pb_msg(5, t) for t in inits)
    graph += pb_msg(11, onnx_value_info("input_ids"))
    graph += pb_msg(11, onnx_value_info("attention_mask"))
    graph += pb_msg(12, onnx_value_info("out"))
    model = pb_varint(1, 8)                                   # ir_version
    model += pb_msg(8, pb_str(1, "") + pb_varint(2, 13))      # opset 13
    model += pb_msg(7, graph)
    with open(path, "wb") as f:
        f.write(model)

def onnx_tensor_external(name, dims, dtype, location, offset, length):
    """TensorProto whose payload lives in a sibling file: external_data
    entries (field 13, StringStringEntryProto) + data_location=EXTERNAL
    (field 14) — how exporters ship checkpoints past protobuf's 2 GB
    limit (onnx/onnx.proto3)."""
    body = b"".join(pb_varint(1, d) for d in dims)
    body += pb_varint(2, dtype)
    body += pb_str(8, name)
    body += pb_msg(13, pb_str(1, "location") + pb_str(2, location))
    body += pb_msg(13, pb_str(1, "offset") + pb_str(2, str(offset)))
    body += pb_msg(13, pb_str(1, "length") + pb_str(2, str(length)))
    body += pb_varint(14, 1)
    return body

def f16s(vals):
    return struct.pack("<%de" % len(vals), *vals)

def write_ext_fp16(model_path, data_path, expect_path):
    """Tiny head with BOTH external-data initializers and an fp16 weight:
    w [4,4] float16 and b [4] float32 live in pool_weights.bin (w at a
    nonzero offset, so offset/length handling is exercised), the graph is
    Cast(w)->MatMul->Add->Cast(fp16)->Cast(f32), and the expected outputs
    for a fixed input batch are computed HERE with Python's binary16
    round-trip (struct '<e', round-to-nearest-even) — fully independent
    of the Scala half-precision code under test."""
    H, B = 4, 3
    # deliberately NOT fp16-exact: quantization must matter
    w_raw = [0.1 * ((i * 5 + j * 3) % 13) - 0.6 for i in range(H) for j in range(H)]
    w_bytes = f16s(w_raw)
    w = [struct.unpack("<e", w_bytes[2 * k:2 * k + 2])[0] for k in range(H * H)]
    bias = [0.25 * k - 0.5 for k in range(H)]  # exact quarters (f32-exact)
    # external blob: bias f32 at offset 0 (16 bytes), w fp16 at offset 16
    blob = f32s(bias) + w_bytes
    with open(data_path, "wb") as f:
        f.write(blob)
    inits = [
        onnx_tensor_external("w", [H, H], 10, "pool_weights.bin", 16, len(w_bytes)),
        onnx_tensor_external("b", [H], 1, "pool_weights.bin", 0, 16),
    ]
    nodes = [
        onnx_node("Cast", ["w"], ["wf"], [onnx_attr_i("to", 1)]),
        onnx_node("MatMul", ["x", "wf"], ["y"]),
        onnx_node("Add", ["y", "b"], ["z"]),
        onnx_node("Cast", ["z"], ["zh"], [onnx_attr_i("to", 10)]),
        onnx_node("Cast", ["zh"], ["out"], [onnx_attr_i("to", 1)]),
    ]
    graph = b"".join(pb_msg(1, n) for n in nodes)
    graph += pb_str(2, "ext_fp16_head")
    graph += b"".join(pb_msg(5, t) for t in inits)
    graph += pb_msg(11, onnx_value_info("x"))
    graph += pb_msg(12, onnx_value_info("out"))
    model = pb_varint(1, 8)
    model += pb_msg(8, pb_str(1, "") + pb_varint(2, 13))
    model += pb_msg(7, graph)
    with open(model_path, "wb") as f:
        f.write(model)
    # expected outputs for the fixed input x[b][k] = ((b*4+k)*3 % 9 - 4)/8
    x = [((b * H + k) * 3 % 9 - 4) / 8.0 for b in range(B) for k in range(H)]
    expected = []
    for bi in range(B):
        for j in range(H):
            acc = 0.0
            for k in range(H):
                acc += x[bi * H + k] * w[k * H + j]
            z = acc + bias[j]
            expected.append(struct.unpack("<e", struct.pack("<e", z))[0])
    with open(expect_path, "w") as f:
        json.dump({"dims": [B, H], "x": x, "expected": expected}, f)

# ---------------------------------------------------------------------------
# HDF5 v0 generation (superblock v0, v1 object headers, symbol-table group)
# spec: HDF5 File Format Specification III.A / IV.A
# ---------------------------------------------------------------------------

UNDEF = 0xFFFFFFFFFFFFFFFF

def h5_msg(mtype, body):
    """v1 header message: type(2) size(2) flags(1) reserved(3), body
    padded to a multiple of 8."""
    pad = (-len(body)) % 8
    body = body + b"\0" * pad
    return struct.pack("<HHB3x", mtype, len(body), 0) + body

def h5_object_header(msgs):
    blob = b"".join(msgs)
    # version(1) reserved(1) nmsgs(2) refcount(4) header-size(4) pad(4)
    return struct.pack("<BBHII4x", 1, 0, len(msgs), 1, len(blob)) + blob

def h5_dataspace(dims):
    # v1: version(1) dimensionality(1) flags(1) reserved(5), then dims
    body = struct.pack("<BBB5x", 1, len(dims), 0)
    body += b"".join(struct.pack("<Q", d) for d in dims)
    return h5_msg(0x0001, body)

def h5_datatype_float(size):
    # class 1 (float), version 1; LE IEEE properties per spec table
    if size == 8:
        props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
        sign = 63
    else:
        props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
        sign = 31
    body = struct.pack("<BBBBI", 0x11, 0x20, sign, 0, size) + props
    return h5_msg(0x0003, body)

def h5_layout_contiguous(addr, nbytes):
    return h5_msg(0x0008, struct.pack("<BBQQ", 3, 1, addr, nbytes))

def h5_layout_chunked(btree_addr, chunk_dims, elem_size):
    body = struct.pack("<BBB", 3, 2, len(chunk_dims) + 1)
    body += struct.pack("<Q", btree_addr)
    body += b"".join(struct.pack("<I", c) for c in chunk_dims)
    body += struct.pack("<I", elem_size)
    return h5_msg(0x0008, body)

def h5_filter_deflate(level):
    # pipeline v1: version(1) nfilters(1) reserved(2+4); filter record:
    # id(2) namelen(2) flags(2) nvals(2) values, padded to 8 when odd
    rec = struct.pack("<HHHH", 1, 0, 1, 1) + struct.pack("<I", level) + b"\0" * 4
    return h5_msg(0x000B, struct.pack("<BB2x4x", 1, 1) + rec)

def h5_filter_shuffle_deflate(esize, level):
    # write-order pipeline: shuffle (id 2, value = element size) THEN
    # deflate (id 1) — the nc_def_var_deflate(shuffle=1) shape
    shuf = struct.pack("<HHHH", 2, 0, 1, 1) + struct.pack("<I", esize) + b"\0" * 4
    defl = struct.pack("<HHHH", 1, 0, 1, 1) + struct.pack("<I", level) + b"\0" * 4
    return h5_msg(0x000B, struct.pack("<BB2x4x", 1, 2) + shuf + defl)

def byte_shuffle(raw, esize):
    # trailing bytes past the last whole element copy straight (libhdf5
    # H5Zshuffle "leftover" rule — a fletcher32 checksum appended before
    # shuffle in the pipeline rides through unshuffled)
    n = len(raw) // esize
    out = bytearray(len(raw))
    for i in range(n):
        for j in range(esize):
            out[j * n + i] = raw[i * esize + j]
    out[n * esize:] = raw[n * esize:]
    return bytes(out)

def fletcher32(data):
    """HDF5's fletcher32 (H5Zfletcher32 filter id 3): big-endian 16-bit
    words, accumulators folded every 360 words, odd tail byte as the
    high byte of a final word. The filter appends the uint32 LE."""
    s1 = s2 = 0
    i = 0
    words = len(data) // 2
    while words:
        t = min(words, 360)
        words -= t
        for _ in range(t):
            s1 += (data[i] << 8) | data[i + 1]
            s2 += s1
            i += 2
        s1 = (s1 & 0xFFFF) + (s1 >> 16)
        s2 = (s2 & 0xFFFF) + (s2 >> 16)
    if len(data) % 2:
        s1 += data[i] << 8
        s2 += s1
        s1 = (s1 & 0xFFFF) + (s1 >> 16)
        s2 = (s2 & 0xFFFF) + (s2 >> 16)
    s1 = (s1 & 0xFFFF) + (s1 >> 16)
    s2 = (s2 & 0xFFFF) + (s2 >> 16)
    return ((s2 << 16) | s1) & 0xFFFFFFFF

def h5_filter_fletcher_shuffle_deflate(esize, level):
    # the nc_def_var_fletcher32 + nc_def_var_deflate(shuffle=1) write
    # pipeline: fletcher32 (id 3, no client data) THEN shuffle THEN
    # deflate; fletcher has 0 values -> no odd-count pad needed
    flet = struct.pack("<HHHH", 3, 0, 1, 0)
    shuf = struct.pack("<HHHH", 2, 0, 1, 1) + struct.pack("<I", esize) + b"\0" * 4
    defl = struct.pack("<HHHH", 1, 0, 1, 1) + struct.pack("<I", level) + b"\0" * 4
    return h5_msg(0x000B, struct.pack("<BB2x4x", 1, 3) + flet + shuf + defl)

def h5_filter_fletcher_only():
    flet = struct.pack("<HHHH", 3, 0, 1, 0)
    return h5_msg(0x000B, struct.pack("<BB2x4x", 1, 1) + flet)

def write_hdf5(path, sb_version=0):
    """Two datasets under a symbol-table root group (the h5py default-
    properties shape): 'temp' contiguous f64 [2,3,4] with value
    i*0.25, and 'series' chunked (4)+deflate f32 [10] with value k*1.5.
    sb_version=1 writes the 1.4-era superblock (4 extra bytes for the
    indexed-storage B-tree K), identical content otherwise."""
    sb_len = 96 if sb_version == 0 else 100
    buf = bytearray(b"\0" * sb_len)  # superblock placeholder, filled last

    def alloc(blob):
        off = len(buf)
        buf.extend(blob)
        return off

    # --- 'temp': contiguous f64
    temp_vals = [i * 0.25 for i in range(24)]
    temp_data_addr = alloc(struct.pack("<24d", *temp_vals))
    temp_oh = alloc(h5_object_header([
        h5_dataspace([2, 3, 4]),
        h5_datatype_float(8),
        h5_layout_contiguous(temp_data_addr, 24 * 8),
    ]))

    # --- 'series': chunked+deflate f32, 3 chunks of 4 (last ragged)
    series_vals = [k * 1.5 for k in range(10)]
    chunk_addrs = []
    chunk_sizes = []
    for c in range(3):
        chunk = series_vals[c * 4:(c + 1) * 4]
        chunk += [0.0] * (4 - len(chunk))  # edge chunk padded to full size
        comp = zlib.compress(struct.pack("<4f", *chunk), 6)
        chunk_addrs.append(alloc(comp))
        chunk_sizes.append(len(comp))
    # v1 chunk B-tree leaf (node type 1): keys carry
    # chunk-size(4) mask(4) offsets((rank+1)*8), child after each key
    bt = bytearray()
    bt += b"TREE" + struct.pack("<BBH", 1, 0, 3)
    bt += struct.pack("<QQ", UNDEF, UNDEF)  # siblings
    for c in range(3):
        bt += struct.pack("<IIQQ", chunk_sizes[c], 0, c * 4, 0)  # key
        bt += struct.pack("<Q", chunk_addrs[c])                  # child
    bt += struct.pack("<IIQQ", 0, 0, 10, 0)                      # final key
    series_btree = alloc(bytes(bt))
    series_oh = alloc(h5_object_header([
        h5_dataspace([10]),
        h5_datatype_float(4),
        h5_filter_deflate(6),
        h5_layout_chunked(series_btree, [4], 4),
    ]))

    # --- 'shuf': chunked f64 + SHUFFLE then DEFLATE (the
    # nc_def_var_deflate(shuffle=1) pipeline), 2 chunks of 3
    shuf_vals = [k * 0.5 - 1.0 for k in range(6)]
    sh_addrs = []
    sh_sizes = []
    for c in range(2):
        raw = struct.pack("<3d", *shuf_vals[c * 3:(c + 1) * 3])
        comp = zlib.compress(byte_shuffle(raw, 8), 6)
        sh_addrs.append(alloc(comp))
        sh_sizes.append(len(comp))
    sbt = bytearray()
    sbt += b"TREE" + struct.pack("<BBH", 1, 0, 2)
    sbt += struct.pack("<QQ", UNDEF, UNDEF)
    for c in range(2):
        sbt += struct.pack("<IIQQ", sh_sizes[c], 0, c * 3, 0)
        sbt += struct.pack("<Q", sh_addrs[c])
    sbt += struct.pack("<IIQQ", 0, 0, 6, 0)
    shuf_btree = alloc(bytes(sbt))
    shuf_oh = alloc(h5_object_header([
        h5_dataspace([6]),
        h5_datatype_float(8),
        h5_filter_shuffle_deflate(8, 6),
        h5_layout_chunked(shuf_btree, [3], 8),
    ]))

    # --- root group: local heap (names), SNOD, group B-tree, object header
    heap_data = bytearray(b"\0" * 8)  # offset 0 = empty string slot
    name_offs = {}
    for nm in ["series", "shuf", "temp"]:  # SNOD entries must be name-ordered
        name_offs[nm] = len(heap_data)
        heap_data += nm.encode() + b"\0"
        heap_data += b"\0" * ((-len(heap_data)) % 8)
    heap_data_addr = alloc(bytes(heap_data))
    heap_addr = alloc(b"HEAP" + struct.pack("<B3xQQQ", 0, len(heap_data), UNDEF,
                                            heap_data_addr))
    snod = b"SNOD" + struct.pack("<BBH", 1, 0, 3)
    for nm, oh in [("series", series_oh), ("shuf", shuf_oh), ("temp", temp_oh)]:
        snod += struct.pack("<QQII16x", name_offs[nm], oh, 0, 0)
    snod_addr = alloc(snod)
    gtree = b"TREE" + struct.pack("<BBH", 0, 0, 1)
    gtree += struct.pack("<QQ", UNDEF, UNDEF)
    gtree += struct.pack("<QQ", 0, snod_addr)         # key0, child0
    gtree += struct.pack("<Q", name_offs["temp"])     # final key
    gtree_addr = alloc(gtree)
    root_oh = alloc(h5_object_header([
        h5_msg(0x0011, struct.pack("<QQ", gtree_addr, heap_addr)),
    ]))

    # --- superblock v0 (or v1: + indexed-storage K and 2 reserved bytes)
    sb = io.BytesIO()
    sb.write(b"\x89HDF\r\n\x1a\n")
    sb.write(struct.pack("<BBBBBBBB", sb_version, 0, 0, 0, 0, 8, 8, 0))
    sb.write(struct.pack("<HHI", 4, 16, 0))           # leaf k, internal k, flags
    if sb_version == 1:
        sb.write(struct.pack("<HH", 32, 0))           # indexed-storage K, reserved
    sb.write(struct.pack("<QQQQ", 0, UNDEF, len(buf), UNDEF))
    # root symbol-table entry: linkname(8) OH(8) cachetype(4) res(4) scratch(16)
    sb.write(struct.pack("<QQII", 0, root_oh, 1, 0))
    sb.write(struct.pack("<QQ", gtree_addr, heap_addr))
    sb_bytes = sb.getvalue()
    assert len(sb_bytes) == sb_len, len(sb_bytes)
    buf[0:sb_len] = sb_bytes
    with open(path, "wb") as f:
        f.write(bytes(buf))

def write_hdf5_fletcher(path):
    """Fletcher32-checksummed chunked datasets (v0 generation):
    'checked' f64 [10] chunked (4) through the full netCDF-4 pipeline
    fletcher32 -> shuffle -> deflate (value k*0.75 - 2.0), and 'plain'
    f64 [5] chunked (3) with fletcher32 ALONE (value k*k*0.5). The
    checksum rides the chunk as a 4-byte LE suffix; with shuffle it is
    the unshuffled leftover tail."""
    buf = bytearray(b"\0" * 96)

    def alloc(blob):
        off = len(buf)
        buf.extend(blob)
        return off

    def v1_leaf(entries, rank, end_off):
        bt = bytearray()
        bt += b"TREE" + struct.pack("<BBH", 1, 0, len(entries))
        bt += struct.pack("<QQ", UNDEF, UNDEF)
        for size, off, addr in entries:
            bt += struct.pack("<II", size, 0)
            bt += struct.pack("<QQ", off, 0)
            bt += struct.pack("<Q", addr)
        bt += struct.pack("<IIQQ", 0, 0, end_off, 0)
        return alloc(bytes(bt))

    # --- 'checked': fletcher32 + shuffle + deflate, 3 chunks of 4
    checked_vals = [k * 0.75 - 2.0 for k in range(10)]
    entries = []
    for c in range(3):
        chunk = checked_vals[c * 4:(c + 1) * 4]
        chunk += [0.0] * (4 - len(chunk))
        raw = struct.pack("<4d", *chunk)
        withsum = raw + struct.pack("<I", fletcher32(raw))
        comp = zlib.compress(byte_shuffle(withsum, 8), 6)
        entries.append((len(comp), c * 4, alloc(comp)))
    checked_bt = v1_leaf(entries, 1, 10)
    checked_oh = alloc(h5_object_header([
        h5_dataspace([10]),
        h5_datatype_float(8),
        h5_filter_fletcher_shuffle_deflate(8, 6),
        h5_layout_chunked(checked_bt, [4], 8),
    ]))

    # --- 'plain': fletcher32 only, 2 chunks of 3
    plain_vals = [k * k * 0.5 for k in range(5)]
    entries = []
    for c in range(2):
        chunk = plain_vals[c * 3:(c + 1) * 3]
        chunk += [0.0] * (3 - len(chunk))
        raw = struct.pack("<3d", *chunk)
        withsum = raw + struct.pack("<I", fletcher32(raw))
        entries.append((len(withsum), c * 3, alloc(withsum)))
    plain_bt = v1_leaf(entries, 1, 5)
    plain_oh = alloc(h5_object_header([
        h5_dataspace([5]),
        h5_datatype_float(8),
        h5_filter_fletcher_only(),
        h5_layout_chunked(plain_bt, [3], 8),
    ]))

    # --- root group (symbol-table, names ordered)
    heap_data = bytearray(b"\0" * 8)
    name_offs = {}
    for nm in ["checked", "plain"]:
        name_offs[nm] = len(heap_data)
        heap_data += nm.encode() + b"\0"
        heap_data += b"\0" * ((-len(heap_data)) % 8)
    heap_data_addr = alloc(bytes(heap_data))
    heap_addr = alloc(b"HEAP" + struct.pack("<B3xQQQ", 0, len(heap_data), UNDEF,
                                            heap_data_addr))
    snod = b"SNOD" + struct.pack("<BBH", 1, 0, 2)
    for nm, oh in [("checked", checked_oh), ("plain", plain_oh)]:
        snod += struct.pack("<QQII16x", name_offs[nm], oh, 0, 0)
    snod_addr = alloc(snod)
    gtree = b"TREE" + struct.pack("<BBH", 0, 0, 1)
    gtree += struct.pack("<QQ", UNDEF, UNDEF)
    gtree += struct.pack("<QQ", 0, snod_addr)
    gtree += struct.pack("<Q", name_offs["plain"])
    gtree_addr = alloc(gtree)
    root_oh = alloc(h5_object_header([
        h5_msg(0x0011, struct.pack("<QQ", gtree_addr, heap_addr)),
    ]))

    sb = io.BytesIO()
    sb.write(b"\x89HDF\r\n\x1a\n")
    sb.write(struct.pack("<BBBBBBBB", 0, 0, 0, 0, 0, 8, 8, 0))
    sb.write(struct.pack("<HHI", 4, 16, 0))
    sb.write(struct.pack("<QQQQ", 0, UNDEF, len(buf), UNDEF))
    sb.write(struct.pack("<QQII", 0, root_oh, 1, 0))
    sb.write(struct.pack("<QQ", gtree_addr, heap_addr))
    sb_bytes = sb.getvalue()
    assert len(sb_bytes) == 96, len(sb_bytes)
    buf[0:96] = sb_bytes
    with open(path, "wb") as f:
        f.write(bytes(buf))

# ---------------------------------------------------------------------------
# szip (CCSDS 121.0-B extended-Rice) ENCODER — independent of the Scala
# decoder; both written from the public spec. Emits the H5Zszip framing:
# uint32 LE original byte count + raw bitstream (SZ_RAW always set).
# ---------------------------------------------------------------------------

class _Bits:
    def __init__(self):
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def put(self, v, nbits):
        assert 0 <= v < (1 << nbits), (v, nbits)
        self.acc = (self.acc << nbits) | v
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)

    def put_fs(self, z):
        # z zeros then a terminating 1
        while z >= 32:
            self.put(0, 32)
            z -= 32
        self.put(1, z + 1)

    def bytes(self):
        if self.n:
            return bytes(self.out) + bytes([(self.acc << (8 - self.n)) & 0xFF])
        return bytes(self.out)

def szip_nn_map(samples, n):
    """NN preprocessing over one reference-sample interval: first sample
    raw, the rest mapped deltas (CCSDS 121 unit-delay predictor)."""
    xmax = (1 << n) - 1
    mapped = [samples[0]]
    pred = samples[0]
    for x in samples[1:]:
        delta = x - pred
        theta = min(pred, xmax - pred)
        if -theta <= delta <= theta:
            d = 2 * delta if delta >= 0 else -2 * delta - 1
        else:
            d = theta + abs(delta)
        mapped.append(d)
        pred = x
    return mapped

def szip_encode(samples, n, block, rsi_blocks, preprocess, ppsl=None):
    """Per-block best-option coding: zero-block runs (with the ROS
    marker), second extension, k-splitting (k=0 = FS), uncompressed.
    A scanline retains min(ppsl, remaining) samples but encodes whole
    blocks — szlib pads a short last block by repeating the final
    sample (padded samples are coded normally, discarded on decode)."""
    bits = _Bits()
    id_len = 5 if n > 16 else 4 if n > 8 else 3
    id_uncomp = (1 << id_len) - 1
    total = len(samples)
    scanline = ppsl if ppsl is not None else rsi_blocks * block
    pos = 0
    while pos < total:
        rsi = min(scanline, total - pos)
        chunk = list(samples[pos:pos + rsi])
        while len(chunk) % block:
            chunk.append(chunk[-1])  # szlib repeat-last-sample padding
        mapped = szip_nn_map(chunk, n) if preprocess else list(chunk)
        nblocks = len(chunk) // block
        b = 0
        while b < nblocks:
            blk = mapped[b * block:(b + 1) * block]
            is_ref = preprocess and b == 0
            body = blk[1:] if is_ref else blk
            # zero-block run (coded samples all zero)?
            if all(v == 0 for v in body):
                run = 1
                while (b + run < nblocks
                       and run < 64 - (b % 64)
                       and all(v == 0 for v in
                               mapped[(b + run) * block:(b + run + 1) * block])):
                    run += 1
                bits.put(0, id_len)
                bits.put(0, 1)
                if is_ref:
                    bits.put(blk[0], n)
                if b + run == nblocks:          # remainder of segment
                    bits.put_fs(4)
                elif run < 5:
                    bits.put_fs(run - 1)
                else:
                    bits.put_fs(run)            # raw 5 is the ROS marker
                b += run
                continue
            # candidate costs (data bits; option overhead: id_len, +1 low-entropy)
            cands = []
            for k in range(0, min(n - 2, id_uncomp - 1)):
                cands.append((sum((v >> k) + 1 for v in body) + k * len(body),
                              ("split", k)))
            se_vals = []
            rest = body
            if is_ref:
                d1 = body[0]
                se_vals.append(d1 * (d1 + 1) // 2 + d1)  # half pair: d0 = 0
                rest = body[1:]
            ok_se = len(rest) % 2 == 0
            if ok_se:
                for j in range(0, len(rest), 2):
                    d0, d1 = rest[j], rest[j + 1]
                    q = d0 + d1
                    se_vals.append(q * (q + 1) // 2 + d1)
                if all(m < (1 << 24) for m in se_vals):
                    cands.append((sum(m + 1 for m in se_vals) + 1, ("se", se_vals)))
            cands.append((n * block, ("uncomp", None)))
            _, (mode, arg) = min(cands, key=lambda c: c[0])
            if mode == "uncomp":
                bits.put(id_uncomp, id_len)
                for v in blk:
                    bits.put(v, n)
            elif mode == "se":
                bits.put(0, id_len)
                bits.put(1, 1)
                if is_ref:
                    bits.put(blk[0], n)
                for m in arg:
                    bits.put_fs(m)
            else:
                k = arg
                bits.put(k + 1, id_len)
                if is_ref:
                    bits.put(blk[0], n)
                for v in body:
                    bits.put_fs(v >> k)
                if k:
                    for v in body:
                        bits.put(v & ((1 << k) - 1), k)
            b += 1
        pos += rsi
    return bits.bytes()

# szlib option-mask bits: ALLOW_K13=1, EC=4, LSB=8, MSB=16, NN=32, RAW=128
SZ_EC_LSB_RAW = 4 | 8 | 128
SZ_NN_LSB_RAW = 32 | 8 | 128

def h5_filter_szip(options, bpp, ppb, pps):
    rec = struct.pack("<HHHH", 4, 0, 1, 4) + struct.pack("<4I", options, bpp, ppb, pps)
    return h5_msg(0x000B, struct.pack("<BB2x4x", 1, 1) + rec)

def szip_h5_chunk(raw_le_bytes, n, block, rsi_blocks, preprocess, ppsl=None):
    """uint32 LE original size + stream; samples read LSB (LE) order."""
    bps = 1 if n <= 8 else 2 if n <= 16 else 4
    assert len(raw_le_bytes) % bps == 0
    samples = [int.from_bytes(raw_le_bytes[i:i + bps], "little")
               for i in range(0, len(raw_le_bytes), bps)]
    stream = szip_encode(samples, n, block, rsi_blocks, preprocess, ppsl=ppsl)
    return struct.pack("<I", len(raw_le_bytes)) + stream

def write_hdf5_szip(path):
    """Szip-compressed chunked datasets (v0 generation), all NN+LSB+RAW
    unless noted, bpp=32, pixels_per_block=8, pixels_per_scanline=16:
      'szi' int32 [48] chunked (16): chunk 0 constant 7 (zero-block run +
            ROS), chunk 1 ramp 3k (small deltas), chunk 2 pseudorandom
            (k-splitting / uncompressed);
      'szf' float32 [32] chunked (16): f32 bit patterns as 32-bit samples;
      'sze' int32 [16] chunked (16): EC mode (no preprocessing)."""
    buf = bytearray(b"\0" * 96)

    def alloc(blob):
        off = len(buf)
        buf.extend(blob)
        return off

    def v1_leaf(entries, end_off):
        bt = bytearray()
        bt += b"TREE" + struct.pack("<BBH", 1, 0, len(entries))
        bt += struct.pack("<QQ", UNDEF, UNDEF)
        for size, off, addr in entries:
            bt += struct.pack("<IIQQ", size, 0, off, 0)
            bt += struct.pack("<Q", addr)
        bt += struct.pack("<IIQQ", 0, 0, end_off, 0)
        return alloc(bytes(bt))

    def h5_datatype_int32le():
        # class 0 (fixed-point), v1, LE, signed (bit 3 of class flags)
        body = struct.pack("<BBBBI", 0x10, 0x08, 0, 0, 4)
        body += struct.pack("<HH", 0, 32)  # bit offset, precision
        return h5_msg(0x0003, body)

    # --- 'szi': int32, 3 chunks of 16
    szi_vals = ([7] * 16
                + [3 * k for k in range(16)]
                + [(k * 2654435761) % 1000003 for k in range(16)])
    entries = []
    for c in range(3):
        raw = b"".join(struct.pack("<i", v) for v in szi_vals[c * 16:(c + 1) * 16])
        comp = szip_h5_chunk(raw, 32, 8, 2, preprocess=True)
        entries.append((len(comp), c * 16, alloc(comp)))
    szi_bt = v1_leaf(entries, 48)
    szi_oh = alloc(h5_object_header([
        h5_dataspace([48]),
        h5_datatype_int32le(),
        h5_filter_szip(SZ_NN_LSB_RAW, 32, 8, 16),
        h5_layout_chunked(szi_bt, [16], 4),
    ]))

    # --- 'szf': float32 bit patterns, 2 chunks of 16
    szf_vals = [k * 0.25 - 2.0 for k in range(32)]
    entries = []
    for c in range(2):
        raw = b"".join(struct.pack("<f", v) for v in szf_vals[c * 16:(c + 1) * 16])
        comp = szip_h5_chunk(raw, 32, 8, 2, preprocess=True)
        entries.append((len(comp), c * 16, alloc(comp)))
    szf_bt = v1_leaf(entries, 32)
    szf_oh = alloc(h5_object_header([
        h5_dataspace([32]),
        h5_datatype_float(4),
        h5_filter_szip(SZ_NN_LSB_RAW, 32, 8, 16),
        h5_layout_chunked(szf_bt, [16], 4),
    ]))

    # --- 'sze': EC mode (no reference samples, direct sample coding)
    sze_vals = [(k * 7) % 19 for k in range(16)]
    raw = b"".join(struct.pack("<i", v) for v in sze_vals)
    comp = szip_h5_chunk(raw, 32, 8, 2, preprocess=False)
    sze_bt = v1_leaf([(len(comp), 0, alloc(comp))], 16)
    sze_oh = alloc(h5_object_header([
        h5_dataspace([16]),
        h5_datatype_int32le(),
        h5_filter_szip(SZ_EC_LSB_RAW, 32, 8, 16),
        h5_layout_chunked(sze_bt, [16], 4),
    ]))

    # --- 'szp': padded FINAL scanline (26 samples, ppsl 16, block 8:
    #     scanline 2 retains 10 of 16 coded — last block repeat-padded)
    szp_vals = [(k * 11) % 97 for k in range(26)]
    raw = b"".join(struct.pack("<i", v) for v in szp_vals)
    comp = szip_h5_chunk(raw, 32, 8, 2, preprocess=True, ppsl=16)
    szp_bt = v1_leaf([(len(comp), 0, alloc(comp))], 26)
    szp_oh = alloc(h5_object_header([
        h5_dataspace([26]),
        h5_datatype_int32le(),
        h5_filter_szip(SZ_NN_LSB_RAW, 32, 8, 16),
        h5_layout_chunked(szp_bt, [26], 4),
    ]))

    # --- 'szq': ppsl NOT a block multiple (ppsl 14, block 8): EVERY
    #     scanline's last block is padded, plus a short final scanline
    szq_vals = [(k * 13) % 83 for k in range(20)]
    raw = b"".join(struct.pack("<i", v) for v in szq_vals)
    comp = szip_h5_chunk(raw, 32, 8, 2, preprocess=True, ppsl=14)
    szq_bt = v1_leaf([(len(comp), 0, alloc(comp))], 20)
    szq_oh = alloc(h5_object_header([
        h5_dataspace([20]),
        h5_datatype_int32le(),
        h5_filter_szip(SZ_NN_LSB_RAW, 32, 8, 14),
        h5_layout_chunked(szq_bt, [20], 4),
    ]))

    # --- root group
    heap_data = bytearray(b"\0" * 8)
    name_offs = {}
    for nm in ["sze", "szf", "szi", "szp", "szq"]:
        name_offs[nm] = len(heap_data)
        heap_data += nm.encode() + b"\0"
        heap_data += b"\0" * ((-len(heap_data)) % 8)
    heap_data_addr = alloc(bytes(heap_data))
    heap_addr = alloc(b"HEAP" + struct.pack("<B3xQQQ", 0, len(heap_data), UNDEF,
                                            heap_data_addr))
    snod = b"SNOD" + struct.pack("<BBH", 1, 0, 5)
    for nm, oh in [("sze", sze_oh), ("szf", szf_oh), ("szi", szi_oh),
                   ("szp", szp_oh), ("szq", szq_oh)]:
        snod += struct.pack("<QQII16x", name_offs[nm], oh, 0, 0)
    snod_addr = alloc(snod)
    gtree = b"TREE" + struct.pack("<BBH", 0, 0, 1)
    gtree += struct.pack("<QQ", UNDEF, UNDEF)
    gtree += struct.pack("<QQ", 0, snod_addr)
    gtree += struct.pack("<Q", name_offs["szq"])
    gtree_addr = alloc(gtree)
    root_oh = alloc(h5_object_header([
        h5_msg(0x0011, struct.pack("<QQ", gtree_addr, heap_addr)),
    ]))

    sb = io.BytesIO()
    sb.write(b"\x89HDF\r\n\x1a\n")
    sb.write(struct.pack("<BBBBBBBB", 0, 0, 0, 0, 0, 8, 8, 0))
    sb.write(struct.pack("<HHI", 4, 16, 0))
    sb.write(struct.pack("<QQQQ", 0, UNDEF, len(buf), UNDEF))
    sb.write(struct.pack("<QQII", 0, root_oh, 1, 0))
    sb.write(struct.pack("<QQ", gtree_addr, heap_addr))
    sb_bytes = sb.getvalue()
    assert len(sb_bytes) == 96, len(sb_bytes)
    buf[0:96] = sb_bytes
    with open(path, "wb") as f:
        f.write(bytes(buf))

# ---------------------------------------------------------------------------
# nbit (H5Znbit, id 5) and scale-offset (H5Zscaleoffset, id 6) ENCODERS —
# independent of the Scala decoder; both written from the libhdf5 on-disk
# behavior. nbit: each element contributes its `precision` significant
# bits (bits offset+precision-1 .. offset of the stored word) MSB-first
# into a continuous bitstream. scale-offset: 13-byte chunk header
# (minbits u32 LE, minval-width byte = 8, minval u64 LE) then the packed
# MSB-first stream of minbits-bit values.
# ---------------------------------------------------------------------------

def so_log2(num):
    """libhdf5 H5Z__scaleoffset_log2: ceil(log2(num))."""
    v, lb, val = 0, 1, num
    while val >> 1:
        val >>= 1
        v += 1
        lb <<= 1
    return v if num == lb else v + 1

def nbit_chunk(words, precision, offset):
    """Pack stored 32-bit words (unsigned representation) per H5Znbit."""
    b = _Bits()
    mask = (1 << precision) - 1
    for w in words:
        b.put((w >> offset) & mask, precision)
    return b.bytes()

def so_header(minbits, minval):
    return (struct.pack("<I", minbits) + bytes([8])
            + struct.pack("<Q", minval & 0xFFFFFFFFFFFFFFFF))

def so_int_chunk(vals, fill=None, minbits_user=0):
    """H5Z_SO_INT over int32 values; fill=None means fill undefined."""
    if minbits_user == 32:  # full precision: header then raw LE payload
        return so_header(32, 0) + b"".join(struct.pack("<i", v) for v in vals)
    live = [v for v in vals if fill is None or v != fill]
    mn, mx = min(live), max(live)
    span = mx - mn + 1
    minbits = so_log2(span + 1) if fill is not None else so_log2(span)
    hdr = so_header(minbits, mn)
    if minbits == 0:
        return hdr
    sentinel = (1 << minbits) - 1
    b = _Bits()
    for v in vals:
        b.put(sentinel if (fill is not None and v == fill) else v - mn, minbits)
    return hdr + b.bytes()

def so_float_chunk(vals, size, d, fill=None):
    """H5Z_SO_FLOAT_DSCALE over float32/float64 values. Fixture values
    are chosen so v*10^d is exactly an integer in the type's precision —
    the llround/lroundf result is then arithmetic-exact in Python too."""
    live = [v for v in vals if fill is None or v != fill]
    mn = min(live)
    sv = [None if (fill is not None and v == fill)
          else round(v * 10 ** d - mn * 10 ** d) for v in vals]
    mx = max(s for s in sv if s is not None)
    minbits = so_log2(mx + 2) if fill is not None else so_log2(mx + 1)
    minval = struct.unpack("<Q", struct.pack("<d", mn))[0] if size == 8 \
        else struct.unpack("<I", struct.pack("<f", mn))[0]
    hdr = so_header(minbits, minval)
    sentinel = (1 << minbits) - 1
    b = _Bits()
    for s in sv:
        b.put(sentinel if s is None else s, minbits)
    return hdr + b.bytes()

def h5_datatype_int32(precision=32, offset=0, signed=True):
    # class 0 (fixed-point), v1, LE; sign = bit 3 of the class bit field;
    # properties: bit offset u16, bit precision u16
    body = struct.pack("<BBBBI", 0x10, 0x08 if signed else 0x00, 0, 0, 4)
    body += struct.pack("<HH", offset, precision)
    return h5_msg(0x0003, body)

def h5_filter_nbit(nelmts, precision, offset):
    # cd = [total nparms, no-op flag, chunk nelmts, class(atomic=1),
    #       size, order(LE=0), precision, offset] — 8 words, even
    cd = [8, 0, nelmts, 1, 4, 0, precision, offset]
    rec = (struct.pack("<HHHH", 5, 0, 1, len(cd))
           + b"".join(struct.pack("<I", c) for c in cd))
    return h5_msg(0x000B, struct.pack("<BB2x4x", 1, 1) + rec)

def h5_filter_scaleoffset(scale_type, scale_factor, nelmts, cls, size,
                          sign, fill_bytes=None):
    # cd = [scale type, scale factor, nelmts, class(0 int/1 float), size,
    #       sign, order(LE=0), fill-defined, fill bytes as LE words];
    # two fill words always emitted (zeros when undefined) -> 10, even
    fw = [0, 0]
    if fill_bytes is not None:
        padded = fill_bytes + b"\0" * (8 - len(fill_bytes))
        fw = list(struct.unpack("<II", padded))
    cd = [scale_type, scale_factor, nelmts, cls, size, sign, 0,
          1 if fill_bytes is not None else 0] + fw
    rec = (struct.pack("<HHHH", 6, 0, 1, len(cd))
           + b"".join(struct.pack("<I", c) for c in cd))
    return h5_msg(0x000B, struct.pack("<BB2x4x", 1, 1) + rec)

def write_hdf5_nbit_so(path):
    """nbit- and scale-offset-filtered chunked datasets (v0 generation):
      'nbi' int32 signed, datatype precision 12 / offset 0, nbit,
            [40] chunked (20): v = ((k*37) % 4000) - 2000;
      'nbu' int32 UNSIGNED, precision 9 / offset 3, nbit,
            [16] chunked (16): v = (k*29) % 512 (stored word = v << 3);
      'soi' int32 SO_INT, fill -9999 defined, [48] chunked (24):
            v = -9999 if k%11==0 else ((k*53) % 1000) - 500;
      'soc' int32 SO_INT, no fill, all-constant 42, [16] -> minbits 0;
      'sor' int32 SO_INT, user minbits 32 (raw store), [12]:
            v = k*1234567 - 6000000;
      'sof' float32 DSCALE D=2, no fill, [32]: v = k*0.25 - 2.0;
      'sod' float64 DSCALE D=3, fill 1e30 defined, [24]:
            v = 1e30 if k%7==0 else k*0.125 - 1.0."""
    buf = bytearray(b"\0" * 96)

    def alloc(blob):
        off = len(buf)
        buf.extend(blob)
        return off

    def v1_leaf(entries, end_off):
        bt = bytearray()
        bt += b"TREE" + struct.pack("<BBH", 1, 0, len(entries))
        bt += struct.pack("<QQ", UNDEF, UNDEF)
        for size, off, addr in entries:
            bt += struct.pack("<IIQQ", size, 0, off, 0)
            bt += struct.pack("<Q", addr)
        bt += struct.pack("<IIQQ", 0, 0, end_off, 0)
        return alloc(bytes(bt))

    ohs = {}

    # --- 'nbi': signed 12-bit precision at offset 0
    nbi_vals = [((k * 37) % 4000) - 2000 for k in range(40)]
    nbi_chunks = [nbit_chunk([v & 0xFFFFFFFF for v in nbi_vals[c*20:(c+1)*20]],
                             12, 0) for c in range(2)]
    entries = [(len(cc), c * 20, alloc(cc)) for c, cc in enumerate(nbi_chunks)]
    ohs["nbi"] = alloc(h5_object_header([
        h5_dataspace([40]), h5_datatype_int32(precision=12),
        h5_filter_nbit(20, 12, 0), h5_layout_chunked(v1_leaf(entries, 40), [20], 4),
    ]))

    # --- 'nbu': unsigned 9-bit precision at offset 3
    nbu_vals = [(k * 29) % 512 for k in range(16)]
    nbu_c = nbit_chunk([v << 3 for v in nbu_vals], 9, 3)
    ohs["nbu"] = alloc(h5_object_header([
        h5_dataspace([16]), h5_datatype_int32(precision=9, offset=3, signed=False),
        h5_filter_nbit(16, 9, 3), h5_layout_chunked(
            v1_leaf([(len(nbu_c), 0, alloc(nbu_c))], 16), [16], 4),
    ]))

    # --- 'soi': int with defined fill, 2 chunks (per-chunk minbits/minval)
    soi_vals = [-9999 if k % 11 == 0 else ((k * 53) % 1000) - 500
                for k in range(48)]
    soi_chunks = [so_int_chunk(soi_vals[c*24:(c+1)*24], fill=-9999)
                  for c in range(2)]
    entries = [(len(cc), c * 24, alloc(cc)) for c, cc in enumerate(soi_chunks)]
    ohs["soi"] = alloc(h5_object_header([
        h5_dataspace([48]), h5_datatype_int32(),
        h5_filter_scaleoffset(2, 0, 24, 0, 4, 1, struct.pack("<i", -9999)),
        h5_layout_chunked(v1_leaf(entries, 48), [24], 4),
    ]))

    # --- 'soc': all-constant, no fill -> minbits 0, header-only chunk
    soc_c = so_int_chunk([42] * 16)
    ohs["soc"] = alloc(h5_object_header([
        h5_dataspace([16]), h5_datatype_int32(),
        h5_filter_scaleoffset(2, 0, 16, 0, 4, 1),
        h5_layout_chunked(v1_leaf([(len(soc_c), 0, alloc(soc_c))], 16), [16], 4),
    ]))

    # --- 'sor': user minbits 32 -> raw little-endian payload branch
    sor_vals = [k * 1234567 - 6000000 for k in range(12)]
    sor_c = so_int_chunk(sor_vals, minbits_user=32)
    ohs["sor"] = alloc(h5_object_header([
        h5_dataspace([12]), h5_datatype_int32(),
        h5_filter_scaleoffset(2, 32, 12, 0, 4, 1),
        h5_layout_chunked(v1_leaf([(len(sor_c), 0, alloc(sor_c))], 12), [12], 4),
    ]))

    # --- 'sof': float32 D-scale, no fill
    sof_vals = [k * 0.25 - 2.0 for k in range(32)]
    sof_c = so_float_chunk(sof_vals, 4, 2)
    ohs["sof"] = alloc(h5_object_header([
        h5_dataspace([32]), h5_datatype_float(4),
        h5_filter_scaleoffset(0, 2, 32, 1, 4, 0),
        h5_layout_chunked(v1_leaf([(len(sof_c), 0, alloc(sof_c))], 32), [32], 4),
    ]))

    # --- 'sod': float64 D-scale with defined fill
    sod_vals = [1e30 if k % 7 == 0 else k * 0.125 - 1.0 for k in range(24)]
    sod_c = so_float_chunk(sod_vals, 8, 3, fill=1e30)
    ohs["sod"] = alloc(h5_object_header([
        h5_dataspace([24]), h5_datatype_float(8),
        h5_filter_scaleoffset(0, 3, 24, 1, 8, 0, struct.pack("<d", 1e30)),
        h5_layout_chunked(v1_leaf([(len(sod_c), 0, alloc(sod_c))], 24), [24], 8),
    ]))

    # --- root group (symbol table, names sorted)
    names = sorted(ohs)
    heap_data = bytearray(b"\0" * 8)
    name_offs = {}
    for nm in names:
        name_offs[nm] = len(heap_data)
        heap_data += nm.encode() + b"\0"
        heap_data += b"\0" * ((-len(heap_data)) % 8)
    heap_data_addr = alloc(bytes(heap_data))
    heap_addr = alloc(b"HEAP" + struct.pack("<B3xQQQ", 0, len(heap_data), UNDEF,
                                            heap_data_addr))
    snod = b"SNOD" + struct.pack("<BBH", 1, 0, len(names))
    for nm in names:
        snod += struct.pack("<QQII16x", name_offs[nm], ohs[nm], 0, 0)
    snod_addr = alloc(snod)
    gtree = b"TREE" + struct.pack("<BBH", 0, 0, 1)
    gtree += struct.pack("<QQ", UNDEF, UNDEF)
    gtree += struct.pack("<QQ", 0, snod_addr)
    gtree += struct.pack("<Q", name_offs[names[-1]])
    gtree_addr = alloc(gtree)
    root_oh = alloc(h5_object_header([
        h5_msg(0x0011, struct.pack("<QQ", gtree_addr, heap_addr)),
    ]))

    sb = io.BytesIO()
    sb.write(b"\x89HDF\r\n\x1a\n")
    sb.write(struct.pack("<BBBBBBBB", 0, 0, 0, 0, 0, 8, 8, 0))
    sb.write(struct.pack("<HHI", 4, 16, 0))
    sb.write(struct.pack("<QQQQ", 0, UNDEF, len(buf), UNDEF))
    sb.write(struct.pack("<QQII", 0, root_oh, 1, 0))
    sb.write(struct.pack("<QQ", gtree_addr, heap_addr))
    sb_bytes = sb.getvalue()
    assert len(sb_bytes) == 96, len(sb_bytes)
    buf[0:96] = sb_bytes
    with open(path, "wb") as f:
        f.write(bytes(buf))

def h5v2_msg(mtype, body):
    """v2 (OHDR) header message: type(1) size(2) flags(1), no padding."""
    return struct.pack("<BHB", mtype, len(body), 0) + body

def h5v2_object_header(msgs):
    blob = b"".join(msgs)
    # OHDR v2, flags=0 (1-byte chunk0 size, no times/phase/order)
    assert len(blob) < 256
    return b"OHDR" + struct.pack("<BBB", 2, 0, len(blob)) + blob + b"\0\0\0\0"

def h5_dataspace_v2(dims):
    body = struct.pack("<BBBB", 2, len(dims), 0, 1)  # v2, simple
    body += b"".join(struct.pack("<Q", d) for d in dims)
    return h5v2_msg(0x01, body)

def h5_datatype_float_be(size):
    # byte order bit set: the legacy big-iron shape the reader must honor
    if size == 4:
        props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
        sign = 31
    else:
        props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
        sign = 63
    body = struct.pack("<BBBBI", 0x11, 0x21, sign, 0, size) + props
    return h5v2_msg(0x03, body)

def h5_link_msg(name, addr):
    nm = name.encode()
    body = struct.pack("<BBB", 1, 0, len(nm)) + nm + struct.pack("<Q", addr)
    return h5v2_msg(0x06, body)

def write_hdf5_v2(path):
    """The libver=latest generation: v2 superblock, OHDR object headers,
    NEW-STYLE root group with compact Link messages. Datasets: 'be' a
    BIG-ENDIAN f32 [4] contiguous (v2 dataspace), and 'tiny' a COMPACT-
    layout f64 [3] with the data inline in the layout message."""
    buf = bytearray(b"\0" * 48)  # v2 superblock placeholder

    def alloc(blob):
        off = len(buf)
        buf.extend(blob)
        return off

    be_vals = [2.5, -1.25, 0.75, 100.0]
    be_addr = alloc(struct.pack(">4f", *be_vals))
    be_oh = alloc(h5v2_object_header([
        h5_dataspace_v2([4]),
        h5_datatype_float_be(4),
        h5v2_msg(0x08, struct.pack("<BBQQ", 3, 1, be_addr, 16)),
    ]))
    tiny_raw = struct.pack("<3d", 9.5, -0.125, 3.0)
    tiny_oh = alloc(h5v2_object_header([
        h5_dataspace_v2([3]),
        # LE f64 datatype in the v2 message framing
        h5v2_msg(0x03, struct.pack("<BBBBI", 0x11, 0x20, 63, 0, 8)
                 + struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)),
        # compact layout: v3, class 0, size(2), data inline
        h5v2_msg(0x08, struct.pack("<BBH", 3, 0, len(tiny_raw)) + tiny_raw),
    ]))
    # --- 'v4fa': layout v4 chunked, FIXED ARRAY index, client 1
    # (filtered: deflate), 3 chunks of 4 over [10] f32
    fa_vals = [7.0 - k for k in range(10)]
    fa_addrs = []
    fa_sizes = []
    for c in range(3):
        chunk = fa_vals[c * 4:(c + 1) * 4]
        chunk += [0.0] * (4 - len(chunk))
        comp = zlib.compress(struct.pack("<4f", *chunk), 6)
        fa_addrs.append(alloc(comp))
        fa_sizes.append(len(comp))
    # FADB: sig, version, client id, header addr, entries (addr + 4-byte
    # size + 4-byte mask), checksum
    fadb = bytearray(b"FADB" + struct.pack("<BB", 0, 1))
    fadb_hdr_pos = len(fadb)
    fadb += struct.pack("<Q", 0)  # header addr backpatched below
    for c in range(3):
        fadb += struct.pack("<QIi", fa_addrs[c], fa_sizes[c], 0)
    fadb += b"\0\0\0\0"
    fadb_addr_pos = alloc(bytes(fadb))
    # FAHD: sig, version, client id, entry size (8+4+4), page bits,
    # max entries, data block addr, checksum
    fahd = b"FAHD" + struct.pack("<BBBB", 0, 1, 16, 10)
    fahd += struct.pack("<QQ", 3, fadb_addr_pos) + b"\0\0\0\0"
    fahd_addr = alloc(fahd)
    buf[fadb_addr_pos + fadb_hdr_pos:fadb_addr_pos + fadb_hdr_pos + 8] = \
        struct.pack("<Q", fahd_addr)
    # layout v4: version, class 2, flags, nd=rank+1, encLen, dims
    # (chunk dim + element-size tail), index type 3, page bits, addr
    lay4 = struct.pack("<BBBBB", 4, 2, 0, 2, 1) + bytes([4, 4]) \
        + struct.pack("<BB", 3, 10) + struct.pack("<Q", fahd_addr)
    v4fa_oh = alloc(h5v2_object_header([
        h5_dataspace_v2([10]),
        h5v2_msg(0x03, struct.pack("<BBBBI", 0x11, 0x20, 31, 0, 4)
                 + struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)),
        h5v2_msg(0x0B, struct.pack("<BB", 2, 1)
                 + struct.pack("<HHH", 1, 0, 1) + struct.pack("<I", 6)),
        h5v2_msg(0x08, lay4),
    ]))

    # --- 'ea': layout v4 chunked, EXTENSIBLE ARRAY index, client 0
    # (unfiltered) — the appended-time netCDF-4 series shape; 3 chunks of
    # 4 over [12] f32, all held directly in the index block (iblkElmts=4)
    ea_vals = [k * 0.25 + 1.0 for k in range(12)]
    ea_addrs = [alloc(struct.pack("<4f", *ea_vals[c * 4:(c + 1) * 4]))
                for c in range(3)]
    # geometry for (maxBits=32, iblkElmts=4, minPtrs=4, minElmts=16):
    # 4 direct data-block addr slots, 56-3=53 super-block addr slots
    eaib = bytearray(b"EAIB" + struct.pack("<BB", 0, 0))
    eaib_hdrpos = len(eaib)
    eaib += struct.pack("<Q", 0)                  # header addr (backpatch)
    for c in range(4):
        eaib += struct.pack("<Q", ea_addrs[c] if c < 3 else UNDEF)
    eaib += struct.pack("<Q", UNDEF) * 4          # direct data-block addrs
    eaib += struct.pack("<Q", UNDEF) * 53         # super-block addrs
    eaib += b"\0\0\0\0"
    eaib_addr = alloc(bytes(eaib))
    eahd = io.BytesIO()
    eahd.write(b"EAHD" + struct.pack("<BB", 0, 0))  # version, client 0
    eahd.write(struct.pack("<BBBBBB", 8, 32, 4, 16, 4, 10))
    eahd.write(struct.pack("<Q", 0) * 6)          # statistics
    eahd.write(struct.pack("<Q", eaib_addr))
    eahd.write(b"\0\0\0\0")
    eahd_addr = alloc(eahd.getvalue())
    buf[eaib_addr + eaib_hdrpos:eaib_addr + eaib_hdrpos + 8] = \
        struct.pack("<Q", eahd_addr)
    lay_ea = struct.pack("<BBBBB", 4, 2, 0, 2, 1) + bytes([4, 4]) \
        + struct.pack("<B", 4) + struct.pack("<BBBBB", 32, 4, 4, 16, 10) \
        + struct.pack("<Q", eahd_addr)
    ea_oh = alloc(h5v2_object_header([
        h5_dataspace_v2([12]),
        h5v2_msg(0x03, struct.pack("<BBBBI", 0x11, 0x20, 31, 0, 4)
                 + struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)),
        h5v2_msg(0x08, lay_ea),
    ]))

    # --- 'ea2': extensible array WITH a data block — 6 chunks of 4 over
    # [24] f32: 4 direct in the EAIB, chunks 4-5 through the row-0 EADB
    # (16 element slots, minElmts=16), addressed from the index block
    ea2_vals = [k * 0.5 for k in range(24)]
    ea2_addrs = [alloc(struct.pack("<4f", *ea2_vals[c * 4:(c + 1) * 4]))
                 for c in range(6)]
    eadb = bytearray(b"EADB" + struct.pack("<BB", 0, 0))
    eadb_hdrpos = len(eadb)
    eadb += struct.pack("<Q", 0)                  # header addr (backpatch)
    eadb += struct.pack("<I", 0)                  # block offset (offSize=4)
    for slot in range(16):
        eadb += struct.pack("<Q", ea2_addrs[4 + slot] if slot < 2 else UNDEF)
    eadb += b"\0\0\0\0"
    eadb_addr = alloc(bytes(eadb))
    ea2ib = bytearray(b"EAIB" + struct.pack("<BB", 0, 0))
    ea2ib_hdrpos = len(ea2ib)
    ea2ib += struct.pack("<Q", 0)
    for c in range(4):
        ea2ib += struct.pack("<Q", ea2_addrs[c])
    ea2ib += struct.pack("<Q", eadb_addr)         # row-0 data block
    ea2ib += struct.pack("<Q", UNDEF) * 3         # rows 1-2 data blocks
    ea2ib += struct.pack("<Q", UNDEF) * 53
    ea2ib += b"\0\0\0\0"
    ea2ib_addr = alloc(bytes(ea2ib))
    ea2hd = io.BytesIO()
    ea2hd.write(b"EAHD" + struct.pack("<BB", 0, 0))
    ea2hd.write(struct.pack("<BBBBBB", 8, 32, 4, 16, 4, 10))
    ea2hd.write(struct.pack("<Q", 0) * 6)
    ea2hd.write(struct.pack("<Q", ea2ib_addr))
    ea2hd.write(b"\0\0\0\0")
    ea2hd_addr = alloc(ea2hd.getvalue())
    buf[ea2ib_addr + ea2ib_hdrpos:ea2ib_addr + ea2ib_hdrpos + 8] = \
        struct.pack("<Q", ea2hd_addr)
    buf[eadb_addr + eadb_hdrpos:eadb_addr + eadb_hdrpos + 8] = \
        struct.pack("<Q", ea2hd_addr)
    lay_ea2 = struct.pack("<BBBBB", 4, 2, 0, 2, 1) + bytes([4, 4]) \
        + struct.pack("<B", 4) + struct.pack("<BBBBB", 32, 4, 4, 16, 10) \
        + struct.pack("<Q", ea2hd_addr)
    ea2_oh = alloc(h5v2_object_header([
        h5_dataspace_v2([24]),
        h5v2_msg(0x03, struct.pack("<BBBBI", 0x11, 0x20, 31, 0, 4)
                 + struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)),
        h5v2_msg(0x08, lay_ea2),
    ]))

    # --- 'btree2': v2 B-tree chunk index (type 10, unfiltered) — the
    # >1-unlimited-dims index; depth 0, records = addr + scaled offsets
    bt_vals = [10.0 - k * 0.5 for k in range(12)]
    bt_addrs = [alloc(struct.pack("<4f", *bt_vals[c * 4:(c + 1) * 4]))
                for c in range(3)]
    btlf = bytearray(b"BTLF" + struct.pack("<BB", 0, 10))
    for c in range(3):
        btlf += struct.pack("<QQ", bt_addrs[c], c)  # addr + scaled offset
    btlf += b"\0\0\0\0"
    btlf_addr = alloc(bytes(btlf))
    bthd = b"BTHD" + struct.pack("<BB", 0, 10)
    bthd += struct.pack("<IHH", 512, 16, 0)       # node size, rec size, depth
    bthd += struct.pack("<BB", 100, 40)
    bthd += struct.pack("<QH", btlf_addr, 3)
    bthd += struct.pack("<Q", 3)                  # total records
    bthd += b"\0\0\0\0"
    bthd_addr = alloc(bthd)
    lay_bt = struct.pack("<BBBBB", 4, 2, 0, 2, 1) + bytes([4, 4]) \
        + struct.pack("<B", 5) + struct.pack("<IBB", 512, 100, 40) \
        + struct.pack("<Q", bthd_addr)
    bt_oh = alloc(h5v2_object_header([
        h5_dataspace_v2([12]),
        h5v2_msg(0x03, struct.pack("<BBBBI", 0x11, 0x20, 31, 0, 4)
                 + struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)),
        h5v2_msg(0x08, lay_bt),
    ]))

    root_oh = alloc(h5v2_object_header([
        h5_link_msg("be", be_oh),
        h5_link_msg("btree2", bt_oh),
        h5_link_msg("ea", ea_oh),
        h5_link_msg("ea2", ea2_oh),
        h5_link_msg("tiny", tiny_oh),
        h5_link_msg("v4fa", v4fa_oh),
    ]))
    sb = io.BytesIO()
    sb.write(b"\x89HDF\r\n\x1a\n")
    sb.write(struct.pack("<BBBB", 2, 8, 8, 0))
    sb.write(struct.pack("<QQQQ", 0, UNDEF, len(buf), root_oh))
    sb.write(b"\0\0\0\0")  # checksum (not verified by this codec)
    sb_bytes = sb.getvalue()
    assert len(sb_bytes) == 48, len(sb_bytes)
    buf[0:48] = sb_bytes
    with open(path, "wb") as f:
        f.write(bytes(buf))

def write_hdf5_dense(path):
    """v2 generation with a DENSE root group: links stored as fractal-heap
    objects (FRHP header + one root direct block) indexed by a name v2
    B-tree (BTHD + BTLF, depth 0) — the shape libhdf5 switches to above
    the ~8-link compact limit, i.e. any netCDF-4 file with many
    variables. Three small contiguous f64 datasets."""
    buf = bytearray(b"\0" * 48)

    def alloc(blob):
        off = len(buf)
        buf.extend(blob)
        return off

    names = ["alpha", "bravo", "charlie"]
    ds_ohs = {}
    for i, nm in enumerate(names):
        vals = [i * 10.0 + k for k in range(4)]
        daddr = alloc(struct.pack("<4d", *vals))
        ds_ohs[nm] = alloc(h5v2_object_header([
            h5_dataspace_v2([4]),
            h5v2_msg(0x03, struct.pack("<BBBBI", 0x11, 0x20, 63, 0, 8)
                     + struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)),
            h5v2_msg(0x08, struct.pack("<BBQQ", 3, 1, daddr, 32)),
        ]))

    # link-message bodies become the heap's managed objects
    def link_body(nm, addr):
        b = nm.encode()
        return struct.pack("<BBB", 1, 0, len(b)) + b + struct.pack("<Q", addr)

    OFFSIZE = 4          # maxHeapBits 32
    START_BLOCK = 512
    DB_HDR = 4 + 1 + 8 + OFFSIZE  # FHDB sig+version+heap hdr addr+offset
    objs = [link_body(nm, ds_ohs[nm]) for nm in names]
    heap_offs = []
    p = DB_HDR
    for o in objs:
        heap_offs.append(p)
        p += len(o)
    assert p <= START_BLOCK
    fhdb = bytearray(b"FHDB" + struct.pack("<B", 0))
    fhdb_hdrpos = len(fhdb)
    fhdb += struct.pack("<Q", 0)                 # heap header addr (backpatch)
    fhdb += struct.pack("<I", 0)                 # block offset (OFFSIZE bytes)
    for o in objs:
        fhdb += o
    fhdb += b"\0" * (START_BLOCK - len(fhdb))    # pad to the block size
    fhdb_addr = alloc(bytes(fhdb))

    # FRHP fractal heap header (field order per spec IV.B)
    frhp = io.BytesIO()
    frhp.write(b"FRHP" + struct.pack("<B", 0))
    frhp.write(struct.pack("<HH", 7, 0))         # heap id len, io filter len
    frhp.write(struct.pack("<B", 0))             # flags (no checksums)
    frhp.write(struct.pack("<I", 4096))          # max managed object size
    frhp.write(struct.pack("<QQ", 0, UNDEF))     # next huge id, huge btree
    frhp.write(struct.pack("<QQ", 0, UNDEF))     # free space, fs manager
    frhp.write(struct.pack("<QQQ", START_BLOCK, START_BLOCK, 0))
    frhp.write(struct.pack("<Q", len(objs)))     # managed objects
    frhp.write(struct.pack("<QQQQ", 0, 0, 0, 0))  # huge/tiny sizes + counts
    frhp.write(struct.pack("<H", 4))             # table width
    frhp.write(struct.pack("<QQ", START_BLOCK, 4096))  # start, max direct
    frhp.write(struct.pack("<HH", 32, 1))        # max heap bits, start rows
    frhp.write(struct.pack("<Q", fhdb_addr))     # root block (direct: rows=0)
    frhp.write(struct.pack("<H", 0))             # current rows -> root direct
    frhp.write(b"\0\0\0\0")                      # checksum
    frhp_addr = alloc(frhp.getvalue())
    buf[fhdb_addr + fhdb_hdrpos:fhdb_addr + fhdb_hdrpos + 8] = \
        struct.pack("<Q", frhp_addr)

    # name-index v2 B-tree: BTLF leaf (hash never interpreted -> zeros),
    # 7-byte heap ids: flags byte 0 (managed) + 4-byte LE offset + 2 spare
    btlf = bytearray(b"BTLF" + struct.pack("<BB", 0, 5))
    for off in heap_offs:
        btlf += struct.pack("<I", 0)
        btlf += struct.pack("<B", 0) + struct.pack("<I", off) + b"\0\0"
    btlf += b"\0\0\0\0"
    btlf_addr = alloc(bytes(btlf))
    bthd = b"BTHD" + struct.pack("<BB", 0, 5)
    bthd += struct.pack("<IHH", 512, 11, 0)      # node size, rec size, depth
    bthd += struct.pack("<BB", 100, 40)          # split/merge percents
    bthd += struct.pack("<QH", btlf_addr, len(objs))
    bthd += struct.pack("<Q", len(objs))         # total records
    bthd += b"\0\0\0\0"
    bthd_addr = alloc(bthd)

    # root group: Link Info message pointing at the heap + name index
    root_oh = alloc(h5v2_object_header([
        h5v2_msg(0x02, struct.pack("<BBQQ", 0, 0, frhp_addr, bthd_addr)),
    ]))
    sb = io.BytesIO()
    sb.write(b"\x89HDF\r\n\x1a\n")
    sb.write(struct.pack("<BBBB", 2, 8, 8, 0))
    sb.write(struct.pack("<QQQQ", 0, UNDEF, len(buf), root_oh))
    sb.write(b"\0\0\0\0")
    buf[0:48] = sb.getvalue()
    with open(path, "wb") as f:
        f.write(bytes(buf))

def write_hdf5_huge(path):
    """DENSE root group with a HUGE link: one link message bigger than
    the heap's max-managed-object size (a 300-char dataset name) stored
    OUTSIDE the heap blocks and addressed through the huge-object v2
    B-tree (record type 1: address + length + id) — the indirectly-
    accessed shape libhdf5 uses with its default 8-byte heap ids. Two
    normal managed links ride the usual root direct block."""
    buf = bytearray(b"\0" * 48)

    def alloc(blob):
        off = len(buf)
        buf.extend(blob)
        return off

    longname = "".join(chr(ord("a") + (i * 7) % 26) for i in range(300))
    names = ["alpha", "bravo", longname]
    ds_ohs = {}
    for i, nm in enumerate(names):
        vals = [i * 100.0 + k * 0.5 for k in range(4)]
        daddr = alloc(struct.pack("<4d", *vals))
        ds_ohs[nm] = alloc(h5v2_object_header([
            h5_dataspace_v2([4]),
            h5v2_msg(0x03, struct.pack("<BBBBI", 0x11, 0x20, 63, 0, 8)
                     + struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)),
            h5v2_msg(0x08, struct.pack("<BBQQ", 3, 1, daddr, 32)),
        ]))

    def link_body(nm, addr):
        b = nm.encode()
        if len(b) < 256:
            return struct.pack("<BBB", 1, 0, len(b)) + b + struct.pack("<Q", addr)
        return struct.pack("<BBH", 1, 1, len(b)) + b + struct.pack("<Q", addr)

    OFFSIZE = 4
    START_BLOCK = 512
    DB_HDR = 4 + 1 + 8 + OFFSIZE
    managed = [link_body(nm, ds_ohs[nm]) for nm in names[:2]]
    heap_offs = []
    p = DB_HDR
    for o in managed:
        heap_offs.append(p)
        p += len(o)
    assert p <= START_BLOCK
    fhdb = bytearray(b"FHDB" + struct.pack("<B", 0))
    fhdb_hdrpos = len(fhdb)
    fhdb += struct.pack("<Q", 0)
    fhdb += struct.pack("<I", 0)
    for o in managed:
        fhdb += o
    fhdb += b"\0" * (START_BLOCK - len(fhdb))
    fhdb_addr = alloc(bytes(fhdb))

    # the huge object: raw link-message bytes outside any heap block
    huge_obj = link_body(longname, ds_ohs[longname])
    assert len(huge_obj) > 256
    huge_addr = alloc(huge_obj)
    # huge-object v2 B-tree: single BTLF of record type 1 (addr+len+id)
    hbtlf = bytearray(b"BTLF" + struct.pack("<BB", 0, 1))
    hbtlf += struct.pack("<QQQ", huge_addr, len(huge_obj), 1)
    hbtlf += b"\0\0\0\0"
    hbtlf_addr = alloc(bytes(hbtlf))
    hbthd = b"BTHD" + struct.pack("<BB", 0, 1)
    hbthd += struct.pack("<IHH", 512, 24, 0)
    hbthd += struct.pack("<BB", 100, 40)
    hbthd += struct.pack("<QH", hbtlf_addr, 1)
    hbthd += struct.pack("<Q", 1)
    hbthd += b"\0\0\0\0"
    hbthd_addr = alloc(hbthd)

    frhp = io.BytesIO()
    frhp.write(b"FRHP" + struct.pack("<B", 0))
    frhp.write(struct.pack("<HH", 7, 0))
    frhp.write(struct.pack("<B", 0))
    frhp.write(struct.pack("<I", 256))           # max managed object size
    frhp.write(struct.pack("<QQ", 2, hbthd_addr))  # next huge id, huge btree
    frhp.write(struct.pack("<QQ", 0, UNDEF))
    frhp.write(struct.pack("<QQQ", START_BLOCK, START_BLOCK, 0))
    frhp.write(struct.pack("<Q", len(managed)))
    frhp.write(struct.pack("<QQQQ", len(huge_obj), 1, 0, 0))  # huge/tiny size+count
    frhp.write(struct.pack("<H", 4))
    frhp.write(struct.pack("<QQ", START_BLOCK, 4096))
    frhp.write(struct.pack("<HH", 32, 1))
    frhp.write(struct.pack("<Q", fhdb_addr))
    frhp.write(struct.pack("<H", 0))
    frhp.write(b"\0\0\0\0")
    frhp_addr = alloc(frhp.getvalue())
    buf[fhdb_addr + fhdb_hdrpos:fhdb_addr + fhdb_hdrpos + 8] = \
        struct.pack("<Q", frhp_addr)

    # name-index BTLF: 2 managed ids + 1 huge id (type bits 0x10, 6-byte LE id)
    btlf = bytearray(b"BTLF" + struct.pack("<BB", 0, 5))
    for off in heap_offs:
        btlf += struct.pack("<I", 0)
        btlf += struct.pack("<B", 0) + struct.pack("<I", off) + b"\0\0"
    btlf += struct.pack("<I", 0)
    btlf += struct.pack("<B", 0x10) + struct.pack("<I", 1) + b"\0\0"
    btlf += b"\0\0\0\0"
    btlf_addr = alloc(bytes(btlf))
    bthd = b"BTHD" + struct.pack("<BB", 0, 5)
    bthd += struct.pack("<IHH", 512, 11, 0)
    bthd += struct.pack("<BB", 100, 40)
    bthd += struct.pack("<QH", btlf_addr, 3)
    bthd += struct.pack("<Q", 3)
    bthd += b"\0\0\0\0"
    bthd_addr = alloc(bthd)

    root_oh = alloc(h5v2_object_header([
        h5v2_msg(0x02, struct.pack("<BBQQ", 0, 0, frhp_addr, bthd_addr)),
    ]))
    sb = io.BytesIO()
    sb.write(b"\x89HDF\r\n\x1a\n")
    sb.write(struct.pack("<BBBB", 2, 8, 8, 0))
    sb.write(struct.pack("<QQQQ", 0, UNDEF, len(buf), root_oh))
    sb.write(b"\0\0\0\0")
    buf[0:48] = sb.getvalue()
    with open(path, "wb") as f:
        f.write(bytes(buf))

def write_hdf5_tiny(path):
    """DENSE root group with an 18-byte heap-id length: a TINY link whose
    whole link message rides inside the heap ID (type bits 0x20, 4-bit
    length-minus-one), a huge DIRECTLY-accessed link (1 + addr + length
    fits the 18-byte id — no B-tree), and one normal managed link."""
    buf = bytearray(b"\0" * 48)

    def alloc(blob):
        off = len(buf)
        buf.extend(blob)
        return off

    longname = "".join(chr(ord("a") + (i * 11) % 26) for i in range(280))
    names = ["m", "t", longname]
    ds_ohs = {}
    for i, nm in enumerate(names):
        vals = [i * 10.0 - k for k in range(4)]
        daddr = alloc(struct.pack("<4d", *vals))
        ds_ohs[nm] = alloc(h5v2_object_header([
            h5_dataspace_v2([4]),
            h5v2_msg(0x03, struct.pack("<BBBBI", 0x11, 0x20, 63, 0, 8)
                     + struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)),
            h5v2_msg(0x08, struct.pack("<BBQQ", 3, 1, daddr, 32)),
        ]))

    def link_body(nm, addr):
        b = nm.encode()
        if len(b) < 256:
            return struct.pack("<BBB", 1, 0, len(b)) + b + struct.pack("<Q", addr)
        return struct.pack("<BBH", 1, 1, len(b)) + b + struct.pack("<Q", addr)

    ID_LEN = 18
    OFFSIZE = 4
    START_BLOCK = 512
    DB_HDR = 4 + 1 + 8 + OFFSIZE
    managed = [link_body("m", ds_ohs["m"])]
    heap_offs = [DB_HDR]
    fhdb = bytearray(b"FHDB" + struct.pack("<B", 0))
    fhdb_hdrpos = len(fhdb)
    fhdb += struct.pack("<Q", 0)
    fhdb += struct.pack("<I", 0)
    fhdb += managed[0]
    fhdb += b"\0" * (START_BLOCK - len(fhdb))
    fhdb_addr = alloc(bytes(fhdb))

    huge_obj = link_body(longname, ds_ohs[longname])
    assert len(huge_obj) > 256
    huge_addr = alloc(huge_obj)

    tiny_body = link_body("t", ds_ohs["t"])
    assert len(tiny_body) <= 16, len(tiny_body)

    frhp = io.BytesIO()
    frhp.write(b"FRHP" + struct.pack("<B", 0))
    frhp.write(struct.pack("<HH", ID_LEN, 0))
    frhp.write(struct.pack("<B", 0))
    frhp.write(struct.pack("<I", 256))
    frhp.write(struct.pack("<QQ", 1, UNDEF))     # next huge id, NO huge btree
    frhp.write(struct.pack("<QQ", 0, UNDEF))
    frhp.write(struct.pack("<QQQ", START_BLOCK, START_BLOCK, 0))
    frhp.write(struct.pack("<Q", 1))
    frhp.write(struct.pack("<QQQQ", len(huge_obj), 1, len(tiny_body), 1))
    frhp.write(struct.pack("<H", 4))
    frhp.write(struct.pack("<QQ", START_BLOCK, 4096))
    frhp.write(struct.pack("<HH", 32, 1))
    frhp.write(struct.pack("<Q", fhdb_addr))
    frhp.write(struct.pack("<H", 0))
    frhp.write(b"\0\0\0\0")
    frhp_addr = alloc(frhp.getvalue())
    buf[fhdb_addr + fhdb_hdrpos:fhdb_addr + fhdb_hdrpos + 8] = \
        struct.pack("<Q", frhp_addr)

    def pad_id(prefix):
        assert len(prefix) <= ID_LEN
        return prefix + b"\0" * (ID_LEN - len(prefix))

    ids = [
        pad_id(struct.pack("<B", 0) + struct.pack("<I", heap_offs[0])),
        pad_id(struct.pack("<B", 0x20 | (len(tiny_body) - 1)) + tiny_body),
        pad_id(struct.pack("<B", 0x10) + struct.pack("<QQ", huge_addr, len(huge_obj))),
    ]
    btlf = bytearray(b"BTLF" + struct.pack("<BB", 0, 5))
    for hid in ids:
        btlf += struct.pack("<I", 0)
        btlf += hid
    btlf += b"\0\0\0\0"
    btlf_addr = alloc(bytes(btlf))
    bthd = b"BTHD" + struct.pack("<BB", 0, 5)
    bthd += struct.pack("<IHH", 512, 4 + ID_LEN, 0)
    bthd += struct.pack("<BB", 100, 40)
    bthd += struct.pack("<QH", btlf_addr, len(ids))
    bthd += struct.pack("<Q", len(ids))
    bthd += b"\0\0\0\0"
    bthd_addr = alloc(bthd)

    root_oh = alloc(h5v2_object_header([
        h5v2_msg(0x02, struct.pack("<BBQQ", 0, 0, frhp_addr, bthd_addr)),
    ]))
    sb = io.BytesIO()
    sb.write(b"\x89HDF\r\n\x1a\n")
    sb.write(struct.pack("<BBBB", 2, 8, 8, 0))
    sb.write(struct.pack("<QQQQ", 0, UNDEF, len(buf), root_oh))
    sb.write(b"\0\0\0\0")
    buf[0:48] = sb.getvalue()
    with open(path, "wb") as f:
        f.write(bytes(buf))

# ---------------------------------------------------------------------------
# HDF4 DFSD subset (spec: HDF 4.x, DD list + tags NDG/SDD/NT/SD/SDL)
# ---------------------------------------------------------------------------

def h5_heap_filter_info():
    """v2-encoded deflate pipeline body, as FRHP embeds it (12 bytes)."""
    return (struct.pack("<BB", 2, 1)
            + struct.pack("<HHH", 1, 0, 1) + struct.pack("<I", 6))

def write_hdf5_dense_filtered(path):
    """DENSE root group whose fractal heap applies a deflate I/O filter
    (FRHP filterLen > 0): the whole root DIRECT block image (header
    included) is stored compressed, its stored size + mask in the FRHP
    header. heapIdLen 27 also forces the EXTENDED tiny-id encoding
    (12-bit length across the first two id bytes) for the 't' link, and
    an 80-char link name exceeds the 64-byte managed cap -> a FILTERED
    huge object (v2 B-tree record type 2: addr + stored len + mask +
    memory size + id; the stored link message is deflate-compressed)."""
    buf = bytearray(b"\0" * 48)

    def alloc(blob):
        off = len(buf)
        buf.extend(blob)
        return off

    hugename = "".join(chr(ord("a") + (i * 5) % 26) for i in range(80))
    names = ["alpha", "bravo", "charlie", hugename, "t"]
    ds_ohs = {}
    for i, nm in enumerate(names):
        vals = [i * 10.0 + k * 0.5 for k in range(4)]
        daddr = alloc(struct.pack("<4d", *vals))
        ds_ohs[nm] = alloc(h5v2_object_header([
            h5_dataspace_v2([4]),
            h5v2_msg(0x03, struct.pack("<BBBBI", 0x11, 0x20, 63, 0, 8)
                     + struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)),
            h5v2_msg(0x08, struct.pack("<BBQQ", 3, 1, daddr, 32)),
        ]))

    def link_body(nm, addr):
        b = nm.encode()
        return struct.pack("<BBB", 1, 0, len(b)) + b + struct.pack("<Q", addr)

    ID_LEN = 27
    OFFSIZE = 4
    START_BLOCK = 512
    DB_HDR = 4 + 1 + 8 + OFFSIZE
    managed = [link_body(nm, ds_ohs[nm]) for nm in names[:3]]
    heap_offs = []
    p = DB_HDR
    for o in managed:
        heap_offs.append(p)
        p += len(o)
    assert p <= START_BLOCK
    tiny_body = link_body("t", ds_ohs["t"])
    assert len(tiny_body) <= ID_LEN - 2

    # filtered HUGE object: the long-name link, deflate-compressed,
    # indexed by a type-2 huge-object v2 B-tree (single leaf, id 1)
    import zlib as _z
    huge_body = link_body(hugename, ds_ohs[hugename])
    assert len(huge_body) > 64  # exceeds max managed object size below
    huge_comp = _z.compress(huge_body, 6)
    huge_addr = alloc(huge_comp)
    hlf = bytearray(b"BTLF" + struct.pack("<BB", 0, 2))
    hlf += struct.pack("<QQ", huge_addr, len(huge_comp))
    hlf += struct.pack("<I", 0)                  # filter mask
    hlf += struct.pack("<Q", len(huge_body))     # memory (de-filtered) size
    hlf += struct.pack("<Q", 1)                  # huge object id
    hlf += b"\0\0\0\0"
    hlf_addr = alloc(bytes(hlf))
    hbt = b"BTHD" + struct.pack("<BB", 0, 2)
    hbt += struct.pack("<IHH", 512, 36, 0)       # node size, rec size, depth
    hbt += struct.pack("<BB", 100, 40)
    hbt += struct.pack("<QH", hlf_addr, 1)
    hbt += struct.pack("<Q", 1)
    hbt += b"\0\0\0\0"
    hbt_addr = alloc(hbt)

    def frhp_bytes(fhdb_addr, root_stored):
        frhp = io.BytesIO()
        frhp.write(b"FRHP" + struct.pack("<B", 0))
        frhp.write(struct.pack("<HH", ID_LEN, 12))  # heap id len, filter len
        frhp.write(struct.pack("<B", 0))
        frhp.write(struct.pack("<I", 64))        # max managed object size
        frhp.write(struct.pack("<QQ", 2, hbt_addr))  # next huge id, huge btree
        frhp.write(struct.pack("<QQ", 0, UNDEF))
        frhp.write(struct.pack("<QQQ", START_BLOCK, START_BLOCK, 0))
        frhp.write(struct.pack("<Q", len(managed)))
        frhp.write(struct.pack("<QQQQ", len(huge_body), 1, len(tiny_body), 1))
        frhp.write(struct.pack("<H", 4))
        frhp.write(struct.pack("<QQ", START_BLOCK, 4096))
        frhp.write(struct.pack("<HH", 32, 1))
        frhp.write(struct.pack("<Q", fhdb_addr))
        frhp.write(struct.pack("<H", 0))         # current rows -> root direct
        frhp.write(struct.pack("<Q", root_stored))  # filtered root block size
        frhp.write(struct.pack("<I", 0))         # filter mask
        frhp.write(h5_heap_filter_info())
        frhp.write(b"\0\0\0\0")
        return frhp.getvalue()

    # FRHP first (fixed size), so the block image compresses with the
    # real back-pointer — no fixed-point patching of compressed bytes
    frhp_addr = alloc(b"\0" * len(frhp_bytes(0, 0)))
    fhdb = bytearray(b"FHDB" + struct.pack("<B", 0))
    fhdb += struct.pack("<Q", frhp_addr)         # heap header addr
    fhdb += struct.pack("<I", 0)                 # block offset
    for o in managed:
        fhdb += o
    fhdb += b"\0" * (START_BLOCK - len(fhdb))
    comp = _z.compress(bytes(fhdb), 6)
    fhdb_addr = alloc(comp)
    real = frhp_bytes(fhdb_addr, len(comp))
    buf[frhp_addr:frhp_addr + len(real)] = real

    def managed_id(off):
        i = struct.pack("<B", 0) + struct.pack("<I", off)
        return i + b"\0" * (ID_LEN - len(i))

    def tiny_ext_id(body):
        n = len(body) - 1
        i = struct.pack("<BB", 0x20 | (n >> 8), n & 0xFF) + body
        return i + b"\0" * (ID_LEN - len(i))

    def huge_id(rec):
        i = struct.pack("<B", 0x10) + struct.pack("<Q", rec)
        return i + b"\0" * (ID_LEN - len(i))

    ids = ([managed_id(o) for o in heap_offs]
           + [huge_id(1), tiny_ext_id(tiny_body)])
    btlf = bytearray(b"BTLF" + struct.pack("<BB", 0, 5))
    for hid in ids:
        btlf += struct.pack("<I", 0) + hid
    btlf += b"\0\0\0\0"
    btlf_addr = alloc(bytes(btlf))
    bthd = b"BTHD" + struct.pack("<BB", 0, 5)
    bthd += struct.pack("<IHH", 512, 4 + ID_LEN, 0)
    bthd += struct.pack("<BB", 100, 40)
    bthd += struct.pack("<QH", btlf_addr, len(ids))
    bthd += struct.pack("<Q", len(ids))
    bthd += b"\0\0\0\0"
    bthd_addr = alloc(bthd)

    root_oh = alloc(h5v2_object_header([
        h5v2_msg(0x02, struct.pack("<BBQQ", 0, 0, frhp_addr, bthd_addr)),
    ]))
    sb = io.BytesIO()
    sb.write(b"\x89HDF\r\n\x1a\n")
    sb.write(struct.pack("<BBBB", 2, 8, 8, 0))
    sb.write(struct.pack("<QQQQ", 0, UNDEF, len(buf), root_oh))
    sb.write(b"\0\0\0\0")
    buf[0:48] = sb.getvalue()
    with open(path, "wb") as f:
        f.write(bytes(buf))

def write_hdf5_dense_filtered_indirect(path):
    """Filtered heap with a root INDIRECT block: 8 links across three
    64-byte direct blocks, each stored deflate-compressed; the indirect
    block's direct-row entries widen to (addr, stored size, mask)."""
    buf = bytearray(b"\0" * 48)

    def alloc(blob):
        off = len(buf)
        buf.extend(blob)
        return off

    names = ["d%02d" % i for i in range(8)]
    ds_ohs = {}
    for i, nm in enumerate(names):
        vals = [i * 3.0 + k * 0.25 for k in range(4)]
        daddr = alloc(struct.pack("<4d", *vals))
        ds_ohs[nm] = alloc(h5v2_object_header([
            h5_dataspace_v2([4]),
            h5v2_msg(0x03, struct.pack("<BBBBI", 0x11, 0x20, 63, 0, 8)
                     + struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)),
            h5v2_msg(0x08, struct.pack("<BBQQ", 3, 1, daddr, 32)),
        ]))

    def link_body(nm, addr):
        b = nm.encode()
        return struct.pack("<BBB", 1, 0, len(b)) + b + struct.pack("<Q", addr)

    ID_LEN = 7
    OFFSIZE = 4
    START_BLOCK = 64
    WIDTH = 4
    DB_HDR = 4 + 1 + 8 + OFFSIZE
    import zlib as _z

    # pack 3 links per 64-byte block (17 hdr + 3*14 = 59)
    objs = [link_body(nm, ds_ohs[nm]) for nm in names]
    blocks, heap_offs = [], []
    bi, p = 0, DB_HDR
    cur = []
    for o in objs:
        if p + len(o) > START_BLOCK:
            blocks.append(cur)
            bi += 1
            cur, p = [], DB_HDR
        heap_offs.append(bi * START_BLOCK + p)
        cur.append(o)
        p += len(o)
    blocks.append(cur)
    assert len(blocks) == 3

    def frhp_bytes(root_addr):
        frhp = io.BytesIO()
        frhp.write(b"FRHP" + struct.pack("<B", 0))
        frhp.write(struct.pack("<HH", ID_LEN, 12))
        frhp.write(struct.pack("<B", 0))
        frhp.write(struct.pack("<I", 4096))
        frhp.write(struct.pack("<QQ", 0, UNDEF))
        frhp.write(struct.pack("<QQ", 0, UNDEF))
        frhp.write(struct.pack("<QQQ", 3 * START_BLOCK, 3 * START_BLOCK, 0))
        frhp.write(struct.pack("<Q", len(objs)))
        frhp.write(struct.pack("<QQQQ", 0, 0, 0, 0))
        frhp.write(struct.pack("<H", WIDTH))
        frhp.write(struct.pack("<QQ", START_BLOCK, 4096))
        frhp.write(struct.pack("<HH", 32, 1))
        frhp.write(struct.pack("<Q", root_addr))
        frhp.write(struct.pack("<H", 1))         # current rows -> indirect
        frhp.write(struct.pack("<Q", 0))         # root-direct size: n/a
        frhp.write(struct.pack("<I", 0))
        frhp.write(h5_heap_filter_info())
        frhp.write(b"\0\0\0\0")
        return frhp.getvalue()

    # FRHP placeholder first so every compressed image carries the real
    # back-pointer (no patching of compressed bytes)
    frhp_addr = alloc(b"\0" * len(frhp_bytes(0)))
    db_addrs, db_sizes = [], []
    for k in range(3):
        img = bytearray(b"FHDB" + struct.pack("<B", 0))
        img += struct.pack("<Q", frhp_addr)
        img += struct.pack("<I", k * START_BLOCK)
        for o in blocks[k]:
            img += o
        img += b"\0" * (START_BLOCK - len(img))
        comp = _z.compress(bytes(img), 6)
        db_addrs.append(alloc(comp))
        db_sizes.append(len(comp))
    # root indirect block: sig/ver/hdr/off + row0's 4 WIDENED entries
    # (addr + stored size + filter mask per direct child)
    fhib = bytearray(b"FHIB" + struct.pack("<B", 0))
    fhib += struct.pack("<Q", frhp_addr)
    fhib += struct.pack("<I", 0)
    for k in range(4):
        if k < 3:
            fhib += struct.pack("<QQI", db_addrs[k], db_sizes[k], 0)
        else:
            fhib += struct.pack("<QQI", UNDEF, 0, 0)
    fhib += b"\0\0\0\0"
    fhib_addr = alloc(bytes(fhib))
    real = frhp_bytes(fhib_addr)
    buf[frhp_addr:frhp_addr + len(real)] = real

    btlf = bytearray(b"BTLF" + struct.pack("<BB", 0, 5))
    for off in heap_offs:
        btlf += struct.pack("<I", 0)
        btlf += struct.pack("<B", 0) + struct.pack("<I", off) + b"\0\0"
    btlf += b"\0\0\0\0"
    btlf_addr = alloc(bytes(btlf))
    bthd = b"BTHD" + struct.pack("<BB", 0, 5)
    bthd += struct.pack("<IHH", 512, 4 + ID_LEN, 0)
    bthd += struct.pack("<BB", 100, 40)
    bthd += struct.pack("<QH", btlf_addr, len(objs))
    bthd += struct.pack("<Q", len(objs))
    bthd += b"\0\0\0\0"
    bthd_addr = alloc(bthd)

    root_oh = alloc(h5v2_object_header([
        h5v2_msg(0x02, struct.pack("<BBQQ", 0, 0, frhp_addr, bthd_addr)),
    ]))
    sb = io.BytesIO()
    sb.write(b"\x89HDF\r\n\x1a\n")
    sb.write(struct.pack("<BBBB", 2, 8, 8, 0))
    sb.write(struct.pack("<QQQQ", 0, UNDEF, len(buf), root_oh))
    sb.write(b"\0\0\0\0")
    buf[0:48] = sb.getvalue()
    with open(path, "wb") as f:
        f.write(bytes(buf))

def write_hdf5_dense_deep(path):
    """30-variable DENSE root whose name-index v2 B-tree reaches DEPTH 2
    (BTIN root -> BTIN internals -> BTLF leaves). Pointer fields are
    sized by the public H5B2 node-info recurrence: every child pointer
    carries the child's own record count in enc(max_leaf) bytes, and
    pointers to depth>=1 children additionally carry the subtree total
    in enc(cum_max_nrec) bytes. 76-byte nodes (leaf cap 6, depth-1
    capacity 20) force the depth-2 shape at 30 links while the heap
    stays a single 512-byte root direct block."""
    buf = bytearray(b"\0" * 48)

    def alloc(blob):
        off = len(buf)
        buf.extend(blob)
        return off

    names = ["v%02d" % i for i in range(30)]
    ds_ohs = {}
    for i, nm in enumerate(names):
        vals = [i * 2.0 + 0.25, i * 2.0 + 0.75]
        daddr = alloc(struct.pack("<2d", *vals))
        ds_ohs[nm] = alloc(h5v2_object_header([
            h5_dataspace_v2([2]),
            h5v2_msg(0x03, struct.pack("<BBBBI", 0x11, 0x20, 63, 0, 8)
                     + struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)),
            h5v2_msg(0x08, struct.pack("<BBQQ", 3, 1, daddr, 16)),
        ]))

    def link_body(nm, addr):
        b = nm.encode()
        return struct.pack("<BBB", 1, 0, len(b)) + b + struct.pack("<Q", addr)

    OFFSIZE = 4
    START_BLOCK = 512
    DB_HDR = 4 + 1 + 8 + OFFSIZE
    objs = [link_body(nm, ds_ohs[nm]) for nm in names]
    heap_offs = []
    p = DB_HDR
    for o in objs:
        heap_offs.append(p)
        p += len(o)
    assert p <= START_BLOCK, "links exceed the single root direct block"
    fhdb = bytearray(b"FHDB" + struct.pack("<B", 0))
    fhdb_hdrpos = len(fhdb)
    fhdb += struct.pack("<Q", 0)
    fhdb += struct.pack("<I", 0)
    for o in objs:
        fhdb += o
    fhdb += b"\0" * (START_BLOCK - len(fhdb))
    fhdb_addr = alloc(bytes(fhdb))

    frhp = io.BytesIO()
    frhp.write(b"FRHP" + struct.pack("<B", 0))
    frhp.write(struct.pack("<HH", 7, 0))
    frhp.write(struct.pack("<B", 0))
    frhp.write(struct.pack("<I", 4096))
    frhp.write(struct.pack("<QQ", 0, UNDEF))
    frhp.write(struct.pack("<QQ", 0, UNDEF))
    frhp.write(struct.pack("<QQQ", START_BLOCK, START_BLOCK, 0))
    frhp.write(struct.pack("<Q", len(objs)))
    frhp.write(struct.pack("<QQQQ", 0, 0, 0, 0))
    frhp.write(struct.pack("<H", 4))
    frhp.write(struct.pack("<QQ", START_BLOCK, 4096))
    frhp.write(struct.pack("<HH", 32, 1))
    frhp.write(struct.pack("<Q", fhdb_addr))
    frhp.write(struct.pack("<H", 0))
    frhp.write(b"\0\0\0\0")
    frhp_addr = alloc(frhp.getvalue())
    buf[fhdb_addr + fhdb_hdrpos:fhdb_addr + fhdb_hdrpos + 8] = \
        struct.pack("<Q", frhp_addr)

    # ---- depth-2 name index (independent H5B2 geometry arithmetic)
    NODE, REC = 76, 11
    max_leaf = (NODE - 10) // REC                     # 6
    ptr1 = 8 + 1                                      # leaf-child pointer
    max_rec1 = (NODE - 10 - ptr1) // (REC + ptr1)     # 2
    cum1 = (max_rec1 + 1) * max_leaf + max_rec1       # 20 (depth-1 cap)
    assert len(objs) > cum1, "fixture must force depth 2"

    def split(ids, d):
        if d == 0:
            assert len(ids) <= max_leaf
            return ("leaf", ids)
        cap = max_leaf if d == 1 else cum1
        m = (len(ids) + 1 + cap) // (cap + 1)
        total = len(ids) - (m - 1)
        base, extra = divmod(total, m)
        children, recs, rest = [], [], list(ids)
        for j in range(m):
            take = base + (1 if j < extra else 0)
            children.append(split(rest[:take], d - 1))
            rest = rest[take:]
            if j < m - 1:
                recs.append(rest.pop(0))
        assert not rest
        return ("int", recs, children)

    def total_recs(node):
        if node[0] == "leaf":
            return len(node[1])
        return len(node[1]) + sum(total_recs(c) for c in node[2])

    def rec_bytes(i):
        return (struct.pack("<I", 0) + struct.pack("<B", 0)
                + struct.pack("<I", heap_offs[i]) + b"\0\0")

    def emit(node, d):
        """returns (addr, own record count)"""
        if node[0] == "leaf":
            blob = bytearray(b"BTLF" + struct.pack("<BB", 0, 5))
            for i in node[1]:
                blob += rec_bytes(i)
            blob += b"\0\0\0\0"
            blob += b"\0" * (NODE - len(blob))
            return alloc(bytes(blob)), len(node[1])
        _, recs, children = node
        infos = [emit(c, d - 1) for c in children]
        blob = bytearray(b"BTIN" + struct.pack("<BB", 0, 5))
        for i in recs:
            blob += rec_bytes(i)
        for c, (caddr, cn) in zip(children, infos):
            blob += struct.pack("<QB", caddr, cn)
            if d - 1 > 0:
                blob += struct.pack("<B", total_recs(c))  # cum1 <= 255
        blob += b"\0\0\0\0"
        blob += b"\0" * (NODE - len(blob))
        return alloc(bytes(blob)), len(recs)

    tree = split(list(range(len(objs))), 2)
    root_addr, root_nrec = emit(tree, 2)
    bthd = b"BTHD" + struct.pack("<BB", 0, 5)
    bthd += struct.pack("<IHH", NODE, REC, 2)
    bthd += struct.pack("<BB", 100, 40)
    bthd += struct.pack("<QH", root_addr, root_nrec)
    bthd += struct.pack("<Q", len(objs))
    bthd += b"\0\0\0\0"
    bthd_addr = alloc(bthd)

    root_oh = alloc(h5v2_object_header([
        h5v2_msg(0x02, struct.pack("<BBQQ", 0, 0, frhp_addr, bthd_addr)),
    ]))
    sb = io.BytesIO()
    sb.write(b"\x89HDF\r\n\x1a\n")
    sb.write(struct.pack("<BBBB", 2, 8, 8, 0))
    sb.write(struct.pack("<QQQQ", 0, UNDEF, len(buf), root_oh))
    sb.write(b"\0\0\0\0")
    buf[0:48] = sb.getvalue()
    with open(path, "wb") as f:
        f.write(bytes(buf))

def write_hdf5_indirect(path):
    """80-variable DENSE root on the SMALL heap geometry (start block 64,
    max direct 128, width 4): link bodies overflow the 1,024-byte direct
    rows into root row 3, whose entries are CHILD indirect blocks — each
    spanning 256 bytes = one row of four 64-byte direct blocks. The
    doubling-table arithmetic here comes straight from the spec,
    independent of the Scala writer. Name index: one big BTLF leaf
    (deep B-trees are golden_deep.h5's job)."""
    buf = bytearray(b"\0" * 48)
    patches = []  # positions that receive the FRHP address once known

    def alloc(blob):
        off = len(buf)
        buf.extend(blob)
        return off

    names = ["w%02d" % i for i in range(80)]
    ds_ohs = {}
    for i, nm in enumerate(names):
        vals = [i + 0.125, -i * 0.5]
        daddr = alloc(struct.pack("<2d", *vals))
        ds_ohs[nm] = alloc(h5v2_object_header([
            h5_dataspace_v2([2]),
            h5v2_msg(0x03, struct.pack("<BBBBI", 0x11, 0x20, 63, 0, 8)
                     + struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)),
            h5v2_msg(0x08, struct.pack("<BBQQ", 3, 1, daddr, 16)),
        ]))

    def link_body(nm, addr):
        b = nm.encode()
        return struct.pack("<BBB", 1, 0, len(b)) + b + struct.pack("<Q", addr)

    START, MAXD, W, OFFSIZE = 64, 128, 4, 4
    DB_HDR = 4 + 1 + 8 + OFFSIZE

    def row_size(r):
        return START if r < 2 else START << (r - 1)

    MAX_DIRECT_ROWS = (MAXD // START).bit_length() + 1      # log2(2) + 2 = 3
    # geometry in heap order: (base, size, root_entry, child_slot)
    geom = []
    base, r = 0, 0
    while base < 8192 and r < 8:
        if r < MAX_DIRECT_ROWS:
            for c in range(W):
                geom.append((base, row_size(r), r * W + c, -1))
                base += row_size(r)
        else:
            for c in range(W):
                covered, k = 0, 0
                while covered < row_size(r):
                    for cc in range(W):
                        geom.append((base + covered, row_size(k), r * W + c, k * W + cc))
                        covered += row_size(k)
                    k += 1
                base += row_size(r)
        r += 1

    objs = [link_body(nm, ds_ohs[nm]) for nm in names]
    fill, offs = [], []
    for o in objs:
        bi = next((i for i in range(len(fill)) if fill[i] + len(o) <= geom[i][1]), None)
        if bi is None:
            fill.append(DB_HDR)
            bi = len(fill) - 1
            assert DB_HDR + len(o) <= geom[bi][1]
        offs.append(geom[bi][0] + fill[bi])
        fill[bi] += len(o)
    used = geom[:len(fill)]
    assert any(b[3] >= 0 for b in used), "fixture must spill into indirect children"
    n_rows = used[-1][2] // W + 1

    # direct blocks (link bodies placed block-relative)
    blk_addr = []
    for bi, (bbase, bsize, _, _) in enumerate(used):
        blob = bytearray(bsize)
        blob[0:4] = b"FHDB"
        blob[4] = 0
        patches.append(len(buf) + 5)                 # heap header addr
        blob[13:13 + OFFSIZE] = struct.pack("<I", bbase)
        for off, body in zip(offs, objs):
            if bbase <= off < bbase + bsize:
                blob[off - bbase:off - bbase + len(body)] = body
        blk_addr.append(alloc(bytes(blob)))

    # child indirect blocks for the used row-3+ entries
    child_entries = []
    for b in used:
        if b[3] >= 0 and b[2] not in child_entries:
            child_entries.append(b[2])
    child_addr = {}
    for e in child_entries:
        cr = (row_size(e // W) // (W * START)).bit_length()  # child rows
        span_base = min(b[0] for b in used if b[2] == e and b[3] == 0)
        blob = bytearray(b"FHIB")
        blob += struct.pack("<B", 0)
        patches.append(len(buf) + len(blob))
        blob += struct.pack("<Q", 0)                 # heap header addr
        blob += struct.pack("<I", span_base)
        slots = {b[3]: a for b, a in zip(used, blk_addr) if b[2] == e}
        for sl in range(cr * W):
            blob += struct.pack("<Q", slots.get(sl, UNDEF))
        blob += b"\0\0\0\0"
        child_addr[e] = alloc(bytes(blob))

    # root indirect block
    root_blob = bytearray(b"FHIB")
    root_blob += struct.pack("<B", 0)
    patches.append(len(buf) + len(root_blob))
    root_blob += struct.pack("<Q", 0)
    root_blob += struct.pack("<I", 0)
    direct_of = {b[2]: a for b, a in zip(used, blk_addr) if b[3] < 0}
    for e in range(n_rows * W):
        if e // W < MAX_DIRECT_ROWS:
            root_blob += struct.pack("<Q", direct_of.get(e, UNDEF))
        else:
            root_blob += struct.pack("<Q", child_addr.get(e, UNDEF))
    root_blob += b"\0\0\0\0"
    root_fhib = alloc(bytes(root_blob))

    frhp = io.BytesIO()
    frhp.write(b"FRHP" + struct.pack("<B", 0))
    frhp.write(struct.pack("<HH", 7, 0))
    frhp.write(struct.pack("<B", 0))
    frhp.write(struct.pack("<I", 4096))
    frhp.write(struct.pack("<QQ", 0, UNDEF))
    frhp.write(struct.pack("<QQ", 0, UNDEF))
    frhp.write(struct.pack("<QQQ", 8192, 8192, 0))
    frhp.write(struct.pack("<Q", len(objs)))
    frhp.write(struct.pack("<QQQQ", 0, 0, 0, 0))
    frhp.write(struct.pack("<H", W))
    frhp.write(struct.pack("<QQ", START, MAXD))
    frhp.write(struct.pack("<HH", 32, n_rows))
    frhp.write(struct.pack("<Q", root_fhib))
    frhp.write(struct.pack("<H", n_rows))
    frhp.write(b"\0\0\0\0")
    frhp_addr = alloc(frhp.getvalue())
    for pos in patches:
        buf[pos:pos + 8] = struct.pack("<Q", frhp_addr)

    # name index: one BTLF leaf big enough for all 80 records
    NODE = 10 + 80 * 11 + 16
    btlf = bytearray(b"BTLF" + struct.pack("<BB", 0, 5))
    for off in offs:
        btlf += struct.pack("<I", 0)
        btlf += struct.pack("<B", 0) + struct.pack("<I", off) + b"\0\0"
    btlf += b"\0\0\0\0"
    btlf_addr = alloc(bytes(btlf))
    bthd = b"BTHD" + struct.pack("<BB", 0, 5)
    bthd += struct.pack("<IHH", NODE, 11, 0)
    bthd += struct.pack("<BB", 100, 40)
    bthd += struct.pack("<QH", btlf_addr, len(objs))
    bthd += struct.pack("<Q", len(objs))
    bthd += b"\0\0\0\0"
    bthd_addr = alloc(bthd)

    root_oh = alloc(h5v2_object_header([
        h5v2_msg(0x02, struct.pack("<BBQQ", 0, 0, frhp_addr, bthd_addr)),
    ]))
    sb = io.BytesIO()
    sb.write(b"\x89HDF\r\n\x1a\n")
    sb.write(struct.pack("<BBBB", 2, 8, 8, 0))
    sb.write(struct.pack("<QQQQ", 0, UNDEF, len(buf), root_oh))
    sb.write(b"\0\0\0\0")
    buf[0:48] = sb.getvalue()
    with open(path, "wb") as f:
        f.write(bytes(buf))

def write_hdf4(path):
    """Two SDSs: 'sst' plain int16 [2,3] (v = 100+i), and 'cld' float32
    [4] deflate-compressed (v = k*0.5), each with its NDG and label."""
    objs = []  # (tag, ref, payload)

    def nt(ref, dfnt, width_bits):
        objs.append((106, ref, struct.pack(">BBBB", 1, dfnt, width_bits, 0)))

    def sdd(ref, dims):
        p = struct.pack(">H", len(dims))
        p += b"".join(struct.pack(">i", d) for d in dims)
        p += struct.pack(">HH", 106, ref)                 # data NT
        p += b"".join(struct.pack(">HH", 106, ref) for _ in dims)  # scale NTs
        objs.append((701, ref, p))

    # --- sst: plain big-endian int16, with SD-interface attributes
    nt(1, 22, 16)
    sdd(1, [2, 3])
    objs.append((704, 1, b"sea_surface_temperature\0"))
    objs.append((702, 1, struct.pack(">6h", *[100 + i for i in range(6)])))
    objs.append((720, 1, struct.pack(">HHHHHH", 701, 1, 702, 1, 704, 1)))

    def str16(s):
        b = s.encode()
        return struct.pack(">H", len(b)) + b

    def attr_vdata(ref, name, dfnt, width, payload, order):
        # Attr0.0 Vdata: VH describes one FULL_INTERLACE field, VS holds it
        vh = struct.pack(">HiHH", 0, 1, order * width, 1)
        vh += struct.pack(">HHHH", dfnt, order * width, 0, order)
        vh += str16("VALUES") + str16(name) + str16("Attr0.0")
        vh += struct.pack(">HHHH", 0, 0, 3, 0)  # extag, exref, version, more
        objs.append((1962, ref, vh))
        objs.append((1963, ref, payload))

    attr_vdata(901, "units", 4, 1, b"K", 1)                       # char8
    attr_vdata(902, "scale_factor", 6, 8, struct.pack(">d", 0.01), 1)
    attr_vdata(903, "add_offset", 6, 8, struct.pack(">d", 273.15), 1)
    attr_vdata(904, "_FillValue", 22, 2, struct.pack(">h", -9999), 1)
    # Var0.0 Vgroup membering the NDG with its attribute Vdatas
    vg = struct.pack(">H", 5)
    vg += struct.pack(">HHHHH", 720, 1962, 1962, 1962, 1962)
    vg += struct.pack(">HHHHH", 1, 901, 902, 903, 904)
    vg += str16("sea_surface_temperature") + str16("Var0.0")
    vg += struct.pack(">HHHH", 0, 0, 3, 0)
    objs.append((1965, 1, vg))

    # --- cld: deflate special element (extended SD tag)
    nt(2, 5, 32)
    sdd(2, [4])
    objs.append((704, 2, b"cloud_fraction\0"))
    raw = struct.pack(">4f", *[k * 0.5 for k in range(4)])
    comp = zlib.compress(raw, 6)
    objs.append((40, 2, comp))  # DFTAG_COMPRESSED, ref shared with header
    # special-element header: kind(2)=SPECIAL_COMP, version(2),
    # uncompressed-len(4), compressed ref(2), model(2), comp code(2), level(2)
    sp = struct.pack(">HHIHHHH", 3, 0, len(raw), 2, 0, 4, 6)
    objs.append((0x4000 | 702, 2, sp))
    # the NDG membership records the LOGICAL tag (702); only the DD entry
    # carries the extended/special bit — the layout libhdf writes
    objs.append((720, 2, struct.pack(">HHHHHH", 701, 2, 702, 2, 704, 2)))

    ndds = len(objs)
    header = 4 + 2 + 4 + 12 * ndds  # magic + ndds + next + DD entries
    out = io.BytesIO()
    out.write(struct.pack(">I", 0x0E031301))
    out.write(struct.pack(">Hi", ndds, 0))
    off = header
    for tag, ref, payload in objs:
        out.write(struct.pack(">HHii", tag, ref, off, len(payload)))
        off += len(payload)
    for _, _, payload in objs:
        out.write(payload)
    with open(path, "wb") as f:
        f.write(out.getvalue())

# ---------------------------------------------------------------------------
# netCDF classic CDF-1 (spec: NetCDF Classic Format, BNF in appendix B)
# ---------------------------------------------------------------------------

def nc_name(s):
    b = s.encode()
    return struct.pack(">i", len(b)) + b + b"\0" * ((-len(b)) % 4)

def nc_attrs(attrs):
    if not attrs:
        return struct.pack(">ii", 0, 0)
    out = struct.pack(">ii", 0x0C, len(attrs))
    for name, text in attrs:
        b = text.encode()
        out += nc_name(name) + struct.pack(">ii", 2, len(b)) + b
        out += b"\0" * ((-len(b)) % 4)
    return out

def write_netcdf3(path):
    """dims (time=3, x=2); vars time(f64)[time] and temp(f32)[time,x],
    both fixed-size; temp has a units attribute."""
    time_vals = [0.0, 6.0, 12.0]
    temp_vals = [20.0 + 0.5 * i for i in range(6)]
    header = io.BytesIO()
    header.write(b"CDF\x01")
    header.write(struct.pack(">i", 0))                      # numrecs
    header.write(struct.pack(">ii", 0x0A, 2))               # dim_list
    header.write(nc_name("time") + struct.pack(">i", 3))
    header.write(nc_name("x") + struct.pack(">i", 2))
    header.write(nc_attrs([("title", "golden fixture")]))   # gatt_list
    header.write(struct.pack(">ii", 0x0B, 2))               # var_list
    # var headers need begins; compute sizes first: header length is
    # data-independent, so lay out with a two-pass dry run
    def var_header(name, dimids, attrs, nctype, vsize, begin):
        out = nc_name(name) + struct.pack(">i", len(dimids))
        out += b"".join(struct.pack(">i", d) for d in dimids)
        out += nc_attrs(attrs)
        out += struct.pack(">iii", nctype, vsize, begin)
        return out

    def build(b_time, b_temp):
        return (var_header("time", [0], [], 6, 24, b_time) +
                var_header("temp", [0, 1], [("units", "K")], 5, 24, b_temp))
    base = header.getvalue()
    hdr_len = len(base) + len(build(0, 0))
    b_time = hdr_len
    b_temp = b_time + 24
    blob = base + build(b_time, b_temp)
    blob += struct.pack(">3d", *time_vals)
    blob += struct.pack(">6f", *temp_vals)
    with open(path, "wb") as f:
        f.write(blob)

def write_netcdf3_rec(path):
    """CDF-2 (64-bit offsets) with an UNLIMITED dimension: one record
    variable flux(time, x) over 2 records — the single-record-variable
    no-padding case the classic spec special-cases."""
    flux = [1.5, 2.5, 3.5, 4.5]  # 2 records x 2
    header = io.BytesIO()
    header.write(b"CDF\x02")
    header.write(struct.pack(">i", 2))                      # numrecs
    header.write(struct.pack(">ii", 0x0A, 2))
    header.write(nc_name("time") + struct.pack(">i", 0))    # UNLIMITED
    header.write(nc_name("x") + struct.pack(">i", 2))
    header.write(struct.pack(">ii", 0, 0))                  # no gatts
    header.write(struct.pack(">ii", 0x0B, 1))
    base = header.getvalue()

    def var_header(begin):
        out = nc_name("flux") + struct.pack(">i", 2)
        out += struct.pack(">ii", 0, 1)                     # dims (time, x)
        out += struct.pack(">ii", 0, 0)                     # no attrs
        out += struct.pack(">ii", 5, 8)                     # float, vsize
        out += struct.pack(">q", begin)                     # CDF-2: 64-bit
        return out
    hdr_len = len(base) + len(var_header(0))
    blob = base + var_header(hdr_len)
    blob += struct.pack(">4f", *flux)
    with open(path, "wb") as f:
        f.write(blob)


def write_netcdf3_rec_big(path):
    """CDF-2 consolidated record store for the chunk-parallel ingest
    spec: 24 records, TWO record variables (flux f32 [time,y=4,x=3] and
    tavg f64 [time]) so the record stride is the general multi-var sum
    of 4-padded per-record slabs, plus one fixed var (xc f64 [x])."""
    nrec, ny, nx = 24, 4, 3
    header = io.BytesIO()
    header.write(b"CDF\x02")
    header.write(struct.pack(">i", nrec))                   # numrecs
    header.write(struct.pack(">ii", 0x0A, 3))               # dim_list
    header.write(nc_name("time") + struct.pack(">i", 0))    # UNLIMITED
    header.write(nc_name("y") + struct.pack(">i", ny))
    header.write(nc_name("x") + struct.pack(">i", nx))
    header.write(struct.pack(">ii", 0, 0))                  # no gatts
    header.write(struct.pack(">ii", 0x0B, 3))               # var_list
    base = header.getvalue()

    def var_header(name, dimids, nctype, vsize, begin):
        out = nc_name(name) + struct.pack(">i", len(dimids))
        out += b"".join(struct.pack(">i", d) for d in dimids)
        out += struct.pack(">ii", 0, 0)                     # no attrs
        out += struct.pack(">ii", nctype, vsize)
        out += struct.pack(">q", begin)                     # CDF-2 64-bit
        return out

    flux_vsize = ((ny * nx * 4 + 3) // 4) * 4              # 48
    tavg_vsize = 8
    xc_vsize = nx * 8
    def build(b_xc, b_flux, b_tavg):
        return (var_header("xc", [2], 6, xc_vsize, b_xc) +
                var_header("flux", [0, 1, 2], 5, flux_vsize, b_flux) +
                var_header("tavg", [0], 6, tavg_vsize, b_tavg))
    hdr_len = len(base) + len(build(0, 0, 0))
    b_xc = hdr_len
    b_flux = b_xc + xc_vsize
    b_tavg = b_flux + flux_vsize
    stride = flux_vsize + tavg_vsize
    blob = bytearray(base + build(b_xc, b_flux, b_tavg))
    blob += struct.pack(">%dd" % nx, *[10.0 * i for i in range(nx)])
    for r in range(nrec):
        rec = struct.pack(">%df" % (ny * nx),
                          *[r * 100.0 + j * 10 + i
                            for j in range(ny) for i in range(nx)])
        rec += b"\x00" * (flux_vsize - len(rec))
        rec += struct.pack(">d", r * 0.5)
        blob += rec
    with open(path, "wb") as f:
        f.write(bytes(blob))


# ---------------------------------------------------------------------------
# Avro Object Container File (spec: Apache Avro 1.12.0 specification)
# ---------------------------------------------------------------------------

def _avro_zigzag(n):
    """Avro long: zigzag then little-endian base-128 varint."""
    u = (n << 1) ^ (n >> 63)
    u &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)

def _avro_str(s):
    b = s.encode("utf-8")
    return _avro_zigzag(len(b)) + b

def write_avro(path):
    """Container file with deflate-coded blocks: record {id long,
    name [null,string], score [null,double], ok boolean} over 6 rows
    (row 3 carries nulls) split across TWO blocks so block framing and
    the sync marker are both exercised. Raw-deflate (RFC1951) codec."""
    schema = ('{"type":"record","name":"golden","namespace":"graft","fields":['
              '{"name":"id","type":"long"},'
              '{"name":"name","type":["null","string"]},'
              '{"name":"score","type":["null","double"]},'
              '{"name":"ok","type":"boolean"}]}')
    rows = [
        (1, "alpha", 1.5, True),
        (2, "beta", -2.25, False),
        (3, None, None, True),
        (4, "delta", 0.125, False),
        (5, "epsilon", 1e300, True),
        (6, "", 0.0, False),
    ]
    def enc_row(r):
        rid, name, score, ok = r
        out = _avro_zigzag(rid)
        out += _avro_zigzag(0) if name is None else _avro_zigzag(1) + _avro_str(name)
        out += (_avro_zigzag(0) if score is None
                else _avro_zigzag(1) + struct.pack("<d", score))
        out += b"\x01" if ok else b"\x00"
        return out
    sync = bytes(range(16))
    blob = bytearray(b"Obj\x01")
    meta = [("avro.schema", schema.encode("utf-8")),
            ("avro.codec", b"deflate")]
    blob += _avro_zigzag(len(meta))
    for k, v in meta:
        blob += _avro_str(k) + _avro_zigzag(len(v)) + v
    blob += _avro_zigzag(0)
    blob += sync
    for chunk in (rows[:4], rows[4:]):
        raw = b"".join(enc_row(r) for r in chunk)
        comp = zlib.compressobj(6, zlib.DEFLATED, -15)  # raw deflate
        data = comp.compress(raw) + comp.flush()
        blob += _avro_zigzag(len(chunk)) + _avro_zigzag(len(data)) + data + sync
    with open(path, "wb") as f:
        f.write(bytes(blob))


def write_avro_fuzz(outdir, n=12, seed=90210):
    """Randomized Avro container files + manifest: random field sets over
    the supported primitives (long/int/double/float/boolean/string/bytes,
    random nullability), random row counts incl. zero, random codec and
    random block chunking. Values encode into the manifest as typed
    tokens (hex for strings/bytes, repr for floats) so the Scala reader
    compares exactly."""
    rng = random.Random(seed)
    os.makedirs(outdir, exist_ok=True)
    types = ["long", "int", "double", "float", "boolean", "string", "bytes"]
    lines = []
    for case in range(n):
        nf = rng.randint(1, 5)
        fields = []
        for fi in range(nf):
            fields.append(("f%d" % fi, rng.choice(types), rng.random() < 0.5))
        codec = rng.choice(["null", "deflate"])
        nrows = rng.choice([0, 1, rng.randint(2, 20)])
        rows = []
        for _ in range(nrows):
            row = []
            for (_, ft, nullable) in fields:
                if nullable and rng.random() < 0.25:
                    row.append(None)
                elif ft == "long":
                    row.append(rng.randint(-2**50, 2**50))
                elif ft == "int":
                    row.append(rng.randint(-2**31, 2**31 - 1))
                elif ft == "double":
                    row.append(rng.randint(-10**6, 10**6) * 0.25)
                elif ft == "float":
                    row.append(rng.randint(-4096, 4096) * 0.5)
                elif ft == "boolean":
                    row.append(rng.random() < 0.5)
                elif ft == "string":
                    chars = "abcdefghijklmnop 0123456789_\u00e9\u4e2d\U0001f309"
                    row.append("".join(rng.choice(chars)
                                       for _ in range(rng.randint(0, 12))))
                else:
                    row.append(bytes(rng.randrange(256)
                                     for _ in range(rng.randint(0, 10))))
            rows.append(row)

        def fschema(ft, nullable):
            return '["null","%s"]' % ft if nullable else '"%s"' % ft
        schema = ('{"type":"record","name":"fz%02d","namespace":"graft",'
                  '"fields":[%s]}' % (case, ",".join(
                      '{"name":"%s","type":%s}' % (fn, fschema(ft, nu))
                      for fn, ft, nu in fields)))

        def enc_val(ft, v):
            if ft == "long" or ft == "int":
                return _avro_zigzag(v)
            if ft == "double":
                return struct.pack("<d", v)
            if ft == "float":
                return struct.pack("<f", v)
            if ft == "boolean":
                return b"\x01" if v else b"\x00"
            if ft == "string":
                return _avro_str(v)
            return _avro_zigzag(len(v)) + v

        def enc_row(row):
            out = b""
            for (fn, ft, nu), v in zip(fields, row):
                if nu:
                    out += _avro_zigzag(0) if v is None \
                        else _avro_zigzag(1) + enc_val(ft, v)
                else:
                    out += enc_val(ft, v)
            return out

        sync = bytes(rng.randrange(256) for _ in range(16))
        blob = bytearray(b"Obj\x01")
        meta = [("avro.schema", schema.encode("utf-8")),
                ("avro.codec", codec.encode())]
        blob += _avro_zigzag(len(meta))
        for k, v in meta:
            blob += _avro_str(k) + _avro_zigzag(len(v)) + v
        blob += _avro_zigzag(0)
        blob += sync
        i = 0
        while i < len(rows):
            take = min(rng.randint(1, 4), len(rows) - i)
            raw = b"".join(enc_row(r) for r in rows[i:i + take])
            if codec == "deflate":
                comp = zlib.compressobj(6, zlib.DEFLATED, -15)
                data = comp.compress(raw) + comp.flush()
            else:
                data = raw
            blob += _avro_zigzag(take) + _avro_zigzag(len(data)) + data + sync
            i += take
        name = "afz%02d" % case
        with open(os.path.join(outdir, name + ".avro"), "wb") as f:
            f.write(bytes(blob))

        def tok(ft, v):
            if v is None:
                return "~"
            if ft == "long":
                return "l%d" % v
            if ft == "int":
                return "i%d" % v
            if ft == "double":
                return "d%r" % v
            if ft == "float":
                return "f%r" % v
            if ft == "boolean":
                return "t" if v else "u"
            if ft == "string":
                return "s" + v.encode("utf-8").hex()
            return "b" + v.hex()
        lines.append(";".join([
            name, codec,
            ",".join("%s:%s:%s" % (fn, ft, "n" if nu else "r")
                     for fn, ft, nu in fields),
            "|".join(",".join(tok(ft, v)
                              for (fn, ft, nu), v in zip(fields, row))
                     for row in rows)]))
    with open(os.path.join(outdir, "avro_manifest.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


_CRC32C_TABLE = None


def _crc32c(data):
    """Table-driven CRC32C (Castagnoli, reflected poly 0x82F63B78) —
    independent of java.util.zip.CRC32C."""
    global _CRC32C_TABLE
    if _CRC32C_TABLE is None:
        tbl = []
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
            tbl.append(c)
        _CRC32C_TABLE = tbl
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC32C_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _tfr_masked(data):
    c = _crc32c(data)
    rot = ((c >> 15) | (c << 17)) & 0xFFFFFFFF
    return (rot + 0xA282EAD8) & 0xFFFFFFFF


def _tfr_varint(n):
    n &= (1 << 64) - 1  # two's complement for negative int64
    out = bytearray()
    while n > 0x7F:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out)


def _tfr_ld(field, payload):
    return _tfr_varint((field << 3) | 2) + _tfr_varint(len(payload)) + payload


def write_tfrecord(path):
    """Three framed tf.train.Example records (record_writer.h framing:
    LE u64 length + masked crc32c + payload + masked crc32c). Features:
    id int64 (record 2 UNPACKED, proto2-style, and negative -> 10-byte
    varint), txt bytes (unicode), vec packed floats (record 3 empty)."""
    def f_i64_packed(vals):
        inner = _tfr_ld(1, b"".join(_tfr_varint(v) for v in vals)) if vals else b""
        return _tfr_ld(3, inner)

    def f_i64_unpacked(vals):
        inner = b"".join(_tfr_varint((1 << 3) | 0) + _tfr_varint(v) for v in vals)
        return _tfr_ld(3, inner)

    def f_bytes(bs):
        return _tfr_ld(1, b"".join(_tfr_ld(1, b) for b in bs))

    def f_f32(vals):
        inner = (_tfr_ld(1, b"".join(struct.pack("<f", v) for v in vals))
                 if vals else b"")
        return _tfr_ld(2, inner)

    def example(feats):
        entries = b""
        for name, fbytes in feats:
            entry = _tfr_ld(1, name.encode("utf-8")) + _tfr_ld(2, fbytes)
            entries += _tfr_ld(1, entry)
        return _tfr_ld(1, entries)

    recs = [
        example([("id", f_i64_packed([7])),
                 ("txt", f_bytes(["héllo wörld".encode("utf-8")])),
                 ("vec", f_f32([1.5, -2.25, 0.5]))]),
        example([("id", f_i64_unpacked([-3])),
                 ("txt", f_bytes(["漢字テキスト".encode("utf-8")])),
                 ("vec", f_f32([3.0]))]),
        example([("id", f_i64_packed([123456789012345])),
                 ("txt", f_bytes([b""])),
                 ("vec", f_f32([]))]),
    ]
    blob = bytearray()
    for payload in recs:
        ln = struct.pack("<Q", len(payload))
        blob += ln + struct.pack("<I", _tfr_masked(ln))
        blob += payload + struct.pack("<I", _tfr_masked(payload))
    with open(path, "wb") as f:
        f.write(bytes(blob))


def write_tfrecord_fuzz(outdir, n=12, seed=60606):
    """Seeded random TFRecord files: 1-5 features per record of random
    kind (int64 full range incl. negatives, raw bytes, float32), numeric
    lists randomly PACKED or UNPACKED, occasional empty lists, 1-6
    records per file. Expectations to tfr_manifest.txt: one line per
    (file, record, feature) — ints decimal, floats as LE hex bit
    patterns, bytes hex — parsed by TfRecordFuzzSpec."""
    import random
    rnd = random.Random(seed)
    os.makedirs(outdir, exist_ok=True)
    manifest = []

    def f_i64(vals, packed):
        if packed:
            inner = _tfr_ld(1, b"".join(_tfr_varint(v) for v in vals)) if vals else b""
            return _tfr_ld(3, inner)
        inner = b"".join(_tfr_varint((1 << 3) | 0) + _tfr_varint(v) for v in vals)
        return _tfr_ld(3, inner)

    def f_bytes(bs):
        return _tfr_ld(1, b"".join(_tfr_ld(1, b) for b in bs))

    def f_f32(vals, packed):
        if packed:
            inner = (_tfr_ld(1, b"".join(struct.pack("<f", v) for v in vals))
                     if vals else b"")
            return _tfr_ld(2, inner)
        inner = b"".join(_tfr_varint((1 << 3) | 5) + struct.pack("<f", v)
                         for v in vals)
        return _tfr_ld(2, inner)

    def example(feats):
        entries = b""
        for name, fbytes in feats:
            entry = _tfr_ld(1, name.encode("utf-8")) + _tfr_ld(2, fbytes)
            entries += _tfr_ld(1, entry)
        return _tfr_ld(1, entries)

    for fi in range(n):
        name = "tfr%02d" % fi
        recs = []
        for ri in range(rnd.randint(1, 6)):
            feats = []
            for gi in range(rnd.randint(1, 5)):
                fname = "f%d_%s" % (gi, rnd.choice(["id", "txt", "vec", "κ"]))
                kind = rnd.choice(["i64", "bytes", "f32"])
                ln = rnd.choice([0, 1, 1, 2, 4])
                if kind == "i64":
                    vals = [rnd.randint(-2**63, 2**63 - 1) for _ in range(ln)]
                    feats.append((fname, f_i64(vals, rnd.random() < 0.5)))
                    manifest.append("%s|%d|%s|i64|%s" % (
                        name, ri, fname, ",".join(str(v) for v in vals)))
                elif kind == "bytes":
                    vals = [bytes(rnd.randrange(256) for _ in range(rnd.randint(0, 8)))
                            for _ in range(ln)]
                    feats.append((fname, f_bytes(vals)))
                    # zero-length byte strings encode as '-' so a list of
                    # one empty element is distinguishable from an empty list
                    manifest.append("%s|%d|%s|bytes|%s" % (
                        name, ri, fname,
                        ",".join((v.hex() or "-") for v in vals)))
                else:
                    vals = [struct.unpack("<f", struct.pack(
                        "<f", rnd.uniform(-1e30, 1e30)))[0] for _ in range(ln)]
                    feats.append((fname, f_f32(vals, rnd.random() < 0.5)))
                    manifest.append("%s|%d|%s|f32|%s" % (
                        name, ri, fname,
                        ",".join(struct.pack("<f", v).hex() for v in vals)))
            recs.append(example(feats))
        blob = bytearray()
        for payload in recs:
            ln8 = struct.pack("<Q", len(payload))
            blob += ln8 + struct.pack("<I", _tfr_masked(ln8))
            blob += payload + struct.pack("<I", _tfr_masked(payload))
        with open(os.path.join(outdir, name + ".tfrecord"), "wb") as f:
            f.write(bytes(blob))
    with open(os.path.join(outdir, "tfr_manifest.txt"), "w") as f:
        f.write("\n".join(manifest) + "\n")


def write_npy_pair(stem):
    """Paired .npy files from the numpy format spec v1.0 (no numpy):
    ids int64 [4], vec float32 [4, 3] with negatives, exact quarters and
    one value needing f4 rounding; header padded to 64-byte data start."""
    def header(descr, shape):
        shape_s = "(%s,)" % shape[0] if len(shape) == 1 else \
            "(%s)" % ", ".join(str(x) for x in shape)
        d = "{'descr': '%s', 'fortran_order': False, 'shape': %s, }" % (descr, shape_s)
        base = 6 + 2 + 2 + len(d) + 1
        pad = (64 - base % 64) % 64
        full = (d + " " * pad + "\n").encode("ascii")
        return b"\x93NUMPY" + bytes([1, 0]) + struct.pack("<H", len(full)) + full

    ids = [7, -3, 123456789012345, 0]
    vecs = [[1.5, -2.25, 0.125], [3.0, -0.5, 0.75],
            [0.1, -1e30, 2.5], [0.0, -0.0, 42.0]]
    with open(stem + ".ids.npy", "wb") as f:
        f.write(header("<i8", (4,)))
        f.write(b"".join(struct.pack("<q", v) for v in ids))
    with open(stem + ".vec.npy", "wb") as f:
        f.write(header("<f4", (4, 3)))
        f.write(b"".join(struct.pack("<f", v) for row in vecs for v in row))


def write_safetensors(path):
    """golden.safetensors from the public spec: u64 LE header length +
    JSON {name: {dtype, shape, data_offsets}} + raw LE buffers; carries
    ids I64 [3], emb F32 [3, 2], and a __metadata__ entry the reader
    must skip."""
    ids = [11, -5, 2**50]
    emb = [[0.5, -1.25], [3.5, 0.1], [-0.0, 1e30]]
    ib = b"".join(struct.pack("<q", v) for v in ids)
    vb = b"".join(struct.pack("<f", v) for row in emb for v in row)
    hdr = ('{"__metadata__":{"writer":"make_fixtures"},'
           '"ids":{"dtype":"I64","shape":[3],"data_offsets":[0,%d]},'
           '"emb":{"dtype":"F32","shape":[3,2],"data_offsets":[%d,%d]}}'
           % (len(ib), len(ib), len(ib) + len(vb))).encode("utf-8")
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hdr)))
        f.write(hdr)
        f.write(ib)
        f.write(vb)


def write_zarr3(store):
    """zarr v3 store (zarr core spec v3.0): per-node zarr.json, default
    c/-nested chunk keys with gzip codec for a 2-D float64 array (one
    chunk MISSING -> fill), a big-endian int32 array under v2-style
    dotted keys with no compression, and a 1-D uint16 coordinate."""
    os.makedirs(store, exist_ok=True)
    with open(os.path.join(store, "zarr.json"), "w") as f:
        json.dump({"zarr_format": 3, "node_type": "group"}, f)

    # lwp: [5,6] f8, chunks [3,4], gzip, keys c/i/j; chunk c/1/1 omitted
    d = os.path.join(store, "lwp")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "zarr.json"), "w") as f:
        json.dump({"zarr_format": 3, "node_type": "array",
                   "shape": [5, 6], "data_type": "float64",
                   "chunk_grid": {"name": "regular",
                                  "configuration": {"chunk_shape": [3, 4]}},
                   "chunk_key_encoding": {"name": "default",
                                          "configuration": {"separator": "/"}},
                   "fill_value": -7.5,
                   "codecs": [{"name": "bytes",
                               "configuration": {"endian": "little"}},
                              {"name": "gzip",
                               "configuration": {"level": 6}}],
                   "dimension_names": ["y", "x"]}, f)
    for ci in range(2):
        for cj in range(2):
            if ci == 1 and cj == 1:
                continue  # missing chunk -> fill_value
            vals = []
            for r in range(3):
                for c in range(4):
                    gy, gx = ci * 3 + r, cj * 4 + c
                    vals.append(gy * 10.0 + gx)  # pad regions ignored
            raw = struct.pack("<12d", *vals)
            comp = zlib.compressobj(6, zlib.DEFLATED, 31)  # gzip container
            data = comp.compress(raw) + comp.flush()
            cd = os.path.join(d, "c", str(ci))
            os.makedirs(cd, exist_ok=True)
            with open(os.path.join(cd, str(cj)), "wb") as f:
                f.write(data)

    # counts: [4] int32 BIG-endian, raw, v2-style dotted keys
    d = os.path.join(store, "counts")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "zarr.json"), "w") as f:
        json.dump({"zarr_format": 3, "node_type": "array",
                   "shape": [4], "data_type": "int32",
                   "chunk_grid": {"name": "regular",
                                  "configuration": {"chunk_shape": [4]}},
                   "chunk_key_encoding": {"name": "v2",
                                          "configuration": {"separator": "."}},
                   "fill_value": 0,
                   "codecs": [{"name": "bytes",
                               "configuration": {"endian": "big"}}]}, f)
    with open(os.path.join(d, "0"), "wb") as f:
        f.write(struct.pack(">4i", -3, 70000, 0, 12345))

    # xc: [3] uint16 LE raw, default keys
    d = os.path.join(store, "xc")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "zarr.json"), "w") as f:
        json.dump({"zarr_format": 3, "node_type": "array",
                   "shape": [3], "data_type": "uint16",
                   "chunk_grid": {"name": "regular",
                                  "configuration": {"chunk_shape": [2]}},
                   "chunk_key_encoding": {"name": "default",
                                          "configuration": {"separator": "/"}},
                   "fill_value": 0,
                   "codecs": [{"name": "bytes",
                               "configuration": {"endian": "little"}}]}, f)
    cd = os.path.join(d, "c")
    os.makedirs(cd, exist_ok=True)
    with open(os.path.join(cd, "0"), "wb") as f:
        f.write(struct.pack("<2H", 100, 65535))
    with open(os.path.join(cd, "1"), "wb") as f:
        f.write(struct.pack("<2H", 40000, 0))  # pad element ignored

# ---------------------------------------------------------------------------
# zarr v2 store (spec: zarr v2 storage specification)
# ---------------------------------------------------------------------------

def write_zarr(store):
    os.makedirs(store, exist_ok=True)
    with open(os.path.join(store, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    # lwp: 2-D f8 [5,6] chunks [3,4], zlib; value r*10 + c
    d = os.path.join(store, "lwp")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, ".zarray"), "w") as f:
        json.dump({"zarr_format": 2, "shape": [5, 6], "chunks": [3, 4],
                   "dtype": "<f8", "order": "C", "fill_value": 0.0,
                   "filters": None,
                   "compressor": {"id": "zlib", "level": 6}}, f)
    for ci in range(2):
        for cj in range(2):
            vals = []
            for r in range(3):
                for c in range(4):
                    gr, gc = ci * 3 + r, cj * 4 + c
                    v = gr * 10.0 + gc if gr < 5 and gc < 6 else 0.0
                    vals.append(v)
            raw = struct.pack("<12d", *vals)
            with open(os.path.join(d, "%d.%d" % (ci, cj)), "wb") as f:
                f.write(zlib.compress(raw, 6))
    # cnt: 1-D i4 [7] chunk [4], raw, chunk 1 ABSENT -> fill_value -1
    d = os.path.join(store, "cnt")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, ".zarray"), "w") as f:
        json.dump({"zarr_format": 2, "shape": [7], "chunks": [4],
                   "dtype": "<i4", "order": "C", "fill_value": -1,
                   "filters": None, "compressor": None}, f)
    with open(os.path.join(d, "0"), "wb") as f:
        f.write(struct.pack("<4i", 3, 1, 4, 1))
    # wind: 1-D BIG-endian f4 [3], raw — the '>f4' dtype branch
    d = os.path.join(store, "wind")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, ".zarray"), "w") as f:
        json.dump({"zarr_format": 2, "shape": [3], "chunks": [3],
                   "dtype": ">f4", "order": "C", "fill_value": 0.0,
                   "filters": None, "compressor": None}, f)
    with open(os.path.join(d, "0"), "wb") as f:
        f.write(struct.pack(">3f", 5.5, -2.25, 0.125))

def write_nested_zarr(store):
    """NESTED hierarchy, two levels, MIXED v2/v3 nodes: the xarray
    multi-variable layout (root group -> 'model' group -> arrays, with
    a v3 subgroup below). Arrays address by group path in the mount's
    dataset column: xc, model/lwp, model/deep/t2m."""
    os.makedirs(store, exist_ok=True)
    with open(os.path.join(store, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    # root-level v2 array xc [3] f8 raw
    d = os.path.join(store, "xc")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, ".zarray"), "w") as f:
        json.dump({"zarr_format": 2, "shape": [3], "chunks": [3],
                   "dtype": "<f8", "order": "C", "fill_value": 0.0,
                   "filters": None, "compressor": None}, f)
    with open(os.path.join(d, "0"), "wb") as f:
        f.write(struct.pack("<3d", 1.5, 2.5, 3.5))
    # group model/ with a v2 array lwp [2,3] chunks [1,3] zlib
    g = os.path.join(store, "model")
    os.makedirs(g, exist_ok=True)
    with open(os.path.join(g, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    d = os.path.join(g, "lwp")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, ".zarray"), "w") as f:
        json.dump({"zarr_format": 2, "shape": [2, 3], "chunks": [1, 3],
                   "dtype": "<f8", "order": "C", "fill_value": 0.0,
                   "filters": None,
                   "compressor": {"id": "zlib", "level": 6}}, f)
    for ci in range(2):
        raw = struct.pack("<3d", *[ci * 10.0 + c for c in range(3)])
        with open(os.path.join(d, "%d.0" % ci), "wb") as f:
            f.write(zlib.compress(raw, 6))
    # subgroup model/deep/ as a V3 group with a v3 array t2m [4] chunk [2]
    gd = os.path.join(g, "deep")
    os.makedirs(gd, exist_ok=True)
    with open(os.path.join(gd, "zarr.json"), "w") as f:
        json.dump({"zarr_format": 3, "node_type": "group"}, f)
    d = os.path.join(gd, "t2m")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "zarr.json"), "w") as f:
        json.dump({"zarr_format": 3, "node_type": "array",
                   "shape": [4], "data_type": "float64",
                   "chunk_grid": {"name": "regular",
                                  "configuration": {"chunk_shape": [2]}},
                   "chunk_key_encoding": {"name": "default",
                                          "configuration": {"separator": "/"}},
                   "fill_value": -1.0,
                   "codecs": [{"name": "bytes",
                               "configuration": {"endian": "little"}}]}, f)
    cd = os.path.join(d, "c")
    os.makedirs(cd, exist_ok=True)
    with open(os.path.join(cd, "0"), "wb") as f:
        f.write(struct.pack("<2d", 271.5, 272.25))
    with open(os.path.join(cd, "1"), "wb") as f:
        f.write(struct.pack("<2d", 273.0, 274.75))


# ---------------------------------------------------------------------------
# blosc1 container (c-blosc 1.x header spec) over LZ4 block streams —
# zarr-python's default compressor. Both the LZ4 encoder and the blosc
# framing below are Python-stdlib reimplementations of the public specs
# (lz4_Block_format.md; c-blosc README_HEADER.rst), sharing no code with
# the Scala decoders they prove.
# ---------------------------------------------------------------------------

def lz4_block_compress(src):
    """Greedy LZ4 block encoder: 4-byte hash matches, spec end rules
    (last 5 bytes literal, no match starting in last 12)."""
    n = len(src)
    out = bytearray()

    def emit(lit, match=None):
        ml = 0 if match is None else match[1] - 4
        token = (min(len(lit), 15) << 4) | (min(ml, 15) if match else 0)
        out.append(token)
        if len(lit) >= 15:
            rem = len(lit) - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out.extend(lit)
        if match:
            out.extend(struct.pack("<H", match[0]))
            if ml >= 15:
                rem = ml - 15
                while rem >= 255:
                    out.append(255)
                    rem -= 255
                out.append(rem)

    if n < 13:
        emit(src)
        return bytes(out)
    table = {}
    anchor = 0
    i = 0
    limit = n - 12     # no match may START at or past here
    mflimit = n - 5    # matches must END before the last 5 bytes
    while i < limit:
        key = src[i:i + 4]
        cand = table.get(key, -1)
        table[key] = i
        if cand >= 0 and i - cand <= 65535 and src[cand:cand + 4] == key:
            mlen = 4
            while i + mlen < mflimit and src[cand + mlen] == src[i + mlen]:
                mlen += 1
            emit(src[anchor:i], (i - cand, mlen))
            i += mlen
            anchor = i
        else:
            i += 1
    emit(src[anchor:])
    return bytes(out)


def byte_shuffle(block, typesize):
    n = len(block)
    nelems = n // typesize
    out = bytearray(n)
    for b in range(typesize):
        for i in range(nelems):
            out[b * nelems + i] = block[i * typesize + b]
    for t in range(nelems * typesize, n):
        out[t] = block[t]
    return bytes(out)


def blosc_compress(data, typesize, blocksize, shuffle=True):
    """One blosc1 frame the way c-blosc >= 1.14 lays it out (dont_split
    recorded in flags bit 4; memcpy fallback when nothing shrinks)."""
    nbytes = len(data)
    nblocks = (nbytes + blocksize - 1) // blocksize
    leftover = nbytes % blocksize
    split = 1 < typesize <= 16 and blocksize // typesize >= 128
    flags = 1 << 5  # lz4
    if shuffle and typesize > 1:
        flags |= 0x1
    if not split:
        flags |= 0x10
    blocks = []
    for j in range(nblocks):
        lob = j == nblocks - 1 and leftover != 0
        bsize = leftover if lob else blocksize
        block = data[j * blocksize:j * blocksize + bsize]
        if shuffle and typesize > 1:
            block = byte_shuffle(block, typesize)
        nstreams = typesize if (split and not lob) else 1
        neblock = bsize // nstreams
        body = bytearray()
        for s in range(nstreams):
            sub = block[s * neblock:(s + 1) * neblock]
            c = lz4_block_compress(sub)
            if len(c) >= neblock:  # store raw, like c-blosc
                body += struct.pack("<i", neblock) + sub
            else:
                body += struct.pack("<i", len(c)) + c
        blocks.append(bytes(body))
    total = 16 + 4 * nblocks + sum(len(b) for b in blocks)
    if total >= 16 + nbytes:  # memcpy fallback, like c-blosc
        return (struct.pack("<BBBB", 2, 1, 0x2, typesize) +
                struct.pack("<iii", nbytes, blocksize, 16 + nbytes) + data)
    out = bytearray(struct.pack("<BBBB", 2, 1, flags, typesize))
    out += struct.pack("<iii", nbytes, blocksize, total)
    off = 16 + 4 * nblocks
    for b in blocks:
        out += struct.pack("<i", off)
        off += len(b)
    for b in blocks:
        out += b
    return bytes(out)


def write_blosc_zarr(store):
    """zarr v2 store whose chunks use the blosc default compressor:
    split/non-split, shuffled, leftover-pad and memcpy frames."""
    os.makedirs(store, exist_ok=True)
    with open(os.path.join(store, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    # sst: 2-D f8 [6,8] chunks [4,5] -> pad regions; blocksize 1024:
    # chunk bytes 160 < blocksize -> single short (leftover) block
    d = os.path.join(store, "sst")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, ".zarray"), "w") as f:
        json.dump({"zarr_format": 2, "shape": [6, 8], "chunks": [4, 5],
                   "dtype": "<f8", "order": "C", "fill_value": "NaN",
                   "filters": None,
                   "compressor": {"id": "blosc", "cname": "lz4",
                                  "clevel": 5, "shuffle": 1,
                                  "blocksize": 1024}}, f)
    for ci in range(2):
        for cj in range(2):
            vals = []
            for r in range(4):
                for c in range(5):
                    gr, gc = ci * 4 + r, cj * 5 + c
                    vals.append(gr * 100.0 + gc if gr < 6 and gc < 8 else 0.0)
            raw = struct.pack("<20d", *vals)
            with open(os.path.join(d, "%d.%d" % (ci, cj)), "wb") as f:
                f.write(blosc_compress(raw, 8, 1024))
    # big: 1-D f8 [512] chunk [512] = 4096 B, blocksize 2048 -> 2 blocks,
    # SPLIT path (2048/8 = 256 >= 128), shuffled
    d = os.path.join(store, "big")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, ".zarray"), "w") as f:
        json.dump({"zarr_format": 2, "shape": [512], "chunks": [512],
                   "dtype": "<f8", "order": "C", "fill_value": 0.0,
                   "filters": None,
                   "compressor": {"id": "blosc", "cname": "lz4",
                                  "clevel": 5, "shuffle": 1,
                                  "blocksize": 2048}}, f)
    vals = [((i * i) % 89) * 0.25 for i in range(512)]
    with open(os.path.join(d, "0"), "wb") as f:
        f.write(blosc_compress(struct.pack("<512d", *vals), 8, 2048))
    # mask: 1-D i2 [100] chunk [64] = 128 B, blocksize 32 -> 4 blocks,
    # non-split (32/2 = 16 < 128) -> dont_split bit exercised
    d = os.path.join(store, "mask")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, ".zarray"), "w") as f:
        json.dump({"zarr_format": 2, "shape": [100], "chunks": [64],
                   "dtype": "<i2", "order": "C", "fill_value": -9,
                   "filters": None,
                   "compressor": {"id": "blosc", "cname": "lz4",
                                  "clevel": 5, "shuffle": 1,
                                  "blocksize": 32}}, f)
    m0 = [(i % 7) - 3 for i in range(64)]
    m1 = [(i % 5) for i in range(64)]  # elements 100.. are chunk pad
    with open(os.path.join(d, "0"), "wb") as f:
        f.write(blosc_compress(struct.pack("<64h", *m0), 2, 32))
    with open(os.path.join(d, "1"), "wb") as f:
        f.write(blosc_compress(struct.pack("<64h", *m1), 2, 32))
    # noise: incompressible f8 -> memcpy-flag frame
    d = os.path.join(store, "noise")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, ".zarray"), "w") as f:
        json.dump({"zarr_format": 2, "shape": [32], "chunks": [32],
                   "dtype": "<f8", "order": "C", "fill_value": 0.0,
                   "filters": None,
                   "compressor": {"id": "blosc", "cname": "lz4",
                                  "clevel": 5, "shuffle": 0,
                                  "blocksize": 256}}, f)
    rnd = random.Random(1234)
    nvals = [rnd.uniform(-1e6, 1e6) for _ in range(32)]
    frame = blosc_compress(struct.pack("<32d", *nvals), 8, 256, shuffle=False)
    assert frame[2] & 0x2, "noise chunk should take the memcpy path"
    with open(os.path.join(d, "0"), "wb") as f:
        f.write(frame)
    return {"big": vals, "noise": nvals}


def write_blosc_zarr3(store):
    """zarr v3 array whose pipeline is [bytes le, blosc(lz4, shuffle)]."""
    os.makedirs(store, exist_ok=True)
    with open(os.path.join(store, "zarr.json"), "w") as f:
        json.dump({"zarr_format": 3, "node_type": "group"}, f)
    d = os.path.join(store, "temp")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "zarr.json"), "w") as f:
        json.dump({"zarr_format": 3, "node_type": "array",
                   "shape": [5, 6], "data_type": "float64",
                   "chunk_grid": {"name": "regular",
                                  "configuration": {"chunk_shape": [3, 4]}},
                   "chunk_key_encoding": {"name": "default",
                                          "configuration": {"separator": "/"}},
                   "fill_value": "NaN",
                   "codecs": [
                       {"name": "bytes",
                        "configuration": {"endian": "little"}},
                       {"name": "blosc",
                        "configuration": {"cname": "lz4", "clevel": 5,
                                          "shuffle": "shuffle",
                                          "typesize": 8,
                                          "blocksize": 0}}]}, f)
    for ci in range(2):
        for cj in range(2):
            vals = []
            for r in range(3):
                for c in range(4):
                    gr, gc = ci * 3 + r, cj * 4 + c
                    vals.append(gr * 10.0 + gc * 0.5 if gr < 5 and gc < 6 else 0.0)
            raw = struct.pack("<12d", *vals)
            cd = os.path.join(d, "c", str(ci))
            os.makedirs(cd, exist_ok=True)
            with open(os.path.join(cd, str(cj)), "wb") as f:
                f.write(blosc_compress(raw, 8, 96))


def write_sharded_zarr3(store):
    """zarr v3 array using the sharding_indexed codec (ZEP-2): each chunk
    file is a shard of gzip'd inner chunks plus a crc32c-checked
    (offset, nbytes) uint64-pair index at the end. One inner chunk is
    deliberately ABSENT (2^64-1 sentinel pair) -> reads as fill."""
    os.makedirs(store, exist_ok=True)
    with open(os.path.join(store, "zarr.json"), "w") as f:
        json.dump({"zarr_format": 3, "node_type": "group"}, f)
    d = os.path.join(store, "temp")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "zarr.json"), "w") as f:
        json.dump({"zarr_format": 3, "node_type": "array",
                   "shape": [6, 8], "data_type": "float64",
                   "chunk_grid": {"name": "regular",
                                  "configuration": {"chunk_shape": [4, 8]}},
                   "chunk_key_encoding": {"name": "default",
                                          "configuration": {"separator": "/"}},
                   "fill_value": -1.0,
                   "codecs": [{
                       "name": "sharding_indexed",
                       "configuration": {
                           "chunk_shape": [2, 4],
                           "codecs": [
                               {"name": "bytes",
                                "configuration": {"endian": "little"}},
                               {"name": "gzip",
                                "configuration": {"level": 6}}],
                           "index_codecs": [
                               {"name": "bytes",
                                "configuration": {"endian": "little"}},
                               {"name": "crc32c"}],
                           "index_location": "end"}}]}, f)
    # value(gr, gc) = gr*10 + gc (array shape [6,8]); shard grid 2x1 of
    # outer [4,8] chunks; inner grid per shard 2x2 of [2,4] chunks
    missing = (1, 0)  # shard 1, inner chunk 0 = rows 4-5, cols 0-3 (VISIBLE)
    for ci in range(2):
        body = b""
        index = b""
        for g in range(4):          # inner chunks, C order over (2, 2)
            gi, gj = g // 2, g % 2
            if (ci, g) == missing:
                index += struct.pack("<QQ", 2**64 - 1, 2**64 - 1)
                continue
            vals = []
            for r in range(2):
                for c in range(4):
                    gr = ci * 4 + gi * 2 + r
                    gc = gj * 4 + c
                    vals.append(gr * 10.0 + gc if gr < 6 and gc < 8 else -1.0)
            raw = gzip.compress(struct.pack("<8d", *vals), 6, mtime=0)
            index += struct.pack("<QQ", len(body), len(raw))
            body += raw
        index += struct.pack("<I", _crc32c(index))
        cd = os.path.join(d, "c", str(ci))
        os.makedirs(cd, exist_ok=True)
        with open(os.path.join(cd, "0"), "wb") as f:
            f.write(body + index)


# ---------------------------------------------------------------------------
# WARC/1.0 (ISO 28500) — gzip member per record, the Common Crawl shape
# ---------------------------------------------------------------------------

def warc_record(rtype, uri, date, payload, extra=()):
    head = "WARC/1.0\r\n"
    head += "WARC-Type: %s\r\n" % rtype
    if uri:
        head += "WARC-Target-URI: %s\r\n" % uri
    head += "WARC-Date: %s\r\n" % date
    for k, v in extra:
        head += "%s: %s\r\n" % (k, v)
    head += "Content-Length: %d\r\n\r\n" % len(payload)
    return head.encode() + payload + b"\r\n\r\n"

def write_warc(path):
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            b"<html><body>golden warc fixture</body></html>")
    recs = [
        warc_record("warcinfo", "", "2024-01-15T00:00:00Z",
                    b"software: make_fixtures.py\r\n"),
        warc_record("response", "https://example.org/golden",
                    "2024-01-15T00:00:01Z", http,
                    [("Content-Type", "application/http; msgtype=response")]),
    ]
    with open(path, "wb") as f:
        for r in recs:
            # mtime=0 + fixed OS byte: byte-identical across runs
            f.write(gzip.compress(r, 6, mtime=0))

# ---------------------------------------------------------------------------
# RIFF/WAVE PCM16 mono — with an unknown LIST chunk the reader must skip
# ---------------------------------------------------------------------------

def write_wav(path):
    samples = [(i * 1000 - 7000) for i in range(16)]
    data = struct.pack("<16h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    lst = b"INFOISFT" + b"fixture\0"
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"LIST" + struct.pack("<I", len(lst)) + lst
            + b"data" + struct.pack("<I", len(data)) + data)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)

# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# randomized HDF5 fuzz fixtures: seeded sweep over the v0-generation
# parameter space (rank, dims, dtype, byte order, layout, chunk geometry
# incl. edge chunks, filter pipelines). Each file carries ONE dataset
# 'data'; manifest.txt records the expected decode so the Scala side
# asserts values without sharing any generation code.
# ---------------------------------------------------------------------------

def h5_datatype_body(dt, be, prec=None, off=0):
    """Datatype message BODY for f32/f64 (class 1) or i32/i64 (class 0,
    signed 2's complement), either byte order (bit 0 of class bit
    field) — same body under v1 and OHDR framing. prec/off carve a
    sub-precision fixed-point type (the nbit shape)."""
    order = 1 if be else 0
    if dt == "f64":
        props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
        return struct.pack("<BBBBI", 0x11, 0x20 | order, 63, 0, 8) + props
    if dt == "f32":
        props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
        return struct.pack("<BBBBI", 0x11, 0x20 | order, 31, 0, 4) + props
    size = 4 if dt == "i32" else 8
    props = struct.pack("<HH", off, prec if prec is not None else size * 8)
    return struct.pack("<BBBBI", 0x10, 0x08 | order, 0, 0, size) + props

def h5_datatype_any(dt, be, prec=None, off=0):
    return h5_msg(0x0003, h5_datatype_body(dt, be, prec, off))

def h5v2_filter_body(filt, esize, nelmts=0):
    """Pipeline message v2 body: version 2, nfilters, then unpadded
    records (id(2) flags(2) nvals(2) values) — ids < 256 carry no name."""
    def rec(fid, vals):
        return struct.pack("<HHH", fid, 0, len(vals)) + \
            b"".join(struct.pack("<I", v) for v in vals)
    if filt.startswith("nbit:"):
        _, prec, off = filt.split(":")
        recs = [rec(5, [8, 0, nelmts, 1, esize, 0, int(prec), int(off)])]
    elif filt == "soint":
        recs = [rec(6, [2, 0, nelmts, 0, 4, 1, 0, 0, 0, 0])]
    elif filt.startswith("sofd:"):
        recs = [rec(6, [0, int(filt.split(":")[1]), nelmts, 1, esize,
                        0, 0, 0, 0, 0])]
    else:
        recs = {"deflate": [rec(1, [6])],
                "shufdef": [rec(2, [esize]), rec(1, [6])],
                "flet": [rec(3, [])],
                "fletshufdef": [rec(3, []), rec(2, [esize]), rec(1, [6])]}[filt]
    return struct.pack("<BB", 2, len(recs)) + b"".join(recs)

def h5_layout_compact(raw):
    return h5_msg(0x0008, struct.pack("<BBH", 3, 0, len(raw)) + raw)

_DT_PACK = {"f32": "f", "f64": "d", "i32": "i", "i64": "q"}
_DT_SIZE = {"f32": 4, "f64": 8, "i32": 4, "i64": 8}

def _pack_vals(vals, dt, be):
    return struct.pack((">" if be else "<") + str(len(vals)) + _DT_PACK[dt],
                       *vals)

def _chunk_gather(vals, dims, cdims, origin):
    """Row-major elements of the chunk at `origin`, zero-padded where the
    chunk overhangs the dataset bounds (the edge-chunk rule)."""
    zero = 0 if isinstance(vals[0], int) else 0.0
    out = []
    for idx in itertools.product(*[range(c) for c in cdims]):
        pos = [origin[k] + idx[k] for k in range(len(dims))]
        if all(p < d for p, d in zip(pos, dims)):
            flat = 0
            for k in range(len(dims)):
                flat = flat * dims[k] + pos[k]
            out.append(vals[flat])
        else:
            out.append(zero)
    return out

def _apply_pipeline(raw, filt, esize):
    """Forward filter pipeline in libhdf5 write order (fletcher32 first,
    then shuffle, then deflate — each agnostic of the others, so an
    esize-dividing checksum gets shuffled as one more element). nbit /
    scale-offset run standalone (packed LOGICAL values: the decoder
    materializes converted full-width natives)."""
    if filt.startswith("nbit:"):
        prec = int(filt.split(":")[1])
        n = len(raw) // esize
        b = _Bits()
        mask = (1 << prec) - 1
        for v in struct.unpack("<%di" % n, raw):
            b.put(v & mask, prec)
        return b.bytes()
    if filt == "soint":
        n = len(raw) // esize
        return so_int_chunk(list(struct.unpack("<%di" % n, raw)))
    if filt.startswith("sofd:"):
        d = int(filt.split(":")[1])
        n = len(raw) // esize
        fmt = ("<%df" if esize == 4 else "<%dd") % n
        return so_float_chunk(list(struct.unpack(fmt, raw)), esize, d)
    if filt in ("flet", "fletshufdef"):
        raw = raw + struct.pack("<I", fletcher32(raw))
    if filt in ("shufdef", "fletshufdef"):
        raw = byte_shuffle(raw, esize)
    if filt in ("deflate", "shufdef", "fletshufdef"):
        raw = zlib.compress(raw, 6)
    return raw

def _h5_filter_msgs(filt, esize, nelmts=0):
    if filt.startswith("nbit:"):
        _, prec, off = filt.split(":")
        return [h5_filter_nbit(nelmts, int(prec), int(off))]
    if filt == "soint":
        return [h5_filter_scaleoffset(2, 0, nelmts, 0, 4, 1)]
    if filt.startswith("sofd:"):
        return [h5_filter_scaleoffset(0, int(filt.split(":")[1]), nelmts,
                                      1, esize, 0)]
    if filt == "deflate":
        return [h5_filter_deflate(6)]
    if filt == "shufdef":
        return [h5_filter_shuffle_deflate(esize, 6)]
    if filt == "flet":
        return [h5_filter_fletcher_only()]
    if filt == "fletshufdef":
        return [h5_filter_fletcher_shuffle_deflate(esize, 6)]
    return []

def write_hdf5_fuzz_one(path, dims, cdims, dt, be, layout, filt, vals,
                        gen="v0"):
    """One-dataset file holding 'data' with the given geometry/dtype/
    layout/filters: gen='v0' writes the symbol-table generation
    (superblock v0, v1 headers, padded v1 messages), gen='v2' the
    libver-latest generation (superblock v3, OHDR headers, compact Link
    root, pipeline-v2 filter records). Chunk storage uses the v1 B-tree
    layout-v3 form under BOTH generations (the libver-v18 shape)."""
    sb_len = 96 if gen == "v0" else 48
    buf = bytearray(b"\0" * sb_len)

    def alloc(blob):
        off = len(buf)
        buf.extend(blob)
        return off

    esize = _DT_SIZE[dt]
    prec, off = None, 0
    if filt.startswith("nbit:"):
        prec, off = int(filt.split(":")[1]), int(filt.split(":")[2])
    if gen == "v0":
        msgs = [h5_dataspace(dims), h5_datatype_any(dt, be, prec, off)]
    else:
        msgs = [h5_dataspace_v2(dims),
                h5v2_msg(0x03, h5_datatype_body(dt, be, prec, off))]

    def layout_msg(body):
        return h5_msg(0x0008, body) if gen == "v0" else h5v2_msg(0x08, body)

    if layout == "compact":
        raw = _pack_vals(vals, dt, be)
        msgs.append(layout_msg(struct.pack("<BBH", 3, 0, len(raw)) + raw))
    elif layout == "contig":
        addr = alloc(_pack_vals(vals, dt, be))
        msgs.append(layout_msg(
            struct.pack("<BBQQ", 3, 1, addr, len(vals) * esize)))
    else:  # chunked: v1 B-tree, one leaf, keys in row-major origin order
        entries = []
        origins = itertools.product(
            *[range(0, d, c) for d, c in zip(dims, cdims)])
        for origin in origins:
            raw = _pack_vals(_chunk_gather(vals, dims, cdims, origin), dt, be)
            stored = _apply_pipeline(raw, filt, esize)
            entries.append((len(stored), origin, alloc(stored)))
        bt = bytearray()
        bt += b"TREE" + struct.pack("<BBH", 1, 0, len(entries))
        bt += struct.pack("<QQ", UNDEF, UNDEF)
        for size, origin, addr in entries:
            bt += struct.pack("<II", size, 0)
            bt += b"".join(struct.pack("<Q", o) for o in origin)
            bt += struct.pack("<Q", 0)  # elem-size dimension offset
            bt += struct.pack("<Q", addr)
        bt += struct.pack("<II", 0, 0)
        bt += b"".join(struct.pack("<Q", d) for d in dims)
        bt += struct.pack("<Q", 0)
        btree_addr = alloc(bytes(bt))
        if filt != "none":
            nelm = 1
            for c in cdims:
                nelm *= c
            if gen == "v0":
                msgs.extend(_h5_filter_msgs(filt, esize, nelm))
            else:
                msgs.append(h5v2_msg(0x0B, h5v2_filter_body(filt, esize, nelm)))
        lay = struct.pack("<BBB", 3, 2, len(cdims) + 1)
        lay += struct.pack("<Q", btree_addr)
        lay += b"".join(struct.pack("<I", c) for c in cdims)
        lay += struct.pack("<I", esize)
        msgs.append(layout_msg(lay))

    if gen == "v2":
        data_oh = alloc(h5v2_object_header(msgs))
        root_oh = alloc(h5v2_object_header([h5_link_msg("data", data_oh)]))
        sb = io.BytesIO()
        sb.write(b"\x89HDF\r\n\x1a\n")
        sb.write(struct.pack("<BBBB", 2, 8, 8, 0))
        sb.write(struct.pack("<QQQQ", 0, UNDEF, len(buf), root_oh))
        sb.write(b"\0\0\0\0")  # checksum (not verified by this codec)
        sb_bytes = sb.getvalue()
    else:
        data_oh = alloc(h5_object_header(msgs))
        heap_data = bytearray(b"\0" * 8)
        name_off = len(heap_data)
        heap_data += b"data\0"
        heap_data += b"\0" * ((-len(heap_data)) % 8)
        heap_data_addr = alloc(bytes(heap_data))
        heap_addr = alloc(b"HEAP" + struct.pack("<B3xQQQ", 0, len(heap_data),
                                                UNDEF, heap_data_addr))
        snod = b"SNOD" + struct.pack("<BBH", 1, 0, 1)
        snod += struct.pack("<QQII16x", name_off, data_oh, 0, 0)
        snod_addr = alloc(snod)
        gtree = b"TREE" + struct.pack("<BBH", 0, 0, 1)
        gtree += struct.pack("<QQ", UNDEF, UNDEF)
        gtree += struct.pack("<QQ", 0, snod_addr)
        gtree += struct.pack("<Q", name_off)
        gtree_addr = alloc(gtree)
        root_oh = alloc(h5_object_header([
            h5_msg(0x0011, struct.pack("<QQ", gtree_addr, heap_addr)),
        ]))
        sb = io.BytesIO()
        sb.write(b"\x89HDF\r\n\x1a\n")
        sb.write(struct.pack("<BBBBBBBB", 0, 0, 0, 0, 0, 8, 8, 0))
        sb.write(struct.pack("<HHI", 4, 16, 0))
        sb.write(struct.pack("<QQQQ", 0, UNDEF, len(buf), UNDEF))
        sb.write(struct.pack("<QQII", 0, root_oh, 1, 0))
        sb.write(struct.pack("<QQ", gtree_addr, heap_addr))
        sb_bytes = sb.getvalue()
    assert len(sb_bytes) == sb_len, len(sb_bytes)
    buf[0:sb_len] = sb_bytes
    with open(path, "wb") as f:
        f.write(bytes(buf))

def write_hdf5_fuzz(outdir, n=32, seed=20260814):
    """Seeded random sweep: n one-dataset files + manifest.txt with lines
    `name;dtype;order;layout;filter;dims;chunks;values` (values via repr,
    exact for the binary fractions and ints used)."""
    os.makedirs(outdir, exist_ok=True)
    rng = random.Random(seed)
    cases = []
    for t in range(n):
        rank = rng.randint(1, 3)
        dims = [rng.randint(1, 7) for _ in range(rank)]
        dt = rng.choice(["f32", "f64", "i32", "i64"])
        be = rng.random() < 0.35
        layout = rng.choice(["contig", "chunked", "chunked", "chunked",
                             "compact"])
        filt = "none"
        cdims = None
        if layout == "chunked":
            while True:
                cdims = [rng.randint(1, d) for d in dims]
                nch = 1
                for d, c in zip(dims, cdims):
                    nch *= -(-d // c)
                if nch <= 8:
                    break
            filt = rng.choice(["none", "deflate", "shufdef", "flet",
                               "fletshufdef"])
        cases.append((dims, cdims, dt, be, layout, filt))
    # directed tail: the esize-4 fletcher+shuffle geometry (checksum
    # divides the element size, so shuffle treats it as one more element)
    # and BE fletcher variants — rare draws worth pinning every run
    cases += [
        ([9], [4], "f32", False, "chunked", "fletshufdef"),
        ([7], [3], "i32", True, "chunked", "fletshufdef"),
        ([3, 5], [2, 3], "i64", True, "chunked", "fletshufdef"),
        ([6], [4], "f64", True, "chunked", "flet"),
        # nbit / scale-offset directed tail: sub-precision at offset 0
        # and 5 (ragged chunks both), SO_INT, and float D-scale in both
        # widths — the round-12 filter decodes under fuzz geometry
        ([9], [4], "i32", False, "chunked", "nbit:12:0"),
        ([3, 5], [2, 3], "i32", False, "chunked", "nbit:7:5"),
        ([10], [4], "i32", False, "chunked", "soint"),
        ([8], [3], "f32", False, "chunked", "sofd:2"),
        ([2, 6], [2, 4], "f64", False, "chunked", "sofd:3"),
    ]
    cases = [c + ("v0",) for c in cases]
    # same filters through the pipeline-v2 record framing
    cases += [
        ([7], [3], "i32", False, "chunked", "nbit:9:3", "v2"),
        ([6], [4], "f32", False, "chunked", "sofd:2", "v2"),
        ([9], [4], "i32", False, "chunked", "soint", "v2"),
    ]
    # second sweep: the libver-latest generation (superblock v3 + OHDR
    # headers + compact Link root + pipeline-v2 filter records); rank
    # <= 2 and small payloads keep the OHDR one-chunk (the compact-link
    # regime this generation exists for)
    for t in range(16):
        rank = rng.randint(1, 2)
        dims = [rng.randint(1, 6) for _ in range(rank)]
        nelem = 1
        for d in dims:
            nelem *= d
        dt = rng.choice(["f32", "f64", "i32", "i64"])
        be = rng.random() < 0.35
        layout = rng.choice(["contig", "chunked", "chunked", "compact"])
        if layout == "compact" and nelem * _DT_SIZE[dt] > 150:
            layout = "contig"  # OHDR one-chunk size bound
        filt = "none"
        cdims = None
        if layout == "chunked":
            while True:
                cdims = [rng.randint(1, d) for d in dims]
                nch = 1
                for d, c in zip(dims, cdims):
                    nch *= -(-d // c)
                if nch <= 8:
                    break
            filt = rng.choice(["none", "deflate", "shufdef", "flet",
                               "fletshufdef"])
        cases.append((dims, cdims, dt, be, layout, filt, "v2"))
    lines = []
    for t, (dims, cdims, dt, be, layout, filt, gen) in enumerate(cases):
        name = "fz%02d" % t
        nelem = 1
        for d in dims:
            nelem *= d
        if filt.startswith("nbit:"):
            p = int(filt.split(":")[1])  # values must fit the precision
            vals = [((i * 37) % (1 << p)) - (1 << (p - 1)) for i in range(nelem)]
        elif dt.startswith("f"):
            vals = [i * 0.25 - 3.0 for i in range(nelem)]
        elif dt == "i32":
            vals = [i * 7919 - 12345 for i in range(nelem)]
        else:
            vals = [(i - 3) * 98765432101 for i in range(nelem)]  # > 2^32, < 2^53
        write_hdf5_fuzz_one(os.path.join(outdir, name + ".h5"),
                            dims, cdims, dt, be, layout, filt, vals, gen)
        lines.append(";".join([
            name, gen, dt, "be" if be else "le", layout, filt,
            ",".join(str(d) for d in dims),
            ",".join(str(c) for c in cdims) if cdims else "-",
            ",".join(repr(v) for v in vals)]))
    with open(os.path.join(outdir, "manifest.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")

_H4_PACK = {5: "f", 6: "d", 20: "b", 21: "B", 22: "h", 23: "H",
            24: "i", 25: "I"}
_H4_WIDTH = {5: 32, 6: 64, 20: 8, 21: 8, 22: 16, 23: 16, 24: 32, 25: 32}

def write_hdf4_fuzz(outdir, n=14, seed=2718281):
    """Seeded random DFSD-subset HDF4 files: 1-2 SDSs each, all eight
    numeric DFNT types (incl. the unsigned widths — u32 values past 2^31
    prove the unsigned decode), rank 1-3, plain data elements and
    deflate special elements. h4_manifest.txt carries the expectations."""
    rng = random.Random(seed)
    lines = []
    for t in range(n):
        name = "hf%02d" % t
        objs = []

        def nt(ref, dfnt, width_bits):
            objs.append((106, ref, struct.pack(">BBBB", 1, dfnt, width_bits, 0)))

        def sdd(ref, dims):
            p = struct.pack(">H", len(dims))
            p += b"".join(struct.pack(">i", d) for d in dims)
            p += struct.pack(">HH", 106, ref)
            p += b"".join(struct.pack(">HH", 106, ref) for _ in dims)
            objs.append((701, ref, p))

        for s in range(rng.randint(1, 2)):
            ref = s + 1
            rank = rng.randint(1, 3)
            dims = [rng.randint(1, 6) for _ in range(rank)]
            # cycle so every DFNT type appears across the sweep
            dfnt = [5, 6, 20, 21, 22, 23, 24, 25][(2 * t + s) % 8]
            deflate = rng.random() < 0.5
            nelem = 1
            for d in dims:
                nelem *= d
            vals = {
                5: [i * 0.25 - 2.0 for i in range(nelem)],
                6: [i * 0.125 - 5.0 for i in range(nelem)],
                20: [(i % 200) - 100 for i in range(nelem)],
                21: [(i * 7) % 256 for i in range(nelem)],
                22: [i * 101 - 9000 for i in range(nelem)],
                23: [(i * 517) % 65536 for i in range(nelem)],
                24: [i * 7919 - 12345 for i in range(nelem)],
                25: [(i * 104729 + 3000000000) % 4294967296
                     for i in range(nelem)],
            }[dfnt]
            label = "v%d" % s
            nt(ref, dfnt, _H4_WIDTH[dfnt])
            sdd(ref, dims)
            objs.append((704, ref, label.encode() + b"\0"))
            raw = struct.pack(">%d%s" % (nelem, _H4_PACK[dfnt]), *vals)
            if deflate:
                objs.append((40, ref, zlib.compress(raw, 6)))
                sp = struct.pack(">HHIHHHH", 3, 0, len(raw), ref, 0, 4, 6)
                objs.append((0x4000 | 702, ref, sp))
            else:
                objs.append((702, ref, raw))
            objs.append((720, ref,
                         struct.pack(">HHHHHH", 701, ref, 702, ref, 704, ref)))
            lines.append(";".join([
                name, label, str(dfnt), "deflate" if deflate else "plain",
                ",".join(map(str, dims)),
                ",".join(repr(v) for v in vals)]))
        ndds = len(objs)
        header = 4 + 2 + 4 + 12 * ndds
        out = io.BytesIO()
        out.write(struct.pack(">I", 0x0E031301))
        out.write(struct.pack(">Hi", ndds, 0))
        off = header
        for tag, ref, payload in objs:
            out.write(struct.pack(">HHii", tag, ref, off, len(payload)))
            off += len(payload)
        for _, _, payload in objs:
            out.write(payload)
        with open(os.path.join(outdir, name + ".hdf"), "wb") as f:
            f.write(out.getvalue())
    with open(os.path.join(outdir, "h4_manifest.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")

_NC_SIZE = {1: 1, 3: 2, 4: 4, 5: 4, 6: 8, 7: 1, 8: 2, 9: 4, 10: 8, 11: 8}
_NC_PACK = {1: "b", 3: "h", 4: "i", 5: "f", 6: "d", 7: "B", 8: "H", 9: "I", 10: "q", 11: "Q"}

def write_netcdf3_fuzz(outdir, n=24, seed=31337):
    """Seeded random NetCDF classic files: CDF-1, CDF-2 (64-bit begins),
    and CDF-5 (8-byte NON_NEG fields + the extended integer types),
    fixed-size variables, ONE record variable (the spec's no-padding
    special case for sub-4-byte types), and TWO interleaved record
    variables (per-record vsize padding); random ranks/dims/types, slab
    padding to 4 bytes throughout. nc_manifest.txt carries the expected
    decode per (file, variable)."""
    rng = random.Random(seed)

    def pad4(x):
        return (x + 3) & ~3

    def gen_vals(nctype, count):
        if nctype == 5:
            return [i * 0.25 - 2.0 for i in range(count)]
        if nctype == 6:
            return [i * 0.125 - 5.0 for i in range(count)]
        if nctype == 1:
            return [(i % 200) - 100 for i in range(count)]
        if nctype == 3:
            return [i * 101 - 9000 for i in range(count)]
        if nctype == 7:
            return [(i * 13) % 256 for i in range(count)]
        if nctype == 8:
            return [(i * 251) % 65536 for i in range(count)]
        if nctype == 9:
            return [(4_000_000_000 + i * 17) % 2**32 for i in range(count)]
        if nctype == 10:
            return [i * 7_919_001_234 - 5_000_000_000 for i in range(count)]
        if nctype == 11:
            # stay under 2**53 so the Double round-trip is exact
            return [4_503_599_000_000 + i * 97 for i in range(count)]
        return [i * 7919 - 12345 for i in range(count)]

    lines = []
    for t in range(n):
        name = "nf%02d" % t
        version = rng.choice([1, 2, 5]) if t < 15 else 5  # tail: CDF-5 heavy
        wide = version == 5
        def nn(v):  # NON_NEG field
            return struct.pack(">q" if wide else ">i", v)
        def ncn(s_):
            b = s_.encode()
            return nn(len(b)) + b + b"\0" * ((-len(b)) % 4)
        def ncatts(items):  # [(name, strval)]
            if not items:
                return struct.pack(">i", 0) + nn(0)
            out = struct.pack(">i", 0x0C) + nn(len(items))
            for nm_, v_ in items:
                vb = v_.encode()
                out += ncn(nm_) + struct.pack(">i", 2) + nn(len(vb)) + vb
                out += b"\0" * ((-len(vb)) % 4)
            return out
        kind = ["fixed", "rec1", "rec2"][t % 3]
        rank = rng.randint(1, 3)
        fixed_lens = [rng.randint(1, 5) for _ in range(rank)]
        if kind == "fixed":
            numrecs = 0
            dims = [("d%d" % i, L) for i, L in enumerate(fixed_lens)]
        else:
            numrecs = rng.randint(1, 4)
            dims = [("t", 0)] + \
                [("d%d" % i, L) for i, L in enumerate(fixed_lens[:rank - 1])]
        # variables: record vars must come LAST in the var list
        vars_ = []
        tpool = [1, 3, 4, 5, 6] + ([7, 8, 9, 10, 11] if wide else [])
        if kind == "fixed":
            vars_.append(("a", list(range(len(dims))), rng.choice(tpool)))
            vars_.append(("b", [len(dims) - 1],
                          rng.choice([4, 5, 6] + ([9, 10, 11] if wide else []))))
        elif kind == "rec1":
            # sub-4-byte types sometimes: the unpadded-record special case
            vars_.append(("r0", list(range(len(dims))),
                          rng.choice([1, 3, 5, 6] + ([7, 8] if wide else []))))
        else:
            vars_.append(("r0", list(range(len(dims))),
                          rng.choice([1, 3] + ([7, 8] if wide else []))))
            vars_.append(("r1", list(range(len(dims))),
                          rng.choice([4, 5, 6] + ([9, 10] if wide else []))))
        rec_count = sum(1 for _, ds, _ in vars_ if ds and dims[ds[0]][1] == 0)

        def var_sizes(nm, dimids, nctype):
            shape = [dims[d][1] for d in dimids]
            is_rec = bool(shape) and shape[0] == 0
            per = 1
            for L in (shape[1:] if is_rec else shape):
                per *= L
            raw = per * _NC_SIZE[nctype]
            if is_rec and rec_count == 1 and _NC_SIZE[nctype] < 4:
                return is_rec, per, raw          # spec special case: no pad
            return is_rec, per, pad4(raw)

        def var_header(nm, dimids, attrs, nctype, vsize, begin):
            out = ncn(nm) + nn(len(dimids))
            out += b"".join(nn(d) for d in dimids)
            out += ncatts(attrs)
            out += struct.pack(">i", nctype) + nn(vsize)
            out += struct.pack(">q" if version >= 2 else ">i", begin)
            return out

        gatts = [("title", "fuzz %d" % t)] if rng.random() < 0.5 else []
        vattrs = {nm: ([("units", "K")] if rng.random() < 0.5 else [])
                  for nm, _, _ in vars_}

        def build(begins):
            hdr = io.BytesIO()
            hdr.write(b"CDF" + bytes([version]))
            hdr.write(nn(numrecs))
            hdr.write(struct.pack(">i", 0x0A) + nn(len(dims)))
            for dn, dl in dims:
                hdr.write(ncn(dn) + nn(dl))
            hdr.write(ncatts(gatts))
            hdr.write(struct.pack(">i", 0x0B) + nn(len(vars_)))
            for (nm, ds, ty), bg in zip(vars_, begins):
                _, _, vs = var_sizes(nm, ds, ty)
                hdr.write(var_header(nm, ds, vattrs[nm], ty, vs, bg))
            return hdr.getvalue()

        hdr_len = len(build([0] * len(vars_)))
        begins = []
        off = hdr_len
        for nm, ds, ty in vars_:           # fixed vars first in both file
            is_rec, per, vs = var_sizes(nm, ds, ty)  # order and layout
            if not is_rec:
                begins.append(off)
                off += vs
        rec_start = off
        roff = rec_start
        for nm, ds, ty in vars_:
            is_rec, per, vs = var_sizes(nm, ds, ty)
            if is_rec:
                begins.append(roff)
                roff += vs
        blob = bytearray(build(begins))
        all_vals = {}
        for nm, ds, ty in vars_:
            is_rec, per, vs = var_sizes(nm, ds, ty)
            total = per * (numrecs if is_rec else 1)
            all_vals[nm] = gen_vals(ty, total)
        for nm, ds, ty in vars_:           # fixed slabs (+ pad to vsize)
            is_rec, per, vs = var_sizes(nm, ds, ty)
            if not is_rec:
                raw = struct.pack(">%d%s" % (per, _NC_PACK[ty]), *all_vals[nm])
                blob += raw + b"\0" * (vs - len(raw))
        for r in range(numrecs):           # record slabs, interleaved
            for nm, ds, ty in vars_:
                is_rec, per, vs = var_sizes(nm, ds, ty)
                if is_rec:
                    chunk = all_vals[nm][r * per:(r + 1) * per]
                    raw = struct.pack(">%d%s" % (per, _NC_PACK[ty]), *chunk)
                    blob += raw + b"\0" * (vs - len(raw))
        with open(os.path.join(outdir, name + ".nc"), "wb") as f:
            f.write(bytes(blob))
        for nm, ds, ty in vars_:
            shape = [dims[d][1] for d in ds]
            if shape and shape[0] == 0:
                shape[0] = numrecs
            lines.append(";".join([
                name, str(version), nm,
                ",".join(dims[d][0] for d in ds),
                ",".join(map(str, shape)),
                ",".join(repr(v) for v in all_vals[nm])]))
    with open(os.path.join(outdir, "nc_manifest.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")

_ZDT_PACK = {"f8": "d", "f4": "f", "i8": "q", "i4": "i", "i2": "h", "i1": "b"}

def write_zarr_fuzz(outdir, n=20, seed=424242):
    """Seeded random zarr-v2 stores, one array 'data' each: rank 1-3,
    all 11 reader-supported dtypes, zlib/null compressor, random chunk
    geometry, randomly MISSING chunk files (read back as fill_value),
    and edge-chunk overhang padded with a sentinel the reader must skip.
    zarr_manifest.txt carries the expected full C-order decode."""
    rng = random.Random(seed)
    lines = []
    dtypes = ["<f8", "<f4", "<i8", "<i4", "<i2",
              ">f8", ">f4", ">i8", ">i4", ">i2", "|i1"]
    for t in range(n):
        name = "zf%02d" % t
        rank = rng.randint(1, 3)
        shape = [rng.randint(1, 7) for _ in range(rank)]
        chunks = [rng.randint(1, s) for s in shape]
        dtype = dtypes[t % len(dtypes)]  # every dtype at least once
        comp = rng.choice([None, "zlib"])
        fill = rng.choice([0, -1, 7])
        nelem = 1
        for s in shape:
            nelem *= s
        kind = dtype[1:]
        if kind[0] == "f":
            vals = [i * 0.25 - 2.0 for i in range(nelem)]
        elif kind == "i1":
            vals = [(i % 200) - 100 for i in range(nelem)]
        elif kind == "i2":
            vals = [i * 101 - 14000 for i in range(nelem)]
        elif kind == "i4":
            vals = [i * 7919 - 12345 for i in range(nelem)]
        else:
            vals = [(i - 2) * 98765432101 for i in range(nelem)]
        arr_dir = os.path.join(outdir, name + ".zarr", "data")
        os.makedirs(arr_dir, exist_ok=True)
        meta = {"zarr_format": 2, "shape": shape, "chunks": chunks,
                "dtype": dtype, "order": "C", "filters": None,
                "fill_value": fill,
                "compressor": ({"id": "zlib", "level": 6} if comp else None)}
        with open(os.path.join(arr_dir, ".zarray"), "w") as f:
            json.dump(meta, f, sort_keys=True)
        expected = [float(fill)] * nelem
        order = ">" if dtype[0] == ">" else "<"
        pk = _ZDT_PACK[kind]
        n_missing = 0
        grids = [range(-(-s // c)) for s, c in zip(shape, chunks)]
        for ci in itertools.product(*grids):
            if rng.random() < 0.3:
                n_missing += 1
                continue  # missing chunk file -> fill_value region
            origin = [ci[k] * chunks[k] for k in range(rank)]
            elems = []
            for idx in itertools.product(*[range(c) for c in chunks]):
                pos = [origin[k] + idx[k] for k in range(rank)]
                if all(p < s for p, s in zip(pos, shape)):
                    flat = 0
                    for k in range(rank):
                        flat = flat * shape[k] + pos[k]
                    elems.append(vals[flat])
                    expected[flat] = float(vals[flat])
                else:
                    elems.append(55)  # overhang sentinel: must be skipped
            raw = struct.pack(order + str(len(elems)) + pk, *elems)
            if comp:
                raw = zlib.compress(raw, 6)
            with open(os.path.join(arr_dir, ".".join(map(str, ci))), "wb") as f:
                f.write(raw)
        lines.append(";".join([
            name, dtype, comp or "null", str(fill), str(n_missing),
            ",".join(map(str, shape)), ",".join(map(str, chunks)),
            ",".join(repr(v) for v in expected)]))
    with open(os.path.join(outdir, "zarr_manifest.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


# ---------------------------------------------------------------------------
# netCDF-4 attribute surface (v0 generation): compact v1 attribute
# messages (numeric/string/unsigned-byte), DIMENSION_LIST vlen-of-object-
# reference through a global heap (GCOL), a vlen-STRING attr, a COMPOUND
# REFERENCE_LIST (the reader must surface it as unsupported, not fail),
# root-group attrs, and one dataset with DENSE attribute storage
# (Attribute Info message -> fractal heap + v2 B-tree type 8) — the
# libhdf5 shape above ~8 attrs. Spec: HDF5 File Format IV.A.2.d/m,
# III.E (fractal heap), III.B.2 (v2 B-tree), netCDF-4 dimension scales.
# ---------------------------------------------------------------------------

def h5a_pad8(b):
    return b + b"\0" * ((-len(b)) % 8)

def h5a_dt_f64():
    return (struct.pack("<BBBBI", 0x11, 0x20, 63, 0, 8) +
            struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023))

def h5a_dt_str(n):
    # class 3 string, NUL-terminated ASCII padding
    return struct.pack("<BBBBI", 0x13, 0, 0, 0, n)

def h5a_dt_u8():
    # class 0 fixed-point, unsigned LE, 1 byte
    return struct.pack("<BBBBIHH", 0x10, 0, 0, 0, 1, 0, 8)

def h5a_dt_ref():
    # class 7 reference, type 0 = object reference
    return struct.pack("<BBBBI", 0x17, 0, 0, 0, 8)

def h5a_dt_vlen_ref():
    # class 9 vlen sequence, base = object reference
    return struct.pack("<BBBBI", 0x19, 0, 0, 0, 16) + h5a_dt_ref()

def h5a_dt_vlen_str():
    # class 9 vlen STRING (low nibble 1), base = 1-byte char
    return struct.pack("<BBBBI", 0x19, 1, 0, 0, 16) + h5a_dt_str(1)

def h5a_dt_reflist_compound():
    # class 6 compound, 2 members — libhdf5's REFERENCE_LIST shape
    # {dataset: objref, dimension: u32}; v1 member layout: name (padded
    # to 8), byte offset (4), dimensionality(1)+3, permutation(4)+4,
    # dims 4x4, member datatype
    def member(name, off, dt):
        return (h5a_pad8(name.encode() + b"\0") + struct.pack("<I", off) +
                struct.pack("<B3xI4x", 0, 0) + struct.pack("<4I", 0, 0, 0, 0) + dt)
    body = struct.pack("<BBBBI", 0x16, 2, 0, 0, 12)
    body += member("dataset", 0, h5a_dt_ref())
    body += member("dimension", 8, struct.pack("<BBBBIHH", 0x10, 0, 0, 0, 4, 0, 32))
    return body

def h5a_ds(dims):
    body = struct.pack("<BBB5x", 1, len(dims), 0)
    return body + b"".join(struct.pack("<Q", d) for d in dims)

def h5a_attr_v1(name, dt, ds, data):
    nb = name.encode() + b"\0"
    body = struct.pack("<BBHHH", 1, 0, len(nb), len(dt), len(ds))
    body += h5a_pad8(nb) + h5a_pad8(dt) + h5a_pad8(ds) + h5a_pad8(data)
    return h5_msg(0x000C, body)

def h5a_attr_v3_body(name, dt, ds, data):
    nb = name.encode() + b"\0"
    return (struct.pack("<BBHHHB", 3, 0, len(nb), len(dt), len(ds), 0) +
            nb + dt + ds + data)

def write_hdf5_ncattrs(path):
    """netCDF-4-shaped attribute golden: 'tair' (4, 6) contiguous f64
    (value i*0.25 - 2.0, every i%7==0 replaced by the -999 fill) with
    DIMENSION_LIST -> [y, x], CF pack attrs (scale 0.5, offset 2.0,
    fill -999), a u8 'flags' attr [1, 2, 250], a vlen-string 'history'
    attr, and a compound REFERENCE_LIST (unsupported by design);
    'y' [4] = 10+10j and 'x' [6] = 100+10i dim scales with
    CLASS/NAME/units; root attrs Conventions=CF-1.8, title; and
    'dense_var' [3] = 1,2,3 whose THREE attrs live in DENSE storage:
    method='mean', cell_methods='time: mean', levels f64 [1.5, 2.5]."""
    buf = bytearray(b"\0" * 96)

    def alloc(blob):
        off = len(buf)
        buf.extend(blob)
        return off

    # --- coordinate datasets first (their header addrs feed the refs)
    y_vals = [10.0 + 10.0 * j for j in range(4)]
    x_vals = [100.0 + 10.0 * i for i in range(6)]
    y_data = alloc(struct.pack("<4d", *y_vals))
    y_oh = alloc(h5_object_header([
        h5_dataspace([4]),
        h5_datatype_float(8),
        h5a_attr_v1("CLASS", h5a_dt_str(16), h5a_ds([1]), b"DIMENSION_SCALE\0"),
        h5a_attr_v1("NAME", h5a_dt_str(2), h5a_ds([1]), b"y\0"),
        h5a_attr_v1("units", h5a_dt_str(2), h5a_ds([1]), b"m\0"),
        h5_layout_contiguous(y_data, 4 * 8),
    ]))
    x_data = alloc(struct.pack("<6d", *x_vals))
    x_oh = alloc(h5_object_header([
        h5_dataspace([6]),
        h5_datatype_float(8),
        h5a_attr_v1("CLASS", h5a_dt_str(16), h5a_ds([1]), b"DIMENSION_SCALE\0"),
        h5a_attr_v1("NAME", h5a_dt_str(2), h5a_ds([1]), b"x\0"),
        h5_layout_contiguous(x_data, 6 * 8),
    ]))

    # --- global heap: DIMENSION_LIST per-axis ref arrays + vlen strings
    gobjs = [struct.pack("<Q", y_oh), struct.pack("<Q", x_oh),
             b"reprocessed v3", b"by make_fixtures"]
    gbody = b""
    for i, o in enumerate(gobjs):
        gbody += struct.pack("<HHIQ", i + 1, 1, 0, len(o)) + h5a_pad8(o)
    gcol_len = 16 + len(gbody) + 16
    gcol_addr = alloc(b"GCOL" + struct.pack("<B3xQ", 1, gcol_len) + gbody +
                      struct.pack("<HHIQ", 0, 0, 0, 16))

    # --- tair with the compact attribute set
    tair_vals = [(-999.0 if i % 7 == 0 else i * 0.25 - 2.0) for i in range(24)]
    tair_data = alloc(struct.pack("<24d", *tair_vals))
    dimlist_data = (struct.pack("<IQI", 1, gcol_addr, 1) +
                    struct.pack("<IQI", 1, gcol_addr, 2))
    hist_data = (struct.pack("<IQI", len(gobjs[2]), gcol_addr, 3) +
                 struct.pack("<IQI", len(gobjs[3]), gcol_addr, 4))
    reflist_data = struct.pack("<QI", y_oh, 0)
    tair_oh = alloc(h5_object_header([
        h5_dataspace([4, 6]),
        h5_datatype_float(8),
        h5a_attr_v1("DIMENSION_LIST", h5a_dt_vlen_ref(), h5a_ds([2]), dimlist_data),
        h5a_attr_v1("units", h5a_dt_str(5), h5a_ds([1]), b"degC\0"),
        h5a_attr_v1("scale_factor", h5a_dt_f64(), h5a_ds([1]), struct.pack("<d", 0.5)),
        h5a_attr_v1("add_offset", h5a_dt_f64(), h5a_ds([1]), struct.pack("<d", 2.0)),
        h5a_attr_v1("_FillValue", h5a_dt_f64(), h5a_ds([1]), struct.pack("<d", -999.0)),
        h5a_attr_v1("flags", h5a_dt_u8(), h5a_ds([3]), bytes([1, 2, 250])),
        h5a_attr_v1("history", h5a_dt_vlen_str(), h5a_ds([2]), hist_data),
        h5a_attr_v1("REFERENCE_LIST", h5a_dt_reflist_compound(), h5a_ds([1]),
                    reflist_data),
        h5_layout_contiguous(tair_data, 24 * 8),
    ]))

    # --- packed_i16: THE CF packed-variable shape (int16 + scale/offset)
    pi16_vals = [-9999, 120, -5, 0, 2500, -9999]
    pi16_data = alloc(struct.pack("<6h", *pi16_vals) + b"\0" * 4)
    pi16_oh = alloc(h5_object_header([
        h5_dataspace([6]),
        h5_msg(0x0003, struct.pack("<BBBBIHH", 0x10, 0x08, 0, 0, 2, 0, 16)),
        h5a_attr_v1("scale_factor", h5a_dt_f64(), h5a_ds([1]),
                    struct.pack("<d", 0.01)),
        h5a_attr_v1("add_offset", h5a_dt_f64(), h5a_ds([1]),
                    struct.pack("<d", 300.0)),
        h5a_attr_v1("_FillValue",
                    struct.pack("<BBBBIHH", 0x10, 0x08, 0, 0, 2, 0, 16),
                    h5a_ds([1]), struct.pack("<h", -9999) + b"\0" * 6),
        h5_layout_contiguous(pi16_data, 12),
    ]))

    # --- packed_u8: netCDF-classic _Unsigned (stored SIGNED int8)
    pu8_vals = [-1, 5, -128, 0, 7, -2]
    pu8_data = alloc(struct.pack("<6b", *pu8_vals) + b"\0" * 2)
    pu8_oh = alloc(h5_object_header([
        h5_dataspace([6]),
        h5_msg(0x0003, struct.pack("<BBBBIHH", 0x10, 0x08, 0, 0, 1, 0, 8)),
        h5a_attr_v1("_Unsigned", h5a_dt_str(5), h5a_ds([1]), b"true\0"),
        h5a_attr_v1("scale_factor", h5a_dt_f64(), h5a_ds([1]),
                    struct.pack("<d", 0.5)),
        h5a_attr_v1("add_offset", h5a_dt_f64(), h5a_ds([1]),
                    struct.pack("<d", 2.0)),
        h5a_attr_v1("_FillValue",
                    struct.pack("<BBBBIHH", 0x10, 0x08, 0, 0, 1, 0, 8),
                    h5a_ds([1]), struct.pack("<b", -1) + b"\0" * 7),
        h5_layout_contiguous(pu8_data, 6),
    ]))

    # --- dense_var: three attrs in DENSE storage
    dv_vals = [1.0, 2.0, 3.0]
    dv_data = alloc(struct.pack("<3d", *dv_vals))
    attr_bodies = [
        h5a_attr_v3_body("method", h5a_dt_str(5), h5a_ds([1]), b"mean\0"),
        h5a_attr_v3_body("cell_methods", h5a_dt_str(11), h5a_ds([1]),
                         b"time: mean\0"),
        h5a_attr_v3_body("levels", h5a_dt_f64(), h5a_ds([2]),
                         struct.pack("<2d", 1.5, 2.5)),
    ]
    # direct block: FHDB header (sig+ver+heap hdr addr+4-byte block off),
    # objects packed after it; heap offsets address the block INCLUDING
    # its header. FRHP address patched into the header below.
    start_block = 512
    db = bytearray(b"FHDB" + struct.pack("<B", 0) + struct.pack("<Q", 0) +
                   struct.pack("<I", 0))
    heap_offs = []
    for b in attr_bodies:
        heap_offs.append(len(db))
        db.extend(b)
    assert len(db) <= start_block, len(db)
    db.extend(b"\0" * (start_block - len(db)))
    fhdb_addr = alloc(bytes(db))
    frhp_addr = alloc(
        b"FRHP" + struct.pack("<B", 0) +
        struct.pack("<HHB", 8, 0, 0) +            # id len, filter len, flags
        struct.pack("<I", 4096) +                  # max managed size
        struct.pack("<Q", 0) +                     # next huge id
        struct.pack("<Q", UNDEF) +                 # huge-object B-tree
        struct.pack("<QQ", 0, UNDEF) +             # free space, fs manager
        struct.pack("<QQQ", start_block, start_block, len(db)) +
        struct.pack("<Q", len(attr_bodies)) +      # managed objects
        struct.pack("<QQQQ", 0, 0, 0, 0) +         # huge/tiny sizes+counts
        struct.pack("<H", 4) +                     # table width
        struct.pack("<QQ", start_block, 65536) +   # start block, max direct
        struct.pack("<HH", 32, 1) +                # max heap bits, start rows
        struct.pack("<Q", fhdb_addr) +             # root block (DIRECT)
        struct.pack("<H", 0) +                     # current rows = 0
        struct.pack("<I", 0))                      # checksum (unchecked)
    # patch the direct block's heap-header back-pointer
    struct.pack_into("<Q", buf, fhdb_addr + 5, frhp_addr)
    # type-8 name-index B-tree: one leaf; records = heap id(8) +
    # flags(1) + creation order(4) + name hash(4)
    btlf = bytearray(b"BTLF" + struct.pack("<BB", 0, 8))
    for k, off in enumerate(heap_offs):
        hid = bytes([0x00]) + struct.pack("<I", off) + b"\0\0\0"
        btlf.extend(hid + struct.pack("<BIi", 0, k, 0))
    btlf.extend(struct.pack("<I", 0))  # checksum (unchecked)
    btlf_addr = alloc(bytes(btlf))
    bthd_addr = alloc(
        b"BTHD" + struct.pack("<BB", 0, 8) +
        struct.pack("<IHH", 512, 17, 0) +          # node size, rec size, depth
        struct.pack("<BB", 100, 40) +              # split/merge percents
        struct.pack("<Q", btlf_addr) +
        struct.pack("<H", len(heap_offs)) +
        struct.pack("<Q", len(heap_offs)) +
        struct.pack("<I", 0))                      # checksum (unchecked)
    attr_info = h5_msg(0x0015, struct.pack("<BBQQ", 0, 0, frhp_addr, bthd_addr))
    dv_oh = alloc(h5_object_header([
        h5_dataspace([3]),
        h5_datatype_float(8),
        attr_info,
        h5_layout_contiguous(dv_data, 3 * 8),
    ]))

    # --- root group scaffolding (+ root attrs)
    heap_data = bytearray(b"\0" * 8)
    name_offs = {}
    names = ["dense_var", "packed_i16", "packed_u8", "tair", "x", "y"]  # SNOD name order
    for nm in names:
        name_offs[nm] = len(heap_data)
        heap_data += nm.encode() + b"\0"
        heap_data += b"\0" * ((-len(heap_data)) % 8)
    heap_data_addr = alloc(bytes(heap_data))
    heap_addr = alloc(b"HEAP" + struct.pack("<B3xQQQ", 0, len(heap_data), UNDEF,
                                            heap_data_addr))
    ohs = {"dense_var": dv_oh, "packed_i16": pi16_oh, "packed_u8": pu8_oh,
           "tair": tair_oh, "x": x_oh, "y": y_oh}
    snod = b"SNOD" + struct.pack("<BBH", 1, 0, len(names))
    for nm in names:
        snod += struct.pack("<QQII16x", name_offs[nm], ohs[nm], 0, 0)
    snod_addr = alloc(snod)
    gtree = b"TREE" + struct.pack("<BBH", 0, 0, 1)
    gtree += struct.pack("<QQ", UNDEF, UNDEF)
    gtree += struct.pack("<QQ", 0, snod_addr)
    gtree += struct.pack("<Q", name_offs[names[-1]])
    gtree_addr = alloc(gtree)
    root_oh = alloc(h5_object_header([
        h5_msg(0x0011, struct.pack("<QQ", gtree_addr, heap_addr)),
        h5a_attr_v1("Conventions", h5a_dt_str(7), h5a_ds([1]), b"CF-1.8\0"),
        h5a_attr_v1("title", h5a_dt_str(15), h5a_ds([1]), b"attr golden v1\0"),
    ]))

    # --- superblock v0
    sb = io.BytesIO()
    sb.write(b"\x89HDF\r\n\x1a\n")
    sb.write(struct.pack("<BBBBBBBB", 0, 0, 0, 0, 0, 8, 8, 0))
    sb.write(struct.pack("<HHI", 4, 16, 0))
    sb.write(struct.pack("<QQQQ", 0, UNDEF, len(buf), UNDEF))
    sb.write(struct.pack("<QQII", 0, root_oh, 1, 0))
    sb.write(struct.pack("<QQ", gtree_addr, heap_addr))
    sb_bytes = sb.getvalue()
    assert len(sb_bytes) == 96, len(sb_bytes)
    buf[0:96] = sb_bytes
    with open(path, "wb") as f:
        f.write(bytes(buf))



def write_hdf5_groups(path):
    """Nested-group golden (netCDF-4 group model, v0 generation):
    root{ surface[3]=k*2, model/{ t2m[2,3]=i*0.5 with DIMENSION_LIST ->
    [model/y, model/x] dim scales, y[2]=10j, x[3]=5i,
    deep/{ bias[2]=0.25,0.75 } }, latest/{ v[2]=7,9 } } where 'latest'
    is a NEW-STYLE (OHDR compact-links) group inside the old-style
    tree — the mixed-generation shape the reader must tolerate. The
    t2m DIMENSION_LIST references cross group boundaries."""
    buf = bytearray(b"\0" * 96)

    def alloc(blob):
        off = len(buf)
        buf.extend(blob)
        return off

    def symtab_group(entries):
        """One old-style group quartet; entries = [(name, oh_addr)]."""
        heap_data = bytearray(b"\0" * 8)
        name_offs = {}
        for nm, _ in sorted(entries):
            name_offs[nm] = len(heap_data)
            heap_data += nm.encode() + b"\0"
            heap_data += b"\0" * ((-len(heap_data)) % 8)
        heap_data_addr = alloc(bytes(heap_data))
        heap_addr = alloc(b"HEAP" + struct.pack("<B3xQQQ", 0, len(heap_data),
                                                UNDEF, heap_data_addr))
        snod = b"SNOD" + struct.pack("<BBH", 1, 0, len(entries))
        for nm, oh in sorted(entries):
            snod += struct.pack("<QQII16x", name_offs[nm], oh, 0, 0)
        snod_addr = alloc(snod)
        gtree = b"TREE" + struct.pack("<BBH", 0, 0, 1)
        gtree += struct.pack("<QQ", UNDEF, UNDEF)
        gtree += struct.pack("<QQ", 0, snod_addr)
        gtree += struct.pack("<Q", name_offs[sorted(entries)[-1][0]])
        gtree_addr = alloc(gtree)
        return alloc(h5_object_header([
            h5_msg(0x0011, struct.pack("<QQ", gtree_addr, heap_addr)),
        ])), gtree_addr, heap_addr

    # --- leaf datasets ---------------------------------------------------
    surface_data = alloc(struct.pack("<3d", *[k * 2.0 for k in range(3)]))
    surface_oh = alloc(h5_object_header([
        h5_dataspace([3]), h5_datatype_float(8),
        h5_layout_contiguous(surface_data, 24),
    ]))
    y_data = alloc(struct.pack("<2d", 0.0, 10.0))
    y_oh = alloc(h5_object_header([
        h5_dataspace([2]), h5_datatype_float(8),
        h5a_attr_v1("NAME", h5a_dt_str(2), h5a_ds([1]), b"y\0"),
        h5_layout_contiguous(y_data, 16),
    ]))
    x_data = alloc(struct.pack("<3d", 0.0, 5.0, 10.0))
    x_oh = alloc(h5_object_header([
        h5_dataspace([3]), h5_datatype_float(8),
        h5_layout_contiguous(x_data, 24),
    ]))
    gobjs = [struct.pack("<Q", y_oh), struct.pack("<Q", x_oh)]
    gbody = b""
    for i, o in enumerate(gobjs):
        gbody += struct.pack("<HHIQ", i + 1, 1, 0, len(o)) + h5a_pad8(o)
    gcol_addr = alloc(b"GCOL" + struct.pack("<B3xQ", 1, 16 + len(gbody) + 16) +
                      gbody + struct.pack("<HHIQ", 0, 0, 0, 16))
    t2m_data = alloc(struct.pack("<6d", *[i * 0.5 for i in range(6)]))
    dimlist = (struct.pack("<IQI", 1, gcol_addr, 1) +
               struct.pack("<IQI", 1, gcol_addr, 2))
    t2m_oh = alloc(h5_object_header([
        h5_dataspace([2, 3]), h5_datatype_float(8),
        h5a_attr_v1("DIMENSION_LIST", h5a_dt_vlen_ref(), h5a_ds([2]), dimlist),
        h5_layout_contiguous(t2m_data, 48),
    ]))
    bias_data = alloc(struct.pack("<2d", 0.25, 0.75))
    bias_oh = alloc(h5_object_header([
        h5_dataspace([2]), h5_datatype_float(8),
        h5_layout_contiguous(bias_data, 16),
    ]))
    v_data = alloc(struct.pack("<2d", 7.0, 9.0))
    v_oh = alloc(h5_object_header([
        h5_dataspace([2]), h5_datatype_float(8),
        h5_layout_contiguous(v_data, 16),
    ]))

    # --- groups, leaves first --------------------------------------------
    deep_oh, _, _ = symtab_group([("bias", bias_oh)])
    model_oh, _, _ = symtab_group([
        ("deep", deep_oh), ("t2m", t2m_oh), ("x", x_oh), ("y", y_oh)])
    # NEW-STYLE group: OHDR header, link-info (no fractal heap) + a
    # compact link message — nested inside the old-style tree
    latest_oh = alloc(h5v2_object_header([
        h5v2_msg(0x02, struct.pack("<BBQQ", 0, 0, UNDEF, UNDEF)),
        h5_link_msg("v", v_oh),
    ]))
    root_oh, gtree_addr, heap_addr = symtab_group([
        ("latest", latest_oh), ("model", model_oh), ("surface", surface_oh)])

    # --- superblock v0
    sb = io.BytesIO()
    sb.write(b"\x89HDF\r\n\x1a\n")
    sb.write(struct.pack("<BBBBBBBB", 0, 0, 0, 0, 0, 8, 8, 0))
    sb.write(struct.pack("<HHI", 4, 16, 0))
    sb.write(struct.pack("<QQQQ", 0, UNDEF, len(buf), UNDEF))
    sb.write(struct.pack("<QQII", 0, root_oh, 1, 0))
    sb.write(struct.pack("<QQ", gtree_addr, heap_addr))
    sb_bytes = sb.getvalue()
    assert len(sb_bytes) == 96, len(sb_bytes)
    buf[0:96] = sb_bytes
    with open(path, "wb") as f:
        f.write(bytes(buf))



def write_netcdf3_cdf5(path):
    """CDF-5 (pnetcdf 64-bit data): every NON_NEG field is 8 bytes and
    the extended integer types appear. dims (time=UNLIMITED over 3
    records, x=4); vars: time(int64)[time] = 100+50t with a units attr,
    counts(uint)[time, x] = 4e9 + idx (above int32 range), packed
    (ushort)[x] = [0, 7, 65535, 42] with an int64 _FillValue attr, and
    big(uint64)[x] with a top-bit-set magnitude."""
    def name5(s):
        b = s.encode()
        return struct.pack(">q", len(b)) + b + b"\0" * ((-len(b)) % 4)
    def attrs5(items):  # [(name, nctype, payload_bytes, nelems)]
        if not items:
            return struct.pack(">iq", 0, 0)
        out = struct.pack(">iq", 0x0C, len(items))
        for nm, t, payload, n in items:
            out += name5(nm) + struct.pack(">iq", t, n) + payload
            out += b"\0" * ((-len(payload)) % 4)
        return out
    header = io.BytesIO()
    header.write(b"CDF\x05")
    header.write(struct.pack(">q", 3))                      # numrecs
    header.write(struct.pack(">iq", 0x0A, 2))               # dim_list
    header.write(name5("time") + struct.pack(">q", 0))      # UNLIMITED
    header.write(name5("x") + struct.pack(">q", 4))
    header.write(attrs5([("title", 2, b"cdf5 golden", 11)]))
    header.write(struct.pack(">iq", 0x0B, 4))               # var_list
    base = header.getvalue()

    def var_header(name, dimids, attrs, nctype, vsize, begin):
        out = name5(name) + struct.pack(">q", len(dimids))
        out += b"".join(struct.pack(">q", d) for d in dimids)
        out += attrs5(attrs)
        out += struct.pack(">i", nctype)
        out += struct.pack(">q", vsize)                     # NON_NEG vsize
        out += struct.pack(">q", begin)                     # 64-bit begin
        return out

    time_units = b"seconds since 2024-01-01"
    fill = struct.pack(">q", -1)
    def build(b_packed, b_big, b_time, b_counts):
        return (var_header("big", [1], [], 11, 32, b_big) +
                var_header("counts", [0, 1], [], 9, 16, b_counts) +
                var_header("packed", [1],
                           [("_FillValue", 10, fill, 1)], 8, 8, b_packed) +
                var_header("time", [0],
                           [("units", 2, time_units, len(time_units))],
                           10, 8, b_time))
    hdr_len = len(base) + len(build(0, 0, 0, 0))
    b_packed = hdr_len           # fixed vars first: packed (8 B), big (32 B)
    b_big = b_packed + 8
    b_time = b_big + 32          # record vars: time + counts interleave
    b_counts = b_time + 8
    blob = base + build(b_packed, b_big, b_time, b_counts)
    blob += struct.pack(">4H", 0, 7, 65535, 42)             # packed
    blob += struct.pack(">4Q", 2**63 + 5, 1, 0, 2**64 - 1)  # big
    for t in range(3):                                      # records
        blob += struct.pack(">q", 100 + 50 * t)             # time
        blob += struct.pack(">4I", *[(4_000_000_000 + t * 4 + i) % 2**32
                                     for i in range(4)])    # counts
    with open(path, "wb") as f:
        f.write(blob)



# ---------------------------------------------------------------------------
# Non-standard CF calendar golden (360_day / noleap / all_leap)
# ---------------------------------------------------------------------------

CAL_MONTHS = {
    "360_day": [30] * 12,
    "noleap": [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31],
    "all_leap": [31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31],
}

def cal_decode(cal, units, value):
    """Independent fixed-length-calendar decode (CF 4.4.1). cftime is
    not installed in this container; this follows its documented
    fixed-length calendars (every year identical, no leap rules) and
    the canonical cases are hard-asserted in write_nc_calendars."""
    import re as _re
    months = CAL_MONTHS[cal]
    ydays = sum(months)
    cum = [0]
    for m in months:
        cum.append(cum[-1] + m)
    m = _re.match(r"(\w+) since (-?\d+)-(\d+)-(\d+)"
                  r"(?:[ T](\d+):(\d+):(\d+))?$", units)
    unit = m.group(1)
    y0, mo0, d0 = int(m.group(2)), int(m.group(3)), int(m.group(4))
    hh0 = int(m.group(5) or 0)
    mm0 = int(m.group(6) or 0)
    ss0 = int(m.group(7) or 0)
    step = {"days": 86400, "hours": 3600, "minutes": 60, "seconds": 1}[unit]
    epoch_day = y0 * ydays + cum[mo0 - 1] + (d0 - 1)
    total = epoch_day * 86400 + hh0 * 3600 + mm0 * 60 + ss0 + int(round(value * step))
    day, sec = divmod(total, 86400)
    y, doy = divmod(day, ydays)
    mo = max(i for i in range(12) if cum[i] <= doy) + 1
    d = doy - cum[mo - 1] + 1
    hh, r = divmod(sec, 3600)
    mm, ss = divmod(r, 60)
    return "%04d-%02d-%02d %02d:%02d:%02d" % (y, mo, d, hh, mm, ss)

def write_nc_calendars(path, manifest_path):
    """netCDF-3 classic with one time coordinate per fixed-length CF
    calendar, each chosen to DISCRIMINATE against Gregorian decode:
    360_day crosses 2000-02-30; noleap skips 2000-02-29 (a real
    Gregorian leap day); all_leap contains 1999-02-29 (not a Gregorian
    date). The manifest pins the decoded datetimes and one crop's
    numeric range per calendar."""
    series = [
        ("t360", "days since 2000-02-25", "360_day",
         [float(i) for i in range(8)],
         ("2000-02-28", "2000-03-02")),
        ("tnoleap", "days since 2000-02-27", "noleap",
         [float(i) for i in range(5)],
         ("2000-02-28", "2000-03-02")),
        ("tleap", "hours since 1999-02-27", "all_leap",
         [float(i * 12) for i in range(8)],
         ("1999-02-28", "1999-03-01 12:00:00")),
    ]
    # canonical hard asserts (cftime-documented behavior)
    assert cal_decode("360_day", "days since 2000-02-25", 5) == "2000-02-30 00:00:00"
    assert cal_decode("noleap", "days since 2000-02-27", 2) == "2000-03-01 00:00:00"
    assert cal_decode("all_leap", "hours since 1999-02-27", 48) == "1999-02-29 00:00:00"

    header = io.BytesIO()
    header.write(b"CDF\x01")
    header.write(struct.pack(">i", 0))                       # numrecs
    header.write(struct.pack(">ii", 0x0A, len(series)))      # dim_list
    for name, _, _, vals, _ in series:
        header.write(nc_name("d_" + name) + struct.pack(">i", len(vals)))
    header.write(struct.pack(">ii", 0, 0))                   # no gatts
    header.write(struct.pack(">ii", 0x0B, len(series)))      # var_list
    base = header.getvalue()

    def var_header(name, dimid, units, cal, n, begin):
        out = nc_name(name) + struct.pack(">i", 1)
        out += struct.pack(">i", dimid)
        out += nc_attrs([("units", units), ("calendar", cal)])
        out += struct.pack(">iii", 6, 8 * n, begin)
        return out

    def build(begins):
        return b"".join(
            var_header(name, i, units, cal, len(vals), begins[i])
            for i, (name, units, cal, vals, _) in enumerate(series))
    hdr_len = len(base) + len(build([0] * len(series)))
    begins = []
    at = hdr_len
    for _, _, _, vals, _ in series:
        begins.append(at)
        at += 8 * len(vals)
    blob = base + build(begins)
    for _, _, _, vals, _ in series:
        blob += struct.pack(">%dd" % len(vals), *vals)
    with open(path, "wb") as f:
        f.write(blob)

    manifest = {}
    for name, units, cal, vals, (t0, t1) in series:
        months = CAL_MONTHS[cal]
        ydays = sum(months)
        cum = [0]
        for m in months:
            cum.append(cum[-1] + m)

        def to_num(t, _units=units, _cal=cal):
            import re as _re
            mm = _re.match(r"(-?\d+)-(\d+)-(\d+)(?:[ T](\d+):(\d+):(\d+))?$", t)
            y, mo, d = int(mm.group(1)), int(mm.group(2)), int(mm.group(3))
            hh = int(mm.group(4) or 0)
            mi = int(mm.group(5) or 0)
            ss = int(mm.group(6) or 0)
            _months = CAL_MONTHS[_cal]
            _ydays = sum(_months)
            _cum = [0]
            for q in _months:
                _cum.append(_cum[-1] + q)
            tsec = (y * _ydays + _cum[mo - 1] + (d - 1)) * 86400 + hh * 3600 + mi * 60 + ss
            import re as _re2
            um = _re2.match(r"(\w+) since (-?\d+)-(\d+)-(\d+)"
                            r"(?:[ T](\d+):(\d+):(\d+))?$", _units)
            ey, emo, ed = int(um.group(2)), int(um.group(3)), int(um.group(4))
            ehh = int(um.group(5) or 0)
            emi = int(um.group(6) or 0)
            ess = int(um.group(7) or 0)
            esec = (ey * _ydays + _cum[emo - 1] + (ed - 1)) * 86400 + ehh * 3600 + emi * 60 + ess
            step = {"days": 86400, "hours": 3600,
                    "minutes": 60, "seconds": 1}[um.group(1)]
            return (tsec - esec) / step
        manifest[name] = {
            "units": units,
            "calendar": cal,
            "values": vals,
            "datetimes": [cal_decode(cal, units, v) for v in vals],
            "crop": {"t0": t0, "t1": t1,
                     "lo": to_num(t0), "hi": to_num(t1)},
        }
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=1)


def main():
    os.makedirs(TEST_FIX, exist_ok=True)
    os.makedirs(MAIN_FIX, exist_ok=True)
    write_onnx(os.path.join(MAIN_FIX, "pool_encoder.onnx"))
    write_mini_encoder(os.path.join(TEST_FIX, "mini_encoder.onnx"))
    write_ext_fp16(os.path.join(TEST_FIX, "ext_fp16.onnx"),
                   os.path.join(TEST_FIX, "pool_weights.bin"),
                   os.path.join(TEST_FIX, "ext_fp16_expected.json"))
    write_hdf5(os.path.join(TEST_FIX, "golden.h5"))
    write_hdf5(os.path.join(TEST_FIX, "golden_v1sb.h5"), sb_version=1)
    write_hdf5_fletcher(os.path.join(TEST_FIX, "golden_fletcher.h5"))
    write_hdf5_szip(os.path.join(TEST_FIX, "golden_szip.h5"))
    write_hdf5_nbit_so(os.path.join(TEST_FIX, "golden_nbit_so.h5"))
    write_hdf5_v2(os.path.join(TEST_FIX, "golden_v2.h5"))
    write_hdf5_ncattrs(os.path.join(TEST_FIX, "golden_ncattrs.h5"))
    write_hdf5_groups(os.path.join(TEST_FIX, "golden_groups.h5"))
    write_hdf5_dense(os.path.join(TEST_FIX, "golden_dense.h5"))
    write_hdf5_dense_filtered(os.path.join(TEST_FIX, "golden_filtered_heap.h5"))
    write_hdf5_dense_filtered_indirect(
        os.path.join(TEST_FIX, "golden_filtered_heap_ib.h5"))
    write_hdf5_huge(os.path.join(TEST_FIX, "golden_huge.h5"))
    write_hdf5_tiny(os.path.join(TEST_FIX, "golden_tiny.h5"))
    write_hdf5_dense_deep(os.path.join(TEST_FIX, "golden_deep.h5"))
    write_hdf5_indirect(os.path.join(TEST_FIX, "golden_indirect.h5"))
    write_hdf5_fuzz(os.path.join(TEST_FIX, "fuzz"))
    write_zarr_fuzz(os.path.join(TEST_FIX, "fuzz"))
    write_netcdf3_fuzz(os.path.join(TEST_FIX, "fuzz"))
    write_hdf4_fuzz(os.path.join(TEST_FIX, "fuzz"))
    write_hdf4(os.path.join(TEST_FIX, "golden.hdf"))
    write_netcdf3(os.path.join(TEST_FIX, "golden.nc"))
    write_netcdf3_rec(os.path.join(TEST_FIX, "golden_rec.nc"))
    write_netcdf3_cdf5(os.path.join(TEST_FIX, "golden_cdf5.nc"))
    write_nc_calendars(os.path.join(TEST_FIX, "golden_calendars.nc"),
                       os.path.join(TEST_FIX, "golden_calendars_manifest.json"))
    write_netcdf3_rec_big(os.path.join(TEST_FIX, "consolidated_rec.nc"))
    write_avro(os.path.join(TEST_FIX, "golden.avro"))
    write_tfrecord(os.path.join(TEST_FIX, "golden.tfrecord"))
    write_tfrecord_fuzz(os.path.join(TEST_FIX, "fuzz"))
    write_npy_pair(os.path.join(TEST_FIX, "golden"))
    write_safetensors(os.path.join(TEST_FIX, "golden.safetensors"))
    write_avro_fuzz(os.path.join(TEST_FIX, "fuzz"))
    write_zarr(os.path.join(TEST_FIX, "golden.zarr"))
    write_zarr3(os.path.join(TEST_FIX, "golden_v3.zarr"))
    write_nested_zarr(os.path.join(TEST_FIX, "golden_nested.zarr"))
    vals = write_blosc_zarr(os.path.join(TEST_FIX, "golden_blosc.zarr"))
    with open(os.path.join(TEST_FIX, "golden_blosc_manifest.json"), "w") as f:
        json.dump(vals, f)
    write_blosc_zarr3(os.path.join(TEST_FIX, "golden_blosc_v3.zarr"))
    write_sharded_zarr3(os.path.join(TEST_FIX, "golden_sharded_v3.zarr"))
    write_warc(os.path.join(TEST_FIX, "golden.warc.gz"))
    write_wav(os.path.join(TEST_FIX, "golden.wav"))
    print("fixtures written to", TEST_FIX, "and", MAIN_FIX)

if __name__ == "__main__":
    main()
