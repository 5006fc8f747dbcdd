#!/usr/bin/env python3
"""Golden zarr v2 stores whose blosc chunks use the zstd codec and/or
the bitshuffle filter — round-13 ForeignFixturesSpec inputs.

Unlike make_fixtures.py (deliberately stdlib-only), the zstd streams
here come from pyarrow's bundled libzstd — the REFERENCE C
implementation — so the codec bytes are foreign to the Scala decoder.
The blosc container framing and the bitshuffle transform below are
pure-Python transliterations of the public specs (c-blosc
README_HEADER.rst; kiyo-masui/bitshuffle's scalar
bshuf_trans_bit_elem path as bundled by c-blosc 1.x), sharing no code
with graft.sources.Blosc. No c-blosc binary is available in this
container, so bitshuffle has no byte-for-byte c-blosc golden; the
proof is two INDEPENDENT transliterations of the same public scalar
algorithm (this file's forward, Blosc.scala's inverse) agreeing, plus
the hand-derived 16-element vector pinned in BloscSpec.
"""
import json
import os
import struct
import sys

import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import make_fixtures as mf  # lz4_block_compress, byte_shuffle

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "src", "test", "resources", "fixtures")

_ZSTD = pa.Codec("zstd", compression_level=5)


def zstd_compress(b):
    return _ZSTD.compress(bytes(b), asbytes=True)


MASK64 = (1 << 64) - 1


def trans_bit_8x8(x):
    """Hacker's Delight 8x8 bit transpose (bitshuffle's TRANS_BIT_8X8)."""
    t = (x ^ (x >> 7)) & 0x00AA00AA00AA00AA
    x = x ^ t ^ ((t << 7) & MASK64)
    t = (x ^ (x >> 14)) & 0x0000CCCC0000CCCC
    x = x ^ t ^ ((t << 14) & MASK64)
    t = (x ^ (x >> 28)) & 0x00000000F0F0F0F0
    x = x ^ t ^ ((t << 28) & MASK64)
    return x & MASK64


def bit_shuffle(block, typesize):
    """Forward bshuf_trans_bit_elem on one blosc block: the largest
    multiple of 8 elements transforms, trailing bytes stay raw
    (c-blosc's `size -= size % 8; memcpy leftovers` convention)."""
    n = len(block)
    out = bytearray(block)
    elems = n // typesize
    size = elems - (elems % 8)
    if size == 0:
        return bytes(out)
    nb = size * typesize
    # step 1: byte-transpose within elements
    a = bytearray(nb)
    for j in range(typesize):
        for i in range(size):
            a[j * size + i] = block[i * typesize + j]
    # step 2: 8x8 bit transpose per aligned 8-byte group; byte k of the
    # transposed word lands in bit-row k at the group position
    nbr = nb // 8
    b = bytearray(nb)
    for g in range(nbr):
        x = int.from_bytes(bytes(a[g * 8:(g + 1) * 8]), "little")
        xb = trans_bit_8x8(x).to_bytes(8, "little")
        for k in range(8):
            b[k * nbr + g] = xb[k]
    # step 3: regroup rows of size/8 bytes: row (k, plane j) -> j*8+k
    nbr2 = size // 8
    for j in range(typesize):
        for k in range(8):
            s = (k * typesize + j) * nbr2
            d = (j * 8 + k) * nbr2
            out[d:d + nbr2] = b[s:s + nbr2]
    return bytes(out)


def blosc_frame(data, typesize, blocksize, codec, shuffle_mode):
    """One blosc1 frame (c-blosc >= 1.14 layout): codec 'lz4'|'zstd',
    shuffle_mode 0 none / 1 byte / 2 bit."""
    data = bytes(data)
    nbytes = len(data)
    nblocks = (nbytes + blocksize - 1) // blocksize
    leftover = nbytes % blocksize
    # c-blosc splits only blosclz/lz4 streams, never zstd
    split = (codec == "lz4" and 1 < typesize <= 16 and
             blocksize // typesize >= 128 and blocksize % typesize == 0)
    flags = (1 if codec == "lz4" else 4) << 5
    if shuffle_mode == 1 and typesize > 1:
        flags |= 0x1
    if shuffle_mode == 2:
        flags |= 0x4
    if not split:
        flags |= 0x10
    blocks = []
    for j in range(nblocks):
        leftover_block = j == nblocks - 1 and leftover != 0
        bsize = leftover if leftover_block else blocksize
        block = data[j * blocksize:j * blocksize + bsize]
        if flags & 0x1:
            block = mf.byte_shuffle(block, typesize)
        elif flags & 0x4:
            block = bit_shuffle(block, typesize)
        nstreams = typesize if (split and not leftover_block) else 1
        neblock = bsize // nstreams
        body = bytearray()
        for s in range(nstreams):
            chunk = bytes(block[s * neblock:(s + 1) * neblock])
            c = (mf.lz4_block_compress(chunk) if codec == "lz4"
                 else zstd_compress(chunk))
            if len(c) >= neblock:  # store raw, like c-blosc
                body += struct.pack("<i", neblock) + chunk
            else:
                body += struct.pack("<i", len(c)) + c
        blocks.append(bytes(body))
    total = 16 + 4 * nblocks + sum(len(b) for b in blocks)
    if total >= 16 + nbytes:  # memcpy fallback, like c-blosc
        return (struct.pack("<BBBB", 2, 1, 0x2, typesize) +
                struct.pack("<iii", nbytes, blocksize, 16 + nbytes) + data)
    out = (struct.pack("<BBBB", 2, 1, flags, typesize) +
           struct.pack("<iii", nbytes, blocksize, total))
    starts = b""
    off = 16 + 4 * nblocks
    for b in blocks:
        starts += struct.pack("<i", off)
        off += len(b)
    return out + starts + b"".join(blocks)


def write_array(store, name, dtype, shape, chunks, compressor, chunk_bytes):
    d = os.path.join(store, name)
    os.makedirs(d, exist_ok=True)
    meta = {"zarr_format": 2, "shape": shape, "chunks": chunks,
            "dtype": dtype, "order": "C", "fill_value": 0.0,
            "filters": None, "compressor": compressor}
    with open(os.path.join(d, ".zarray"), "w") as f:
        json.dump(meta, f)
    for key, frame in chunk_bytes.items():
        with open(os.path.join(d, key), "wb") as f:
            f.write(frame)


def main():
    store = os.path.join(OUT, "golden_blosc_zstd.zarr")
    os.makedirs(store, exist_ok=True)

    def comp(cname, shuffle, blocksize):
        return {"id": "blosc", "cname": cname, "clevel": 5,
                "shuffle": shuffle, "blocksize": blocksize}

    # zs: f8 zstd + BYTE shuffle, 2 chunks of 32, blocksize 128 (2
    # blocks per chunk)
    zs = [i * 0.5 - 3.0 for i in range(64)]
    write_array(store, "zs", "<f8", [64], [32], comp("zstd", 1, 128), {
        "0": blosc_frame(struct.pack("<32d", *zs[:32]), 8, 128, "zstd", 1),
        "1": blosc_frame(struct.pack("<32d", *zs[32:]), 8, 128, "zstd", 1),
    })

    # zn: f8 zstd, NO shuffle, one 384-byte block
    zn = [1000.0 + i for i in range(48)]
    write_array(store, "zn", "<f8", [48], [48], comp("zstd", 0, 384), {
        "0": blosc_frame(struct.pack("<48d", *zn), 8, 384, "zstd", 0),
    })

    # zb: f8 zstd + BITshuffle, blocksize 128 -> 16 elems/block (8|16)
    zb = [i * 0.25 for i in range(64)]
    write_array(store, "zb", "<f8", [64], [32], comp("zstd", 2, 128), {
        "0": blosc_frame(struct.pack("<32d", *zb[:32]), 8, 128, "zstd", 2),
        "1": blosc_frame(struct.pack("<32d", *zb[32:]), 8, 128, "zstd", 2),
    })

    # lb: i4 lz4 + BITshuffle, 2 chunks of 40, blocksize 160 -> 40
    # elems/block (8|40); lz4 splits only when blocksize/typesize >=
    # 128, so these frames are non-split
    lb = [i * 7 - 100 for i in range(80)]
    write_array(store, "lb", "<i4", [80], [40], comp("lz4", 2, 160), {
        "0": blosc_frame(struct.pack("<40i", *lb[:40]), 4, 160, "lz4", 2),
        "1": blosc_frame(struct.pack("<40i", *lb[40:]), 4, 160, "lz4", 2),
    })

    # lt: i4 lz4 + BITshuffle with a RAW TAIL: 20 elems/block -> only
    # 16 transform, the last 4 elements (16 bytes) stay raw in the
    # shuffled block (the size -= size % 8 convention)
    lt = [(i * 3) % 17 - 8 for i in range(20)]
    write_array(store, "lt", "<i4", [20], [20], comp("lz4", 2, 80), {
        "0": blosc_frame(struct.pack("<20i", *lt), 4, 80, "lz4", 2),
    })

    print("wrote", store)


if __name__ == "__main__":
    main()
