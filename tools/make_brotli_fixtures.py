#!/usr/bin/env python3
"""Brotli (RFC 7932) extraction + interop fixtures from the SYSTEM
libbrotli (the public reference implementation), via ctypes — the same
playbook tools/make_webp_fixtures.py / extract_vp8_tables.py ran for
WebP:

1. EXTRACT the public RFC 7932 constant data to avoid hand-transcription
   errors:
     - the 122,784-byte static dictionary (RFC 7932 Appendix A) via
       `BrotliGetDictionary` -> src/main/resources/graft/brotli/
       dictionary.bin (a RUNTIME resource: the dictionary is part of
       the format, every decoder needs it);
     - the 121 word transforms (RFC 7932 Appendix B) via
       `BrotliGetTransforms`, each VERIFIED against the reference
       `BrotliTransformDictionaryWord` over sample words before emit;
     - the 2048-byte literal-context lookup table (RFC 7932 section
       7.1) located in libbrotlicommon's .rodata by its self-describing
       LSB6 prefix (0..63 repeated), with the four mode sections
       validated structurally.
   Emitted as src/main/scala/graft/operators/BrotliTables.scala.

2. GENERATE real-encoder fixtures:
     - src/test/resources/graft/brotli/interop_NN.{br,raw}: a matrix of
       qualities 0..11, windows 10..24, content shapes (dictionary-rich
       text, hex noise, byte ramps, long runs, empty, 1-byte, ~1 MiB),
       some multi-meta-block via BrotliEncoderCompressStream FLUSH —
       consumed by BrotliSpec for bit-exact decode interop;
     - src/main/resources/graft/brotli/q243/NNN.br: 40 frames whose
       content is a DuckDB-replayable formula (repeat/md5-hex/concat of
       the file id), so the q243 oracle replays length+md5 exactly.

Deterministic, no external inputs. Rerun: python3 tools/make_brotli_fixtures.py
"""
import ctypes
import hashlib
import os

LIBC = ctypes.CDLL("libbrotlicommon.so.1")
LIBE = ctypes.CDLL("libbrotlienc.so.1")
LIBD = ctypes.CDLL("libbrotlidec.so.1")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAIN_RES = os.path.join(ROOT, "src/main/resources/graft/brotli")
TEST_RES = os.path.join(ROOT, "src/test/resources/graft/brotli")
os.makedirs(os.path.join(MAIN_RES, "q243"), exist_ok=True)
os.makedirs(TEST_RES, exist_ok=True)

# ---------------------------------------------------------------- extract

class BrotliDictionary(ctypes.Structure):
    _fields_ = [("size_bits_by_length", ctypes.c_uint8 * 32),
                ("offsets_by_length", ctypes.c_uint32 * 32),
                ("data_size", ctypes.c_size_t),
                ("data", ctypes.POINTER(ctypes.c_uint8))]


class BrotliTransforms(ctypes.Structure):
    _fields_ = [("prefix_suffix_size", ctypes.c_uint16),
                ("prefix_suffix", ctypes.POINTER(ctypes.c_uint8)),
                ("prefix_suffix_map", ctypes.POINTER(ctypes.c_uint16)),
                ("num_transforms", ctypes.c_uint32),
                ("transforms", ctypes.POINTER(ctypes.c_uint8)),
                ("params", ctypes.POINTER(ctypes.c_uint8)),
                ("cutOffTransforms", ctypes.c_int16 * 10)]


LIBC.BrotliGetDictionary.restype = ctypes.POINTER(BrotliDictionary)
LIBC.BrotliGetTransforms.restype = ctypes.POINTER(BrotliTransforms)
LIBC.BrotliTransformDictionaryWord.restype = ctypes.c_int
LIBC.BrotliTransformDictionaryWord.argtypes = [
    ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
    ctypes.POINTER(BrotliTransforms), ctypes.c_int]


def extract_dictionary():
    d = LIBC.BrotliGetDictionary().contents
    data = bytes(ctypes.cast(
        d.data, ctypes.POINTER(ctypes.c_uint8 * d.data_size)).contents)
    assert d.data_size == 122784, d.data_size
    # RFC 7932 section 8 size_bits (index = word length 4..24)
    rfc_bits = [0, 0, 0, 0, 10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9, 8,
                7, 7, 8, 7, 7, 6, 6, 5, 5] + [0] * 7
    assert list(d.size_bits_by_length) == rfc_bits
    with open(os.path.join(MAIN_RES, "dictionary.bin"), "wb") as f:
        f.write(data)
    print("dictionary.bin: %d bytes md5=%s" %
          (len(data), hashlib.md5(data).hexdigest()))
    return data, list(d.size_bits_by_length), list(d.offsets_by_length)


def extract_transforms():
    t = LIBC.BrotliGetTransforms().contents
    assert t.num_transforms == 121, t.num_transforms
    ps = bytes(ctypes.cast(
        t.prefix_suffix,
        ctypes.POINTER(ctypes.c_uint8 * t.prefix_suffix_size)).contents)
    triples = bytes(ctypes.cast(
        t.transforms,
        ctypes.POINTER(ctypes.c_uint8 * (121 * 3))).contents)
    mx = max(max(triples[i * 3], triples[i * 3 + 2]) for i in range(121))
    pmap = list(ctypes.cast(
        t.prefix_suffix_map,
        ctypes.POINTER(ctypes.c_uint16 * (mx + 1))).contents)

    def string_at(idx):
        off = pmap[idx]
        n = ps[off]
        return ps[off + 1:off + 1 + n]

    table = []
    for i in range(121):
        p, ty, s = triples[i * 3], triples[i * 3 + 1], triples[i * 3 + 2]
        table.append((string_at(p), ty, string_at(s)))

    # verify our model of every transform against the reference impl
    def ferment(b, pos):
        c = b[pos]
        if c < 192:
            if 97 <= c <= 122:
                b[pos] ^= 32
            return 1
        elif c < 224:
            if pos + 1 < len(b):
                b[pos + 1] ^= 32
            return 2
        else:
            if pos + 2 < len(b):
                b[pos + 2] ^= 5
            return 3

    def model(word, tr):
        prefix, ty, suffix = table[tr]
        w = bytearray(word)
        if 12 <= ty <= 20:          # OmitFirst1..9
            w = w[min(ty - 11, len(w)):]
        elif 1 <= ty <= 9:          # OmitLast1..9
            w = w[:max(0, len(w) - ty)]
        if ty == 10 and len(w) > 0:  # UppercaseFirst
            ferment(w, 0)
        elif ty == 11:               # UppercaseAll
            i = 0
            while i < len(w):
                i += ferment(w, i)
        return bytes(prefix) + bytes(w) + bytes(suffix)

    tptr = LIBC.BrotliGetTransforms()
    samples = [b"time", b"information", b"the \xc3\xa9cole", b"a",
               b"abcdefghijklm", b"\xe4\xb8\xad\xe6\x96\x87ab"]
    for word in samples:
        for tr in range(121):
            dst = ctypes.create_string_buffer(256)
            n = LIBC.BrotliTransformDictionaryWord(
                dst, word, len(word), tptr, tr)
            assert dst.raw[:n] == model(word, tr), (word, tr)
    print("transforms: 121 verified against BrotliTransformDictionaryWord "
          "over %d words" % len(samples))
    return table


def extract_context_lut():
    data = open("/usr/lib/x86_64-linux-gnu/libbrotlicommon.so.1.0.9",
                "rb").read()
    lsb6 = bytes((i & 0x3f) for i in range(256))
    idx = data.find(lsb6)
    assert idx >= 0, "context LUT not found"
    tab = data[idx:idx + 2048]
    msb6 = bytes((i >> 2) for i in range(256))
    assert tab[256:512] == b"\0" * 256          # LSB6 p2 contributes 0
    assert tab[512:768] == msb6                 # MSB6 p1
    assert tab[768:1024] == b"\0" * 256         # MSB6 p2 contributes 0
    assert all(v & 3 == 0 or v in (1, 2, 3) or v % 4 == 0
               for v in tab[1024:1280])         # UTF8 lut0: multiples of 4
    assert set(tab[1280:1536]) <= {0, 1, 2, 3}  # UTF8 lut1 in 0..3
    assert set(tab[1536:1792]) <= {v << 3 for v in range(8)}  # signed lut0
    assert set(tab[1792:2048]) <= set(range(8))               # signed lut1
    print("context LUT: 2048 bytes md5=%s" % hashlib.md5(tab).hexdigest())
    return tab


def emit_tables_scala(transforms, lut):
    import base64

    def b64(b):
        enc = base64.b64encode(b).decode()
        return "\n".join('    "%s" +' % enc[i:i + 72]
                         for i in range(0, len(enc), 72))[:-2]

    ps = []
    for p, ty, s in transforms:
        ps.append("    (%s, %d, %s)" % (scala_bytes(p), ty, scala_bytes(s)))
    src = '''package graft.operators

/** Brotli constant tables (RFC 7932 sections 7.1, 8, Appendices A/B) —
  * public data, extracted byte-exactly from the system libbrotli (the
  * reference implementation) by `tools/make_brotli_fixtures.py` to
  * avoid hand-transcription errors; the 121 word transforms were each
  * verified against the reference `BrotliTransformDictionaryWord`
  * before emission, and the context lookup table's four mode sections
  * validated structurally (LSB6/MSB6 are their defining formulas).
  * The 122,784-byte static dictionary itself ships as the runtime
  * resource graft/brotli/dictionary.bin.
  * DO NOT EDIT BY HAND — rerun the extractor.
  */
object BrotliTables {

  /** Literal context lookup (RFC 7932 section 7.1): four modes x
    * (lut0[256] ++ lut1[256]); ContextID = lut0(p1) | lut1(p2). */
  val ContextLut: Array[Byte] = java.util.Base64.getDecoder.decode(
%s)

  /** RFC 7932 Appendix B: (prefix, transform type, suffix) x 121.
    * Types: 0 identity, 1..9 omit-last-N, 10 uppercase-first,
    * 11 uppercase-all, 12..20 omit-first-(N-11). */
  val Transforms: Array[(Array[Byte], Int, Array[Byte])] = Array(
%s)

  /** RFC 7932 section 8: dictionary size bits by word length (4..24). */
  val DictSizeBits: Array[Int] = Array(
    0, 0, 0, 0, 10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9, 8,
    7, 7, 8, 7, 7, 6, 6, 5, 5)
}
''' % (b64(lut), ",\n".join(ps))
    path = os.path.join(ROOT, "src/main/scala/graft/operators/BrotliTables.scala")
    with open(path, "w") as f:
        f.write(src)
    print("wrote", path)


def scala_bytes(b):
    if not b:
        return "Array.empty[Byte]"
    return "Array[Byte](%s)" % ", ".join(str(x if x < 128 else x - 256)
                                         for x in b)

# ---------------------------------------------------------------- encode

LIBE.BrotliEncoderCompress.restype = ctypes.c_int
LIBE.BrotliEncoderCompress.argtypes = [
    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_size_t,
    ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]
LIBE.BrotliEncoderCreateInstance.restype = ctypes.c_void_p
LIBE.BrotliEncoderCompressStream.restype = ctypes.c_int
LIBE.BrotliEncoderCompressStream.argtypes = [
    ctypes.c_void_p, ctypes.c_int,
    ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.c_char_p),
    ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.c_char_p),
    ctypes.POINTER(ctypes.c_size_t)]
LIBD.BrotliDecoderDecompress.restype = ctypes.c_int
LIBD.BrotliDecoderDecompress.argtypes = [
    ctypes.c_size_t, ctypes.c_char_p,
    ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]

BROTLI_PARAM_MODE, BROTLI_PARAM_QUALITY, BROTLI_PARAM_LGWIN = 0, 1, 2
OP_PROCESS, OP_FLUSH, OP_FINISH = 0, 1, 2


def compress(data, quality, lgwin):
    out_len = ctypes.c_size_t(len(data) * 2 + 1024)
    out = ctypes.create_string_buffer(out_len.value)
    ok = LIBE.BrotliEncoderCompress(quality, lgwin, 0, len(data), data,
                                    ctypes.byref(out_len), out)
    assert ok == 1
    return out.raw[:out_len.value]


def compress_flushed(chunks, quality, lgwin):
    """Stream with FLUSH between chunks -> multiple meta-blocks."""
    LIBE.BrotliEncoderSetParameter.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_uint32]
    st = LIBE.BrotliEncoderCreateInstance(None, None, None)
    LIBE.BrotliEncoderSetParameter(st, BROTLI_PARAM_QUALITY, quality)
    LIBE.BrotliEncoderSetParameter(st, BROTLI_PARAM_LGWIN, lgwin)
    out = b""
    for ci, chunk in enumerate(chunks):
        op = OP_FINISH if ci == len(chunks) - 1 else OP_FLUSH
        avail_in = ctypes.c_size_t(len(chunk))
        next_in = ctypes.c_char_p(chunk)
        while True:
            buf = ctypes.create_string_buffer(1 << 20)
            avail_out = ctypes.c_size_t(len(buf))
            next_out = ctypes.c_char_p(ctypes.addressof(buf))
            ok = LIBE.BrotliEncoderCompressStream(
                st, op, ctypes.byref(avail_in), ctypes.byref(next_in),
                ctypes.byref(avail_out), ctypes.byref(next_out), None)
            assert ok == 1
            out += buf.raw[:len(buf) - avail_out.value]
            if avail_in.value == 0 and avail_out.value > 0:
                break
    LIBE.BrotliEncoderDestroyInstance.argtypes = [ctypes.c_void_p]
    LIBE.BrotliEncoderDestroyInstance(st)
    return out


def check_roundtrip(blob, data):
    out_len = ctypes.c_size_t(max(64, len(data) + 64))
    out = ctypes.create_string_buffer(out_len.value)
    ok = LIBD.BrotliDecoderDecompress(len(blob), blob,
                                      ctypes.byref(out_len), out)
    assert ok == 1 and out.raw[:out_len.value] == data


def hexnoise(seed, n):
    out = b""
    i = 0
    while len(out) < n:
        out += hashlib.md5(("%d:%d" % (seed, i)).encode()).hexdigest().encode()
        i += 1
    return out[:n]


def make_interop():
    text = (b"the quick brown fox jumps over the lazy dog. "
            b"The Information of this public website, ")
    cases = []
    for q in (0, 1, 2, 4, 5, 7, 9, 10, 11):
        cases.append((text * (3 + q), q, 22))
    for w in (10, 11, 14, 16, 18, 24):
        cases.append((text * 40 + hexnoise(w, 500), 9, w))
    cases += [
        (b"", 11, 22),
        (b"z", 11, 22),
        (b"time", 11, 22),                      # pure dictionary word
        (b"The information. However, whether", 11, 22),  # transforms
        (bytes(range(256)) * 16, 11, 22),       # byte ramp (signed ctx)
        (b"a" * 100000, 11, 22),                # long run
        (hexnoise(7, 65536), 5, 22),            # noise
        (hexnoise(8, 1 << 20), 9, 18),          # ~1 MiB
        (bytes([0]) * 3 + text * 200, 11, 10),  # small window
    ]
    for i, (data, q, w) in enumerate(cases):
        blob = compress(data, q, w)
        check_roundtrip(blob, data)
        open(os.path.join(TEST_RES, "interop_%02d.br" % i), "wb").write(blob)
        open(os.path.join(TEST_RES, "interop_%02d.raw" % i), "wb").write(data)
    # multi-meta-block via FLUSH
    n = len(cases)
    for j, (q, w) in enumerate([(5, 22), (11, 22), (9, 12)]):
        chunks = [text * (10 + j), hexnoise(j, 2000), text * 5,
                  b"tail " * (50 * (j + 1))]
        data = b"".join(chunks)
        blob = compress_flushed(chunks, q, w)
        check_roundtrip(blob, data)
        i = n + j
        open(os.path.join(TEST_RES, "interop_%02d.br" % i), "wb").write(blob)
        open(os.path.join(TEST_RES, "interop_%02d.raw" % i), "wb").write(data)
    print("interop fixtures: %d" % (n + 3))


def q243_content(i):
    """MUST stay in lockstep with the q243 oracle SQL in LlmQueries."""
    base = ("brotli stream %d: the quick brown fox jumps over the lazy dog. "
            % i)
    hx = hashlib.md5(str(i).encode()).hexdigest()
    k = i % 4
    if k == 0:
        return (base * (1 + i)).encode()
    if k == 1:
        return (hx * (2 + 3 * i)).encode()
    if k == 2:
        return ((base + hx) * (1 + i % 7)).encode()
    return (("" if i == 3 else "a" * (1 + 40 * i)) + base).encode()


def make_q243():
    qualities = [0, 1, 2, 5, 9, 11]
    windows = [10, 11, 16, 18, 22, 24]
    for i in range(40):
        data = q243_content(i)
        q, w = qualities[i % 6], windows[(i // 6) % 6]
        if i % 5 == 0 and len(data) > 40:
            half = len(data) // 2
            blob = compress_flushed([data[:half], data[half:]], q, w)
        else:
            blob = compress(data, q, w)
        check_roundtrip(blob, data)
        open(os.path.join(MAIN_RES, "q243", "%03d.br" % i), "wb").write(blob)
    print("q243 fixtures: 40")


if __name__ == "__main__":
    extract_dictionary()
    transforms = extract_transforms()
    lut = extract_context_lut()
    emit_tables_scala(transforms, lut)
    make_interop()
    make_q243()
