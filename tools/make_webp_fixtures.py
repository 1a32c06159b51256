#!/usr/bin/env python3
"""Generate WebP interop fixtures with the SYSTEM libwebp (the public
reference implementation), via ctypes:

- lossy_*.webp  : real VP8 key frames across qualities/sizes, plus
  lossy_*.yuv — libwebp's OWN decoded Y/U/V planes (the bit-exact
  expected output of an RFC 6386 decoder, post loop filter).
- lossless_*.webp : real VP8L streams across content shapes, plus
  lossless_*.argb — libwebp's decoded ARGB (identical to the input,
  lossless), pinning graft's Vp8l decoder against a real encoder
  (the round-10 ADVICE ask: encoder-roundtrip tests can't see a
  shared-layout misreading; these can).

Deterministic content (fixed LCG), no external inputs. Fixtures are
checked into src/test/resources and consumed by Vp8InteropSpec /
Vp8lSpec. Rerun: python3 tools/make_webp_fixtures.py
"""
import ctypes
import os
import struct

LIB = ctypes.CDLL("libwebp.so.7")
OUT = "src/test/resources/graft/webp"
os.makedirs(OUT, exist_ok=True)

LIB.WebPEncodeRGBA.restype = ctypes.c_size_t
LIB.WebPEncodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
LIB.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
LIB.WebPEncodeLosslessRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
LIB.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
LIB.WebPDecodeYUV.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
LIB.WebPDecodeARGB.restype = ctypes.POINTER(ctypes.c_uint8)
LIB.WebPDecodeARGB.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
LIB.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
LIB.WebPDecodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
LIB.WebPFree.argtypes = [ctypes.c_void_p]


def lcg(seed):
    s = seed & 0xFFFFFFFF
    while True:
        s = (s * 1664525 + 1013904223) & 0xFFFFFFFF
        yield (s >> 16) & 0xFF


def image(kind, w, h, seed, alpha=False):
    """Deterministic RGBA content: gradients, blocks, noise, edges.
    `alpha` adds a deterministic non-255 alpha ramp (forces an ALPH
    chunk in lossy encodes / real alpha in lossless ones)."""
    rnd = lcg(seed)
    buf = bytearray(w * h * 4)
    for y in range(h):
        for x in range(w):
            i = (y * w + x) * 4
            if kind == "gradient":
                r, g, b = (x * 255) // max(1, w - 1), (y * 255) // max(1, h - 1), (x + y) % 256
            elif kind == "blocks":
                r = ((x // 8) * 37 + (y // 8) * 91 + seed) % 256
                g = ((x // 16) * 53 + (y // 4) * 29) % 256
                b = ((x // 4) * 11 + (y // 16) * 71) % 256
            elif kind == "noise":
                r, g, b = next(rnd), next(rnd), next(rnd)
            else:  # edges: sharp transitions exercise the loop filter + hev
                on = ((x // 13) + (y // 7)) % 2 == 0
                r = 230 if on else 20
                g = 40 if on else 200
                b = (x * 3 + y * 5) % 256
            buf[i] = r
            buf[i + 1] = g
            buf[i + 2] = b
            buf[i + 3] = (40 + (x * 5 + y * 9 + seed) % 200) if alpha else 255
    return bytes(buf)


def encode_lossy(rgba, w, h, q):
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = LIB.WebPEncodeRGBA(rgba, w, h, w * 4, ctypes.c_float(q), ctypes.byref(out))
    assert n > 0
    blob = ctypes.string_at(out, n)
    LIB.WebPFree(out)
    return blob


def encode_lossless(rgba, w, h):
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = LIB.WebPEncodeLosslessRGBA(rgba, w, h, w * 4, ctypes.byref(out))
    assert n > 0
    blob = ctypes.string_at(out, n)
    LIB.WebPFree(out)
    return blob


def decode_yuv(blob):
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    y = LIB.WebPDecodeYUV(blob, len(blob), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uv_stride))
    assert y
    W, H = w.value, h.value
    uvW, uvH = (W + 1) // 2, (H + 1) // 2
    yb = bytearray()
    for r in range(H):
        yb += ctypes.string_at(ctypes.byref(y.contents, r * stride.value), W)
    ub = bytearray()
    vb = bytearray()
    for r in range(uvH):
        ub += ctypes.string_at(ctypes.byref(u.contents, r * uv_stride.value), uvW)
        vb += ctypes.string_at(ctypes.byref(v.contents, r * uv_stride.value), uvW)
    LIB.WebPFree(y)
    return W, H, bytes(yb), bytes(ub), bytes(vb)


def decode_argb(blob):
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = LIB.WebPDecodeARGB(blob, len(blob), ctypes.byref(w), ctypes.byref(h))
    assert p
    data = ctypes.string_at(p, w.value * h.value * 4)
    LIB.WebPFree(p)
    return w.value, h.value, data


def decode_argb_rgba(blob):
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = LIB.WebPDecodeRGBA(blob, len(blob), ctypes.byref(w), ctypes.byref(h))
    assert p
    data = ctypes.string_at(p, w.value * h.value * 4)
    LIB.WebPFree(p)
    return w.value, h.value, data


def main():
    lossy_cases = [
        ("gradient", 64, 48, 75), ("blocks", 80, 64, 50),
        ("noise", 48, 48, 90), ("edges", 96, 80, 30),
        ("gradient", 33, 21, 60),  # ragged crop
        ("blocks", 129, 65, 20),   # low quality -> strong loop filter
        ("edges", 16, 16, 95), ("noise", 200, 120, 40),
    ]
    for i, (kind, w, h, q) in enumerate(lossy_cases):
        rgba = image(kind, w, h, seed=i * 7919 + 17)
        blob = encode_lossy(rgba, w, h, q)
        W, H, yb, ub, vb = decode_yuv(blob)
        assert (W, H) == (w, h)
        open(f"{OUT}/lossy_{i}.webp", "wb").write(blob)
        with open(f"{OUT}/lossy_{i}.yuv", "wb") as f:
            f.write(struct.pack("<ii", W, H))
            f.write(yb)
            f.write(ub)
            f.write(vb)
        print(f"lossy_{i}: {kind} {w}x{h} q{q} -> {len(blob)} bytes")

    lossless_cases = [
        ("gradient", 40, 30, False), ("blocks", 64, 64, False),
        ("noise", 32, 24, False), ("edges", 77, 45, False),
        ("blocks", 16, 200, False),
        # real transparency: VP8L carries alpha natively in ARGB
        ("gradient", 48, 32, True), ("blocks", 33, 57, True),
    ]
    for i, (kind, w, h, al) in enumerate(lossless_cases):
        rgba = image(kind, w, h, seed=i * 104729 + 5, alpha=al)
        blob = encode_lossless(rgba, w, h)
        W, H, argb = decode_argb(blob)
        assert (W, H) == (w, h)
        open(f"{OUT}/lossless_{i}.webp", "wb").write(blob)
        with open(f"{OUT}/lossless_{i}.argb", "wb") as f:
            f.write(struct.pack("<ii", W, H))
            f.write(argb)
        print(f"lossless_{i}: {kind} {w}x{h} alpha={al} -> {len(blob)} bytes")

    # lossy WITH TRANSPARENCY: VP8X container + ALPH chunk + VP8 frame.
    # Expected alpha = the A channel of libwebp's own RGBA decode (the
    # color planes are already pinned by the plain lossy cases; alpha is
    # what these add).
    alpha_cases = [("gradient", 64, 48, 75), ("edges", 49, 33, 40),
                   ("blocks", 96, 64, 60)]
    for i, (kind, w, h, q) in enumerate(alpha_cases):
        rgba = image(kind, w, h, seed=i * 31337 + 3, alpha=True)
        blob = encode_lossy(rgba, w, h, q)
        assert b"ALPH" in blob and b"VP8X" in blob, "alpha fixture must carry ALPH"
        W, H, yb, ub, vb = decode_yuv(blob)
        assert (W, H) == (w, h)
        Wa, Ha, argb_out = decode_argb_rgba(blob)
        a_plane = bytes(argb_out[k * 4 + 3] for k in range(w * h))
        open(f"{OUT}/alpha_{i}.webp", "wb").write(blob)
        with open(f"{OUT}/alpha_{i}.yuva", "wb") as f:
            f.write(struct.pack("<ii", W, H))
            f.write(yb)
            f.write(ub)
            f.write(vb)
            f.write(a_plane)
        print(f"alpha_{i}: {kind} {w}x{h} q{q} -> {len(blob)} bytes")

    # RGBA expected output (round 12): WebPDecodeRGBA dumps for every
    # lossy/alpha fixture — the bit-exact target of graft's fancy
    # upsampler + fixed-point YUV->RGB (WebpRgb / WebpRgbSpec).
    for i in range(len(lossy_cases)):
        dump_rgba(f"{OUT}/lossy_{i}.webp", f"{OUT}/lossy_{i}.rgba")
    for i in range(len(alpha_cases)):
        dump_rgba(f"{OUT}/alpha_{i}.webp", f"{OUT}/alpha_{i}.rgba")


def dump_rgba(webp_path, out_path):
    blob = open(webp_path, "rb").read()
    w, h, rgba = decode_argb_rgba(blob)
    with open(out_path, "wb") as f:
        f.write(struct.pack("<ii", w, h))
        f.write(rgba)
    print(f"{out_path}: {w}x{h}")


if __name__ == "__main__":
    main()
