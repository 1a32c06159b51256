#!/usr/bin/env python3
"""Compressed-TIFF interop fixtures from the SYSTEM libtiff via ctypes —
the libbrotli/libwebp playbook applied to TIFF 6.0 compressions:

  src/test/resources/graft/tiff/interop_NN.tif  — written by libtiff
  src/test/resources/graft/tiff/interop_NN.gray — the exact pixels
      libtiff itself reads back from that file (w,h in the filename
      sidecar line of MANIFEST.txt)

Matrix: compression {LZW(5), AdobeDeflate(8), PackBits(32773)} ×
predictor {1,2 (not for PackBits — libtiff ignores it there)} ×
content shapes (byte ramp, per-row gradients, long runs, high-entropy
LCG bytes, large enough LCG images to push the LZW table past the
9→10→11→12-bit EARLY-CHANGE boundaries and past the 4094-entry Clear).

Deterministic (LCG, no random module). Rerun:
    python3 tools/make_tiff_fixtures.py
"""
import ctypes
import os

T = ctypes.CDLL("libtiff.so.6")

T.TIFFOpen.restype = ctypes.c_void_p
T.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
T.TIFFSetField.restype = ctypes.c_int
T.TIFFWriteScanline.restype = ctypes.c_int
T.TIFFWriteScanline.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_uint32, ctypes.c_uint16]
T.TIFFReadScanline.restype = ctypes.c_int
T.TIFFReadScanline.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                               ctypes.c_uint32, ctypes.c_uint16]
T.TIFFClose.argtypes = [ctypes.c_void_p]

IMAGEWIDTH, IMAGELENGTH, BITSPERSAMPLE = 256, 257, 258
COMPRESSION, PHOTOMETRIC, SAMPLESPERPIXEL = 259, 262, 277
ROWSPERSTRIP, PLANARCONFIG, PREDICTOR = 278, 284, 317

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/test/resources/graft/tiff")
os.makedirs(OUT, exist_ok=True)


def lcg_bytes(n, seed):
    s = seed & 0xFFFFFFFF
    out = bytearray(n)
    for i in range(n):
        s = (1103515245 * s + 12345) & 0xFFFFFFFF
        out[i] = (s >> 16) & 0xFF
    return bytes(out)


def content(kind, w, h, seed):
    n = w * h
    if kind == "ramp":
        return bytes((i % 256) for i in range(n))
    if kind == "rows":
        return bytes(((3 * (i % w) + 7 * (i // w) + seed) % 256)
                     for i in range(n))
    if kind == "runs":
        return bytes((((i // 37) * 11 + seed) % 256) for i in range(n))
    return lcg_bytes(n, seed)  # high entropy: drives LZW table growth


def write_tiff(path, w, h, px, comp, pred, rps):
    tif = ctypes.c_void_p(T.TIFFOpen(path.encode(), b"w"))
    assert tif.value, f"TIFFOpen failed: {path}"
    # NB: TIFFSetField is varargs — without argtypes, a raw Python int
    # handle would be truncated to 32 bits; keep the c_void_p wrapper
    sf = T.TIFFSetField
    sf(tif, ctypes.c_uint32(IMAGEWIDTH), ctypes.c_uint32(w))
    sf(tif, ctypes.c_uint32(IMAGELENGTH), ctypes.c_uint32(h))
    sf(tif, ctypes.c_uint32(BITSPERSAMPLE), ctypes.c_int(8))
    sf(tif, ctypes.c_uint32(SAMPLESPERPIXEL), ctypes.c_int(1))
    sf(tif, ctypes.c_uint32(PHOTOMETRIC), ctypes.c_int(1))  # BlackIsZero
    sf(tif, ctypes.c_uint32(PLANARCONFIG), ctypes.c_int(1))
    sf(tif, ctypes.c_uint32(COMPRESSION), ctypes.c_int(comp))
    if pred != 1:
        sf(tif, ctypes.c_uint32(PREDICTOR), ctypes.c_int(pred))
    sf(tif, ctypes.c_uint32(ROWSPERSTRIP), ctypes.c_uint32(rps))
    for r in range(h):
        buf = ctypes.create_string_buffer(px[r * w:(r + 1) * w], w)
        assert T.TIFFWriteScanline(tif, buf, r, 0) == 1, "write scanline"
    T.TIFFClose(tif)


def read_tiff(path, w, h):
    tif = ctypes.c_void_p(T.TIFFOpen(path.encode(), b"r"))
    assert tif.value, f"TIFFOpen(r) failed: {path}"
    out = bytearray()
    buf = ctypes.create_string_buffer(w)
    for r in range(h):
        assert T.TIFFReadScanline(tif, buf, r, 0) == 1, "read scanline"
        out += buf.raw[:w]
    T.TIFFClose(tif)
    return bytes(out)


CASES = []
i = 0
for comp, cname in [(5, "lzw"), (8, "deflate"), (32773, "packbits")]:
    preds = [1, 2] if comp != 32773 else [1]
    for pred in preds:
        for kind, w, h, rps in [
            ("ramp", 33, 21, 5),
            ("rows", 64, 48, 16),
            ("runs", 80, 40, 40),
            ("lcg", 96, 64, 64),        # > 511 LZW entries: first bump
            ("lcg", 256, 96, 96),       # > 4094 entries: forces Clear
        ]:
            CASES.append((i, comp, cname, pred, kind, w, h, rps))
            i += 1

manifest = []
for (idx, comp, cname, pred, kind, w, h, rps) in CASES:
    px = content(kind, w, h, seed=idx * 7919 + 17)
    tif_path = os.path.join(OUT, f"interop_{idx:02d}.tif")
    write_tiff(tif_path, w, h, px, comp, pred, rps)
    back = read_tiff(tif_path, w, h)
    assert back == px, f"libtiff round-trip mismatch on case {idx}"
    with open(os.path.join(OUT, f"interop_{idx:02d}.gray"), "wb") as f:
        f.write(back)
    manifest.append(f"interop_{idx:02d} {w} {h} {comp} {pred} {kind}")
    print(f"case {idx:02d}: {cname} pred={pred} {kind} {w}x{h} rps={rps} "
          f"({os.path.getsize(tif_path)} bytes)")

with open(os.path.join(OUT, "MANIFEST.txt"), "w") as f:
    f.write("\n".join(manifest) + "\n")
print(f"{len(CASES)} fixtures -> {OUT}")
