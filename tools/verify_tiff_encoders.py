#!/usr/bin/env python3
"""Independent-direction TIFF interop check (the verify_brotli_encoders
pattern): TiffInteropSpec pins that GRAFT decodes real libtiff files
byte-exactly; this tool pins the reverse — that the REAL libtiff
accepts and byte-exactly reads files produced by
graft.operators.Tiff.encodeGray across the compression (none/LZW/
Deflate/PackBits) × predictor × byte-order matrix. Run after
`sbt test` has written the graft-encoded files to
target/tiff_encoder_out/ (TiffInteropSpec does this).

Usage: python3 tools/verify_tiff_encoders.py [dir]
"""
import ctypes
import glob
import os
import re
import sys

T = ctypes.CDLL("libtiff.so.6")
T.TIFFOpen.restype = ctypes.c_void_p
T.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
T.TIFFReadScanline.restype = ctypes.c_int
T.TIFFReadScanline.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                               ctypes.c_uint32, ctypes.c_uint16]
T.TIFFClose.argtypes = [ctypes.c_void_p]

d = sys.argv[1] if len(sys.argv) > 1 else "target/tiff_encoder_out"
files = sorted(glob.glob(os.path.join(d, "*.tif")))
if not files:
    sys.exit(f"no .tif files under {d} — run `sbt test` (TiffInteropSpec) first")

ok = bad = 0
for tif_path in files:
    m = re.search(r"_(\d+)x(\d+)_c(\d+)_p(\d+)\.tif$", tif_path)
    w, h = int(m.group(1)), int(m.group(2))
    want = open(tif_path[:-4] + ".gray", "rb").read()
    tif = ctypes.c_void_p(T.TIFFOpen(tif_path.encode(), b"r"))
    if not tif.value:
        print(f"FAIL {os.path.basename(tif_path)}: libtiff rejected the file")
        bad += 1
        continue
    got = bytearray()
    fine = True
    buf = ctypes.create_string_buffer(w)
    for r in range(h):
        if T.TIFFReadScanline(tif, buf, r, 0) != 1:
            print(f"FAIL {os.path.basename(tif_path)}: scanline {r}")
            fine = False
            break
        got += buf.raw[:w]
    T.TIFFClose(tif)
    if fine and bytes(got) == want:
        ok += 1
    elif fine:
        print(f"FAIL {os.path.basename(tif_path)}: pixels differ")
        bad += 1
    else:
        bad += 1

print(f"{ok}/{ok + bad} graft-encoded TIFFs byte-exact under libtiff")
sys.exit(1 if bad else 0)
