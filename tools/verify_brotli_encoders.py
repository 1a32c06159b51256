#!/usr/bin/env python3
"""Independent-direction brotli interop check (the verify_webp_encoders
pattern): BrotliSpec pins that GRAFT decodes real libbrotli frames
byte-exactly; this tool pins the reverse — that the REAL libbrotli
decoder accepts and byte-exactly decodes frames produced by
graft.operators.Brotli.encode. Run after `sbt test` has written the
graft-encoded blobs to target/brotli_encoder_out/ (BrotliSpec does
this), or pass a directory of NN.br/NN.raw pairs.

Usage: python3 tools/verify_brotli_encoders.py [dir]
"""
import ctypes
import glob
import os
import sys

LIBD = ctypes.CDLL("libbrotlidec.so.1")
LIBD.BrotliDecoderDecompress.restype = ctypes.c_int
LIBD.BrotliDecoderDecompress.argtypes = [
    ctypes.c_size_t, ctypes.c_char_p,
    ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]

d = sys.argv[1] if len(sys.argv) > 1 else "target/brotli_encoder_out"
pairs = sorted(glob.glob(os.path.join(d, "*.br")))
if not pairs:
    sys.exit(f"no .br files under {d} — run `sbt test` (BrotliSpec) first")
ok = bad = 0
for br_path in pairs:
    raw_path = br_path[:-3] + ".raw"
    blob = open(br_path, "rb").read()
    want = open(raw_path, "rb").read()
    out_len = ctypes.c_size_t(max(64, len(want) + 64))
    out = ctypes.create_string_buffer(out_len.value)
    rc = LIBD.BrotliDecoderDecompress(len(blob), blob,
                                      ctypes.byref(out_len), out)
    got = out.raw[:out_len.value]
    if rc == 1 and got == want:
        ok += 1
    else:
        bad += 1
        print(f"FAIL {os.path.basename(br_path)}: rc={rc} "
              f"got={len(got)} want={len(want)}")
print(f"{ok}/{ok + bad} graft-encoded frames decode byte-exactly "
      f"in the system libbrotli")
sys.exit(1 if bad else 0)
