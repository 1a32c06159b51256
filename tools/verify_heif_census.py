#!/usr/bin/env python3
"""HEIF/AVIF census cross-check against the REAL parsers on-system:
HeifSpec dumps graft-constructed .heic/.avif containers to
target/heif_encoder_out/; this tool reads each through libheif
(heif_context_read_from_memory_without_copy) — and .avif additionally
through libavif's metadata-only avifDecoderParse — and cross-checks
the primary image dimensions, top-level image count, and (for avif)
that the parser identifies AV1 content. Pixel decode is NOT attempted
anywhere: the census is metadata-only by design (the q247 honest
scoping), and this tool validates exactly that layer.

Usage: python3 tools/verify_heif_census.py [dir]
"""
import ctypes
import glob
import os
import re
import sys

H = ctypes.CDLL("libheif.so.1")
H.heif_context_alloc.restype = ctypes.c_void_p
H.heif_context_free.argtypes = [ctypes.c_void_p]


class HeifError(ctypes.Structure):
    _fields_ = [("code", ctypes.c_int), ("subcode", ctypes.c_int),
                ("message", ctypes.c_char_p)]


H.heif_context_read_from_memory_without_copy.restype = HeifError
H.heif_context_read_from_memory_without_copy.argtypes = [
    ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p]
H.heif_context_get_primary_image_handle.restype = HeifError
H.heif_context_get_primary_image_handle.argtypes = [
    ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p)]
H.heif_context_get_number_of_top_level_images.restype = ctypes.c_int
H.heif_context_get_number_of_top_level_images.argtypes = [ctypes.c_void_p]
H.heif_image_handle_get_width.restype = ctypes.c_int
H.heif_image_handle_get_width.argtypes = [ctypes.c_void_p]
H.heif_image_handle_get_height.restype = ctypes.c_int
H.heif_image_handle_get_height.argtypes = [ctypes.c_void_p]
H.heif_image_handle_release.argtypes = [ctypes.c_void_p]

A = ctypes.CDLL("libavif.so.15")
A.avifDecoderCreate.restype = ctypes.c_void_p
A.avifDecoderDestroy.argtypes = [ctypes.c_void_p]
A.avifDecoderSetIOMemory.restype = ctypes.c_int
A.avifDecoderSetIOMemory.argtypes = [
    ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t]
A.avifDecoderParse.restype = ctypes.c_int
A.avifDecoderParse.argtypes = [ctypes.c_void_p]

d = sys.argv[1] if len(sys.argv) > 1 else "target/heif_encoder_out"
files = sorted(glob.glob(os.path.join(d, "*.heic")) +
               glob.glob(os.path.join(d, "*.avif")))
if not files:
    sys.exit(f"no containers under {d} — run `sbt test` (HeifSpec) first")

ok = bad = 0
for path in files:
    name = os.path.basename(path)
    m = re.search(r"_(\d+)x(\d+)_(exif|plain)\.(heic|avif)$", name)
    w, h = int(m.group(1)), int(m.group(2))
    blob = open(path, "rb").read()
    ctx = ctypes.c_void_p(H.heif_context_alloc())
    err = H.heif_context_read_from_memory_without_copy(
        ctx, blob, len(blob), None)
    if err.code != 0:
        print(f"FAIL {name}: libheif read: {err.message.decode()}")
        bad += 1
        H.heif_context_free(ctx)
        continue
    n_top = H.heif_context_get_number_of_top_level_images(ctx)
    handle = ctypes.c_void_p()
    err = H.heif_context_get_primary_image_handle(ctx, ctypes.byref(handle))
    if err.code != 0:
        print(f"FAIL {name}: libheif primary: {err.message.decode()}")
        bad += 1
        H.heif_context_free(ctx)
        continue
    gw = H.heif_image_handle_get_width(handle)
    gh = H.heif_image_handle_get_height(handle)
    H.heif_image_handle_release(handle)
    H.heif_context_free(ctx)
    fine = (gw == w and gh == h and n_top == 1)
    if not fine:
        print(f"FAIL {name}: libheif sees {gw}x{gh} n_top={n_top}, "
              f"census says {w}x{h} n_top=1")
    # avif files additionally through libavif's metadata parse
    if fine and path.endswith(".avif"):
        dec = ctypes.c_void_p(A.avifDecoderCreate())
        assert A.avifDecoderSetIOMemory(dec, blob, len(blob)) == 0
        rc = A.avifDecoderParse(dec)
        A.avifDecoderDestroy(dec)
        if rc != 0:
            print(f"FAIL {name}: libavif parse rc={rc}")
            fine = False
    if fine:
        ok += 1
    else:
        bad += 1

print(f"{ok}/{ok + bad} graft-constructed containers validated by the "
      f"reference parsers")
sys.exit(1 if bad else 0)
