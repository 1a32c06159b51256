#!/usr/bin/env python3
"""Extract the VP8 probability/quantizer constant tables from the system
libwebp binary (the public reference implementation of RFC 6386) and emit
them as Scala source.

The tables are PUBLIC DATA — they appear verbatim in RFC 6386 sections
11.4, 13.4, 13.5 and 14.1; reading them out of libwebp's .rodata just
avoids hand-typing ~3000 constants (and the transcription bugs that
invites). Offsets are discovered by probing for rows whose values are
independently known from the RFC text, then validated structurally
(table sizes, neighboring-table adjacency, value ranges).

Run: python3 tools/extract_vp8_tables.py  (rewrites Vp8Tables.scala)
"""
import re
import struct
import sys

LIB = "/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5"
OUT = "src/main/scala/graft/operators/Vp8Tables.scala"

lib = open(LIB, "rb").read()


def find_once(probe, what, nth=0):
    hits = [m.start() for m in re.finditer(re.escape(probe), lib)]
    if not hits:
        sys.exit(f"probe for {what} not found")
    return hits[nth]


# ac dequant table: uint16[128]; RFC 14.1 values 4..284 with the
# first deviation at index 55 (58 -> 60)
acq_at = find_once(struct.pack("<12H", 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15), "acq")
acq = list(struct.unpack("<128H", lib[acq_at:acq_at + 256]))
assert acq[55] == 60 and acq[127] == 284, acq[50:60]

# dc dequant table: uint8[128]; starts 4,5,6,7,8,9,10,10,11 (the
# double 10 distinguishes it from acq), ends 157
dcq_at = find_once(bytes([4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17]), "dcq")
dcq = list(lib[dcq_at:dcq_at + 128])
assert dcq[127] == 157, dcq[-5:]

# default coefficient probabilities (RFC 13.5): [4][8][3][11] uint8.
# The probe row {253,136,...} is type 0 BAND 1 ctx 0 — type 0 (Y after
# Y2) starts at coefficient 1, so its band 0 is never read and the
# table fills it with one band (3 rows) of 128s, which sit immediately
# before the probe. Anchor one band earlier.
defp_at = find_once(bytes([253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128]), "default probs") - 33
defp = list(lib[defp_at:defp_at + 1056])
assert defp[:33] == [128] * 33, "type0 band0 must be the unused all-128 band"
assert all(b >= 1 for b in defp), "probabilities are 1..255"

# coefficient-probability UPDATE probabilities (RFC 13.4): same shape,
# dominated by 255s; sits directly before the kf b-mode table
kfb_at = find_once(bytes([231, 120, 48, 89, 115, 113, 120, 152, 112]), "kf bmode")
upd_at = kfb_at - 1056
upd = list(lib[upd_at:upd_at + 1056])
frac255 = sum(1 for b in upd if b == 255) / 1056
assert frac255 > 0.8, frac255
assert all(b >= 1 for b in upd), "probabilities are 1..255"

# keyframe 4x4 mode probabilities (RFC 11.4): [10][10][9] uint8.
# libwebp's 4x4-mode enum orders the diagonals RD,VR,LD,VL (indices
# 4..7) where the RFC orders them LD,RD,VR,VL — permute rows/columns
# into RFC id order so decoder code written against the RFC indexes
# the right [above][left] cell. (The 9 per-row probabilities pair with
# tree NODES, which are identical in both orderings.)
kfb_raw = list(lib[kfb_at:kfb_at + 900])
assert all(b >= 1 for b in kfb_raw)
rfc2webp = [0, 1, 2, 3, 6, 4, 5, 7, 8, 9]  # RFC id -> libwebp id
kfb = []
for a in range(10):
    for l in range(10):
        src = (rfc2webp[a] * 10 + rfc2webp[l]) * 9
        kfb += kfb_raw[src:src + 9]


def scala4(name, flat, d1, d2, d3, d4):
    lines = [f"  val {name}: Array[Array[Array[Array[Int]]]] = Array("]
    i = 0
    for a in range(d1):
        lines.append("    Array(")
        for b in range(d2):
            lines.append("      Array(")
            for c in range(d3):
                row = flat[i:i + d4]
                i += d4
                sep = "," if c < d3 - 1 else ""
                lines.append("        Array(" + ", ".join(map(str, row)) + f"){sep}")
            sep = "," if b < d2 - 1 else ""
            lines.append(f"      ){sep}")
        sep = "," if a < d1 - 1 else ""
        lines.append(f"    ){sep}")
    lines.append("  )")
    return "\n".join(lines)


def scala3(name, flat, d1, d2, d3):
    lines = [f"  val {name}: Array[Array[Array[Int]]] = Array("]
    i = 0
    for a in range(d1):
        lines.append("    Array(")
        for b in range(d2):
            row = flat[i:i + d3]
            i += d3
            sep = "," if b < d2 - 1 else ""
            lines.append("      Array(" + ", ".join(map(str, row)) + f"){sep}")
        sep = "," if a < d1 - 1 else ""
        lines.append(f"    ){sep}")
    lines.append("  )")
    return "\n".join(lines)


def scala1(name, vals):
    rows = [", ".join(map(str, vals[i:i + 16])) for i in range(0, len(vals), 16)]
    body = ",\n    ".join(rows)
    return f"  val {name}: Array[Int] = Array(\n    {body})"


src = f"""package graft.operators

/** VP8 constant tables (RFC 6386 sections 11.4, 13.4, 13.5, 14.1) —
  * public data, extracted byte-exactly from the system libwebp (the
  * reference implementation) by `tools/extract_vp8_tables.py` to avoid
  * hand-transcription errors across ~3000 values. Layout follows the
  * bitstream's update order: [blockType][band][context][probability]
  * with blockType 0 = Y-after-Y2, 1 = Y2, 2 = chroma, 3 = Y-with-DC.
  * DO NOT EDIT BY HAND — rerun the extractor.
  */
object Vp8Tables {{

  /** default_coeff_probs (RFC 13.5). */
{scala4("DefaultCoeffProbs", defp, 4, 8, 3, 11)}

  /** coeff_update_probs (RFC 13.4). */
{scala4("CoeffUpdateProbs", upd, 4, 8, 3, 11)}

  /** kf_bmode_prob[above][left] (RFC 11.4). */
{scala3("KfBModeProb", kfb, 10, 10, 9)}

  /** dc_qlookup (RFC 14.1). */
{scala1("DcQLookup", dcq)}

  /** ac_qlookup (RFC 14.1). */
{scala1("AcQLookup", acq)}
}}
"""
open(OUT, "w").write(src)
print(f"wrote {OUT}: defp@{defp_at} upd@{upd_at} kfb@{kfb_at} dcq@{dcq_at} acq@{acq_at}")
