package graft.operators

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
    "AAECAwQFBgcICQoLDA0ODxAREhMUFRYXGBkaGxwdHh8gISIjJCUmJygpKissLS4vMDEyMzQ1" +
    "Njc4OTo7PD0+PwABAgMEBQYHCAkKCwwNDg8QERITFBUWFxgZGhscHR4fICEiIyQlJicoKSor" +
    "LC0uLzAxMjM0NTY3ODk6Ozw9Pj8AAQIDBAUGBwgJCgsMDQ4PEBESExQVFhcYGRobHB0eHyAh" +
    "IiMkJSYnKCkqKywtLi8wMTIzNDU2Nzg5Ojs8PT4/AAECAwQFBgcICQoLDA0ODxAREhMUFRYX" +
    "GBkaGxwdHh8gISIjJCUmJygpKissLS4vMDEyMzQ1Njc4OTo7PD0+PwAAAAAAAAAAAAAAAAAA" +
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAQEBAQICAgIDAwMDBAQEBAUFBQUGBgYG" +
    "BwcHBwgICAgJCQkJCgoKCgsLCwsMDAwMDQ0NDQ4ODg4PDw8PEBAQEBERERESEhISExMTExQU" +
    "FBQVFRUVFhYWFhcXFxcYGBgYGRkZGRoaGhobGxsbHBwcHB0dHR0eHh4eHx8fHyAgICAhISEh" +
    "IiIiIiMjIyMkJCQkJSUlJSYmJiYnJycnKCgoKCkpKSkqKioqKysrKywsLCwtLS0tLi4uLi8v" +
    "Ly8wMDAwMTExMTIyMjIzMzMzNDQ0NDU1NTU2NjY2Nzc3Nzg4ODg5OTk5Ojo6Ojs7Ozs8PDw8" +
    "PT09PT4+Pj4/Pz8/AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
    "AAAAAAAAAAQEAAAEAAAAAAAAAAAAAAAAAAAAAAAACAwQDAwUDBAYHAwMIAwkDCwsLCwsLCws" +
    "LCwgIBgoHAwMMDQ0NDA0NDQwNDQ0NDQwNDQ0NDQwNDQ0NDQYDBwMDAw4PDw8ODw8PDg8PDw8" +
    "PDg8PDw8PDg8PDw8PBgMHAwAAAEAAQABAAEAAQABAAEAAQABAAEAAQABAAEAAQABAAEAAQAB" +
    "AAEAAQABAAEAAQABAAEAAQABAAEAAQABAAEAAQIDAgMCAwIDAgMCAwIDAgMCAwIDAgMCAwID" +
    "AgMCAwIDAgMCAwIDAgMCAwIDAgMCAwIDAgMCAwIDAgMCAwIDAgMAAAAAAAAAAAAAAAAAAAAA" +
    "AAAAAAAAAAAAAAAAAAAAAAABAQEBAQEBAQEBAQEBAQECAgICAgICAgICAQEBAQEBAQICAgIC" +
    "AgICAgICAgICAgICAgICAgICAgICAQEBAQEBAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMB" +
    "AQEBAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAICAgICAgIC" +
    "AgICAgICAgICAgICAgICAgICAgICAgICAAgICAgICAgICAgICAgICBAQEBAQEBAQEBAQEBAQ" +
    "EBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBgYGBgYGBgYGBgYGBgYGBgYGBgY" +
    "GBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBggICAgICAgICAg" +
    "ICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAg" +
    "KCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoMDAwMDAw" +
    "MDAwMDAwMDAwOAABAQEBAQEBAQEBAQEBAQECAgICAgICAgICAgICAgICAgICAgICAgICAgIC" +
    "AgICAgICAgICAgICAgICAgICAgIDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMD" +
    "AwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQE" +
    "BAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAUFBQUFBQUFBQUFBQUF" +
    "BQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQYGBgYGBgYGBgYGBgYGBgc=")

  /** RFC 7932 Appendix B: (prefix, transform type, suffix) x 121.
    * Types: 0 identity, 1..9 omit-last-N, 10 uppercase-first,
    * 11 uppercase-all, 12..20 omit-first-(N-11). */
  val Transforms: Array[(Array[Byte], Int, Array[Byte])] = Array(
    (Array.empty[Byte], 0, Array.empty[Byte]),
    (Array.empty[Byte], 0, Array[Byte](32)),
    (Array[Byte](32), 0, Array[Byte](32)),
    (Array.empty[Byte], 12, Array.empty[Byte]),
    (Array.empty[Byte], 10, Array[Byte](32)),
    (Array.empty[Byte], 0, Array[Byte](32, 116, 104, 101, 32)),
    (Array[Byte](32), 0, Array.empty[Byte]),
    (Array[Byte](115, 32), 0, Array[Byte](32)),
    (Array.empty[Byte], 0, Array[Byte](32, 111, 102, 32)),
    (Array.empty[Byte], 10, Array.empty[Byte]),
    (Array.empty[Byte], 0, Array[Byte](32, 97, 110, 100, 32)),
    (Array.empty[Byte], 13, Array.empty[Byte]),
    (Array.empty[Byte], 1, Array.empty[Byte]),
    (Array[Byte](44, 32), 0, Array[Byte](32)),
    (Array.empty[Byte], 0, Array[Byte](44, 32)),
    (Array[Byte](32), 10, Array[Byte](32)),
    (Array.empty[Byte], 0, Array[Byte](32, 105, 110, 32)),
    (Array.empty[Byte], 0, Array[Byte](32, 116, 111, 32)),
    (Array[Byte](101, 32), 0, Array[Byte](32)),
    (Array.empty[Byte], 0, Array[Byte](34)),
    (Array.empty[Byte], 0, Array[Byte](46)),
    (Array.empty[Byte], 0, Array[Byte](34, 62)),
    (Array.empty[Byte], 0, Array[Byte](10)),
    (Array.empty[Byte], 3, Array.empty[Byte]),
    (Array.empty[Byte], 0, Array[Byte](93)),
    (Array.empty[Byte], 0, Array[Byte](32, 102, 111, 114, 32)),
    (Array.empty[Byte], 14, Array.empty[Byte]),
    (Array.empty[Byte], 2, Array.empty[Byte]),
    (Array.empty[Byte], 0, Array[Byte](32, 97, 32)),
    (Array.empty[Byte], 0, Array[Byte](32, 116, 104, 97, 116, 32)),
    (Array[Byte](32), 10, Array.empty[Byte]),
    (Array.empty[Byte], 0, Array[Byte](46, 32)),
    (Array[Byte](46), 0, Array.empty[Byte]),
    (Array[Byte](32), 0, Array[Byte](44, 32)),
    (Array.empty[Byte], 15, Array.empty[Byte]),
    (Array.empty[Byte], 0, Array[Byte](32, 119, 105, 116, 104, 32)),
    (Array.empty[Byte], 0, Array[Byte](39)),
    (Array.empty[Byte], 0, Array[Byte](32, 102, 114, 111, 109, 32)),
    (Array.empty[Byte], 0, Array[Byte](32, 98, 121, 32)),
    (Array.empty[Byte], 16, Array.empty[Byte]),
    (Array.empty[Byte], 17, Array.empty[Byte]),
    (Array[Byte](32, 116, 104, 101, 32), 0, Array.empty[Byte]),
    (Array.empty[Byte], 4, Array.empty[Byte]),
    (Array.empty[Byte], 0, Array[Byte](46, 32, 84, 104, 101, 32)),
    (Array.empty[Byte], 11, Array.empty[Byte]),
    (Array.empty[Byte], 0, Array[Byte](32, 111, 110, 32)),
    (Array.empty[Byte], 0, Array[Byte](32, 97, 115, 32)),
    (Array.empty[Byte], 0, Array[Byte](32, 105, 115, 32)),
    (Array.empty[Byte], 7, Array.empty[Byte]),
    (Array.empty[Byte], 1, Array[Byte](105, 110, 103, 32)),
    (Array.empty[Byte], 0, Array[Byte](10, 9)),
    (Array.empty[Byte], 0, Array[Byte](58)),
    (Array[Byte](32), 0, Array[Byte](46, 32)),
    (Array.empty[Byte], 0, Array[Byte](101, 100, 32)),
    (Array.empty[Byte], 20, Array.empty[Byte]),
    (Array.empty[Byte], 18, Array.empty[Byte]),
    (Array.empty[Byte], 6, Array.empty[Byte]),
    (Array.empty[Byte], 0, Array[Byte](40)),
    (Array.empty[Byte], 10, Array[Byte](44, 32)),
    (Array.empty[Byte], 8, Array.empty[Byte]),
    (Array.empty[Byte], 0, Array[Byte](32, 97, 116, 32)),
    (Array.empty[Byte], 0, Array[Byte](108, 121, 32)),
    (Array[Byte](32, 116, 104, 101, 32), 0, Array[Byte](32, 111, 102, 32)),
    (Array.empty[Byte], 5, Array.empty[Byte]),
    (Array.empty[Byte], 9, Array.empty[Byte]),
    (Array[Byte](32), 10, Array[Byte](44, 32)),
    (Array.empty[Byte], 10, Array[Byte](34)),
    (Array[Byte](46), 0, Array[Byte](40)),
    (Array.empty[Byte], 11, Array[Byte](32)),
    (Array.empty[Byte], 10, Array[Byte](34, 62)),
    (Array.empty[Byte], 0, Array[Byte](61, 34)),
    (Array[Byte](32), 0, Array[Byte](46)),
    (Array[Byte](46, 99, 111, 109, 47), 0, Array.empty[Byte]),
    (Array[Byte](32, 116, 104, 101, 32), 0, Array[Byte](32, 111, 102, 32, 116, 104, 101, 32)),
    (Array.empty[Byte], 10, Array[Byte](39)),
    (Array.empty[Byte], 0, Array[Byte](46, 32, 84, 104, 105, 115, 32)),
    (Array.empty[Byte], 0, Array[Byte](44)),
    (Array[Byte](46), 0, Array[Byte](32)),
    (Array.empty[Byte], 10, Array[Byte](40)),
    (Array.empty[Byte], 10, Array[Byte](46)),
    (Array.empty[Byte], 0, Array[Byte](32, 110, 111, 116, 32)),
    (Array[Byte](32), 0, Array[Byte](61, 34)),
    (Array.empty[Byte], 0, Array[Byte](101, 114, 32)),
    (Array[Byte](32), 11, Array[Byte](32)),
    (Array.empty[Byte], 0, Array[Byte](97, 108, 32)),
    (Array[Byte](32), 11, Array.empty[Byte]),
    (Array.empty[Byte], 0, Array[Byte](61, 39)),
    (Array.empty[Byte], 11, Array[Byte](34)),
    (Array.empty[Byte], 10, Array[Byte](46, 32)),
    (Array[Byte](32), 0, Array[Byte](40)),
    (Array.empty[Byte], 0, Array[Byte](102, 117, 108, 32)),
    (Array[Byte](32), 10, Array[Byte](46, 32)),
    (Array.empty[Byte], 0, Array[Byte](105, 118, 101, 32)),
    (Array.empty[Byte], 0, Array[Byte](108, 101, 115, 115, 32)),
    (Array.empty[Byte], 11, Array[Byte](39)),
    (Array.empty[Byte], 0, Array[Byte](101, 115, 116, 32)),
    (Array[Byte](32), 10, Array[Byte](46)),
    (Array.empty[Byte], 11, Array[Byte](34, 62)),
    (Array[Byte](32), 0, Array[Byte](61, 39)),
    (Array.empty[Byte], 10, Array[Byte](44)),
    (Array.empty[Byte], 0, Array[Byte](105, 122, 101, 32)),
    (Array.empty[Byte], 11, Array[Byte](46)),
    (Array[Byte](-62, -96), 0, Array.empty[Byte]),
    (Array[Byte](32), 0, Array[Byte](44)),
    (Array.empty[Byte], 10, Array[Byte](61, 34)),
    (Array.empty[Byte], 11, Array[Byte](61, 34)),
    (Array.empty[Byte], 0, Array[Byte](111, 117, 115, 32)),
    (Array.empty[Byte], 11, Array[Byte](44, 32)),
    (Array.empty[Byte], 10, Array[Byte](61, 39)),
    (Array[Byte](32), 10, Array[Byte](44)),
    (Array[Byte](32), 11, Array[Byte](61, 34)),
    (Array[Byte](32), 11, Array[Byte](44, 32)),
    (Array.empty[Byte], 11, Array[Byte](44)),
    (Array.empty[Byte], 11, Array[Byte](40)),
    (Array.empty[Byte], 11, Array[Byte](46, 32)),
    (Array[Byte](32), 11, Array[Byte](46)),
    (Array.empty[Byte], 11, Array[Byte](61, 39)),
    (Array[Byte](32), 11, Array[Byte](46, 32)),
    (Array[Byte](32), 10, Array[Byte](61, 34)),
    (Array[Byte](32), 11, Array[Byte](61, 39)),
    (Array[Byte](32), 10, Array[Byte](61, 39)))

  /** RFC 7932 section 8: dictionary size bits by word length (4..24). */
  val DictSizeBits: Array[Int] = Array(
    0, 0, 0, 0, 10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9, 8,
    7, 7, 8, 7, 7, 6, 6, 5, 5)
}
