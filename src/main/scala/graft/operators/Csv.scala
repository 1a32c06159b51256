package graft.operators

/** RFC 4180 CSV lexical census — the tabular-text seam: CSV is the
  * most common structured-text format in a crawl after HTML/JSON, and
  * before a pipeline can type or load one it needs the LEXICAL verdict:
  * does the quoting parse at all, what is the header arity, how many
  * rows keep it, how much quoting/emptiness is in the cells. That
  * census is what routes a file to a loader, a repair pass, or the
  * quarantine bin.
  *
  * The parser is the real RFC 4180 state machine, not a line split:
  * quoted fields may contain delimiters, CR/LF and doubled quotes
  * (`""` = one literal quote). Reject-don't-guess applies to LEXICAL
  * corruption — an unterminated quote, a bare quote inside an unquoted
  * field, or content after a closing quote quarantines the document
  * (None); RAGGED rows (arity ≠ header arity) are well-formed CSV and
  * are COUNTED, not rejected — arity drift is a data-quality signal,
  * not a lexical error.
  *
  * Spark-side: per-row `mapPartitions` work, no shuffle — same scaling
  * posture as the other format walks. (Spark's own CSV reader answers
  * "load this one file as a DataFrame"; this walk answers "census a
  * CORPUS of CSV blobs as rows", which is a different shape: millions
  * of small files as values in a column, one verdict row each.)
  */
object Csv {

  final case class Info(
      nCols: Int,
      nRows: Long,
      nRagged: Long,
      dataCells: Long,
      nQuoted: Long,
      nEmpty: Long)

  /** Lexical census of one CSV document (comma delimiter, LF or CRLF
    * records, optional trailing newline). None = lexical corruption. */
  def info(raw: String): Option[Info] = {
    if (raw == null || raw.isEmpty) return None
    val n = raw.length
    var i = 0
    val recs = collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var fields = 0
    var quotedInRec = 0
    var emptyInRec = 0
    var fieldLen = 0
    var fieldQuoted = false
    var inQuotes = false

    def endField(): Unit = {
      fields += 1
      if (fieldQuoted) quotedInRec += 1
      else if (fieldLen == 0) emptyInRec += 1
      fieldLen = 0
      fieldQuoted = false
    }
    def endRec(): Unit = {
      endField()
      recs += ((fields, quotedInRec, emptyInRec))
      fields = 0; quotedInRec = 0; emptyInRec = 0
    }

    while (i < n) {
      val ch = raw.charAt(i)
      if (inQuotes) {
        if (ch == '"') {
          if (i + 1 < n && raw.charAt(i + 1) == '"') { fieldLen += 1; i += 2 }
          else {
            inQuotes = false; i += 1
            // a closing quote must be followed by delimiter, EOL or EOF
            if (i < n) {
              val nx = raw.charAt(i)
              if (nx != ',' && nx != '\n' && nx != '\r') return None
            }
          }
        } else { fieldLen += 1; i += 1 }
      } else ch match {
        case '"' =>
          if (fieldLen == 0 && !fieldQuoted) { inQuotes = true; fieldQuoted = true; i += 1 }
          else return None // bare quote inside an unquoted field
        case ',' => endField(); i += 1
        case '\n' => endRec(); i += 1
        case '\r' =>
          if (i + 1 < n && raw.charAt(i + 1) == '\n') { endRec(); i += 2 }
          else return None // stray CR
        case _ => fieldLen += 1; i += 1
      }
    }
    if (inQuotes) return None // unterminated quote at EOF
    if (fields > 0 || fieldLen > 0 || fieldQuoted) endRec()
    if (recs.size < 1) return None
    val header = recs.head
    val data = recs.drop(1)
    Some(Info(
      nCols = header._1,
      nRows = data.size.toLong,
      nRagged = data.count(_._1 != header._1).toLong,
      dataCells = data.iterator.map(_._1.toLong).sum,
      nQuoted = data.iterator.map(_._2.toLong).sum,
      nEmpty = data.iterator.map(_._3.toLong).sum))
  }
}
