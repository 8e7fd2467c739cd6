package graft

/** Post-write self-checks for the two driver-facing artifact emitters
  * (Bench's stdout line + target/bench_result.json, Verify's parquet dumps
  * + oracle_sql.json).
  *
  * Motivation: rounds 9 and 10 each lost one hard signal to silent
  * artifact plumbing — round 9's CORRECTNESS file recorded empty (oracle
  * timeout) and round 10's BENCH recorded `parsed:null` (the compact
  * stdout line outgrew the driver's ~2 KB tail capture). Neither failure
  * was visible at emit time. Each emitter now re-reads what it wrote,
  * parses it with a real (dependency-free) JSON validity scanner, and
  * asserts the expected payload shape; a failed check exits nonzero so
  * the driver records a RED run instead of a silent hole.
  */
object ArtifactSelfCheck {

  /** Validate that `s` is one complete JSON value (object/array/string/
    * number/bool/null) with nothing but whitespace after it. Returns
    * None when valid, Some(error) otherwise. A scanner, not a reader —
    * it never materializes the document, so arbitrarily large detail
    * files cost one linear pass. */
  def jsonError(s: String): Option[String] = {
    var i = 0
    val n = s.length
    def ws(): Unit = while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"$msg at offset $i")
    def expect(c: Char): Unit =
      if (i < n && s.charAt(i) == c) i += 1 else fail(s"expected '$c'")
    def string(): Unit = {
      expect('"')
      while (i < n && s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') {
          i += 1
          if (i >= n) fail("dangling escape")
          s.charAt(i) match {
            case '"' | '\\' | '/' | 'b' | 'f' | 'n' | 'r' | 't' => i += 1
            case 'u' =>
              if (i + 4 >= n) fail("truncated \\u escape")
              (1 to 4).foreach { d =>
                if (Character.digit(s.charAt(i + d), 16) < 0) fail("bad \\u escape")
              }
              i += 5
            case _ => fail("bad escape")
          }
        } else if (s.charAt(i) < ' ') fail("raw control char in string")
        else i += 1
      }
      expect('"')
    }
    def number(): Unit = {
      if (i < n && s.charAt(i) == '-') i += 1
      val d0 = i
      while (i < n && Character.isDigit(s.charAt(i))) i += 1
      if (i == d0) fail("bad number")
      if (i < n && s.charAt(i) == '.') {
        i += 1
        val d1 = i
        while (i < n && Character.isDigit(s.charAt(i))) i += 1
        if (i == d1) fail("bad fraction")
      }
      if (i < n && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        i += 1
        if (i < n && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
        val d2 = i
        while (i < n && Character.isDigit(s.charAt(i))) i += 1
        if (i == d2) fail("bad exponent")
      }
    }
    def value(): Unit = {
      ws()
      if (i >= n) fail("truncated value")
      s.charAt(i) match {
        case '{' =>
          i += 1; ws()
          if (i < n && s.charAt(i) == '}') { i += 1; return }
          var more = true
          while (more) {
            ws(); string(); ws(); expect(':'); value(); ws()
            if (i < n && s.charAt(i) == ',') i += 1
            else { expect('}'); more = false }
          }
        case '[' =>
          i += 1; ws()
          if (i < n && s.charAt(i) == ']') { i += 1; return }
          var more = true
          while (more) {
            value(); ws()
            if (i < n && s.charAt(i) == ',') i += 1
            else { expect(']'); more = false }
          }
        case '"' => string()
        case 't' => if (s.startsWith("true", i)) i += 4 else fail("bad literal")
        case 'f' => if (s.startsWith("false", i)) i += 5 else fail("bad literal")
        case 'n' => if (s.startsWith("null", i)) i += 4 else fail("bad literal")
        case _ => number()
      }
    }
    try {
      value(); ws()
      if (i != n) Some(s"trailing garbage at offset $i") else None
    } catch {
      case e: IllegalArgumentException => Some(e.getMessage)
      case e: StringIndexOutOfBoundsException => Some(s"truncated JSON: $e")
    }
  }

  /** The driver keeps only the tail of captured stdout; the compact line
    * must stay comfortably inside it. Round 10's line (~2.3 KB once the
    * 4M probe keys landed) overflowed a ~2 KB window — the budget leaves
    * ~25% headroom below that observed bound. */
  final val ShortLineMaxBytes = 1500

  /** Bench emitter check: the compact stdout line must be valid JSON and
    * within the tail budget; the detail file must be valid JSON carrying
    * at least `expectedProbeKeys` distinct probe metrics (so a truncated
    * or probe-less detail write can't pass). Returns None when clean. */
  def checkBench(shortLine: String, detailJson: String,
                 expectedProbeKeys: Int): Option[String] = {
    val shortBytes = shortLine.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    lazy val probeKeys = "\"(x_[a-z0-9_]+)\"\\s*:\\s*[0-9]".r
      .findAllMatchIn(detailJson).map(_.group(1)).toSet
    if (shortBytes > ShortLineMaxBytes)
      Some(s"compact stdout line is $shortBytes bytes " +
        s"(> $ShortLineMaxBytes budget) — it would overflow the driver's tail capture")
    else jsonError(shortLine).map(e => s"compact stdout line is not valid JSON: $e")
      .orElse(jsonError(detailJson).map(e => s"detail file is not valid JSON: $e"))
      .orElse(
        if (probeKeys.size < expectedProbeKeys)
          Some(s"detail file carries ${probeKeys.size} probe keys, " +
            s"expected >= $expectedProbeKeys")
        else None)
  }

  /** Verify emitter check: oracle_sql.json must be valid JSON carrying an
    * entry for every expected oracle, and every dumped gate directory must
    * hold a committed parquet write (_SUCCESS). Returns None when clean. */
  def checkVerify(outDir: String, oracleJson: String,
                  dumpedGates: Set[String],
                  expectedOracles: Set[String]): Option[String] = {
    lazy val keys = "\"([a-z][a-z0-9_]+)\"\\s*:\\s*\"".r
      .findAllMatchIn(oracleJson).map(_.group(1)).toSet
    lazy val missing = expectedOracles.diff(keys)
    lazy val noParquet = dumpedGates.toSeq.sorted.filterNot { g =>
      new java.io.File(s"$outDir/$g/_SUCCESS").exists()
    }
    jsonError(oracleJson).map(e => s"oracle_sql.json is not valid JSON: $e")
      .orElse(
        if (missing.nonEmpty)
          Some(s"oracle_sql.json is missing ${missing.size} gate(s): " +
            missing.toSeq.sorted.take(5).mkString(", "))
        else None)
      .orElse(
        if (noParquet.nonEmpty)
          Some(s"${noParquet.size} gate(s) have no committed parquet output: " +
            noParquet.take(5).mkString(", "))
        else None)
  }
}
