package graft.sources

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Minimal reader/writer for the reference's pickle artifacts:
  * `docs.pkl` / `ids.pkl` are plain `list[str]` and `minhash_meta.pkl`
  * a flat `dict[str, int|str|bool]` (synth_data.py:113-117,148-157;
  * benchmark_runner.py:28-31). This is NOT a general pickle VM — it
  * covers exactly the opcode subset CPython's pickler emits for those
  * shapes under protocols 2-5 (PROTO/FRAME framing, list/dict/set builds,
  * BINUNICODE strings, BININT family, NEWTRUE/NEWFALSE, MEMOIZE/PUT
  * bookkeeping), and throws on anything else — a reduce/global opcode
  * (arbitrary object construction) is out of scope by design, so the
  * reader cannot be used as a deserialization gadget.
  *
  * Scale note: these artifacts are driver-sized by contract (ids and
  * meta; the reference's docs.pkl holds the raw corpus only in its
  * synthetic demo). The corpus-scale path into the engine is parquet /
  * .npy shards ([[Npy]]); this boundary exists so a user holding the
  * reference's ACTUAL output directory can load every file in it. */
object Pickle {

  /** Read a pickled `list[str]`. */
  def readStringList(path: String): Seq[String] =
    parse(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))) match {
      case l: Seq[_] => l.map(_.toString)
      case other => sys.error(s"expected list[str] pickle, got ${other.getClass}")
    }

  /** Read a pickled flat `dict` (minhash_meta.pkl). */
  def readStringMap(path: String): Map[String, Any] =
    parse(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))) match {
      case m: Map[_, _] => m.map { case (k, v) => k.toString -> v }
      case other => sys.error(s"expected dict pickle, got ${other.getClass}")
    }

  /** Read a pickled `list[set[str]]` (shingles.pkl — one shingle set per
    * document, synth_data.py:156-157). Protocol ≥4 set opcodes; a
    * protocol-2 set pickle uses REDUCE and is rejected like any other
    * object construction. */
  def readStringSetList(path: String): Seq[Set[String]] =
    parse(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))) match {
      case l: Seq[_] => l.map {
        case s: Set[_] => s.map(_.toString)
        case other => sys.error(s"expected set element, got ${other.getClass}")
      }
      case other => sys.error(s"expected list[set[str]] pickle, got ${other.getClass}")
    }

  /** Write a `list[str]` as a protocol-2 pickle byte-readable by any
    * CPython `pickle.load` (the reference's loaders) — the mirror of
    * its `pickle.dump(docs/ids)`. */
  def writeStringList(path: String, items: Seq[String]): Unit = {
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      out.write(0x80); out.write(2) // PROTO 2
      out.write(']')                // EMPTY_LIST
      out.write('(')                // MARK
      items.foreach { s =>
        val b = s.getBytes(StandardCharsets.UTF_8)
        out.write('X')              // BINUNICODE
        val len = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(b.length)
        out.write(len.array())
        out.write(b)
      }
      out.write('e')                // APPENDS
      out.write('.')                // STOP
    } finally out.close()
  }

  /** Write a flat `dict[str, int|bool|str|float]` as a protocol-2 pickle
    * (minhash_meta.pkl's shape — synth_data.py:152-153). Deterministic:
    * entries are written in sorted key order. */
  def writeStringMap(path: String, m: Map[String, Any]): Unit = {
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      out.write(0x80); out.write(2) // PROTO 2
      out.write('}')                // EMPTY_DICT
      out.write('(')                // MARK
      m.toSeq.sortBy(_._1).foreach { case (k, v) =>
        writeUnicode(out, k)
        v match {
          case b: Boolean => out.write(if (b) 0x88 else 0x89) // NEWTRUE/NEWFALSE
          case i: Int => writeLong(out, i.toLong)
          case l: Long => writeLong(out, l)
          case d: Double =>               // BINFLOAT (big-endian f64)
            out.write('G')
            out.write(ByteBuffer.allocate(8).putLong(
              java.lang.Double.doubleToLongBits(d)).array())
          case s: String => writeUnicode(out, s)
          case other => sys.error(s"unsupported meta value type: ${other.getClass}")
        }
      }
      out.write('u')                // SETITEMS
      out.write('.')                // STOP
    } finally out.close()
  }

  /** Write a `list[set[str]]` (shingles.pkl's shape) as a protocol-4
    * pickle — sets have native opcodes only from protocol 4 on (earlier
    * protocols build them via REDUCE, which this boundary refuses to
    * emit for the same reason the reader refuses to run it).
    * Deterministic: set elements are written sorted. */
  def writeStringSetList(path: String, items: Seq[Set[String]]): Unit = {
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      out.write(0x80); out.write(4) // PROTO 4
      out.write(']')                // EMPTY_LIST
      out.write('(')                // MARK
      items.foreach { s =>
        out.write(0x8f)             // EMPTY_SET
        out.write('(')              // MARK
        s.toSeq.sorted.foreach(writeUnicode(out, _))
        out.write(0x90)             // ADDITEMS
      }
      out.write('e')                // APPENDS
      out.write('.')                // STOP
    } finally out.close()
  }

  private def writeUnicode(out: DataOutputStream, s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    out.write('X') // BINUNICODE
    out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(b.length).array())
    out.write(b)
  }

  private def writeLong(out: DataOutputStream, v: Long): Unit =
    if (v >= 0 && v <= 0xff) { out.write('K'); out.write(v.toInt) } // BININT1
    else if (v >= 0 && v <= 0xffff) {                               // BININT2
      out.write('M'); out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    } else if (v >= Int.MinValue && v <= Int.MaxValue) {            // BININT
      out.write('J')
      out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(v.toInt).array())
    } else {                                                        // LONG1
      out.write(0x8a)
      // minimal two's-complement byte length: n fits iff sign-extending
      // the low n bytes reproduces v
      var n = 1
      while ((v << (64 - 8 * n)) >> (64 - 8 * n) != v) n += 1
      out.write(n)
      var i = 0
      while (i < n) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
    }

  // ---- the tiny pickle machine ----

  private def parse(bytes: Array[Byte]): Any = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val stack = new scala.collection.mutable.ArrayBuffer[Any]
    val marks = new scala.collection.mutable.ArrayBuffer[Int]
    val memo = new scala.collection.mutable.ArrayBuffer[Any]
    object Mark
    def popToMark(): Seq[Any] = {
      val m = marks.remove(marks.length - 1)
      val items = stack.slice(m, stack.length).toSeq
      stack.remove(m, stack.length - m)
      items
    }
    def str(n: Int): String = {
      val b = new Array[Byte](n); bb.get(b)
      new String(b, StandardCharsets.UTF_8)
    }
    while (true) {
      (bb.get() & 0xff) match {
        case 0x80 => bb.get()                       // PROTO n
        case 0x95 => bb.getLong()                   // FRAME len (ignored)
        case ']' => stack += List.empty[Any]        // EMPTY_LIST
        case '}' => stack += Map.empty[Any, Any]    // EMPTY_DICT
        case 0x8f => stack += Set.empty[Any]        // EMPTY_SET
        case 0x90 =>                                // ADDITEMS
          val items = popToMark()
          stack(stack.length - 1) = stack.last.asInstanceOf[Set[Any]] ++ items
        case 0x91 => stack += popToMark().toSet     // FROZENSET
        case '(' => marks += stack.length           // MARK
        case 'N' => stack += null                   // NONE
        case 0x88 => stack += true                  // NEWTRUE
        case 0x89 => stack += false                 // NEWFALSE
        case 'J' => stack += bb.getInt().toLong     // BININT
        case 'K' => stack += (bb.get() & 0xff).toLong          // BININT1
        case 'M' => stack += (bb.getShort() & 0xffff).toLong   // BININT2
        case 0x8a =>                                // LONG1
          val n = bb.get() & 0xff
          var v = 0L
          var i = 0
          while (i < n) { v |= (bb.get() & 0xffL) << (8 * i); i += 1 }
          if (n > 0 && n < 8 && (v & (1L << (8 * n - 1))) != 0) v -= 1L << (8 * n)
          stack += v
        case 'G' => stack += java.lang.Double.longBitsToDouble( // BINFLOAT (big-endian)
          ByteBuffer.wrap({ val b = new Array[Byte](8); bb.get(b); b }).getLong)
        case 0x8c => stack += str(bb.get() & 0xff)  // SHORT_BINUNICODE
        case 'X' => stack += str(bb.getInt())       // BINUNICODE
        case 'U' => stack += str(bb.get() & 0xff)   // SHORT_BINSTRING
        case 'T' => stack += str(bb.getInt())       // BINSTRING
        case 0x94 => memo += stack.last             // MEMOIZE
        case 'q' => val i = bb.get() & 0xff         // BINPUT
          while (memo.length <= i) memo += null
          memo(i) = stack.last
        case 'r' => val i = bb.getInt()             // LONG_BINPUT
          while (memo.length <= i) memo += null
          memo(i) = stack.last
        case 'h' => stack += memo(bb.get() & 0xff)  // BINGET
        case 'j' => stack += memo(bb.getInt())      // LONG_BINGET
        case 'a' =>                                 // APPEND
          val v = stack.remove(stack.length - 1)
          stack(stack.length - 1) = stack.last.asInstanceOf[List[Any]] :+ v
        case 'e' =>                                 // APPENDS
          val items = popToMark()
          stack(stack.length - 1) = stack.last.asInstanceOf[List[Any]] ++ items
        case 's' =>                                 // SETITEM
          val v = stack.remove(stack.length - 1)
          val k = stack.remove(stack.length - 1)
          stack(stack.length - 1) = stack.last.asInstanceOf[Map[Any, Any]] + (k -> v)
        case 'u' =>                                 // SETITEMS
          val items = popToMark()
          val add = items.grouped(2).map { case Seq(k, v) => k -> v }.toMap
          stack(stack.length - 1) = stack.last.asInstanceOf[Map[Any, Any]] ++ add
        case '.' => return stack.last               // STOP
        case op => sys.error(
          f"unsupported pickle opcode 0x$op%02x at ${bb.position() - 1} " +
            "(only the reference's list[str]/flat-dict shapes are in scope)")
      }
    }
    sys.error("unreachable")
  }
}
