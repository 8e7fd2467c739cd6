package graft

import java.nio.file.{Files, Paths}

/** Dump SparkEntry.oracleSql as JSON without running any Spark query —
  * the oracle-side iteration loop (tools/profile_oracle.py reads it). */
object DumpOracleSql {
  def main(args: Array[String]): Unit = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(args(0)), json)
    println(s"[dump] ${SparkEntry.oracleSql.size} oracle entries -> ${args(0)}")
  }
}
