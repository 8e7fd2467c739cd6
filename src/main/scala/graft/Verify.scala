package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional third arg: comma-separated query-name whitelist — scale
    // runs (e.g. the sf1.0 cap/skew pass) dump only the gates under test
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    // a typo'd gate name must FAIL LOUDLY, not dump zero outputs that a
    // downstream compare reads as a green 0/0 pass
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty,
        s"unknown query names in whitelist: ${unknown.mkString(", ")}")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER=local-cluster[3,4,6144] dumps the same gates
    // through REAL executor JVMs (multi-JVM evidence for the correctness
    // surface); see Bench for the environment contract.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.executor.extraClassPath",
        new java.io.File("target/scala-2.13/classes").getAbsolutePath)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val dumped = scala.collection.mutable.LinkedHashSet.empty[String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          dumped += name
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
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
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Post-write self-check (round 11): re-read what was just emitted and
    // assert the full expected payload — every selected gate dumped a
    // committed parquet AND carries its oracle entry in a parseable
    // oracle_sql.json. Rounds 9/10 each lost a hard signal to a silent
    // emit-time failure; a broken or partial dump must exit nonzero so
    // the driver records a red run, not a quietly thin artifact.
    val expected = SparkEntry.queries.keySet
      .filter(name => only.forall(_.contains(name)))
    val notDumped = expected.diff(dumped.toSet)
    val written = Files.readString(Paths.get(s"$outDir/oracle_sql.json"))
    val expectedOracles = SparkEntry.oracleSql.keySet
      .filter(name => only.forall(_.contains(name)))
    val err =
      (if (notDumped.nonEmpty)
        Some(s"${notDumped.size} gate(s) failed to dump: " +
          notDumped.toSeq.sorted.take(5).mkString(", "))
      else None)
        .orElse(ArtifactSelfCheck.checkVerify(outDir, written,
          dumped.toSet, expectedOracles))
    spark.stop()
    err.foreach { msg =>
      System.err.println(s"[verify] ARTIFACT SELF-CHECK FAILED: $msg")
      sys.exit(2)
    }
  }
}
