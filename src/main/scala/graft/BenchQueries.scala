package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop timing for a SUBSET of the catalog queries: same session
  * config and same warmup + min-of-2 methodology as [[Bench]]'s catalog
  * pass, but only for the comma-separated query names in args(0) — so a
  * single gate's optimization can be measured in seconds instead of a
  * full bench run. Not part of the driver contract (the driver runs
  * [[Bench]]); prints one "name seconds" line per query to stdout. */
object BenchQueries {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchQueries <q1,q2,...> [repeats]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val unknown = names.toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val repeats = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fns = names.map(n => n -> SparkEntry.queries(n))
    fns.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // GRAFT_BENCHQ_EXPLAIN=/dir writes each query's explain("formatted")
    // to <dir>/<name>.txt before timing
    sys.env.get("GRAFT_BENCHQ_EXPLAIN").foreach { d =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
      fns.foreach { case (name, fn) =>
        try {
          val txt = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(java.nio.file.Paths.get(d, s"$name.txt"),
            txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        } catch { case e: Throwable =>
          System.err.println(s"[benchq] explain $name failed: $e")
        }
      }
    }
    val phases = sys.env.get("GRAFT_BENCHQ_PHASES").contains("1")
    fns.foreach { case (name, fn) =>
      if (phases) {
        // split one timed run into construct / plan / execute so the
        // optimization target (driver planning vs cluster execution) is
        // visible per gate
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // analyze + optimize + plan
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        println(f"$name construct=${(t1 - t0) / 1e9}%.3f plan=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f")
      } else {
        // a failed sample must NOT record its (near-zero) elapsed time as
        // a timing — a broken gate would read as a huge speedup in the
        // dev loop; report it loudly and mark the sample NaN instead
        val secs = (1 to repeats).map { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            System.err.println(s"[benchq] $name FAILED: $e")
            Double.NaN
          }
        }
        val ok = secs.filterNot(_.isNaN)
        val best = if (ok.nonEmpty) f"${ok.min}%.3f" else "FAILED"
        println(s"$name $best  (samples: ${secs.map(s => f"$s%.3f").mkString(", ")})")
      }
    }
    spark.stop()
  }
}
