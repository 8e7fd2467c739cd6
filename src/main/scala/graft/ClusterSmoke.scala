package graft

import org.apache.spark.sql.SparkSession

/** Minimal multi-JVM smoke: proves the session comes up under
  * `local-cluster[n,c,m]` (real executor JVMs, real serialization) in
  * this sandbox, and that executor-side classes from this build resolve
  * (a closure referencing graft code runs on the forked executors).
  * Used by the BENCH_CLUSTER run-up; kept as the reproducible entry. */
object ClusterSmoke {
  def main(args: Array[String]): Unit = {
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[2,2,2048]")
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.executor.extraClassPath",
        sys.props.get("graft.classpath").getOrElse(
          new java.io.File("target/scala-2.13/classes").getAbsolutePath))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      import spark.implicits._
      // a shuffle + a graft codegen kernel, evaluated on remote executors
      val n = spark.range(1L << 20).selectExpr("id % 97 AS k", "id AS v")
        .groupBy("k").sum("v").count()
      val sigs = graft.core.MinHashPipeline.withSignature(
        graft.sources.SyntheticCorpus.docs(spark, 200), "text",
        graft.core.MinHashPipeline.Params(kShingle = 1)).count()
      val execs = spark.sparkContext.getExecutorMemoryStatus.size
      println(s"""{"master":"$master","groups":$n,"sigs":$sigs,"executors":$execs}""")
    } finally spark.stop()
  }
}
