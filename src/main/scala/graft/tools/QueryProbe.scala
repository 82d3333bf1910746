package graft.tools

import org.apache.spark.sql.SparkSession

import graft.harness.QueryCatalog

/** Ad-hoc wall-time probe for named catalog queries — the measure-first
  * step before deciding whether an operator joins `Bench`'s headline set
  * (an entry well under the ~0.3 s noise floor only dilutes the signal).
  *
  * Usage: runMain graft.tools.QueryProbe <name> [<name> ...]
  *   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) picks the scale.
  *
  * Two timed runs per query (warm JVM, noop sink — full column
  * materialization, same contract as Bench); prints both runs and the min.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryProbe <catalog query name>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.sources.Tables
      .configure(
        SparkSession.builder()
          .master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus)
          .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val fns = QueryCatalog.queries
    args.foreach { name =>
      val fn = fns.getOrElse(name, sys.error(s"unknown catalog query '$name'"))
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-28s runs=${times.map(t => f"$t%.2f").mkString(",")} min=${times.min}%.2f s")
    }
    spark.stop()
  }
}
