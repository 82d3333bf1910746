package graft.tools

import org.apache.spark.sql.SparkSession

import graft.harness.QueryCatalog

/** Dev probe: time one catalog query under session-conf overrides — the
  * §1 measure-first harness for conf-sensitivity hypotheses (codegen
  * limits, AQE toggles) before any code change. Each invocation is a
  * fresh session; N timed runs (noop sink, Bench's contract) are printed
  * raw so warm-up decay stays visible.
  *
  * Usage: runMain graft.tools.ConfProbe <query> <runs> [k=v ...]
  *   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) picks the scale.
  */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ConfProbe <query> <runs> [k=v ...]")
    val name = args(0)
    val runs = args(1).toInt
    val overrides = args.drop(2).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      (k, v)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
    overrides.foreach { case (k, v) => builder.config(k, v) }
    val spark = graft.sources.Tables.configure(builder).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val fn = QueryCatalog.queries.getOrElse(
      name, sys.error(s"unknown catalog query '$name'"))
    val ts = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[conf] $name ${overrides.map { case (k, v) => s"$k=$v" }.mkString(" ")} " +
      f"runs=${ts.map(t => f"$t%.2f").mkString(",")} min=${ts.min}%.2f")
    spark.stop()
  }
}
