package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.harness.QueryCatalog

/** Targeted local oracle dump: like [[graft.Verify]] but for a subset of
  * catalog entries — `runMain graft.tools.OracleCheck <sfDir> <outDir>
  * <name>...` writes each named query's parquet plus its oracle SQL, for
  * a local DuckDB compare while iterating (the driver's full Verify pass
  * covers everything per round).
  */
object OracleCheck {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: OracleCheck <sfDir> <outDir> <name>...")
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val fn = QueryCatalog.queries.getOrElse(name,
        sys.error(s"unknown catalog entry '$name'"))
      fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      QueryCatalog.oracleSql.get(name).foreach(sql =>
        Files.writeString(Paths.get(s"$outDir/$name.sql"), sql))
      println(s"[oracle-check] dumped $name")
    }
    spark.stop()
  }
}
