package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Subset correctness dump: run the NAMED catalog entries (instead of all
  * of them, which is [[graft.Verify]]) against a testdata dir and write
  * the same `<out>/<name>/` parquet + `oracle_sql.json` layout, so
  * `scripts/check_correctness.py <out>` gates exactly the entries under
  * iteration — the edit-compile-gate loop for one operator without the
  * full 240-entry sweep.
  *
  * Usage: `runMain graft.tools.OneQuery <sfDir> <outDir> <name> [name…]`
  */
object OneQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: OneQuery <sfDir> <outDir> <queryName> [queryName...]")
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"no such catalog entries: ${unknown.mkString(", ")}")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[onequery] wrote $outDir/$name")
    }
    // Same JSON escape discipline as Verify (control chars included).
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql.view.filterKeys(names.contains)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
