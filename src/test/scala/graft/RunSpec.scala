package graft

import java.nio.file.{Files, Paths}

/** CLI-level golden test: `graft.Run.main` on the direct-standard e2e
  * fixture must reproduce the reference CLI's output (the harness analogue
  * of tests/utils.py:76-163 `cli_test`).
  */
class RunSpec extends SparkSpec {

  test("Run.main reproduces the e2e golden row from CSV via CLI args") {
    // Reuse the fixture from EndToEndSpec via its source files.
    val e2e = new EndToEndSpec
    val dir = Files.createTempDirectory("graft_run")
    val csv = dir.resolve("data.csv")
    val yaml = dir.resolve("task.yaml")
    Files.writeString(csv, e2e.predicatesCsvText)
    Files.writeString(yaml, e2e.taskYamlText)
    val out = dir.resolve("out.parquet").toString

    // ensure the shared test session is what Run.getOrCreate picks up
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    Run.main(Array(
      "--config", yaml.toString,
      "--data", csv.toString,
      "--standard", "direct",
      "--ts-format", "M/d/yyyy H:mm",
      "--output", out))

    val result = spark.read.parquet(out)
    assert(result.count() == 1)
    val row = result.head()
    assert(row.getAs[Long]("subject_id") == 1L)
    assert(row.getAs[java.sql.Timestamp]("index_timestamp") ==
      java.sql.Timestamp.valueOf("1991-01-28 23:32:00"))
    assert(row.getAs[Long]("label") == 0L)
  }
}
