package graft

import org.apache.spark.sql.functions._

import graft.config.{CodeEq, PlainPredicateDef}
import graft.sources.PredicateFrames

/** ESGPT directory loading against the reference's real sample dataset
  * (/root/reference/sample_data/esgpt_sample — the layout the reference
  * loads via the external EventStream package, predicates.py:420-474).
  * Expected counts computed independently with DuckDB over the same
  * parquet files.
  */
class EsgptDirSpec extends SparkSpec {

  private val dir = "/root/reference/sample_data/esgpt_sample"

  private val predicates = Seq(
    "admission" -> PlainPredicateDef(CodeEq("event_type//ADMISSION")),
    "discharge" -> PlainPredicateDef(CodeEq("event_type//DISCHARGE")),
    // multivariate measurement: values column (lab_value) resolved from config.json
    "high_spo2" -> PlainPredicateDef(CodeEq("lab_name//SpO2"), valueMin = Some(95.0)),
    // bare-column existence predicate
    "hr_any" -> PlainPredicateDef(CodeEq("HR")),
    // univariate measurement with a value bound: the column itself is the value
    "high_temp" -> PlainPredicateDef(CodeEq("temp"), valueMin = Some(100.0)),
    // static demographic
    "blue_eyes" -> PlainPredicateDef(CodeEq("eye_color//BLUE"), static = true)
  )

  test("directory loader matches independent DuckDB counts on esgpt_sample") {
    assume(new java.io.File(s"$dir/events_df.parquet").exists())
    val df = PredicateFrames.fromEsgptDir(spark, dir, predicates).cache()

    // 30,943 events (unique per (subject, ts) by ESGPT construction) +
    // 100 static subject rows with null timestamps.
    assert(df.count() == 31043)
    assert(df.filter(col("timestamp").isNull).count() == 100)

    val sums = df.agg(
      sum("admission").as("a"), sum("discharge").as("d"), sum("high_spo2").as("s"),
      sum("hr_any").as("h"), sum("high_temp").as("t"), sum("blue_eyes").as("b")).head()
    assert(sums.getLong(0) == 194, "admission")
    assert(sums.getLong(1) == 194, "discharge")
    assert(sums.getLong(2) == 6, "high_spo2")
    assert(sums.getLong(3) == 38287, "hr_any")
    assert(sums.getLong(4) == 3565, "high_temp")
    assert(sums.getLong(5) == 22, "blue_eyes")
  }

  test("config.json values_column resolution (predicates.py:465-471)") {
    assume(new java.io.File(s"$dir/config.json").exists())
    val vcs = PredicateFrames.esgptValueColumns(spark, dir, predicates)
    // Only the multivariate lab_name measurement declares a values column.
    assert(vcs == Map("high_spo2" -> "lab_value"))
  }

  test("full ESGPT cohort task end-to-end (admission -> discharge stay)") {
    assume(new java.io.File(s"$dir/events_df.parquet").exists())
    val yaml =
      """predicates:
        |  admission: { code: event_type//ADMISSION }
        |  discharge: { code: event_type//DISCHARGE }
        |trigger: admission
        |windows:
        |  stay:
        |    start: trigger
        |    end: start -> discharge
        |    start_inclusive: False
        |    end_inclusive: True
        |    label: discharge
        |""".stripMargin
    val cfg = graft.config.TaskConfig.fromYaml(yaml)
    val plain = PredicateFrames.fromEsgptDir(spark, dir, cfg.plainPredicates.toSeq)
    val result = Query(cfg, PredicateFrames.finalize(cfg, plain)).cache()
    // Independently computed with DuckDB over the same parquet: 194
    // admissions, every one bounded by a discharge, exactly one discharge
    // per stay window.
    assert(result.count() == 194)
    assert(result.agg(sum("label")).head().getLong(0) == 194L)
  }

  test("directory path == API-level fromEsgpt path") {
    assume(new java.io.File(s"$dir/events_df.parquet").exists())
    val viaDir = snap(PredicateFrames.fromEsgptDir(spark, dir, predicates))
    // The API-level path hands fromEsgpt raw frames; reading THIS dataset's
    // arrow2-written parquet is the caller's responsibility — the vectorized
    // reader can't decode its pages (see fromEsgptDir), so disable it for
    // the evaluation window.
    spark.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
    val viaApi =
      try
        snap(PredicateFrames.fromEsgpt(
          spark.read.parquet(s"$dir/subjects_df.parquet"),
          spark.read.parquet(s"$dir/events_df.parquet"),
          spark.read.parquet(s"$dir/dynamic_measurements_df.parquet"),
          Map("high_spo2" -> "lab_value"),
          predicates))
      finally spark.conf.unset("spark.sql.parquet.enableVectorizedReader")
    assert(viaDir == viaApi)
  }
}
