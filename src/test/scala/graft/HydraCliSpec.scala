package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Hydra-compat CLI parity (reference: configs/_aces.yaml +
  * tests/utils.py:96-130 — `aces-cli cohort_dir=... cohort_name=...
  * data.standard=meds ...`, and `--multirun data=sharded
  * data.shard=$(expand_shards ...)`). Asserts the interpolated default
  * paths and the per-shard multirun output layout.
  */
class HydraCliSpec extends SparkSpec {

  private val taskYaml =
    """predicates:
      |  admission: { code: admission }
      |  discharge: { code: discharge }
      |trigger: admission
      |windows:
      |  target:
      |    start: trigger
      |    end: start + 48h
      |    start_inclusive: False
      |    end_inclusive: True
      |    label: discharge
      |    index_timestamp: end
      |""".stripMargin

  private def writeEvents(path: String, subjects: Seq[Long]): Unit = {
    import spark.implicits._
    subjects
      .flatMap(s => Seq(
        (s, s"2024-01-0${1 + (s % 3)} 10:00:00", "admission"),
        (s, s"2024-01-0${1 + (s % 3)} 20:00:00", "discharge")))
      .toDF("subject_id", "time", "code")
      .withColumn("time", to_timestamp(col("time")))
      .write.mode("overwrite").parquet(path)
  }

  test("single-file run: interpolated config/output paths (aces-cli parity)") {
    val cohortDir = Files.createTempDirectory("graft_hydra").toString
    Files.writeString(java.nio.file.Paths.get(s"$cohortDir/mytask.yaml"), taskYaml)
    val dataPath = s"$cohortDir/data.parquet"
    writeEvents(dataPath, Seq(1L, 2L, 3L))

    Run.main(Array(
      s"cohort_dir=$cohortDir", "cohort_name=mytask",
      "data.standard=meds", s"data.path=$dataPath"))

    val out = spark.read.parquet(s"$cohortDir/mytask.parquet")
    assert(out.columns.toSeq == Seq("subject_id", "prediction_time", "boolean_value",
      "integer_value", "float_value", "categorical_value"), "MEDS label schema")
    assert(out.count() == 3, "one label row per admitted subject")
  }

  test("multirun sharded: one output per shard at cohort_dir/task/shard.parquet") {
    val cohortDir = Files.createTempDirectory("graft_hydra_sh").toString
    Files.writeString(java.nio.file.Paths.get(s"$cohortDir/mytask.yaml"), taskYaml)
    val dataRoot = s"$cohortDir/data"
    writeEvents(s"$dataRoot/train/0.parquet", Seq(1L, 2L))
    writeEvents(s"$dataRoot/train/1.parquet", Seq(10L, 11L, 12L))

    Run.main(Array("--multirun",
      s"cohort_dir=$cohortDir", "cohort_name=mytask",
      "data=sharded", s"data.root=$dataRoot", "data.shard=train/0,train/1",
      "data.standard=meds"))

    assert(spark.read.parquet(s"$cohortDir/mytask/train/0.parquet").count() == 2)
    assert(spark.read.parquet(s"$cohortDir/mytask/train/1.parquet").count() == 3)
  }

  test("arbitrary dotted overrides merge into the task YAML (OmegaConf parity)") {
    val cohortDir = Files.createTempDirectory("graft_hydra_ovr").toString
    Files.writeString(java.nio.file.Paths.get(s"$cohortDir/mytask.yaml"), taskYaml)
    val dataPath = s"$cohortDir/data.parquet"
    writeEvents(dataPath, Seq(1L, 2L, 3L))

    // Baseline: discharge 10h after admission, window end start+48h →
    // every label true. Override the window end to start+5h → discharge
    // falls outside → every label false, same cohort size.
    Run.main(Array(
      s"cohort_dir=$cohortDir", "cohort_name=mytask",
      "data.standard=meds", s"data.path=$dataPath",
      "windows.target.end=start + 5h"))
    val out = spark.read.parquet(s"$cohortDir/mytask.parquet")
    assert(out.count() == 3, "override must not change the cohort size")
    assert(out.filter(col("boolean_value")).count() == 0,
      "start+5h window excludes the discharge 10h later")

    // A typo'd root key still fails loudly through fromYaml's validation.
    val typo = intercept[IllegalArgumentException] {
      Run.main(Array(
        s"cohort_dir=$cohortDir", "cohort_name=mytask",
        "data.standard=meds", s"data.path=$dataPath",
        "windoes.target.end=start + 5h"))
    }
    assert(typo.getMessage.contains("Unrecognized keys"), typo.getMessage)

    // Traversing through a scalar names the offending segment.
    val scalar = intercept[IllegalArgumentException] {
      Run.main(Array(
        s"cohort_dir=$cohortDir", "cohort_name=mytask",
        "data.standard=meds", s"data.path=$dataPath",
        "trigger.nested=admission"))
    }
    assert(scalar.getMessage.contains("traverses 'trigger'"), scalar.getMessage)
  }

  test("override values parse safely: quoting forces strings, tags cannot instantiate objects") {
    import graft.config.TaskConfig
    val base = "predicates:\n  admission: { code: ADMIT }\n"
    // Unquoted `on` is a YAML 1.1 boolean — quoted forms stay the string
    // (the dump re-quotes it, proving it survived as text).
    val dq = TaskConfig.applyOverrides(base, Seq("predicates.admission.code" -> "\"on\""))
    assert(dq.contains("code: 'on'"), s"quoted 'on' must stay a string: $dq")
    val sq = TaskConfig.applyOverrides(base, Seq("predicates.admission.code" -> "'08:30'"))
    assert(sq.contains("08:30"), s"quoted sexagesimal must stay text: $sq")
    val bare = TaskConfig.applyOverrides(base, Seq("predicates.admission.code" -> "on"))
    assert(bare.contains("code: true"), s"unquoted on is a YAML 1.1 boolean: $bare")
    // A YAML global tag from argv must NOT instantiate an arbitrary class.
    val tagged = intercept[org.yaml.snakeyaml.error.YAMLException] {
      TaskConfig.applyOverrides(base,
        Seq("predicates.admission.code" -> "!!java.io.File [/tmp/x]"))
    }
    assert(tagged.getMessage.toLowerCase.contains("could not determine a constructor")
      || tagged.getMessage.toLowerCase.contains("global tag is not allowed"),
      tagged.getMessage)
  }

  test("native flag CLI keeps routing when a path value contains '='") {
    val cohortDir = Files.createTempDirectory("graft_hydra_eq").toString
    Files.writeString(java.nio.file.Paths.get(s"$cohortDir/mytask.yaml"), taskYaml)
    // Hive-partitioned-style path segment with '=' must not flip the
    // invocation into Hydra key=value mode.
    val dataPath = s"$cohortDir/date=2024-01-01/data.parquet"
    writeEvents(dataPath, Seq(1L, 2L))
    Run.main(Array(
      "--config", s"$cohortDir/mytask.yaml", "--data", dataPath,
      "--standard", "meds", "--output", s"$cohortDir/out.parquet"))
    assert(spark.read.parquet(s"$cohortDir/out.parquet").count() == 2)
  }

  test("sharded without --multirun rejects a multi-shard sweep") {
    val err = intercept[IllegalArgumentException] {
      Run.hydraMain(Array("cohort_dir=/tmp", "cohort_name=x", "data=sharded",
        "data.root=/tmp", "data.shard=0,1", "data.standard=meds"))
    }
    assert(err.getMessage.contains("--multirun"))
  }
}
