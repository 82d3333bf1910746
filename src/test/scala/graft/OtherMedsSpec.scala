package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.config.TaskConfig
import graft.sources.PredicateFrames

/** MEDS multi-shard, multi-task golden port (reference:
  * tests/test_other_meds.py): three tasks over a 2-shard MEDS corpus,
  * compared against the reference's exact MEDS label outputs. Exercises
  * cross-window references, negative window sizes (`end - 1825d`),
  * backward event bounds (`end <- admission`), record-end censor windows
  * (`end: null`), regex predicates, and a 59-way derived or().
  */
class OtherMedsSpec extends SparkSpec {

  private val shard0 =
    """1,,GENDER//MALE,
      |1,,SNP//rs234567,
      |1,12/18/1960 11:03,MEDS_BIRTH,
      |1,08/02/1972 10:00,CLINIC_VISIT,
      |1,08/02/1972 10:00,ICD9CM//493.90,
      |1,08/02/1972 10:00,LOINC//8310-5,0.65
      |1,08/02/1972 10:00,VITALS//BP//SYSTOLIC,108
      |1,01/14/2020 15:14,ADMISSION//MEDICAL,
      |1,01/14/2020 15:18,VITALS//BP//SYSTOLIC,132
      |1,01/14/2020 15:18,VITALS//BP//DIASTOLIC,90
      |1,01/14/2020 15:18,VITALS//HR//BPM,121
      |1,01/14/2020 15:18,VITALS//WEIGHT//LBS,233.2
      |1,01/15/2020 10:04,VITALS//BP//SYSTOLIC,126
      |1,01/15/2020 10:04,VITALS//BP//DIASTOLIC,91
      |1,01/15/2020 10:04,VITALS//HR//BPM,85
      |1,01/16/2020 10:11,VITALS//BP//SYSTOLIC,135
      |1,01/16/2020 10:11,VITALS//BP//DIASTOLIC,88
      |1,01/16/2020 10:11,VITALS//HR//BPM,79
      |1,01/16/2020 13:02,LVEF//ECHO,0.24
      |1,01/17/2020 10:00,ICD9CM//428.9,
      |1,01/17/2020 10:00,DISCHARGE//HOME,
      |1,01/18/2022 04:46,ADMISSION//MEDICAL,
      |1,01/20/2022 08:00,DISCHARGE//HOME_AMA,
      |1,01/20/2022 08:00,ICD9CM//428.41,
      |1,01/20/2022 08:00,ICD9CM//451.1,
      |1,01/24/2022 08:11,ADMISSION//ED,
      |1,01/25/2022 10:04,VITALS//BP//SYSTOLIC,168
      |1,01/25/2022 10:04,VITALS//BP//DIASTOLIC,100
      |1,01/25/2022 10:04,VITALS//HR//BPM,56
      |1,02/27/2022 01:13,ICD9CM//428.41,
      |1,02/27/2022 01:13,ICD9CM//410.1,
      |1,02/27/2022 01:13,DEATH,""".stripMargin

  private val shard1 =
    """3,,GENDER//FEMALE,
      |3,,SNP//rs2345291,
      |3,,SNP//rs228192,
      |3,02/28/1982 00:00,MEDS_BIRTH,
      |3,01/14/2020 15:14,ADMISSION//MEDICAL,
      |3,01/14/2020 15:18,VITALS//BP//SYSTOLIC,132
      |3,01/14/2020 15:18,VITALS//BP//DIASTOLIC,90
      |3,01/14/2020 15:18,VITALS//HR//BPM,121
      |3,01/17/2020 10:00,ICD9CM//V30.00,
      |3,01/17/2020 10:00,DISCHARGE//HOME,
      |3,01/18/2020 18:18,ADMISSION//MEDICAL,
      |3,01/20/2020 15:18,DISCHARGE//HOME,
      |3,03/18/2024 16:54,ICD9CM//428.9,
      |3,03/18/2024 17:11,ADMISSION//SURGICAL,
      |3,03/28/2024 10:00,DISCHARGE//HOME,
      |3,03/29/2024 11:00,ADMISSION//SURGICAL,
      |3,04/19/2024 13:32,DISCHARGE//HOME,
      |3,05/22/2024 00:00,ICD9CM//428.9,""".stripMargin

  private lazy val medsDf: DataFrame = {
    import spark.implicits._
    val rows = (shard0 + "\n" + shard1).split("\n").toSeq.map { line =>
      val p = line.split(",", -1)
      (p(0).toLong,
        if (p(1).isEmpty) None else Some(p(1)),
        p(2),
        if (p(3).isEmpty) None else Some(p(3).toFloat))
    }
    rows.toDF("subject_id", "time", "code", "numeric_value")
      .withColumn("time", to_timestamp(col("time"), "M/d/yyyy H:mm"))
  }

  private val inhospitalYaml =
    """predicates:
      |  admission: { code: { regex: "ADMISSION//.*" } }
      |  discharge: { code: { regex: "DISCHARGE//.*" } }
      |  death: { code: DEATH }
      |  discharge_or_death: { expr: "or(discharge, death)" }
      |trigger: admission
      |windows:
      |  input:
      |    start: NULL
      |    end: trigger + 24h
      |    start_inclusive: True
      |    end_inclusive: True
      |    has: { _ANY_EVENT: "(5, None)" }
      |    index_timestamp: end
      |  gap:
      |    start: trigger
      |    end: start + 48h
      |    start_inclusive: False
      |    end_inclusive: True
      |    has: { admission: "(None, 0)", discharge_or_death: "(None, 0)" }
      |  target:
      |    start: gap.end
      |    end: start -> discharge_or_death
      |    start_inclusive: False
      |    end_inclusive: True
      |    label: death
      |""".stripMargin

  private val hfYaml =
    """predicates:
      |  admission: { code: { regex: "ADMISSION//.*" } }
      |  discharge: { code: { regex: "DISCHARGE//.*" } }
      |  HF_dx: { code: { regex: "ICD9CM//428.*" } }
      |trigger: discharge
      |windows:
      |  data_within_5yr_of_admit:
      |    start: end - 1825d
      |    end: admission_is_HF.start
      |    start_inclusive: True
      |    end_inclusive: False
      |    has: { _ANY_EVENT: "(1, None)" }
      |  admission_is_HF:
      |    start: end <- admission
      |    end: trigger
      |    start_inclusive: True
      |    end_inclusive: True
      |    has: { HF_dx: "(1, None)" }
      |  input:
      |    start: NULL
      |    end: trigger
      |    start_inclusive: True
      |    end_inclusive: True
      |    index_timestamp: end
      |  target:
      |    start: input.end
      |    end: start + 30d
      |    start_inclusive: False
      |    end_inclusive: True
      |    label: admission
      |  censor_protection:
      |    start: target.end
      |    end: null
      |    start_inclusive: False
      |    end_inclusive: True
      |    has: { _ANY_EVENT: "(1, None)" }
      |""".stripMargin

  private def runTask(yaml: String): Set[(Long, String, Boolean)] = {
    val cfg = TaskConfig.fromYaml(yaml)
    val plain = PredicateFrames.fromMeds(medsDf, cfg.plainPredicates.toSeq)
    val preds = PredicateFrames.finalize(cfg, plain)
    val labels = Query.toMedsLabels(Query(cfg, preds))
    labels
      .select(col("subject_id"), col("prediction_time").cast("string"), col("boolean_value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
      .toSet
  }

  test("MEDS label schema strictness (run.py:84-118 / test_meds.py)") {
    import spark.implicits._

    // Missing mandatory subject_id on a NON-empty result → hard error.
    val noSubject = Seq((java.sql.Timestamp.valueOf("2021-01-01 00:00:00"), true))
      .toDF("index_timestamp", "label")
    val err = intercept[IllegalArgumentException](Query.toMedsLabels(noSubject))
    assert(err.getMessage.contains("subject_id"))

    // Missing subject_id on an EMPTY result → leniency: warn and emit an
    // empty frame with a null Int64 subject_id (run.py:154-160).
    val emptyNoSubject = Query.toMedsLabels(noSubject.limit(0))
    assert(emptyNoSubject.count() == 0)
    assert(emptyNoSubject.columns.toSeq == Seq("subject_id", "prediction_time",
      "boolean_value", "integer_value", "float_value", "categorical_value"))
    assert(emptyNoSubject.schema("subject_id").dataType ==
      org.apache.spark.sql.types.LongType)

    // Missing prediction_time → warns, fills null; int label → boolean;
    // extra columns → dropped.
    val messy = Seq((1L, 100L, "x"), (2L, 0L, "y"))
      .toDF("subject_id", "label", "extra_col")
    val out = Query.toMedsLabels(messy)
    assert(out.columns.toSeq == Seq("subject_id", "prediction_time", "boolean_value",
      "integer_value", "float_value", "categorical_value"))
    val rows = out.orderBy("subject_id").collect()
    assert(rows.map(_.getBoolean(2)).toSeq == Seq(true, false))
    assert(rows.forall(_.isNullAt(1)))
  }

  test("inhospital_mortality labels (test_other_meds.py WANT_SHARDS)") {
    assert(runTask(inhospitalYaml) == Set(
      (1L, "2020-01-15 15:14:00", false),
      (1L, "2022-01-19 04:46:00", false),
      (1L, "2022-01-25 08:11:00", true),
      (3L, "2024-03-19 17:11:00", false),
      (3L, "2024-03-30 11:00:00", false)
    ))
  }

  test("HF_derived_readmission labels (test_other_meds.py WANT_SHARDS)") {
    assert(runTask(hfYaml) == Set(
      (1L, "2022-01-20 08:00:00", true)
    ))
  }

  test("nested_preds_readmission labels: 73-predicate fan-in (test_other_meds.py)") {
    // The reference task defines 59 admission + 14 discharge plain
    // predicates or()-ed into two deriveds; only a handful ever fire on
    // the fixture, but the width stresses config closure, topo order, and
    // the predicate matrix.
    val admissionKinds = Seq(
      "ED", "EU OBSERVATION//EMERGENCY ROOM", "SURGICAL",
      "OBSERVATION ADMIT//EMERGENCY ROOM", "URGENT//TRANSFER FROM HOSPITAL",
      "URGENT//PHYSICIAN REFERRAL", "DIRECT EMER.//PHYSICIAN REFERRAL",
      "OBSERVATION ADMIT//PHYSICIAN REFERRAL", "DIRECT OBSERVATION//PHYSICIAN REFERRAL",
      "ELECTIVE//PHYSICIAN REFERRAL", "EU OBSERVATION//PHYSICIAN REFERRAL",
      "OBSERVATION ADMIT//TRANSFER FROM HOSPITAL", "OBSERVATION ADMIT//WALK-IN/SELF REFERRAL",
      "DIRECT EMER.//CLINIC REFERRAL", "EU OBSERVATION//WALK-IN/SELF REFERRAL",
      "EW EMER.//TRANSFER FROM HOSPITAL", "EW EMER.//PHYSICIAN REFERRAL",
      "AMBULATORY OBSERVATION//PROCEDURE SITE", "URGENT//INTERNAL TRANSFER TO OR FROM PSYCH",
      "EW EMER.//PROCEDURE SITE", "EW EMER.//WALK-IN/SELF REFERRAL",
      "AMBULATORY OBSERVATION//PACU", "EW EMER.//PACU", "OBSERVATION ADMIT//CLINIC REFERRAL",
      "DIRECT OBSERVATION//TRANSFER FROM HOSPITAL",
      "URGENT//TRANSFER FROM SKILLED NURSING FACILITY", "EU OBSERVATION//TRANSFER FROM HOSPITAL",
      "DIRECT OBSERVATION//CLINIC REFERRAL",
      "OBSERVATION ADMIT//TRANSFER FROM SKILLED NURSING FACILITY",
      "DIRECT OBSERVATION//EMERGENCY ROOM", "DIRECT OBSERVATION//WALK-IN/SELF REFERRAL",
      "EU OBSERVATION//CLINIC REFERRAL", "EW EMER.//TRANSFER FROM SKILLED NURSING FACILITY",
      "EW EMER.//INTERNAL TRANSFER TO OR FROM PSYCH", "URGENT//WALK-IN/SELF REFERRAL",
      "DIRECT OBSERVATION//TRANSFER FROM SKILLED NURSING FACILITY", "EW EMER.//CLINIC REFERRAL",
      "OBSERVATION ADMIT//PROCEDURE SITE", "DIRECT OBSERVATION//PROCEDURE SITE",
      "EU OBSERVATION//TRANSFER FROM SKILLED NURSING FACILITY", "URGENT//CLINIC REFERRAL",
      "EW EMER.//INFORMATION NOT AVAILABLE", "URGENT//PROCEDURE SITE",
      "OBSERVATION ADMIT//INTERNAL TRANSFER TO OR FROM PSYCH", "URGENT//EMERGENCY ROOM",
      "DIRECT OBSERVATION//PACU", "OBSERVATION ADMIT//PACU", "MEDICAL",
      "OBSERVATION ADMIT//INFORMATION NOT AVAILABLE",
      "DIRECT OBSERVATION//INFORMATION NOT AVAILABLE", "URGENT//PACU",
      "EW EMER.//AMBULATORY SURGERY TRANSFER",
      "DIRECT OBSERVATION//INTERNAL TRANSFER TO OR FROM PSYCH",
      "URGENT//AMBULATORY SURGERY TRANSFER",
      "SURGICAL SAME DAY ADMISSION//TRANSFER FROM SKILLED NURSING FACILITY",
      "EU OBSERVATION//INFORMATION NOT AVAILABLE", "URGENT//INFORMATION NOT AVAILABLE",
      "EU OBSERVATION//AMBULATORY SURGERY TRANSFER",
      "SURGICAL SAME DAY ADMISSION//TRANSFER FROM HOSPITAL")
    val dischargeKinds = Seq(
      "HOME", "UNK", "HOME HEALTH CARE", "SKILLED NURSING FACILITY", "REHAB", "DIED",
      "CHRONIC/LONG TERM ACUTE CARE", "HOSPICE", "HOME_AMA", "PSYCH FACILITY",
      "ACUTE HOSPITAL", "OTHER FACILITY", "ASSISTED LIVING", "HEALTHCARE FACILITY")

    val admPreds = admissionKinds.zipWithIndex
      .map { case (k, i) => s"""  hospital_admission_$i: { code: "ADMISSION//$k" }""" }
      .mkString("\n")
    val disPreds = dischargeKinds.zipWithIndex
      .map { case (k, i) => s"""  hospital_discharge_$i: { code: "DISCHARGE//$k" }""" }
      .mkString("\n")
    val admOr = admissionKinds.indices.map(i => s"hospital_admission_$i").mkString(",")
    val disOr = dischargeKinds.indices.map(i => s"hospital_discharge_$i").mkString(",")

    val yaml =
      s"""predicates:
         |$admPreds
         |$disPreds
         |  admission: { expr: "or($admOr)" }
         |  discharge: { expr: "or($disOr)" }
         |  death: { code: DEATH }
         |  discharge_or_death: { expr: "or(discharge, death)" }
         |trigger: discharge
         |windows:
         |  data_within_5yr_of_admit:
         |    start: end - 1825d
         |    end: prior_admission.start
         |    start_inclusive: True
         |    end_inclusive: False
         |    has: { _ANY_EVENT: "(1, None)" }
         |  prior_admission:
         |    start: end <- admission
         |    end: trigger
         |    start_inclusive: True
         |    end_inclusive: False
         |    has: { discharge_or_death: "(None, 0)" }
         |  input:
         |    start: NULL
         |    end: trigger
         |    start_inclusive: True
         |    end_inclusive: True
         |    index_timestamp: end
         |  target:
         |    start: input.end
         |    end: start + 30d
         |    start_inclusive: False
         |    end_inclusive: True
         |    label: admission
         |  censor_protection:
         |    start: target.end
         |    end: null
         |    start_inclusive: False
         |    end_inclusive: True
         |    has: { _ANY_EVENT: "(1, None)" }
         |""".stripMargin

    assert(runTask(yaml) == Set(
      (1L, "2022-01-20 08:00:00", true),
      (3L, "2020-01-20 15:18:00", false),
      (3L, "2024-03-28 10:00:00", true),
      (3L, "2024-04-19 13:32:00", false)
    ))
  }
}
