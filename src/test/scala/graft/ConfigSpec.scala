package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config._
import graft.model.{EventBounds, TemporalBounds}
import graft.operators.Constraints

/** Config-layer validation parity tests (reference: config.py doctests). */
class ConfigSpec extends AnyFunSuite {

  private def win(
      start: Option[String],
      end: Option[String],
      si: Boolean = true,
      ei: Boolean = true) = WindowDef(start, end, si, ei)

  test("window boundary parsing (config.py:392-495 doctests)") {
    val input = win(None, Some("trigger + 24h"))
    assert(input.referencedEvent == Seq("trigger"))
    assert(input.rootNode == "end")
    assert(input.startEndpointExpr.contains(EventBounds(true, "-_RECORD_START", true, 0L)))
    assert(input.endEndpointExpr.contains(TemporalBounds(false, 24L * 3600000000L, false, 0L)))

    val gap = win(Some("input.end"), Some("start + 24h"), si = false, ei = true)
    assert(gap.referencedEvent == Seq("input", "end"))
    assert(gap.rootNode == "start")
    assert(gap.startEndpointExpr.isEmpty)
    assert(gap.endEndpointExpr.contains(TemporalBounds(false, 24L * 3600000000L, true, 0L)))

    val zero = win(Some("input.end"), Some("start + 0h"), si = false, ei = true)
    assert(zero.endEndpointExpr.isEmpty)

    val target = win(Some("gap.end"), Some("start -> discharge_or_death"), si = false, ei = true)
    assert(target.endEndpointExpr.contains(EventBounds(false, "discharge_or_death", true, 0L)))
    assert(target.referencedPredicates == Set("discharge_or_death"))

    val backward = win(Some("end"), Some("gap.end <- discharge_or_death"), si = false, ei = true)
    assert(backward.rootNode == "end")
    assert(backward.endEndpointExpr.contains(EventBounds(false, "-discharge_or_death", false, 0L)))
  }

  test("invalid windows raise with the reference's diagnostics (config.py:497-618)") {
    // Each case mirrors one config.py doctest Traceback: same trigger,
    // same message surface (the YAML front door users actually see).
    def msg(t: => Any): String = intercept[IllegalArgumentException](t).getMessage

    val refErr = "Window boundary reference must be either a valid alphanumeric/'_' string"
    val m1 = msg(win(Some("gap.end gap.start"), Some("start -> x")))
    assert(m1.contains(refErr) && m1.endsWith("Got: 'gap.end gap.start'"))
    val m2 = msg(win(Some("input"), Some("start window -> discharge_or_death")))
    assert(m2.contains(refErr) && m2.endsWith("Got: 'start window'"))
    val m3 = msg(win(Some("window.foo -> x"), Some("input.end")))
    assert(m3.contains(refErr) && m3.endsWith("Got: 'window.foo'"))

    assert(msg(win(None, None)).contains(
      "Window cannot progress from the start of the record to the end of the record."))

    assert(msg(win(Some("input.end"), Some("start - 2d"))).contains(
      "Window start will not occur before window end! Got: input.end -> start - 2d"))
    assert(msg(win(Some("end -> predicate"), Some("input.end"))).contains(
      "Window start will not occur before window end! Got: end -> predicate -> input.end"))

    assert(msg(win(Some("end - 24h"), Some("start + 1d"))).contains(
      "Exactly one of the start or end of the window must reference the other. " +
        "Got: end - 24h -> start + 1d"))
    assert(msg(win(Some("input.end"), Some("input.end + 2d"))).contains(
      "Exactly one of the start or end of the window must reference the other. " +
        "Got: input.end -> input.end + 2d"))

    assert(msg(win(Some("input.end"), Some("start + -24h")))
      .contains("Window boundary cannot contain both '+' and '-' operators."))
    assert(msg(win(Some("input.end"), Some("start + invalid time string.")))
      .contains("Failed to parse timedelta from window offset for 'invalid time string.'"))
    assert(msg(win(Some("gap.end"), Some("start <-> dd")))
      .contains("Window boundary cannot contain both '->' and '<-' operators."))

    assert(msg(WindowDef.parseConstraint("discharge", "(0)")).contains(
      "Invalid constraint format: discharge. Expected format: '(min, max)'. Got: '(0)'"))
  }

  test("derived predicate validation (config.py:252-293)") {
    assert(DerivedPredicateDef("and(P1, P2, P3)").inputPredicates == Seq("P1", "P2", "P3"))
    assert(DerivedPredicateDef("or(PA, PB)").isOr)
    intercept[IllegalArgumentException](DerivedPredicateDef("and()"))
    intercept[IllegalArgumentException](DerivedPredicateDef("PA + PB"))
    intercept[IllegalArgumentException](DerivedPredicateDef(""))
  }

  test("task config validation (config.py:1421-1562)") {
    def plain = PlainPredicateDef(CodeEq("A"))
    // undefined predicate in constraint
    intercept[IllegalArgumentException] {
      TaskConfig(
        Map("A" -> plain),
        TriggerDef("_ANY_EVENT"),
        Seq("w" -> WindowDef(None, Some("trigger"), true, false,
          has = Map("B" -> (Some(1L), None)))))
    }
    // undefined trigger
    intercept[IllegalArgumentException] {
      TaskConfig(Map("A" -> plain), TriggerDef("missing"), Seq.empty)
    }
    // cyclic derived predicates
    intercept[IllegalArgumentException] {
      TaskConfig(
        Map(
          "A" -> DerivedPredicateDef("and(B, C)"),
          "B" -> DerivedPredicateDef("and(A, C)"),
          "C" -> plain),
        TriggerDef("C"),
        Seq.empty).derivedPredicatesInOrder
    }
    // two labels
    intercept[IllegalArgumentException] {
      TaskConfig(
        Map("A" -> plain),
        TriggerDef("A"),
        Seq(
          "w1" -> WindowDef(None, Some("trigger"), true, false, label = Some("A")),
          "w2" -> WindowDef(Some("w1.end"), Some("start + 1d"), true, false, label = Some("A"))))
    }
  }

  test("yaml loader prunes unreferenced predicates (config.py:1177-1235)") {
    val yaml =
      """patient_demographics:
        |  male: { code: MALE }
        |  female: { code: FEMALE }
        |predicates:
        |  normal_male_lab_range: { code: LAB, value_min: 0, value_max: 100,
        |    value_min_inclusive: True, value_max_inclusive: True }
        |  normal_female_lab_range: { code: LAB, value_min: 0, value_max: 90,
        |    value_min_inclusive: True, value_max_inclusive: True }
        |  normal_lab_male: { expr: "and(normal_male_lab_range, male)" }
        |  normal_lab_female: { expr: "and(normal_female_lab_range, female)" }
        |trigger: _ANY_EVENT
        |windows:
        |  start:
        |    start: null
        |    end: trigger + 24h
        |    start_inclusive: True
        |    end_inclusive: True
        |    has: { normal_lab_male: "(1, None)" }
        |""".stripMargin
    val cfg = TaskConfig.fromYaml(yaml)
    assert(cfg.predicates.keySet == Set("normal_lab_male", "normal_male_lab_range", "female", "male"))
    // demographics stay static
    assert(cfg.predicates("male").static)
  }

  test("predicates-override file merges and overrides (config.py:1147-1175)") {
    val base =
      """trigger: admission
        |windows:
        |  w:
        |    start: null
        |    end: trigger + 24h
        |    start_inclusive: True
        |    end_inclusive: True
        |""".stripMargin
    val preds =
      """patient_demographics:
        |  brown_eyes: { code: eye_color//BR }
        |predicates:
        |  admission: { code: admission }
        |""".stripMargin
    val cfg = TaskConfig.fromYaml(base, Some(preds))
    assert(cfg.predicates.keySet == Set("admission", "brown_eyes"))
    assert(cfg.predicates("brown_eyes").static)
  }

  test("constraints validation (constraints.py:46-53)") {
    val dummy = null.asInstanceOf[org.apache.spark.sql.DataFrame]
    intercept[IllegalArgumentException](
      Constraints.checkConstraints(Map("is_A" -> (None, None)), dummy))
    intercept[IllegalArgumentException](
      Constraints.checkConstraints(Map("is_A" -> (Some(2L), Some(1L))), dummy))
  }
}
