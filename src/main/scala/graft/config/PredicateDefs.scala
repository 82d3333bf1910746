package graft.config

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Predicate configuration → Spark `Column` compiler.
  * (reference: src/aces/config.py:34-316)
  */
sealed trait PredicateDef {
  def static: Boolean
  def isPlain: Boolean
}

/** Code matcher for plain predicates (reference: config.py:98-129). */
sealed trait CodeMatcher {
  /** Boolean expression over the MEDS `code` column. */
  def expr: Column = this match {
    case CodeEq(v)    => col("code") === lit(v)
    case CodeRegex(re) =>
      require(re.nonEmpty, "Expected a non-empty string for 'regex'.")
      col("code").rlike(re)
    case CodeAnyOf(vs) =>
      require(vs.nonEmpty, "Expected a list of strings for 'any'.")
      col("code").isin(vs: _*)
  }
  def text: String = this match {
    case CodeEq(v)     => v
    case CodeRegex(re) => re
    case CodeAnyOf(vs) => vs.mkString("|")
  }
}
final case class CodeEq(value: String) extends CodeMatcher
final case class CodeRegex(regex: String) extends CodeMatcher
final case class CodeAnyOf(values: Seq[String]) extends CodeMatcher

/** A plain (non-derived) predicate over the raw event stream.
  * (reference: config.py:34-148 `PlainPredicateConfig`)
  */
final case class PlainPredicateDef(
    code: CodeMatcher,
    valueMin: Option[Double] = None,
    valueMax: Option[Double] = None,
    valueMinInclusive: Boolean = false,
    valueMaxInclusive: Boolean = false,
    static: Boolean = false,
    otherCols: Map[String, String] = Map.empty
) extends PredicateDef {
  def isPlain: Boolean = true

  /** Boolean expression for a MEDS-shaped frame
    * (`code` string + `numeric_value`). (reference: config.py:44-148)
    */
  def medsExpr: Column = {
    val criteria = Seq(code.expr) ++
      valueMin.map(v => if (valueMinInclusive) col("numeric_value") >= v else col("numeric_value") > v) ++
      valueMax.map(v => if (valueMaxInclusive) col("numeric_value") <= v else col("numeric_value") < v) ++
      otherCols.map { case (k, v) => col(k) === lit(v) }
    criteria.reduce(_ && _)
  }

  /** Boolean expression for an ESGPT-shaped frame: the code is
    * `measurement//value`, `event_type` values are `&`-joined multi-labels,
    * bare columns are existence predicates. (reference: config.py:150-234)
    */
  def esgptExpr(valuesColumn: Option[String] = None): Column = {
    val codeStr = code match {
      case CodeEq(v) => v
      case other =>
        throw new IllegalArgumentException(
          s"ESGPT predicates require a plain string code; got $other")
    }
    val (base: Seq[Column], valueCol: Option[String]) =
      if (codeStr.contains("//")) {
        val parts = codeStr.split("//", 2)
        val (meas, value) = (parts(0), parts(1))
        if (meas.equalsIgnoreCase("event_type"))
          (Seq(array_contains(split(col("event_type").cast("string"), "&"), value)), valuesColumn)
        else (Seq(col(meas) === lit(value)), valuesColumn)
      } else if (valueMin.isEmpty && valueMax.isEmpty) {
        return col(codeStr).isNotNull
      } else (Seq.empty[Column], Some(codeStr))

    def vc: Column = col(valueCol.getOrElse(throw new IllegalArgumentException(
      s"Must specify a values column for ESGPT predicates with a value bound")))

    val criteria = base ++
      valueMin.map(v => if (valueMinInclusive) vc >= v else vc > v) ++
      valueMax.map(v => if (valueMaxInclusive) vc <= v else vc < v) ++
      otherCols.map { case (k, v) => col(k) === lit(v) }
    criteria.reduce(_ && _)
  }
}

/** A derived predicate: `and(p1, p2, …)` / `or(…)` over other predicates'
  * counts (>0), recast to a count. (reference: config.py:241-316)
  */
final case class DerivedPredicateDef(expr: String, static: Boolean = false) extends PredicateDef {
  require(expr.nonEmpty, "Derived predicates must have a non-empty expression field.")

  val isAnd: Boolean = expr.startsWith("and(") && expr.endsWith(")")
  val isOr: Boolean = expr.startsWith("or(") && expr.endsWith(")")
  require(isAnd || isOr, s"Derived predicate expression must start with 'and(' or 'or('. Got: '$expr'")

  val inputPredicates: Seq[String] = {
    val inner = if (isAnd) expr.substring(4, expr.length - 1) else expr.substring(3, expr.length - 1)
    val parts = inner.split(",").map(_.trim).toSeq
    require(
      parts.size >= 2,
      "Derived predicate expression must have at least two input predicates (comma separated). " +
        s"Got: '$expr'")
    parts
  }

  def isPlain: Boolean = false

  /** (reference: config.py:295-311) */
  def evalExpr: Column = {
    val terms = inputPredicates.map(p => col(p) > 0)
    if (isAnd) terms.reduce(_ && _) else terms.reduce(_ || _)
  }
}
