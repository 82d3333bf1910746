package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding-vector math.
  *
  * Spark evaluates higher-order array lambdas (`zip_with` + `aggregate`)
  * INTERPRETED, one function call per element — at 768-dim × billions of
  * candidate pairs that is the hot path of every similarity/near-dup
  * operator. This binary expression generates a tight fused Java loop
  * inside whole-stage codegen instead (the preference order for custom
  * ops: compose built-ins < native codegen Expression < UDF).
  *
  * Lives under `org.apache.spark.sql` because the expression-authoring
  * surface (`AbstractDataType`, `ExpressionUtils.column`) is
  * `private[sql]` — the standard extension-library arrangement; no Spark
  * code is modified or shadowed.
  *
  * Math is pure double (products included), matching what DuckDB computes
  * for `list_cosine_similarity(CAST(... AS DOUBLE[]))` — the oracle
  * harness's formulation.
  */
case class FloatVectorCosine(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // Fresh names: with non-nullable inputs nullSafeCodeGen inlines this
      // block unbraced, so two cosine expressions in one codegen scope would
      // otherwise declare duplicate Java locals and break Janino compilation.
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
      |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      |double $dot = 0.0, $na = 0.0, $nb = 0.0;
      |for (int $i = 0; $i < $n; $i++) {
      |  double $x = (double) $a.getFloat($i);
      |  double $y = (double) $b.getFloat($i);
      |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
      |}
      |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorCosine =
    copy(left = newLeft, right = newRight)
}

/** Squared Euclidean distance of two `array<float>` columns — the
  * product-quantization codeword-assignment metric. Same design notes as
  * [[FloatVectorCosine]].
  */
case class FloatVectorL2Sq(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_l2sq"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      s += d * d; i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
      |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      |double $s = 0.0;
      |for (int $i = 0; $i < $n; $i++) {
      |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
      |  $s += $d * $d;
      |}
      |${ev.value} = $s;
      |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorL2Sq =
    copy(left = newLeft, right = newRight)
}

/** Dot product of two `array<float>` columns (double accumulation) — the
  * asymmetric-distance table builder for PQ. Same design notes as
  * [[FloatVectorCosine]].
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
      |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      |double $s = 0.0;
      |for (int $i = 0; $i < $n; $i++) {
      |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
      |}
      |${ev.value} = $s;
      |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

/** Pack an `array<int>` of small codes into a `binary` column, one byte
  * per element (values taken mod 256) — the production PQ code layout
  * (ks ≤ 256 codewords → 1 byte/subspace → m bytes/vector, vs ~4·m + 16
  * for the `array<int>` form). Same design notes as [[FloatVectorCosine]].
  */
case class IntArrayToBytes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(IntegerType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "int_array_to_bytes"

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val out = new Array[Byte](arr.numElements())
    var i = 0
    while (i < out.length) { out(i) = (arr.getInt(i) & 0xff).toByte; i += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
      |int $n = $a.numElements();
      |byte[] $out = new byte[$n];
      |for (int $i = 0; $i < $n; $i++) { $out[$i] = (byte)($a.getInt($i) & 0xff); }
      |${ev.value} = $out;
      |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): IntArrayToBytes =
    copy(child = newChild)
}

/** The PQ ADC hot-path in ONE codegen'd loop: score = Σᵢ
  * tab[offsets(i) + codes(i)] over the packed byte codes — `m` array
  * lookups per candidate pair with zero per-subspace expression
  * overhead (the previous formulation chained m `element_at` calls).
  * `offsets` are the flattened per-subspace table offsets (a compile-time
  * constant of the codebook layout, not a column). Unsigned byte
  * semantics: code 255 = codeword 255, so ks=256 round-trips.
  */
case class PqAdcScoreBytes(left: Expression, right: Expression, offsets: Seq[Int])
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score_bytes"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[Array[Byte]]
    val tab = b.asInstanceOf[ArrayData]
    val m = math.min(codes.length, offsets.length)
    var s = 0.0; var i = 0
    while (i < m) { s += tab.getDouble(offsets(i) + (codes(i) & 0xff)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val off = ctx.addReferenceObj("pqOffsets", offsets.toArray, "int[]")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
      |int $m = java.lang.Math.min($a.length, $off.length);
      |double $s = 0.0;
      |for (int $i = 0; $i < $m; $i++) {
      |  $s += $b.getDouble($off[$i] + ($a[$i] & 0xff));
      |}
      |${ev.value} = $s;
      |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScoreBytes =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Codegen'd cosine similarity of two `array<float>` columns. */
  def cosine(a: Column, b: Column): Column =
    ExpressionUtils.column(
      FloatVectorCosine(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Codegen'd squared L2 distance of two `array<float>` columns. */
  def l2sq(a: Column, b: Column): Column =
    ExpressionUtils.column(
      FloatVectorL2Sq(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Codegen'd dot product of two `array<float>` columns. */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      FloatVectorDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Pack an `array<int>` of codes (each < 256) into one byte each. */
  def packBytes(codes: Column): Column =
    ExpressionUtils.column(IntArrayToBytes(ExpressionUtils.expression(codes)))

  /** Codegen'd PQ ADC score over packed byte codes and a flattened
    * per-query lookup table, with constant per-subspace offsets.
    */
  def pqAdcScore(codes: Column, tab: Column, offsets: Seq[Int]): Column =
    ExpressionUtils.column(PqAdcScoreBytes(
      ExpressionUtils.expression(codes), ExpressionUtils.expression(tab), offsets))
}
