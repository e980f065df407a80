package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for dense float-vector math.
  *
  * The reference scores query/chunk similarity inside Chroma (L2 distance,
  * `/root/reference/micro-infobot/app.py:130,223` — Chroma's default metric).
  * Here the vector is an `ARRAY<FLOAT>` column and the distance is a
  * codegen'd binary expression, so kNN scoring stays inside whole-stage
  * codegen (no UDF boxing, no higher-order-function allocation per row) —
  * this is the hot loop of a 100 TB similarity scan.
  */
abstract class VectorBinaryExpression extends BinaryExpression with ExpectsInputTypes {
  // Seq[DataType] <: Seq[AbstractDataType] (covariant override);
  // AbstractDataType itself is private[sql] in Spark 4.x.
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType

  /** Java source computing the double result from ArrayData `a`, `b`. */
  protected def genLoop(a: String, b: String, result: String): String

  protected def evalLoop(a: ArrayData, b: ArrayData): Double

  override def nullSafeEval(l: Any, r: Any): Any =
    evalLoop(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => genLoop(a, b, ev.value.toString))
}

object VectorBinaryExpression {
  /** Mismatched dimensions are an error, never silent truncation (the
    * reference's numpy/Chroma path would raise too). Called from both the
    * interpreted path and generated Java (via the static forwarder).
    */
  def checkDims(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    if (n != m) {
      throw new IllegalArgumentException(
        s"vector dimension mismatch: $n vs $m")
    }
    n
  }
}

/** Euclidean (L2) distance — Chroma's default similarity metric. */
case class L2Distance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "l2_distance"
  override protected def evalLoop(a: ArrayData, b: ArrayData): Double = {
    val n = VectorBinaryExpression.checkDims(a, b)
    var s = 0.0
    var i = 0
    while (i < n) { val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble; s += d * d; i += 1 }
    math.sqrt(s)
  }
  override protected def genLoop(a: String, b: String, result: String): String =
    s"""
       |int n = graft.functions.VectorBinaryExpression.checkDims($a, $b);
       |double s = 0.0;
       |for (int i = 0; i < n; i++) {
       |  double d = (double) $a.getFloat(i) - (double) $b.getFloat(i);
       |  s += d * d;
       |}
       |$result = Math.sqrt(s);
     """.stripMargin
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dot product of two float vectors. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "dot_product"
  override protected def evalLoop(a: ArrayData, b: ArrayData): Double = {
    val n = VectorBinaryExpression.checkDims(a, b)
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }
  override protected def genLoop(a: String, b: String, result: String): String =
    s"""
       |int n = graft.functions.VectorBinaryExpression.checkDims($a, $b);
       |double s = 0.0;
       |for (int i = 0; i < n; i++) {
       |  s += (double) $a.getFloat(i) * (double) $b.getFloat(i);
       |}
       |$result = s;
     """.stripMargin
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity; 0.0 when either vector has zero norm. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_similarity"
  override protected def evalLoop(a: ArrayData, b: ArrayData): Double = {
    val n = VectorBinaryExpression.checkDims(a, b)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def genLoop(a: String, b: String, result: String): String =
    s"""
       |int n = graft.functions.VectorBinaryExpression.checkDims($a, $b);
       |double dot = 0.0, na = 0.0, nb = 0.0;
       |for (int i = 0; i < n; i++) {
       |  double x = (double) $a.getFloat(i);
       |  double y = (double) $b.getFloat(i);
       |  dot += x * y; na += x * x; nb += y * y;
       |}
       |$result = (na == 0.0 || nb == 0.0) ? 0.0 : dot / (Math.sqrt(na) * Math.sqrt(nb));
     """.stripMargin
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorFunctions {

  /** Register the vector expressions in the session function registry so they
    * are callable from both the Column API (via [[l2Distance]] etc.) and SQL.
    * Idempotent.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("l2_distance", es => L2Distance(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "cosine_similarity", es => CosineSimilarity(es.head, es(1)), "built-in")
    TopKAggregate.register(spark)
    CmsFunctions.register(spark)
    TextExpressions.register(spark)
    AudioExpressions.register(spark)
    VideoExpressions.register(spark)
  }

  def l2Distance(a: Column, b: Column): Column = call_function("l2_distance", a, b)
  def dotProduct(a: Column, b: Column): Column = call_function("dot_product", a, b)
  def cosineSimilarity(a: Column, b: Column): Column = call_function("cosine_similarity", a, b)
}
