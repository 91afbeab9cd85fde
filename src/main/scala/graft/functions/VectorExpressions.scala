package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native Catalyst expressions for embedding arithmetic.
 *
 * The composable form (`aggregate(zip_with(...))`, graft.ml.Similarity) is
 * semantically identical but runs as an interpreted higher-order function
 * (CodegenFallback) — three lambda evaluations per element per pair. These
 * expressions generate a single fused Java loop inside whole-stage codegen,
 * which is what an O(n²·d) similarity kernel needs at scale.
 *
 * Float elements are upcast to double before accumulation, left-to-right —
 * bit-identical to the HOF path and to DuckDB's double-precision list
 * functions, so oracle hash-matches are preserved. Inputs may be
 * ARRAY<FLOAT> or ARRAY<DOUBLE> (read directly, no array cast/copy).
 */
trait VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  protected def elementOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elementOk(left.dataType) && elementOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT> or ARRAY<DOUBLE> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  protected def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Scala-side element read, upcast to double. */
  protected def get(arr: ArrayData, i: Int, float: Boolean): Double =
    if (float) arr.getFloat(i).toDouble else arr.getDouble(i)

  /** Java code for an element read, upcast to double. */
  protected def getJava(v: String, i: String, float: Boolean): String =
    if (float) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
}

case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = isFloat(left); val rf = isFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = get(x, i, lf)
      val yv = get(y, i, rf)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    // sqrt(na) * sqrt(nb), NOT sqrt(na*nb): keeps the exact double op
    // sequence of the HOF implementation (norm(a) * norm(b))
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names: the same expression can be expanded twice in one
      // codegen scope (e.g. both sides of a comparison)
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = ${getJava(a, i, isFloat(left))};
         |  double $yv = ${getJava(b, i, isFloat(right))};
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ aᵢbᵢ in double — the fused-loop form of `aggregate(zip_with(a, b, _*_))`. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = isFloat(left); val rf = isFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += get(x, i, lf) * get(y, i, rf); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ${getJava(a, i, isFloat(left))} * ${getJava(b, i, isFloat(right))};
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  import org.apache.spark.sql.graftshim.ColumnShim

  def vecCosine(a: Column, b: Column): Column =
    ColumnShim.column(CosineSimilarity(ColumnShim.expression(a), ColumnShim.expression(b)))

  def vecDot(a: Column, b: Column): Column =
    ColumnShim.column(DotProduct(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Register `vec_cosine` / `vec_dot` as SQL functions on a live session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_cosine",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_dot",
      exprs => DotProduct(exprs(0), exprs(1)), "built-in")
  }
}

/** `SparkSessionExtensions` hook: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * makes the vector functions available in every session of a cluster. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "vec_cosine"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
  }
}
