package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for embedding math (SURVEY.md §2.12
  * similarity surface). The builtin route — `aggregate(zip_with(...))` —
  * is a pair of interpreted higher-order functions: one lambda invocation
  * per element per row, which dominates the all-pairs cosine queries. These
  * expressions compile to a tight primitive loop inside whole-stage
  * codegen instead.
  *
  * Numeric contract (oracle-critical): identical to the HOF fold —
  * left-to-right double accumulation of `(double)a[i] * (double)b[i]` —
  * so results are bit-equal to both the previous implementation and the
  * DuckDB `list_sum` oracle.
  */
object VectorOps {

  /** Σ a[i]·b[i] over float arrays, double accumulator, sequential. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Σ a[i]·b[i], a float × b double (e.g. embedding · centroid). */
  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Σ a[i]·b[i] over double arrays. */
  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** sqrt(Σ x²) over a float array, double accumulator, sequential. */
  def norm(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }

  /** sqrt(Σ x²) over a double array. */
  def normD(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case ArrayType(FloatType, _)  => false
    case other => throw new IllegalArgumentException(
      s"vec_* expects array<float> or array<double>, got $other")
  }

  // (no ExpectsInputTypes — AbstractDataType is private[sql] in Spark 4;
  // inputs are array<float>/array<double> by construction at the call sites)
  case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    // accumulation is left-to-right double in all variants, so the numeric
    // contract (oracle-critical) is identical regardless of element type
    private lazy val method = (isDoubleArray(left), isDoubleArray(right)) match {
      case (false, false) => "dot"
      case (false, true)  => "dotFD"
      case (true, true)   => "dotDD"
      case (true, false)  => "dotDFSwap" // handled below by swapping args
    }
    override def nullSafeEval(a: Any, b: Any): Any = method match {
      case "dot"       => dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      case "dotFD"     => dotFD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      case "dotDD"     => dotDD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      case "dotDFSwap" => dotFD(b.asInstanceOf[ArrayData], a.asInstanceOf[ArrayData])
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => method match {
        case "dotDFSwap" => s"${ev.value} = graft.functions.VectorOps.dotFD($b, $a);"
        case m           => s"${ev.value} = graft.functions.VectorOps.$m($a, $b);"
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
      copy(left = l, right = r)
  }

  case class VecNorm(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    private lazy val method = if (isDoubleArray(child)) "normD" else "norm"
    override def nullSafeEval(a: Any): Any =
      if (method == "normD") normD(a.asInstanceOf[ArrayData])
      else norm(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.functions.VectorOps.$method($a)")
    override protected def withNewChildInternal(c: Expression): VecNorm =
      copy(child = c)
  }

  /** Registers vec_dot / vec_norm on the session (idempotent) — the same
    * extension point a SparkSessionExtensions injectedFunction would use,
    * kept session-local so any driver-created session works.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot", exprs => VecDot(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_norm", exprs => VecNorm(exprs.head), "built-in")
  }

  def vecDot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark); call_function("vec_dot", a, b)
  }
  def vecNorm(spark: SparkSession, a: Column): Column = {
    register(spark); call_function("vec_norm", a)
  }
}
