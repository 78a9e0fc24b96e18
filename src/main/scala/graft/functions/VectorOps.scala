package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StructField, StructType}

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

  /** Exact-i64 Σ (a[off+i] − c[i])² over i < c.length — the PQ block
    * squared distance of a slice of the e6-quantized embedding against
    * an integer centroid. Pure integer math: fold order cannot change
    * the value, so the oracle contract is trivially preserved; the win
    * over `aggregate(zip_with(slice(...)))` is dropping ~3 interpreted
    * lambda calls per element per candidate (q271/q276 pay
    * blocks × (codes + 1) ≈ 70 such folds per row otherwise).
    */
  /** Loud bound guard for the integer kernels: UnsafeArrayData.getLong
    * past the array's end returns arbitrary memory, not an exception —
    * a short/malformed embedding would silently corrupt every code and
    * distance downstream. The HOF route these kernels replaced
    * propagated null instead; a task-failing error is the honest
    * version of that (dot/norm in this file bound with math.min because
    * their float semantics tolerate truncation; integer PQ must not).
    */
  private def boundCheck(fn: String, a: ArrayData, off: Int, n: Int): Unit =
    if (off < 0 || off + n > a.numElements())
      throw new IllegalArgumentException(
        s"$fn: slice [$off, ${off + n}) exceeds array of ${a.numElements()} " +
          "elements — malformed embedding or mis-sized codebook")

  private def totalWidth(cb: Array[Array[Array[Long]]]): Int = {
    var w = 0; var b = 0
    while (b < cb.length) {
      if (cb(b).length > 0) w += cb(b)(0).length
      b += 1
    }
    w
  }

  def pqD2(a: ArrayData, off: Int, c: ArrayData): Long = {
    val n = c.numElements()
    boundCheck("pq_d2", a, off, n)
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(off + i) - c.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Exact-i64 Σ (a[off+i] − s[i] − c[i])² — the residual-PQ level-2
    * block distance: the row's block slice minus its selected level-1
    * centroid `s` (a data-dependent element_at of a literal
    * array-of-arrays), against level-2 code `c`, without ever
    * materializing the residual array.
    */
  def pqResD2(a: ArrayData, off: Int, s: ArrayData, c: ArrayData): Long = {
    val n = c.numElements()
    boundCheck("pq_res_d2", a, off, n)
    boundCheck("pq_res_d2 (selected centroid)", s, 0, n)
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(off + i) - s.getLong(i) - c.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Full PQ encoding of an e6-quantized vector against a static
    * codebook: for each block, the argmin code by exact-i64 squared
    * distance (ties → lowest code, the `least(struct(d2, code))`
    * contract) and that minimum distance. One expression evaluation
    * replaces blocks × codes pq_d2 calls AND the blocks × codes
    * struct/least Catalyst tree — at 16 blocks × 64 codes the tree
    * alternative is ~1024 expression nodes whose planning/codegen time
    * dwarfs the 500-row execution (measured 164 s → ~3 s for the q277
    * sweep arm). Block widths come from the codebook
    * (cb(b)(c).length), offsets accumulate left to right.
    */
  def pqEncode(a: ArrayData, cb: Array[Array[Array[Long]]]): InternalRow = {
    boundCheck("pq_encode", a, 0, totalWidth(cb))
    val nb = cb.length
    val codes = new Array[Long](nb)
    val d2s = new Array[Long](nb)
    var off = 0
    var b = 0
    while (b < nb) {
      val blk = cb(b)
      val bw = if (blk.length > 0) blk(0).length else 0
      var best = Long.MaxValue
      var bestC = 0L
      var c = 0
      while (c < blk.length) {
        val cent = blk(c)
        var acc = 0L
        var i = 0
        while (i < bw) {
          val d = a.getLong(off + i) - cent(i)
          acc += d * d
          i += 1
        }
        if (acc < best) { best = acc; bestC = c }
        c += 1
      }
      codes(b) = bestC
      d2s(b) = best
      off += bw
      b += 1
    }
    InternalRow(ArrayData.toArrayData(codes), ArrayData.toArrayData(d2s))
  }

  /** Residual PQ encoding: like pqEncode, but block slices are taken
    * from `a − sel` (the row's residual against its selected coarse
    * centroid `sel`, a full-width array picked per row) without ever
    * materializing the residual. Same argmin/tie contract.
    */
  def pqResEncode(a: ArrayData, sel: ArrayData,
      cb: Array[Array[Array[Long]]]): InternalRow = {
    val w = totalWidth(cb)
    boundCheck("pq_res_encode", a, 0, w)
    boundCheck("pq_res_encode (selected centroid)", sel, 0, w)
    val nb = cb.length
    val codes = new Array[Long](nb)
    val d2s = new Array[Long](nb)
    var off = 0
    var b = 0
    while (b < nb) {
      val blk = cb(b)
      val bw = if (blk.length > 0) blk(0).length else 0
      var best = Long.MaxValue
      var bestC = 0L
      var c = 0
      while (c < blk.length) {
        val cent = blk(c)
        var acc = 0L
        var i = 0
        while (i < bw) {
          val d = a.getLong(off + i) - sel.getLong(off + i) - cent(i)
          acc += d * d
          i += 1
        }
        if (acc < best) { best = acc; bestC = c }
        c += 1
      }
      codes(b) = bestC
      d2s(b) = best
      off += bw
      b += 1
    }
    InternalRow(ArrayData.toArrayData(codes), ArrayData.toArrayData(d2s))
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

  /** pq_d2(arr, off, cent): codegen'd exact-i64 block squared distance
    * (see pqD2). `arr` is array<bigint>, `off` a literal int (0-based
    * slice start), `cent` a literal array<bigint> whose length bounds
    * the loop.
    */
  case class PqD2(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(a: Any, off: Any, c: Any): Any =
      pqD2(a.asInstanceOf[ArrayData], off.asInstanceOf[Int],
        c.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, off, c) =>
        s"${ev.value} = graft.functions.VectorOps.pqD2($a, $off, $c);")
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): PqD2 =
      copy(first = f, second = s, third = t)
  }

  /** pq_res_d2(arr, off, sel, cent): codegen'd level-2 residual block
    * distance (see pqResD2). `sel` is the row's selected level-1
    * centroid (array<bigint>, typically element_at of a literal
    * array-of-arrays), `cent` the literal level-2 code.
    */
  case class PqResD2(first: Expression, second: Expression,
      third: Expression, fourth: Expression) extends QuaternaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(a: Any, off: Any, s: Any, c: Any): Any =
      pqResD2(a.asInstanceOf[ArrayData], off.asInstanceOf[Int],
        s.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, off, s, c) =>
        s"${ev.value} = graft.functions.VectorOps.pqResD2($a, $off, $s, $c);")
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression, q: Expression): PqResD2 =
      copy(first = f, second = s, third = t, fourth = q)
  }

  /** pq_encode(arr, codebook): codegen'd whole-vector PQ assignment
    * (see pqEncode). `codebook` must be a FOLDABLE
    * array<array<array<bigint>>> (block → code → component) — it is
    * evaluated once at plan time into a primitive long[][][] carried as
    * a codegen reference object, so neither planning nor execution pays
    * per-candidate expression nodes.
    */
  case class PqEncode(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("codes", ArrayType(LongType, containsNull = false),
        nullable = false),
      StructField("d2s", ArrayType(LongType, containsNull = false),
        nullable = false)))
    @transient private lazy val cb: Array[Array[Array[Long]]] = {
      require(right.foldable, "pq_encode codebook must be a literal")
      val top = right.eval(null).asInstanceOf[ArrayData]
      Array.tabulate(top.numElements()) { b =>
        val blk = top.getArray(b)
        Array.tabulate(blk.numElements())(c => blk.getArray(c).toLongArray())
      }
    }
    override def nullSafeEval(a: Any, unused: Any): Any =
      pqEncode(a.asInstanceOf[ArrayData], cb)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cbRef = ctx.addReferenceObj("pqCodebook", cb, "long[][][]")
      nullSafeCodeGen(ctx, ev, (a, _) =>
        s"${ev.value} = graft.functions.VectorOps.pqEncode($a, $cbRef);")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncode =
      copy(left = l, right = r)
  }

  /** pq_res_encode(arr, sel, codebook): codegen'd whole-vector residual
    * PQ assignment (see pqResEncode). `sel` is a full-width
    * array<bigint> column (the row's coarse centroid, typically
    * element_at of a literal array-of-arrays by the row's cell code);
    * `codebook` must be foldable, carried as a primitive reference
    * object exactly like PqEncode.
    */
  case class PqResEncode(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("codes", ArrayType(LongType, containsNull = false),
        nullable = false),
      StructField("d2s", ArrayType(LongType, containsNull = false),
        nullable = false)))
    @transient private lazy val cb: Array[Array[Array[Long]]] = {
      require(third.foldable, "pq_res_encode codebook must be a literal")
      val top = third.eval(null).asInstanceOf[ArrayData]
      Array.tabulate(top.numElements()) { b =>
        val blk = top.getArray(b)
        Array.tabulate(blk.numElements())(c => blk.getArray(c).toLongArray())
      }
    }
    override def nullSafeEval(a: Any, s: Any, unused: Any): Any =
      pqResEncode(a.asInstanceOf[ArrayData], s.asInstanceOf[ArrayData], cb)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cbRef = ctx.addReferenceObj("pqResCodebook", cb, "long[][][]")
      nullSafeCodeGen(ctx, ev, (a, s, _) =>
        s"${ev.value} = graft.functions.VectorOps.pqResEncode($a, $s, $cbRef);")
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): PqResEncode =
      copy(first = f, second = s, third = t)
  }

  /** Registers vec_dot / vec_norm on the session (idempotent) — the same
    * extension point a SparkSessionExtensions injectedFunction would use,
    * kept session-local so any driver-created session works.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot", exprs => VecDot(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_norm", exprs => VecNorm(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("pq_d2",
      exprs => PqD2(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction("pq_res_d2",
      exprs => PqResD2(exprs(0), exprs(1), exprs(2), exprs(3)), "built-in")
    reg.createOrReplaceTempFunction("pq_encode",
      exprs => PqEncode(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("pq_res_encode",
      exprs => PqResEncode(exprs(0), exprs(1), exprs(2)), "built-in")
  }

  def vecDot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark); call_function("vec_dot", a, b)
  }
  def vecNorm(spark: SparkSession, a: Column): Column = {
    register(spark); call_function("vec_norm", a)
  }
  /** Σ (arr[off+i] − cent[i])² (exact i64) against a literal Long centroid. */
  def pqD2Col(spark: SparkSession, arr: Column, off: Int, cent: Seq[Long]): Column = {
    register(spark)
    call_function("pq_d2", arr, org.apache.spark.sql.functions.lit(off),
      org.apache.spark.sql.functions.array(
        cent.map(org.apache.spark.sql.functions.lit): _*))
  }
  /** Σ (arr[off+i] − sel[i] − cent[i])² (exact i64); `sel` is a column. */
  def pqResD2Col(spark: SparkSession, arr: Column, off: Int, sel: Column,
      cent: Seq[Long]): Column = {
    register(spark)
    call_function("pq_res_d2", arr, org.apache.spark.sql.functions.lit(off), sel,
      org.apache.spark.sql.functions.array(
        cent.map(org.apache.spark.sql.functions.lit): _*))
  }
  /** struct(codes, d2s) PQ assignment of `arr` against a literal
    * codebook cb(block)(code)(component).
    */
  def pqEncodeCol(spark: SparkSession, arr: Column,
      cb: Seq[Seq[Seq[Long]]]): Column = {
    register(spark)
    // typedlit: ONE Literal node — a nested array(array(lit...)) tree
    // pays a constant-fold over blocks*codes*dim nodes at every
    // optimizer visit, which dominates planning for large codebooks
    call_function("pq_encode", arr,
      org.apache.spark.sql.functions.typedlit(cb))
  }
  /** struct(codes, d2s) residual PQ assignment of `arr − sel` against a
    * literal codebook; `sel` is a full-width array column.
    */
  def pqResEncodeCol(spark: SparkSession, arr: Column, sel: Column,
      cb: Seq[Seq[Seq[Long]]]): Column = {
    register(spark)
    call_function("pq_res_encode", arr, sel,
      org.apache.spark.sql.functions.typedlit(cb))
  }
}
