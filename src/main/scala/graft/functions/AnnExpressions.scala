package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Compact codegen'd kernels for the ANN hot paths (sign-LSH bucketing,
  * centroid ranking, PQ encode, ADC table build + lookup).
  *
  * Why these exist: the previous formulation built each of these as an
  * UNROLLED literal-expression tree — `tables × planes` dot products for
  * LSH buckets, `nlist` for centroid argmax, `m × ksub` (128 at the
  * defaults) for PQ encode and the ADC tables. Fused into the enclosing
  * stage (typically a `GenerateExec` consume after an `explode`), the
  * generated Java method blew janino's 64 KB body limit — Spark recovered
  * by falling back to INTERPRETED execution for exactly the hottest ANN
  * stages (29 `Code grows beyond 64 KB` compile failures in a full test
  * run; q91/q92 paid the constant factor).
  *
  * The fix is structural, not a split: each kernel is ONE static JVM
  * method looping over a constant tensor (`ctx.addReferenceObj`), and the
  * generated code is a single static call — method size is O(1) in
  * tables/planes/nlist/m/ksub, whole-stage codegen always survives, and
  * HotSpot JITs the loop once (same machine code janino-generated loops
  * would reach, without the per-parameter code-size cliff).
  *
  * Numeric semantics are bit-identical to the expression trees they
  * replace: dot products accumulate left-to-right like
  * [[DotProduct.doGenCode]], double ordering is Spark's SQL ordering
  * (`SQLOrderingUtil.compareDoubles`: -0.0 == 0.0, NaN greatest,
  * NaN == NaN), and ties rank the smaller centroid id first exactly like
  * `array_sort`/`array_min` over (score, cid) structs. The one deliberate
  * change: a NULL vector (or a null element — unreachable after
  * [[L2Normalize]], which nulls whole arrays) now yields a NULL result
  * instead of a degenerate bucket/cell list, so downstream `explode`s drop
  * the row immediately rather than funneling every null vector into one
  * hot bucket and discarding it at the cosine filter. Final results are
  * unchanged (degenerate similarities were already filtered); the plan
  * just stops carrying the rows.
  */
object AnnKernels {

  /** Spark's SQL double ordering, called directly (not re-derived, so a
    * Spark upgrade can never drift the kernels' tie-breaks from the
    * expression trees they replaced): -0.0 == 0.0, NaN greatest,
    * NaN == NaN. */
  def cmpDouble(x: Double, y: Double): Int =
    org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles(x, y)

  /** Copy to a primitive array; null on a null element (post-normalize
    * vectors are containsNull=false, so this check never fires in the
    * query paths — it guards hand-built frames). */
  private def toVec(a: ArrayData): Array[Double] = {
    val n = a.numElements()
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
    a.toDoubleArray()
  }

  /** min-length dot product, the [[DotProduct]] accumulation order. */
  private def dot(v: Array[Double], w: Array[Double]): Double = {
    val n = math.min(v.length, w.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += v(i) * w(i); i += 1 }
    s
  }

  /** Dot of v[off until off+len (clamped)] against w — the
    * `dotp(slice(v, off+1, len), w)` semantics (slice past the end
    * shortens; dot runs over the min length). */
  private def dotSub(v: Array[Double], off: Int, len: Int,
                     w: Array[Double]): Double = {
    val n = math.min(math.min(len, w.length), math.max(v.length - off, 0))
    var s = 0.0
    var i = 0
    while (i < n) { s += v(off + i) * w(i); i += 1 }
    s
  }

  /** Sign-LSH bucket ids for ALL tables: bucket(t) = Σ_p (v·plane(t,p) > 0
    * ? 1L<<p : 0). NaN projections contribute a 0 bit (NaN > 0 is false),
    * exactly like the `when(dotp > 0, …)` chain this replaces. */
  def signLshBuckets(a: ArrayData,
                     tensor: Array[Array[Array[Double]]]): ArrayData = {
    val vec = toVec(a)
    if (vec == null) return null
    val out = new Array[Long](tensor.length)
    var t = 0
    while (t < tensor.length) {
      val planes = tensor(t)
      var b = 0L
      var p = 0
      while (p < planes.length) {
        if (dot(vec, planes(p)) > 0.0) b += 1L << p
        p += 1
      }
      out(t) = b
      t += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Top-`top` centroid ids by dot product, descending, ties by smaller
    * id, NaN similarities last — the `slice(transform(array_sort(
    * struct(-sim, cid)), cid), 1, top)` selection. O(nlist·top) scan,
    * no allocation beyond the two small arrays. */
  def nearestCells(a: ArrayData, cents: Array[Array[Double]],
                   top: Int): ArrayData = {
    val vec = toVec(a)
    if (vec == null) return null
    val k = cents.length
    val neg = new Array[Double](k)
    var j = 0
    while (j < k) { neg(j) = -dot(vec, cents(j)); j += 1 }
    val n = math.max(math.min(top, k), 0)
    val out = new Array[Int](n)
    val used = new Array[Boolean](k)
    var r = 0
    while (r < n) {
      var best = -1
      var c = 0
      while (c < k) {
        if (!used(c) && (best < 0 || cmpDouble(neg(c), neg(best)) < 0)) best = c
        c += 1
      }
      used(best) = true
      out(r) = best
      r += 1
    }
    ArrayData.toArrayData(out)
  }

  /** PQ codes for all `m` subspaces: per subspace the argmin-L2 centroid
    * with the query-independent |v_s|² dropped (d = |c|² − 2·v_s·c), ties
    * to the smaller cid, NaN distances never win (Spark's array_min over
    * (d, cid) structs). `c2(s)(c)` is the precomputed |c|². */
  def pqEncode(a: ArrayData, cb: Array[Array[Array[Double]]],
               c2: Array[Array[Double]]): ArrayData = {
    val vec = toVec(a)
    if (vec == null) return null
    val m = cb.length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cents = cb(s)
      val dsub = if (cents.length > 0) cents(0).length else 0
      val off = s * dsub
      var bestC = 0
      var bestD = c2(s)(0) - 2.0 * dotSub(vec, off, dsub, cents(0))
      var c = 1
      while (c < cents.length) {
        val d = c2(s)(c) - 2.0 * dotSub(vec, off, dsub, cents(c))
        if (cmpDouble(d, bestD) < 0) { bestD = d; bestC = c }
        c += 1
      }
      out(s) = bestC
      s += 1
    }
    ArrayData.toArrayData(out)
  }

  /** ADC distance tables for a query (residual) vector: out(s)(c) =
    * |c|² − 2·q_s·c, the per-(query, subspace) lookup table ADC scoring
    * reads per candidate code. m × ksub doubles — built once per
    * (query, probed cell) row on the broadcast side. */
  def adcTables(a: ArrayData, cb: Array[Array[Array[Double]]],
                c2: Array[Array[Double]]): ArrayData = {
    val vec = toVec(a)
    if (vec == null) return null
    val m = cb.length
    val rows = new Array[Any](m)
    var s = 0
    while (s < m) {
      val cents = cb(s)
      val dsub = if (cents.length > 0) cents(0).length else 0
      val off = s * dsub
      val row = new Array[Double](cents.length)
      var c = 0
      while (c < cents.length) {
        row(c) = c2(s)(c) - 2.0 * dotSub(vec, off, dsub, cents(c))
        c += 1
      }
      rows(s) = ArrayData.toArrayData(row)
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  /** Σ_s dtab(s)(codes(s)) — the per-candidate ADC lookup sum, replacing
    * the m-way `element_at(dtab_s, code_s + 1)` chain. Null (boxed) on a
    * null/short/out-of-range code, matching element_at's out-of-bounds
    * null. Left-to-right accumulation like the `reduce(_ + _)` chain. */
  def adcSum(dtab: ArrayData, codes: ArrayData): java.lang.Double = {
    val m = dtab.numElements()
    if (codes.numElements() < m) return null
    var s = 0
    var acc = 0.0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val code = codes.getInt(s)
      val row = dtab.getArray(s)
      if (code < 0 || code >= row.numElements()) return null
      acc += row.getDouble(code)
      s += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/** Sign-LSH bucket ids for all tables as one array<long> column. */
final case class SignLshBuckets(child: Expression,
                                tensor: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "sign_lsh_buckets"

  override protected def nullSafeEval(input: Any): Any =
    AnnKernels.signLshBuckets(input.asInstanceOf[ArrayData], tensor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val t = ctx.addReferenceObj("lshTensor", tensor, "double[][][]")
      val r = ctx.freshName("r")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.AnnKernels.signLshBuckets($v, $t);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignLshBuckets =
    copy(child = newChild)
}

/** Top-n nearest centroid ids as one array<int> column. */
final case class NearestCells(child: Expression,
                              cents: Array[Array[Double]], top: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cells"

  override protected def nullSafeEval(input: Any): Any =
    AnnKernels.nearestCells(input.asInstanceOf[ArrayData], cents, top)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val c = ctx.addReferenceObj("centroids", cents, "double[][]")
      val r = ctx.freshName("r")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.AnnKernels.nearestCells($v, $c, $top);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

/** All m PQ codes of a vector as one array<int> column. */
final case class PqEncodeCodes(child: Expression,
                               codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  @transient private lazy val c2: Array[Array[Double]] =
    codebooks.map(_.map(c => c.map(x => x * x).sum))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any =
    AnnKernels.pqEncode(input.asInstanceOf[ArrayData], codebooks, c2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
      val cc = ctx.addReferenceObj("pqC2", c2, "double[][]")
      val r = ctx.freshName("r")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.AnnKernels.pqEncode($v, $cb, $cc);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncodeCodes =
    copy(child = newChild)
}

/** ADC distance tables (m × ksub) for a query vector as one
  * array<array<double>> column. */
final case class AdcDistanceTables(child: Expression,
                                   codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  @transient private lazy val c2: Array[Array[Double]] =
    codebooks.map(_.map(c => c.map(x => x * x).sum))

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "adc_tables"

  override protected def nullSafeEval(input: Any): Any =
    AnnKernels.adcTables(input.asInstanceOf[ArrayData], codebooks, c2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
      val cc = ctx.addReferenceObj("pqC2", c2, "double[][]")
      val r = ctx.freshName("r")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.AnnKernels.adcTables($v, $cb, $cc);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AdcDistanceTables =
    copy(child = newChild)
}

/** Per-candidate ADC score: Σ_s dtab(s)(code(s)). The hot expression of
  * PQ serving — one static call per (query, candidate) row. */
final case class AdcLookupSum(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_sum"

  override protected def nullSafeEval(dtab: Any, codes: Any): Any =
    AnnKernels.adcSum(dtab.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, c) => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Double $r = graft.functions.AnnKernels.adcSum($d, $c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcLookupSum =
    copy(left = newLeft, right = newRight)
}

object AnnExpressions {
  /** Sign-LSH bucket ids for all tables (array<long>, one per table). */
  def signLshBuckets(vec: Column, tensor: Array[Array[Array[Double]]]): Column =
    Bridge.column(SignLshBuckets(Bridge.expression(vec), tensor))

  /** Top-n nearest centroid ids (array<int>), descending similarity. */
  def nearestCells(vec: Column, cents: Array[Array[Double]], top: Int): Column =
    Bridge.column(NearestCells(Bridge.expression(vec), cents, top))

  /** All m PQ codes (array<int>). */
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqEncodeCodes(Bridge.expression(vec), codebooks))

  /** ADC distance tables (array<array<double>>, m × ksub). */
  def adcTables(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    Bridge.column(AdcDistanceTables(Bridge.expression(vec), codebooks))

  /** Σ_s dtab(s)(code(s)) — the per-candidate ADC lookup sum. */
  def adcSum(dtab: Column, codes: Column): Column =
    Bridge.column(AdcLookupSum(Bridge.expression(dtab), Bridge.expression(codes)))
}
