package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native Catalyst expressions for the vector hot path (SURVEY.md §7.3:
  * similarity/dedup are the north-star ops that must survive 100 TB).
  *
  * `aggregate(zip_with(a, b, *), 0.0, +)` is semantically right but runs as
  * interpreted lambda calls per element — on an all-pairs similarity join
  * that's billions of virtual calls. These expressions generate a tight
  * primitive loop inside whole-stage codegen instead (preference order (b)
  * in the build contract: custom Expression before UDF).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // declared input types: getDouble over an array<float>'s 4-byte layout
  // would silently read garbage — the analyzer now casts (or fails) instead
  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
}

/** L2 norm via the same codegen'd loop. */
case class L2Norm(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override protected def withNewChildInternal(c: Expression): L2Norm = copy(child = c)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.getDouble($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })
}

/** Static helper shared by `eval` and generated code (same pattern as
  * TextHashes): SRP-LSH bucket per hash table — bit (t,b) is the sign of
  * the projection onto a deterministic ±1 vector r(t,b,·). One tight
  * primitive loop per vector instead of tables × nBits nested interpreted
  * lambdas.
  *
  * The sign family is a multiplicative scramble, not murmur3: with
  * seed = t·4096+b and P = 2³¹−1,
  *   q = ((seed+1)·2654435761 mod P) · ((i+1)·40503 + 17 mod P) mod P,
  * r = +1 iff bit 13 of q — exact int64 arithmetic a DuckDB oracle
  * computes verbatim (both factors are < P, so the product stays < 2⁶² —
  * no overflow in either engine), which is what lets
  * `dedup_embedding_lsh` replay the whole bucketing (murmur signs were
  * engine-private and forced the gate down to a rows-only check). The
  * seed-factor × index-factor PRODUCT is load-bearing: an affine
  * seed+index form makes consecutive hyperplanes differ by a constant
  * shift, which bit 13 preserves — measured 0.44 mean |corr| between
  * same-table hyperplanes and a 25× candidate-pair blowup vs this
  * family's 0.07/random-baseline buckets. Projection sums run
  * index-ascending so the replay adds the same IEEE doubles in the same
  * order; the sign is ulp-fragile only when the projection is ~0, and
  * every decision the output depends on is margin-safe (verified pairs
  * sit at cos ≫ threshold). */
object VectorHashes {
  def srpBuckets(v: ArrayData, nBits: Int, tables: Int): ArrayData = {
    val dim = v.numElements()
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var b = 0
      while (b < nBits) {
        val sa = ((t * 4096 + b + 1).toLong * 2654435761L) % 2147483647L
        var s = 0.0
        var i = 0
        while (i < dim) {
          val xi = ((i + 1).toLong * 40503L + 17L) % 2147483647L
          val q = (sa * xi) % 2147483647L
          val r = if (((q >> 13) & 1L) == 1L) 1.0 else -1.0
          s += v.getDouble(i) * r
          i += 1
        }
        bucket = (bucket << 1) | (if (s > 0) 1 else 0)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** `srp_sig(vec, nBits, tables)` — array<double> → array<int> of length
  * `tables`: the vector's SRP-LSH bucket in each hash table. */
case class SrpSig(child: Expression, nBits: Int, tables: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def withNewChildInternal(c: Expression): SrpSig = copy(child = c)
  override def nullSafeEval(a: Any): Any =
    VectorHashes.srpBuckets(a.asInstanceOf[ArrayData], nBits, tables)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorHashes.srpBuckets($a, $nBits, $tables);")
}

/** Driver-side-model centroid assignment, as one primitive loop. */
object CentroidOps {
  /** Nearest centroid of `v` against a literal model — a BIT-EXACT replica
    * of the former broadcast plan `min(struct(1.0 - vec_cosine(v, cvec),
    * centroid_id))`, kept replayable so every quantizer-consuming oracle
    * (similarity_ivf, cluster_stats, dedup_semantic CTE chains) stays
    * hash-green:
    *  - dot and norm accumulate index-ascending (DotProduct/L2Norm order);
    *  - dot length = min(|v|, |c|) (DotProduct's contract);
    *  - a zero denominator yields a NULL cosine (vec_cosine's CaseWhen) →
    *    a null dist field, which Spark's ascending struct order ranks
    *    BEFORE every non-null dist;
    *  - double comparison is Spark's SQLOrderingUtil semantics (`==` first
    *    so 0.0 equals -0.0, then Double.compare so NaN ranks greatest);
    *  - ties break on ascending centroid id.
    * The former plan materialized n·k rows through a crossJoin + min
    * aggregate — 313M rows and most of the gate's 788 cpu-s at the sf10
    * ritual; this is the same answer in one narrow pass. */
  def nearest(v: ArrayData, cents: Array[Array[Double]], ids: Array[Long]): Long = {
    val dim = v.numElements()
    var sv = 0.0
    var i = 0
    while (i < dim) { val x = v.getDouble(i); sv += x * x; i += 1 }
    val nv = math.sqrt(sv)
    var first = true
    var bestId = 0L
    var bestDist = 0.0
    var bestNull = false
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      var sc = 0.0
      var j = 0
      while (j < cv.length) { val x = cv(j); sc += x * x; j += 1 }
      val n = math.min(dim, cv.length)
      var d = 0.0
      var l = 0
      while (l < n) { d += v.getDouble(l) * cv(l); l += 1 }
      val denom = nv * math.sqrt(sc)
      val isNull = denom == 0.0
      val dist = if (isNull) 0.0 else 1.0 - d / denom
      val id = ids(c)
      val better =
        if (first) true
        else if (isNull != bestNull) isNull // null dist sorts first (asc)
        else if (isNull) id < bestId
        else {
          val cmp =
            if (dist == bestDist) 0 else java.lang.Double.compare(dist, bestDist)
          cmp < 0 || (cmp == 0 && id < bestId)
        }
      if (better) { first = false; bestId = id; bestDist = dist; bestNull = isNull }
      c += 1
    }
    bestId
  }
}

/** `nearest_centroid(vec)` against a driver-side literal centroid model:
  * array<double> → the winning centroid id. See [[CentroidOps.nearest]]
  * for the exactness contract. The model arrays ride as codegen reference
  * objects (NOT an expression tree — a k=782 literal-struct argmin blows
  * the codegen method limit and falls back to the interpreter). */
case class NearestCentroid(child: Expression, cents: Array[Array[Double]],
                           ids: Array[Long])
    extends UnaryExpression with ImplicitCastInputTypes {
  require(cents.nonEmpty && cents.length == ids.length,
    "nearest_centroid: need a non-empty model with one id per centroid")
  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override protected def withNewChildInternal(c: Expression): NearestCentroid =
    copy(child = c)
  override def nullSafeEval(a: Any): Any =
    CentroidOps.nearest(a.asInstanceOf[ArrayData], cents, ids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val idsRef = ctx.addReferenceObj("ids", ids, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.CentroidOps.nearest($a, $centsRef, $idsRef);")
  }
}

object VectorExpressions {
  /** Column builders (expect `array<double>` inputs). */
  private def toExpr(c: Column): Expression = ColumnBridge.expression(c)
  def nearest_centroid(v: Column, model: Seq[(Long, Seq[Double])]): Column =
    ColumnBridge.column(NearestCentroid(toExpr(v),
      model.map(_._2.toArray).toArray, model.map(_._1).toArray))
  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(toExpr(a), toExpr(b)))
  def vec_norm(a: Column): Column = ColumnBridge.column(L2Norm(toExpr(a)))
  /** Cosine similarity, null-safe on degenerate vectors: a zero-norm
    * embedding (empty array, or an all-zeros vector from a failed encode)
    * has no defined direction, and under ANSI mode (Spark 4 default) the
    * naive `dot/(‖a‖·‖b‖)` kills the whole job with DIVIDE_BY_ZERO the
    * first time one appears — at corpus scale, that's a certainty, not an
    * edge case. CaseWhen evaluates the division only on the non-zero
    * branch, so the guard costs nothing on the hot path. */
  def vec_cosine(a: Column, b: Column): Column = {
    val denom = vec_norm(a) * vec_norm(b)
    org.apache.spark.sql.functions.when(denom =!= 0.0, vec_dot(a, b) / denom)
  }
  def srp_sig(a: Column, nBits: Int, tables: Int): Column =
    ColumnBridge.column(SrpSig(toExpr(a), nBits, tables))

  /** SQL registration: `vec_dot(a, b)`, `vec_norm(a)`. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => {
        require(exprs.length == 2, s"vec_dot expects 2 arguments, got ${exprs.length}")
        DotProduct(exprs(0), exprs(1))
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_norm", exprs => {
        require(exprs.length == 1, s"vec_norm expects 1 argument, got ${exprs.length}")
        L2Norm(exprs.head)
      }, "built-in")
  }
}
