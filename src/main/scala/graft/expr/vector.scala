package graft.expr

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Native Catalyst expression for the vector hot path (SURVEY.md §7.4).
  *
  * The higher-order-function composition (`aggregate(zip_with(a,b,*),+)`)
  * is semantically right but physically interpreted: HOFs are
  * CodegenFallback, so every pair evaluation allocates a lambda frame and
  * an intermediate 64-element array — measured as the dominant cost of the
  * similarity queries. This expression is the engine's "custom Expression
  * with doGenCode beats UDF beats nothing" tier: a fused dot-product loop
  * over the two `ArrayData` values, participating in whole-stage codegen,
  * zero intermediate allocation.
  *
  * Summation order is ascending index — identical to the HOF fold it
  * replaces and to the DuckDB oracle's list order, so results are
  * bit-identical and the oracle SQL is unchanged. Null semantics also
  * mirror the HOF exactly (a requirement for [[FuseDotProduct]] to be a
  * valid rewrite): mismatched lengths or any null element yield NULL,
  * the same poisoning `zip_with` padding + null-propagating `*`/`+`
  * produce; an empty pair yields the fold's zero, 0.0.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // SQL-registered: a non-double-array argument must fail ANALYSIS, not
  // reach getDouble over arbitrary bytes at runtime (call sites widen
  // float arrays explicitly before constructing the expression)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires two array<double>, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** JVM-lifetime memo of the random-hyperplane sign words: entry i of
  * `get(seed, n)` is the md5-u64 prefix of `"hp:<seed>:<i>"`
  * ([[Md5U64]] — the engine-boundary basis shared with SimHash64), so
  * bit j of entry i is plane j's ±1 component at dimension i. The md5
  * basis (r14, replacing per-row `xxhash64(i, seed)`) is what makes
  * `sim_ann_lsh` oracle-replayable: DuckDB computes the identical word
  * from `CAST('0x' || substr(md5('hp:' || seed || ':' || i), 1, 16) AS
  * UBIGINT)`. The table is a pure function of (seed, i) — memoizing it
  * is semantics-free — and sized by the widest vector seen: one CHM
  * read per ROW replaces 64 hash calls per row, so the rebase is also
  * a (small) win on the sketch pass itself. Grown geometrically under
  * a lock; entries never change, so a stale narrower array read race
  * is benign (the widest request re-resolves under the lock).
  */
object HyperplanePlanes {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Long]]()
  def get(seed: Long, n: Int): Array[Long] = {
    val cur = cache.get(seed)
    if (cur != null && cur.length >= n) cur
    else cache.synchronized {
      val c2 = cache.get(seed)
      if (c2 != null && c2.length >= n) c2
      else {
        val m = math.max(n,
          math.max(64, if (c2 == null) 0 else c2.length * 2))
        val arr = new Array[Long](m)
        var i = 0
        while (i < m) {
          arr(i) = Md5U64.hash(
            org.apache.spark.unsafe.types.UTF8String
              .fromString(s"hp:$seed:$i"))
          i += 1
        }
        cache.put(seed, arr)
        arr
      }
    }
  }
}

/** 64-bit random-hyperplane sign sketch over an array<double> vector
  * (SimHash for the continuous case): plane j's component at dimension i
  * is ±1 drawn from bit j of the md5-u64 of `"hp:<seed>:<i>"`
  * ([[HyperplanePlanes]] — deterministic, shared by every row,
  * memoized once per JVM, DuckDB-expressible) — and bit j of the
  * sketch is the sign of
  * `Σ_i v(i) · plane_j(i)`. Vectors at angle θ collide per bit with
  * probability 1 − θ/π (Goemans–Williamson), so fixed-width bands of the
  * sketch give an equi-joinable LSH bucket key for approximate
  * nearest-neighbor search — the same candidate-generation shape as the
  * text sketches. Band width is the consumer's selectivity/recall dial —
  * see `sim_ann_lsh` for the capacity math that sizes it.
  *
  * `seed` selects an independent hyperplane family: two seeds give two
  * independent 64-bit sketches, i.e. a 128-bit sketch as two longs —
  * the r12 capacity fix for `sim_ann_lsh`, whose 64-bit key space
  * saturated at the sf10 decade (2¹⁶-value band vocabulary at 200 k
  * vectors). Collision probability per bit is 1 − θ/π regardless of
  * seed, so the concatenated sketch keeps the Goemans–Williamson
  * geometry with double the concentration.
  *
  * One codegen'd pass: per dimension one 8-byte hash + 64 signed
  * accumulator updates; null elements contribute nothing (same contract
  * as [[MinHashSignature]]).
  */
case class SignSketch64(child: Expression, seed: Long = 42L)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_sketch64 requires array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_sketch64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val acc = new Array[Double](64)
    val n = arr.numElements()
    val planes = HyperplanePlanes.get(seed, n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = arr.getDouble(i)
        val h = planes(i)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) acc(j) += x else acc(j) -= x
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (acc(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val acc = ctx.freshName("acc")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val h = ctx.freshName("h")
      val pl = ctx.freshName("planes")
      val sig = ctx.freshName("sig")
      s"""
         |double[] $acc = new double[64];
         |int $n = $a.numElements();
         |long[] $pl = graft.expr.HyperplanePlanes.get(${seed}L, $n);
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) continue;  // null dim: no vote
         |  double $x = $a.getDouble($i);
         |  long $h = $pl[$i];
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($h >>> $j) & 1L) == 1L) $acc[$j] += $x; else $acc[$j] -= $x;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($acc[$j] > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distance scoring of one vector against a PACKED centroid relation —
  * the map-side heart of the IVF index (`sim_ivf_train` /
  * `sim_ann_ivf_trained`): given `v: array<double>` and
  * `cents: array<struct<cid:int, c:array<double>>>` (the K centroids
  * collected into ONE broadcastable row), returns
  * `array<struct<cid:int, d2:double>>` sorted by (d², cid) ascending —
  * element 0 is the argmin assignment, a front slice is the multi-probe
  * set. Packing the centroids into a scalar turns both assignment and
  * probe selection into pure per-row projections: the declarative
  * alternative (crossJoin with a K-row relation + groupBy(vec_id)
  * min_by) re-shuffles the whole corpus — vectors and all — once per
  * k-means round, which is exactly the shuffle a 100 TB training loop
  * cannot afford.
  *
  * One codegen'd pass: K fused subtract-square loops, insertion sort
  * over at most K (cid, d²) pairs, zero per-element allocation. Null
  * semantics: a null element in `v` poisons the result to NULL (same
  * discipline as [[DotProduct]]); a null / dimension-mismatched centroid
  * entry is skipped as a candidate, so the result can be EMPTY but never
  * silently wrong.
  */
case class CentroidScores(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _),
            ArrayType(StructType(Array(
              StructField(_, IntegerType, _, _),
              StructField(_, ArrayType(DoubleType, _), _, _))), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"centroid_scores requires array<double> and " +
          s"array<struct<int, array<double>>>, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cid", IntegerType, nullable = false),
    StructField("d2", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "centroid_scores"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    val n = v.numElements()
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return null; i += 1 }
    val kMax = cents.numElements()
    val cids = new Array[Int](kMax)
    val d2s = new Array[Double](kMax)
    var m = 0
    var k = 0
    while (k < kMax) {
      if (!cents.isNullAt(k)) {
        val cr = cents.getStruct(k, 2)
        if (!cr.isNullAt(0) && !cr.isNullAt(1)) {
          val c = cr.getArray(1)
          if (c.numElements() == n) {
            var d2 = 0.0
            var ok = true
            var j = 0
            while (j < n && ok) {
              if (c.isNullAt(j)) ok = false
              else {
                val diff = v.getDouble(j) - c.getDouble(j)
                d2 += diff * diff
                j += 1
              }
            }
            // NaN d2 (an Inf/NaN embedding or centroid) is SKIPPED like
            // the other malformed-centroid cases: every NaN comparison
            // is false, so an inserted NaN would sit at element 0 and
            // become the argmin — "can be empty but never silently
            // wrong" (review finding r10)
            if (ok && !java.lang.Double.isNaN(d2)) {
              val cid = cr.getInt(0)
              var pos = m
              while (pos > 0 && (d2s(pos - 1) > d2 ||
                  (d2s(pos - 1) == d2 && cids(pos - 1) > cid))) {
                d2s(pos) = d2s(pos - 1); cids(pos) = cids(pos - 1); pos -= 1
              }
              d2s(pos) = d2; cids(pos) = cid; m += 1
            }
          }
        }
      }
      k += 1
    }
    val out = new Array[Any](m)
    k = 0
    while (k < m) {
      out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](cids(k), d2s(k)))
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val row = "org.apache.spark.sql.catalyst.expressions.GenericInternalRow"
      val arr = "org.apache.spark.sql.catalyst.util.GenericArrayData"
      val ir = "InternalRow"
      val ad = classOf[ArrayData].getName
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val kMax = ctx.freshName("kMax")
      val k = ctx.freshName("k")
      val m = ctx.freshName("m")
      val cids = ctx.freshName("cids")
      val d2s = ctx.freshName("d2s")
      val cr = ctx.freshName("cr")
      val c = ctx.freshName("c")
      val d2 = ctx.freshName("d2")
      val ok = ctx.freshName("ok")
      val j = ctx.freshName("j")
      val diff = ctx.freshName("diff")
      val cid = ctx.freshName("cid")
      val pos = ctx.freshName("pos")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |}
         |if (!${ev.isNull}) {
         |  int $kMax = $b.numElements();
         |  int[] $cids = new int[$kMax];
         |  double[] $d2s = new double[$kMax];
         |  int $m = 0;
         |  for (int $k = 0; $k < $kMax; $k++) {
         |    if ($b.isNullAt($k)) continue;
         |    $ir $cr = $b.getStruct($k, 2);
         |    if ($cr.isNullAt(0) || $cr.isNullAt(1)) continue;
         |    $ad $c = $cr.getArray(1);
         |    if ($c.numElements() != $n) continue;
         |    double $d2 = 0.0;
         |    boolean $ok = true;
         |    for (int $j = 0; $j < $n; $j++) {
         |      if ($c.isNullAt($j)) { $ok = false; break; }
         |      double $diff = $a.getDouble($j) - $c.getDouble($j);
         |      $d2 += $diff * $diff;
         |    }
         |    if (!$ok || Double.isNaN($d2)) continue;
         |    int $cid = $cr.getInt(0);
         |    int $pos = $m;
         |    while ($pos > 0 && ($d2s[$pos - 1] > $d2 ||
         |        ($d2s[$pos - 1] == $d2 && $cids[$pos - 1] > $cid))) {
         |      $d2s[$pos] = $d2s[$pos - 1]; $cids[$pos] = $cids[$pos - 1]; $pos--;
         |    }
         |    $d2s[$pos] = $d2; $cids[$pos] = $cid; $m++;
         |  }
         |  Object[] $out = new Object[$m];
         |  for (int $k = 0; $k < $m; $k++) {
         |    $out[$k] = new $row(new Object[]{$cids[$k], $d2s[$k]});
         |  }
         |  ${ev.value} = new $arr($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Fused dot product over two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** 64-bit hyperplane sign sketch of an array<double> vector; distinct
    * `seed`s draw independent hyperplane families (see [[SignSketch64]]).
    */
  def signSketch64(v: Column, seed: Long = 42L): Column =
    GraftSqlBridge.column(SignSketch64(GraftSqlBridge.expression(v), seed))

  /** (cid, d²) of every packed centroid, sorted by (d², cid) ascending. */
  def centroidScores(v: Column, cents: Column): Column =
    GraftSqlBridge.column(CentroidScores(
      GraftSqlBridge.expression(v), GraftSqlBridge.expression(cents)))
}
