package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for vector math over ARRAY<FLOAT|DOUBLE>
  * (SURVEY §4.2-2). The `zip_with`/`aggregate` built-ins are semantically
  * right but their lambdas are interpreted (`ArrayAggregate.eval` is not
  * codegen'd) — measured >100× slower inside pairwise joins. These fuse the
  * whole fold into one generated loop over the unsafe array data: no
  * per-element boxing, no intermediate array, whole-stage-codegen friendly.
  *
  * Determinism contract (shared with the DuckDB oracle): accumulate in
  * double, strictly left-to-right, elements 0..n-1 — identical operation
  * order to the `aggregate(zip_with(...))` formulation and to
  * `list_sum(list_transform(...))`, so results are bit-equal.
  *
  * Semantics: null array → null; null element → null; length mismatch →
  * folds the common prefix (the arrays in this engine are fixed-dim).
  */
abstract class PairFoldExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<FLOAT|DOUBLE> args, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  protected def getD(arr: ArrayData, i: Int, t: DataType): Double =
    if (t == FloatType) arr.getFloat(i).toDouble else arr.getDouble(i)

  protected def genGet(arr: String, i: String, t: DataType): String =
    if (t == FloatType) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"

  /** Codegen pieces, parameterized on three fresh accumulator names so two
    * instances inside one generated method can't collide. */
  protected def accDecl(a1: String, a2: String, a3: String): String
  protected def accUpdate(x: String, y: String, a1: String, a2: String, a3: String): String
  protected def accResult(a1: String, a2: String, a3: String): String
  /** Interpreted twin of the generated loop. */
  protected def evalLoop(a: ArrayData, b: ArrayData, lt: DataType, rt: DataType, n: Int): Any

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    evalLoop(a, b, elemType(left), elemType(right),
      math.min(a.numElements(), b.numElements()))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val a1 = ctx.freshName("acc1"); val a2 = ctx.freshName("acc2"); val a3 = ctx.freshName("acc3")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${accDecl(a1, a2, a3)}
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final double $x = ${genGet(a, i, elemType(left))};
         |  final double $y = ${genGet(b, i, elemType(right))};
         |  ${accUpdate(x, y, a1, a2, a3)}
         |}
         |if (!${ev.isNull}) { ${ev.value} = ${accResult(a1, a2, a3)}; }
         |""".stripMargin
    })
}

/** Σ (a_i − b_i)² — the reference's vector distance (squared L2; hnswlib
  * space='l2' and faiss.IndexFlatL2 both return it, local_db.py:42–48). */
case class SquaredL2(left: Expression, right: Expression) extends PairFoldExpression {
  override def prettyName: String = "vec_squared_l2"
  protected def accDecl(a1: String, a2: String, a3: String) =
    s"double $a1 = 0.0; double $a2 = 0.0;"
  protected def accUpdate(x: String, y: String, a1: String, a2: String, a3: String) =
    s"$a2 = $x - $y; $a1 += $a2 * $a2;"
  protected def accResult(a1: String, a2: String, a3: String) = a1
  protected def evalLoop(a: ArrayData, b: ArrayData, lt: DataType, rt: DataType, n: Int): Any = {
    var s = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = getD(a, i, lt) - getD(b, i, rt); s += d * d; i += 1
    }
    s
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ a_i·b_i */
case class DotProduct(left: Expression, right: Expression) extends PairFoldExpression {
  override def prettyName: String = "vec_dot"
  protected def accDecl(a1: String, a2: String, a3: String) = s"double $a1 = 0.0;"
  protected def accUpdate(x: String, y: String, a1: String, a2: String, a3: String) =
    s"$a1 += $x * $y;"
  protected def accResult(a1: String, a2: String, a3: String) = a1
  protected def evalLoop(a: ArrayData, b: ArrayData, lt: DataType, rt: DataType, n: Int): Any = {
    var s = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += getD(a, i, lt) * getD(b, i, rt); i += 1
    }
    s
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** dot(a,b) / (‖a‖·‖b‖) in one fused pass (3 accumulators, 1 loop) —
  * replaces three separate interpreted folds in the pairwise hot path. */
case class CosineSim(left: Expression, right: Expression) extends PairFoldExpression {
  override def prettyName: String = "vec_cosine"
  protected def accDecl(a1: String, a2: String, a3: String) =
    s"double $a1 = 0.0; double $a2 = 0.0; double $a3 = 0.0;"
  protected def accUpdate(x: String, y: String, a1: String, a2: String, a3: String) =
    s"$a1 += $x * $y; $a2 += $x * $x; $a3 += $y * $y;"
  protected def accResult(a1: String, a2: String, a3: String) =
    s"$a1 / (java.lang.Math.sqrt($a2) * java.lang.Math.sqrt($a3))"
  protected def evalLoop(a: ArrayData, b: ArrayData, lt: DataType, rt: DataType, n: Int): Any = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = getD(a, i, lt); val y = getD(b, i, rt)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** argmin_c Σ (v_i − centroid_c_i)² — the IVF/k-means assignment kernel as a
  * codegen expression (r1 VERDICT minor #6: the Scala-UDF formulation ran
  * interpreted with per-row boxing). The centroid table is a broadcast-sized
  * constant (≤ nlist × dim doubles — the same thing FAISS holds in RAM)
  * carried as a plan reference object, so the generated code is one fused
  * double loop per row with zero allocation. Ties break to the lowest
  * cluster index (strict `<`), matching the driver-side probe order. */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  override def prettyName: String = "vec_nearest_centroid"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<FLOAT|DOUBLE> arg, got ${other.simpleString}")
  }

  private def elemT: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val isF = elemT == FloatType
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      val n = math.min(cen.length, arr.numElements())
      var d = 0.0; var i = 0
      while (i < n) {
        val x = (if (isF) arr.getFloat(i).toDouble else arr.getDouble(i)) - cen(i)
        d += x * x; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val get = if (elemT == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val c = ctx.freshName("c"); val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val d = ctx.freshName("d"); val x = ctx.freshName("x")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val cen = ctx.freshName("cen")
      s"""
         |int $best = 0; double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $cents.length; $c++) {
         |  final double[] $cen = $cents[$c];
         |  final int $n = java.lang.Math.min($cen.length, $v.numElements());
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $x = ((double) $v.$get($i)) - $cen[$i];
         |    $d += $x * $x;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = $best;
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All sign-random-projection band signatures in ONE fused pass: for band b
  * and bit k, bit = (Σ_i v_i · planes[b·bitsPerBand+k][i] > 0) ? '1' : '0';
  * output is one `bitsPerBand`-char string per band. The plane matrix rides
  * as a plan reference object (bands × bitsPerBand × dim doubles — constant-
  * sized, like [[NearestCentroid]]'s centroid table), so the generated code
  * is three nested double loops with zero allocation beyond the output
  * strings. Replaces a Project of bands × bitsPerBand separate dot
  * expressions over 64-element literal arrays, whose generated method was
  * the dominant janino-compile cost of the banded dedup funnel.
  * Accumulation is strictly left-to-right in double — bit-identical to
  * [[DotProduct]] and to the SQL oracle's `list_sum(list_transform(...))`. */
case class SignBands(child: Expression, planes: Array[Array[Double]], bitsPerBand: Int)
    extends UnaryExpression {
  require(planes.nonEmpty && planes.length % bitsPerBand == 0,
    "planes must hold bands × bitsPerBand rows")
  override def prettyName: String = "vec_sign_bands"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<FLOAT|DOUBLE> arg, got ${other.simpleString}")
  }

  private def elemT: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val isF = elemT == FloatType
    val nBands = planes.length / bitsPerBand
    val out = new Array[Any](nBands)
    var b = 0
    while (b < nBands) {
      val bytes = new Array[Byte](bitsPerBand)
      var k = 0
      while (k < bitsPerBand) {
        val p = planes(b * bitsPerBand + k)
        val n = math.min(p.length, arr.numElements())
        var d = 0.0; var i = 0
        while (i < n) {
          d += (if (isF) arr.getFloat(i).toDouble else arr.getDouble(i)) * p(i)
          i += 1
        }
        bytes(k) = if (d > 0) '1' else '0'
        k += 1
      }
      out(b) = org.apache.spark.unsafe.types.UTF8String.fromBytes(bytes)
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ps = ctx.addReferenceObj("planes", planes, "double[][]")
    val get = if (elemT == FloatType) "getFloat" else "getDouble"
    val nBands = planes.length / bitsPerBand
    nullSafeCodeGen(ctx, ev, v => {
      val b = ctx.freshName("b"); val k = ctx.freshName("k"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val d = ctx.freshName("d")
      val p = ctx.freshName("p"); val bytes = ctx.freshName("bytes")
      val out = ctx.freshName("out")
      s"""
         |final Object[] $out = new Object[$nBands];
         |for (int $b = 0; $b < $nBands; $b++) {
         |  final byte[] $bytes = new byte[$bitsPerBand];
         |  for (int $k = 0; $k < $bitsPerBand; $k++) {
         |    final double[] $p = $ps[$b * $bitsPerBand + $k];
         |    final int $n = java.lang.Math.min($p.length, $v.numElements());
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $d += ((double) $v.$get($i)) * $p[$i];
         |    }
         |    $bytes[$k] = $d > 0 ? (byte) '1' : (byte) '0';
         |  }
         |  $out[$b] = org.apache.spark.unsafe.types.UTF8String.fromBytes($bytes);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** |A ∩ B| of two SORTED, de-duplicated ARRAY<STRING> columns via a single
  * merge walk — the set-similarity verification kernel. The exploded-join
  * formulation (pair ⨝ shingles(a) ⨝ shingles(b) on (id, gram) + count)
  * shuffles |pairs| × |doc| rows; this joins each pair to TWO one-row-per-doc
  * array frames and intersects in ~|A|+|B| binary string compares, no
  * shuffle of per-gram rows at all. Inputs MUST be sorted ascending in
  * Spark's UTF8String binary order (`sort_array(array_distinct(...))`) —
  * the merge walk silently undercounts otherwise. */
case class SortedIntersectCount(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "sorted_intersect_count"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<STRING> args, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0L
    while (i < a.numElements() && j < b.numElements()) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val c = ctx.freshName("c")
      s"""
         |long $n = 0L; int $i = 0; int $j = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  final int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { $n++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points. */
object VectorExpr {
  private def c(e: Expression): Column = GraftColumnBridge.column(e)
  private def x(col: Column): Expression = GraftColumnBridge.expression(col)

  def squaredL2(a: Column, b: Column): Column = c(SquaredL2(x(a), x(b)))
  def dot(a: Column, b: Column): Column = c(DotProduct(x(a), x(b)))
  def cosine(a: Column, b: Column): Column = c(CosineSim(x(a), x(b)))
  def nearestCentroid(v: Column, centroids: Array[Array[Double]]): Column =
    c(NearestCentroid(x(v), centroids))
  def signBands(v: Column, planes: Array[Array[Double]], bitsPerBand: Int): Column =
    c(SignBands(x(v), planes, bitsPerBand))
  def sortedIntersectCount(a: Column, b: Column): Column =
    c(SortedIntersectCount(x(a), x(b)))
}
