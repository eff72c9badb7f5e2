package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StructField, StructType}

/** Native codegen vector kernels (SURVEY.md §2.11 similarity ops).
  *
  * The HOF formulation (`aggregate(zip_with(a, b, _*_), 0.0, _+_)` over
  * a `transform(_.cast(double))` view) is semantically right but slow
  * twice over: LambdaFunction expressions don't participate in
  * whole-stage codegen — one in a Project evicts the WHOLE projection
  * from the codegen span — and the cast/zip materialize two intermediate
  * arrays per row. These expressions read float or double ArrayData
  * directly (element float→double widening is exact) and generate a
  * fused multiply-add loop: no intermediate array, no lambda dispatch,
  * and the enclosing operator stays inside WholeStageCodegen.
  *
  * Summation order is strictly left-to-right, bit-identical to both the
  * HOF fold and the oracle's `list_reduce` over per-element
  * `CAST(x AS DOUBLE)` — required for cross-engine hash equality of
  * rounded cosine outputs.
  */
abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elemOk(t: DataType) = t match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _                                                  => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>/array<float> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  /** Java source accumulating into `ACC` given element expressions. */
  protected def kernel(x: String, y: String): String

  /** Scala mirror of the generated loop (interpreted fallback path). */
  protected def accumulate(x: Double, y: Double, acc: Double): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch ${x.numElements()} vs ${y.numElements()}")
    val lf = isFloat(left); val rf = isFloat(right)
    val n = x.numElements()
    var s = 0.0; var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s = accumulate(xv, yv, s)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val xe = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val ye = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
        |if ($a.numElements() != $b.numElements()) {
        |  throw new IllegalArgumentException("$prettyName: dimension mismatch "
        |    + $a.numElements() + " vs " + $b.numElements());
        |}
        |final int $n = $a.numElements();
        |double $s = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  ${kernel(xe, ye).replace("ACC", s)}
        |}
        |${ev.value} = $s;
      """.stripMargin
    })
}

/** Σ aᵢ·bᵢ over two float/double arrays. */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "graft_dot"
  protected def kernel(x: String, y: String): String = s"ACC += $x * $y;"
  protected def accumulate(x: Double, y: Double, acc: Double): Double = acc + x * y
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Σ (aᵢ−bᵢ)² — squared L2 distance. */
case class SquaredL2(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "graft_l2sq"
  protected def kernel(x: String, y: String): String =
    s"final double d = $x - $y; ACC += d * d;"
  protected def accumulate(x: Double, y: Double, acc: Double): Double = {
    val d = x - y; acc + d * d
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Signed-random-projection signature: packs the sign bits of
  * `planes · v` into `planes.length / bitsPerBand` per-band ints.
  *
  * One expression node instead of nPlanes × dim literal arrays — the
  * plane matrix rides along as a codegen reference object. (The literal
  * formulation made the analyzed plan tens of thousands of nodes; with
  * the self-join and verify joins multiplying it, Catalyst optimization
  * time dwarfed execution.)
  */
case class SrpSignature(child: Expression, planes: Array[Array[Double]],
                        bitsPerBand: Int) extends UnaryExpression {
  override def prettyName: String = "graft_srp_sig"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double>/array<float> input, got ${t.sql}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Int](planes.length / bitsPerBand)
    var p = 0
    while (p < planes.length) {
      val w = planes(p)
      val n = math.min(w.length, v.numElements())
      var s = 0.0; var d = 0
      while (d < n) {
        s += w(d) * (if (isFloat) v.getFloat(d).toDouble else v.getDouble(d))
        d += 1
      }
      if (s > 0) out(p / bitsPerBand) |= 1 << (p % bitsPerBand)
      p += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("planes", planes, "double[][]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val p = ctx.freshName("p"); val d = ctx.freshName("d")
      val s = ctx.freshName("s"); val w = ctx.freshName("w")
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      s"""
        |final double[][] ${w}s = $mat;
        |final int[] $out = new int[${planes.length / bitsPerBand}];
        |for (int $p = 0; $p < ${w}s.length; $p++) {
        |  final double[] $w = ${w}s[$p];
        |  final int $n = java.lang.Math.min($w.length, $v.numElements());
        |  double $s = 0.0;
        |  for (int $d = 0; $d < $n; $d++) {
        |    $s += $w[$d] * (double) $v.$get($d);
        |  }
        |  if ($s > 0) $out[$p / $bitsPerBand] |= 1 << ($p % $bitsPerBand);
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** IVF coarse-quantizer cell assignment: the indices of the `nprobe`
  * centroids with the highest dot product against the input vector
  * (centroids pre-normalized by the caller, so dot order = cosine
  * order), lowest index first on exact dot ties.
  *
  * Same packaging rationale as [[SrpSignature]]: the centroid matrix is
  * a codegen reference object, not literal arrays, so the K×dim
  * constants don't balloon the Catalyst tree; the K dots + nprobe-pass
  * selection run as one fused loop inside WholeStageCodegen.
  */
case class IvfCells(child: Expression, cents: Array[Array[Double]],
                    nprobe: Int) extends UnaryExpression {
  override def prettyName: String = "graft_ivf_cells"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double>/array<float> input, got ${t.sql}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dots = new Array[Double](cents.length)
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val n = math.min(c.length, v.numElements())
      var s = 0.0; var d = 0
      while (d < n) {
        s += c(d) * (if (isFloat) v.getFloat(d).toDouble else v.getDouble(d))
        d += 1
      }
      dots(j) = s
      j += 1
    }
    val out = new Array[Int](nprobe)
    var p = 0
    while (p < nprobe) {
      var best = -1; var bestDot = Double.NegativeInfinity
      var k = 0
      while (k < dots.length) {
        if (dots(k) > bestDot) { best = k; bestDot = dots(k) }
        k += 1
      }
      out(p) = best
      dots(best) = Double.NegativeInfinity
      p += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("cents", cents, "double[][]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val j = ctx.freshName("j"); val d = ctx.freshName("d")
      val s = ctx.freshName("s"); val c = ctx.freshName("c")
      val n = ctx.freshName("n"); val dots = ctx.freshName("dots")
      val out = ctx.freshName("out"); val p = ctx.freshName("p")
      val k = ctx.freshName("k"); val best = ctx.freshName("best")
      val bestDot = ctx.freshName("bestDot")
      s"""
        |final double[][] ${c}s = $mat;
        |final double[] $dots = new double[${c}s.length];
        |for (int $j = 0; $j < ${c}s.length; $j++) {
        |  final double[] $c = ${c}s[$j];
        |  final int $n = java.lang.Math.min($c.length, $v.numElements());
        |  double $s = 0.0;
        |  for (int $d = 0; $d < $n; $d++) {
        |    $s += $c[$d] * (double) $v.$get($d);
        |  }
        |  $dots[$j] = $s;
        |}
        |final int[] $out = new int[$nprobe];
        |for (int $p = 0; $p < $nprobe; $p++) {
        |  int $best = -1; double $bestDot = Double.NEGATIVE_INFINITY;
        |  for (int $k = 0; $k < $dots.length; $k++) {
        |    if ($dots[$k] > $bestDot) { $best = $k; $bestDot = $dots[$k]; }
        |  }
        |  $out[$p] = $best;
        |  $dots[$best] = Double.NEGATIVE_INFINITY;
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Two-level ROUTED IVF cell assignment — the O(√k) twin of
  * [[IvfCells]] for quantizers whose k grows with the corpus (the
  * SemDeDup k = n/256 rule): dotting all k centroids per vector is
  * O(n·k·d) = O(n²d/256), the round-10 verdict's scale-killer. The k
  * centroids are pre-clustered (driver-side, they are model state)
  * into ~√k routing groups; per vector this kernel dots the √k GROUP
  * centroids, takes the top-`nRoute` groups, and completes the
  * top-`nprobe` selection over only those groups' member centroids —
  * O(√k + nRoute·√k) dots per vector, cells IDENTICAL to the flat
  * codebook's (same centroid arrays, same dot kernel, same
  * lowest-id-wins tie rule), so the only divergence from [[IvfCells]]
  * is a routing miss: a true top-nprobe cell whose group fell outside
  * the nRoute probed ones. `memberIds`/`memberCents` carry each
  * group's member cell ids (GLOBAL ids) and their centroid rows. */
case class IvfRoutedCells(child: Expression,
                          groupCents: Array[Array[Double]],
                          memberIds: Array[Array[Int]],
                          memberCents: Array[Array[Array[Double]]],
                          nRoute: Int, nprobe: Int) extends UnaryExpression {
  override def prettyName: String = "graft_ivf_routed_cells"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double>/array<float> input, got ${t.sql}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    def dot(c: Array[Double]): Double = {
      val n = math.min(c.length, v.numElements())
      var s = 0.0; var d = 0
      while (d < n) {
        s += c(d) * (if (isFloat) v.getFloat(d).toDouble else v.getDouble(d))
        d += 1
      }
      s
    }
    // stage 1: top-nRoute groups (the IvfCells selection loop)
    val gDots = new Array[Double](groupCents.length)
    var j = 0
    while (j < groupCents.length) { gDots(j) = dot(groupCents(j)); j += 1 }
    val ng = math.min(nRoute, groupCents.length)
    val groups = new Array[Int](ng)
    var p = 0
    while (p < ng) {
      var best = -1; var bestDot = Double.NegativeInfinity
      var g = 0
      while (g < gDots.length) {
        if (gDots(g) > bestDot) { best = g; bestDot = gDots(g) }
        g += 1
      }
      groups(p) = best
      gDots(best) = Double.NegativeInfinity
      p += 1
    }
    // stage 2: top-nprobe cells over the probed groups' members —
    // (dot strict-greater, lowest GLOBAL id on ties) reproduces the
    // flat kernel's ascending-index scan exactly
    var cand = 0
    var gi = 0
    while (gi < ng) { cand += memberIds(groups(gi)).length; gi += 1 }
    val cDots = new Array[Double](cand)
    val cIds = new Array[Int](cand)
    var ci = 0
    gi = 0
    while (gi < ng) {
      val g = groups(gi)
      val ids = memberIds(g); val cs = memberCents(g)
      var m = 0
      while (m < ids.length) {
        cIds(ci) = ids(m); cDots(ci) = dot(cs(m)); ci += 1; m += 1
      }
      gi += 1
    }
    // spilled membership lists a boundary cell in TWO groups — when
    // both are probed the cell appears twice in the candidate strip,
    // so retiring a pick must retire EVERY copy of its id or the next
    // probe slot re-selects the same cell
    var np = math.min(nprobe, cand)
    val out = new Array[Int](math.min(nprobe, cand))
    var filled = 0
    p = 0
    while (p < np) {
      var bi = -1; var bestDot = Double.NegativeInfinity; var bestId = Int.MaxValue
      var c = 0
      while (c < cand) {
        if (cDots(c) > bestDot ||
            (cDots(c) == bestDot && cIds(c) < bestId)) {
          bi = c; bestDot = cDots(c); bestId = cIds(c)
        }
        c += 1
      }
      if (bestDot == Double.NegativeInfinity) { p = np } // only dup copies left
      else {
        out(filled) = cIds(bi); filled += 1
        c = 0
        while (c < cand) {
          if (cIds(c) == bestId) cDots(c) = Double.NegativeInfinity
          c += 1
        }
        p += 1
      }
    }
    new GenericArrayData(if (filled == out.length) out else out.take(filled))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gMat = ctx.addReferenceObj("groupCents", groupCents, "double[][]")
    val mIds = ctx.addReferenceObj("memberIds", memberIds, "int[][]")
    val mCents = ctx.addReferenceObj("memberCents", memberCents, "double[][][]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val gc = ctx.freshName("gc"); val mi = ctx.freshName("mi")
      val mc = ctx.freshName("mc"); val gDots = ctx.freshName("gDots")
      val groups = ctx.freshName("groups"); val ng = ctx.freshName("ng")
      val cand = ctx.freshName("cand"); val cDots = ctx.freshName("cDots")
      val cIds = ctx.freshName("cIds"); val ci = ctx.freshName("ci")
      val out = ctx.freshName("out"); val np = ctx.freshName("np")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      val s = ctx.freshName("s"); val n = ctx.freshName("n")
      val c = ctx.freshName("c"); val p = ctx.freshName("p")
      val best = ctx.freshName("best"); val bestDot = ctx.freshName("bestDot")
      val bestId = ctx.freshName("bestId"); val g = ctx.freshName("g")
      val m = ctx.freshName("m"); val row = ctx.freshName("row")
      s"""
        |final double[][] $gc = $gMat;
        |final int[][] $mi = $mIds;
        |final double[][][] $mc = $mCents;
        |final double[] $gDots = new double[$gc.length];
        |for (int $i = 0; $i < $gc.length; $i++) {
        |  final double[] $row = $gc[$i];
        |  final int $n = java.lang.Math.min($row.length, $v.numElements());
        |  double $s = 0.0;
        |  for (int $d = 0; $d < $n; $d++) $s += $row[$d] * (double) $v.$get($d);
        |  $gDots[$i] = $s;
        |}
        |final int $ng = java.lang.Math.min($nRoute, $gc.length);
        |final int[] $groups = new int[$ng];
        |for (int $p = 0; $p < $ng; $p++) {
        |  int $best = -1; double $bestDot = Double.NEGATIVE_INFINITY;
        |  for (int $i = 0; $i < $gDots.length; $i++) {
        |    if ($gDots[$i] > $bestDot) { $best = $i; $bestDot = $gDots[$i]; }
        |  }
        |  $groups[$p] = $best;
        |  $gDots[$best] = Double.NEGATIVE_INFINITY;
        |}
        |int $cand = 0;
        |for (int $i = 0; $i < $ng; $i++) $cand += $mi[$groups[$i]].length;
        |final double[] $cDots = new double[$cand];
        |final int[] $cIds = new int[$cand];
        |int $ci = 0;
        |for (int $i = 0; $i < $ng; $i++) {
        |  final int $g = $groups[$i];
        |  for (int $m = 0; $m < $mi[$g].length; $m++) {
        |    final double[] $row = $mc[$g][$m];
        |    final int $n = java.lang.Math.min($row.length, $v.numElements());
        |    double $s = 0.0;
        |    for (int $d = 0; $d < $n; $d++) $s += $row[$d] * (double) $v.$get($d);
        |    $cIds[$ci] = $mi[$g][$m]; $cDots[$ci] = $s; $ci++;
        |  }
        |}
        |final int $np = java.lang.Math.min($nprobe, $cand);
        |int[] $out = new int[$np];
        |int ${ci}f = 0;
        |for (int $p = 0; $p < $np; $p++) {
        |  int $best = -1; double $bestDot = Double.NEGATIVE_INFINITY;
        |  int $bestId = Integer.MAX_VALUE;
        |  for (int $c = 0; $c < $cand; $c++) {
        |    if ($cDots[$c] > $bestDot ||
        |        ($cDots[$c] == $bestDot && $cIds[$c] < $bestId)) {
        |      $best = $c; $bestDot = $cDots[$c]; $bestId = $cIds[$c];
        |    }
        |  }
        |  if ($bestDot == Double.NEGATIVE_INFINITY) break; // only dup copies left
        |  $out[${ci}f++] = $cIds[$best];
        |  for (int $c = 0; $c < $cand; $c++) {
        |    if ($cIds[$c] == $bestId) $cDots[$c] = Double.NEGATIVE_INFINITY;
        |  }
        |}
        |if (${ci}f < $out.length) $out = java.util.Arrays.copyOf($out, ${ci}f);
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Float-packed vector store for the ANN verify paths: ids sorted for
  * binary search, vectors flattened row-major into ONE float[] (the
  * fixture embeddings are float32, so packing is LOSSLESS — the cosine
  * below widens each element to double exactly like [[DotProduct]]'s
  * kernel does on an array<float> column, giving bit-identical sims to
  * the join-based verify), norms precomputed as sqrt(Σ(double)f²) — the
  * same value the `nrm` column carries. ~(8+4·dim) bytes per vector:
  * 2M 64-d vectors ≈ 530 MB, a routine torrent broadcast per executor
  * where the join-based verify would shuffle the multi-billion-row
  * candidate stream CARRYING vectors (~600 GB at sf100). */
final class PackedVecs(val ids: Array[Long], val flat: Array[Float],
                       val nrm: Array[Double], val dim: Int)
    extends Serializable {
  // DENSE-ID fast path (round 11): the verify stage is CPU-bound on
  // billions of per-pair lookups, and two 21-probe binary searches per
  // pair cost more than the 64-FMA cosine they feed. Contiguous ids
  // (the common case for a freshly keyed corpus: ids sorted at pack
  // time, so density is one O(1) check) resolve by offset instead;
  // sparse stores keep the binary search.
  private val dense: Boolean =
    ids.length > 0 && ids(ids.length - 1) - ids(0) == ids.length - 1
  private val base: Long = if (ids.length > 0) ids(0) else 0L
  def indexOf(id: Long): Int =
    if (dense) {
      val i = id - base
      if (i >= 0 && i < ids.length) i.toInt else -1
    } else java.util.Arrays.binarySearch(ids, id)
  def cosine(ia: Int, ib: Int): Double = {
    var s = 0.0; var d = 0; val ba = ia * dim; val bb = ib * dim
    while (d < dim) {
      s += flat(ba + d).toDouble * flat(bb + d).toDouble; d += 1
    }
    s / (nrm(ia) * nrm(ib))
  }
}

/** cosine(lookup(aId), lookup(bId)) against a broadcast [[PackedVecs]] —
  * the ANN verify as a SCALAR lookup instead of two joins: the candidate
  * pair stream (the only super-linear frame in the ANN ops) flows
  * map-side from the banding/cell join through this expression and the
  * sim filter without ever shuffling. The broadcast HANDLE rides the
  * plan (bytes ship torrent, once per executor, not per task — an
  * addReferenceObj of the matrix itself would Java-serialize it into
  * every stage's task binary). NULL for an id absent from the store
  * (cannot happen when candidates and store derive from one table). */
case class PackedCosine(left: Expression, right: Expression,
                        bc: org.apache.spark.broadcast.Broadcast[PackedVecs])
    extends BinaryExpression {
  override def prettyName: String = "graft_packed_cos"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint) ids, got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val pv = bc.value
    val ia = pv.indexOf(a.asInstanceOf[Long])
    val ib = pv.indexOf(b.asInstanceOf[Long])
    if (ia < 0 || ib < 0) null else pv.cosine(ia, ib)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("pvbc", bc,
      "org.apache.spark.broadcast.Broadcast")
    // resolve the broadcast ONCE per generated-class instance (per
    // task), not per row — Broadcast.value() revalidates on every call
    val pv = ctx.addMutableState("graft.functions.PackedVecs", "pv",
      v => s"$v = (graft.functions.PackedVecs) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ia = ctx.freshName("ia"); val ib = ctx.freshName("ib")
      s"""
        |final int $ia = $pv.indexOf($a);
        |final int $ib = $pv.indexOf($b);
        |if ($ia < 0 || $ib < 0) {
        |  ${ev.isNull} = true;
        |} else {
        |  ${ev.value} = $pv.cosine($ia, $ib);
        |}
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Membership test of an id PAIR against a broadcast sorted long[] of
  * (x<<32 | y) encodings — the packed-broadcast discipline applied to a
  * graph edge set (16 B/edge, ~1 GB at sf100's 116M arcs): lets a
  * super-linear stream (the triangle wedge stream, Σ outdeg²) be
  * closing-edge-filtered MAP-SIDE instead of shuffled into a semi join.
  * Caller guarantees 0 ≤ x,y < 2³¹ (checked before building the pack;
  * beyond that the op falls back to the distributed semi join, which is
  * what a real cluster runs anyway). */
case class PairContains(left: Expression, right: Expression,
                        bc: org.apache.spark.broadcast.Broadcast[Array[Long]])
    extends BinaryExpression with Predicate {
  override def prettyName: String = "graft_pair_contains"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint) ids, got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val e = (a.asInstanceOf[Long] << 32) | b.asInstanceOf[Long]
    val f = PairContainsFilter.forBroadcast(bc)
    PairContainsFilter.mightContain(f, e) &&
      java.util.Arrays.binarySearch(bc.value, e) >= 0
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("pairsbc", bc,
      "org.apache.spark.broadcast.Broadcast")
    val arr = ctx.addMutableState("long[]", "pairs",
      v => s"$v = (long[]) $bcRef.value();")
    val flt = ctx.addMutableState("long[]", "pairflt",
      v => s"$v = graft.functions.PairContainsFilter.forBroadcast($bcRef);")
    val e = ctx.freshName("enc")
    val h = ctx.freshName("h")
    // the splitmix64 finalizer inlined — MUST mirror
    // PairContainsFilter.mix step for step (interpreted eval parity)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |long $e = ($a << 32) | $b;
      |long $h = $e + 0x9e3779b97f4a7c15L;
      |$h = ($h ^ ($h >>> 30)) * 0xbf58476d1ce4e5b9L;
      |$h = ($h ^ ($h >>> 27)) * 0x94d049bb133111ebL;
      |$h = ($h ^ ($h >>> 31)) & (((long) $flt.length << 6) - 1L);
      |${ev.value} = ($flt[(int)($h >>> 6)] & (1L << (int)($h & 63L))) != 0L
      |  && java.util.Arrays.binarySearch($arr, $e) >= 0;
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Executor-local bit pre-filter for [[PairContains]] (round-13: the
  * wedge closing stages at sf100 profiled 89–97% CPU-bound, and the
  * dominant op is a ~30-probe binary search over a ~1 GB sorted pack —
  * every probe a cache miss, paid by EVERY wedge though only a small
  * fraction close into triangles). One splitmix64-hashed bit per arc in
  * a power-of-two bitmap (≥8 bits/arc, capped at 2³¹ bits = 256 MB, so
  * ≤12.5% fill) rejects ~90% of non-closing wedges with a single
  * memory access; survivors (true members + fill-rate false positives)
  * fall through to the exact binary search — the result set is
  * bit-identical by construction, only the work per miss changes.
  *
  * Built LAZILY once per executor JVM from the already-broadcast pack
  * (one linear pass; memoized by broadcast id) rather than shipped as a
  * second broadcast: same executor RAM either way, no extra network, no
  * API change. Entries expire with a ConcurrentHashMap sweep keyed on
  * broadcast VALIDITY — the pack broadcast is per-query and its id is
  * monotone, so stale filters are dropped when a newer id appears (the
  * JVM holds O(1) live packs; the one-live-join discipline). Top-level
  * object: Scala emits static forwarders, so generated Java calls
  * `graft.functions.PairContainsFilter.forBroadcast(...)` directly. */
object PairContainsFilter {
  private val filters =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Long]]

  /** splitmix64 finalizer — the codegen template inlines these exact
    * steps; any change must be made in BOTH places. */
  def mix(e: Long): Long = {
    var z = e + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def forBroadcast(
      bc: org.apache.spark.broadcast.Broadcast[Array[Long]]): Array[Long] =
    filters.computeIfAbsent(bc.id, _ => {
      // sweep older packs: broadcast ids are monotone per context, and
      // at most one closing-filter pack is live per query
      filters.keySet.removeIf(k => k < bc.id - 4)
      val arr = bc.value
      var bits = 1L << 20
      while (bits < arr.length.toLong * 8 && bits < (1L << 31)) bits <<= 1
      val words = new Array[Long]((bits >>> 6).toInt)
      val mask = bits - 1
      var i = 0
      while (i < arr.length) {
        val h = mix(arr(i)) & mask
        words((h >>> 6).toInt) |= 1L << (h & 63L).toInt
        i += 1
      }
      words
    })

  def mightContain(words: Array[Long], e: Long): Boolean = {
    val h = mix(e) & (words.length.toLong * 64 - 1)
    (words((h >>> 6).toInt) & (1L << (h & 63L).toInt)) != 0L
  }
}

/** Per-GROUP top-`nprobe` cell selection for the DISTRIBUTED two-level
  * quantizer (the round-11 verdict's driver-residency envelope on
  * [[IvfRoutedCells]]): past `graft.semantic.driverMaxK` cells the
  * codebook no longer rides the plan as a reference object — each
  * routing group's member cells travel as ONE row of the membership
  * frame (`mem_ids: array<int>` ascending, `mem_flat: array<double>`
  * row-major, dim = |flat|/|ids|), and this expression runs stage 2 of
  * the routed kernel inside the group join's codegen span: dot the
  * vector against every member row of the flat slab and keep the
  * top-`nprobe` by (dot strict-greater, lowest cell id on ties) — the
  * identical selection rule as the kernel, so merging the per-group
  * winners across a vector's probed groups (equal-dot duplicate spill
  * copies collapse under `array_distinct`) reproduces the routed
  * kernel's cell list exactly. Output stays `nprobe` structs per
  * (vector, group) row — the 2 MB member slab never copies into the
  * join output. */
case class GroupTopCells(first: Expression, second: Expression,
                         third: Expression, nprobe: Int)
    extends TernaryExpression {
  override def prettyName: String = "graft_group_top_cells"

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("cell", IntegerType, nullable = false),
                   StructField("dot", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _) | ArrayType(FloatType, _),
            ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float|double>, array<int>, " +
          s"array<double>), got (${a.sql}, ${b.sql}, ${c.sql})")
    }

  private def isFloat: Boolean = first.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(v0: Any, ids0: Any, flat0: Any): Any = {
    val v = v0.asInstanceOf[ArrayData]
    val ids = ids0.asInstanceOf[ArrayData]
    val flat = flat0.asInstanceOf[ArrayData]
    val m = ids.numElements()
    val dim = if (m == 0) 0 else flat.numElements() / m
    val dots = new Array[Double](m)
    var i = 0
    while (i < m) {
      var s = 0.0; var d = 0
      val n = math.min(dim, v.numElements())
      while (d < n) {
        s += flat.getDouble(i * dim + d) *
          (if (isFloat) v.getFloat(d).toDouble else v.getDouble(d))
        d += 1
      }
      dots(i) = s
      i += 1
    }
    val np = math.min(nprobe, m)
    val out = new Array[Any](np)
    var p = 0
    while (p < np) {
      var bi = -1; var bestDot = Double.NegativeInfinity; var bestId = Int.MaxValue
      var c = 0
      while (c < m) {
        if (dots(c) > bestDot ||
            (dots(c) == bestDot && ids.getInt(c) < bestId)) {
          bi = c; bestDot = dots(c); bestId = ids.getInt(c)
        }
        c += 1
      }
      out(p) = org.apache.spark.sql.catalyst.InternalRow(bestId, bestDot)
      dots(bi) = Double.NegativeInfinity
      p += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (v, idsA, flatA) => {
      val m = ctx.freshName("m"); val dim = ctx.freshName("dim")
      val dots = ctx.freshName("dots"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val n = ctx.freshName("n"); val np = ctx.freshName("np")
      val out = ctx.freshName("out"); val p = ctx.freshName("p")
      val c = ctx.freshName("c"); val bi = ctx.freshName("bi")
      val bestDot = ctx.freshName("bestDot"); val bestId = ctx.freshName("bestId")
      s"""
        |final int $m = $idsA.numElements();
        |final int $dim = ($m == 0) ? 0 : $flatA.numElements() / $m;
        |final double[] $dots = new double[$m];
        |final int $n = java.lang.Math.min($dim, $v.numElements());
        |for (int $i = 0; $i < $m; $i++) {
        |  double $s = 0.0;
        |  for (int $d = 0; $d < $n; $d++) {
        |    $s += $flatA.getDouble($i * $dim + $d) * (double) $v.$get($d);
        |  }
        |  $dots[$i] = $s;
        |}
        |final int $np = java.lang.Math.min($nprobe, $m);
        |final Object[] $out = new Object[$np];
        |for (int $p = 0; $p < $np; $p++) {
        |  int $bi = -1; double $bestDot = Double.NEGATIVE_INFINITY;
        |  int $bestId = Integer.MAX_VALUE;
        |  for (int $c = 0; $c < $m; $c++) {
        |    if ($dots[$c] > $bestDot ||
        |        ($dots[$c] == $bestDot && $idsA.getInt($c) < $bestId)) {
        |      $bi = $c; $bestDot = $dots[$c]; $bestId = $idsA.getInt($c);
        |    }
        |  }
        |  $out[$p] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        |    new Object[]{$bestId, $bestDot});
        |  $dots[$bi] = Double.NEGATIVE_INFINITY;
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression) =
    copy(first = f, second = s, third = t)
}

object VectorExpressions {
  /** Codegen dot product of two array<float|double> columns. */
  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen squared L2 distance of two array<float|double> columns. */
  def squaredL2(a: Column, b: Column): Column =
    Bridge.column(SquaredL2(Bridge.expression(a), Bridge.expression(b)))

  /** SRP-LSH band signature of an array<float|double> column. */
  def srpSignature(v: Column, planes: Array[Array[Double]],
                   bitsPerBand: Int): Column =
    Bridge.column(SrpSignature(Bridge.expression(v), planes, bitsPerBand))

  /** Top-`nprobe` IVF cell ids of an array<float|double> column. */
  def ivfCells(v: Column, cents: Array[Array[Double]], nprobe: Int): Column =
    Bridge.column(IvfCells(Bridge.expression(v), cents, nprobe))

  /** Two-level routed top-`nprobe` IVF cell ids (see [[IvfRoutedCells]]). */
  def ivfRoutedCells(v: Column, groupCents: Array[Array[Double]],
                     memberIds: Array[Array[Int]],
                     memberCents: Array[Array[Array[Double]]],
                     nRoute: Int, nprobe: Int): Column =
    Bridge.column(IvfRoutedCells(Bridge.expression(v), groupCents,
                                 memberIds, memberCents, nRoute, nprobe))

  /** Stage-2 routed selection against ONE group's member slab riding as
    * row data (see [[GroupTopCells]] — the distributed-codebook path). */
  def groupTopCells(v: Column, memIds: Column, memFlat: Column,
                    nprobe: Int): Column =
    Bridge.column(GroupTopCells(Bridge.expression(v), Bridge.expression(memIds),
                                Bridge.expression(memFlat), nprobe))

  /** Broadcast-lookup cosine of two id columns against a [[PackedVecs]]. */
  def packedCosine(aId: Column, bId: Column,
                   bc: org.apache.spark.broadcast.Broadcast[PackedVecs]): Column =
    Bridge.column(PackedCosine(Bridge.expression(aId), Bridge.expression(bId), bc))

  /** Broadcast-lookup membership of an (x, y) id pair in a sorted
    * (x<<32|y)-encoded edge array. */
  def pairContains(x: Column, y: Column,
                   bc: org.apache.spark.broadcast.Broadcast[Array[Long]]): Column =
    Bridge.column(PairContains(Bridge.expression(x), Bridge.expression(y), bc))
}
