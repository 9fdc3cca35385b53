package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Both expressions read ArrayData elements as primitive longs — anything
  * except ARRAY<BIGINT> would be reinterpreted garbage (or a cast error)
  * at runtime, so reject it at analysis time.
  */
private[functions] trait LongArrayArgs { self: BinaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
}

/** Native Catalyst expression for the exact integer dot product of two
  * quantized (array<long>) vectors.
  *
  * Why not `aggregate(zip_with(a, b, _*_), 0L, _+_)`: the higher-order
  * functions build an intermediate 64-element array and evaluate the
  * lambdas through non-codegen interpreted closures — per *pair*, in the
  * similarity joins' hot loop. This expression is a tight generated loop
  * over the two ArrayData buffers: no allocation, participates in
  * whole-stage codegen. Semantics are identical (element-wise product
  * summed over the common prefix length).
  */
case class DotQ(left: Expression, right: Expression)
    extends BinaryExpression with LongArrayArgs {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_q"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Native intersection count of two SORTED array<long> columns: a
  * two-pointer merge — O(n+m), zero allocation, whole-stage codegen.
  *
  * Why not `size(array_intersect(a, b))`: ArrayIntersect builds a hash
  * set per evaluation; in the near-dup verify join it runs once per
  * candidate pair and measured ~0.5 ms/pair (≈100 CPU-s over 193k
  * candidates at sf0.1) vs microseconds for the merge. Inputs must be
  * sorted ascending and distinct — exactly what
  * `sort_array(collect_list(...))` over distinct shingle rows produces.
  */
case class IntersectCountSorted(left: Expression, right: Expression)
    extends BinaryExpression with LongArrayArgs {

  override def dataType: DataType = LongType
  override def prettyName: String = "intersect_count_sorted"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var c = 0L
    var i = 0
    var j = 0
    while (i < n && j < m) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |long $c = 0L;
         |int $i = 0;
         |int $j = 0;
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** All banded hyperplane LSH buckets of a quantized vector in ONE native
  * expression: output[b] packs the sign bits of `planesPerBand` exact
  * integer dots against plane rows b·P+p of the (build-time constant)
  * plane matrix.
  *
  * Why not `planesPerBand × bands` separate [[DotQ]]-vs-literal calls (the
  * previous shape): at 20 bands × 4 planes that is 80 expressions and 80
  * 64-element literal arrays in the plan — the generated signature stage
  * measured 1.7 s for 2000 rows at sf0.1, nearly all codegen compilation
  * and per-expression dispatch, not arithmetic. Here the matrix ships once
  * as a reference object and one generated triple loop computes every
  * bucket: same exact-integer math bit-for-bit (the DuckDB oracle's SQL
  * replay is untouched), two orders of magnitude less generated code.
  *
  * The plane matrix is carried as Seq-of-Seq so case-class equality stays
  * structural — plan canonicalization (and therefore CacheManager plan
  * sharing) must treat two builds of the same signature as equal, which
  * Array fields' reference equality would silently break.
  */
case class HyperplaneSig(child: Expression, planes: Seq[Seq[Long]],
    planesPerBand: Int, dims: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(planesPerBand >= 1 && planesPerBand <= 63 &&
    planes.nonEmpty && planes.length % planesPerBand == 0 &&
    planes.forall(_.length == dims),
    s"plane matrix must be (bands*$planesPerBand) x $dims")

  private val bands = planes.length / planesPerBand

  @transient private lazy val planesArr: Array[Array[Long]] =
    planes.map(_.toArray).toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${dt.simpleString}")
  }

  private def dimsError(got: Int): Nothing =
    throw new IllegalArgumentException(
      s"hyperplane_sig: expected $dims dims, got $got")

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (v.numElements() != dims) dimsError(v.numElements())
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var p = 0
      while (p < planesPerBand) {
        val row = planesArr(b * planesPerBand + p)
        var s = 0L
        var i = 0
        while (i < dims) { s += v.getLong(i) * row(i); i += 1 }
        if (s >= 0L) bucket |= 1L << p
        p += 1
      }
      out(b) = bucket
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("planes", planesArr, "long[][]")
      val out = ctx.freshName("buckets")
      val b = ctx.freshName("b")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val bucket = ctx.freshName("bucket")
      val row = ctx.freshName("row")
      s"""
         |if ($a.numElements() != $dims) {
         |  throw new IllegalArgumentException(
         |    "hyperplane_sig: expected $dims dims, got " + $a.numElements());
         |}
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $bucket = 0L;
         |  for (int $p = 0; $p < $planesPerBand; $p++) {
         |    long[] $row = $m[$b * $planesPerBand + $p];
         |    long $s = 0L;
         |    for (int $i = 0; $i < $dims; $i++) {
         |      $s += $a.getLong($i) * $row[$i];
         |    }
         |    if ($s >= 0L) $bucket |= 1L << $p;
         |  }
         |  $out[$b] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Banded MinHash signature of a distinct-shingle set (array<long>):
  * band b's value is the xxhash64 chain over its `rowsPerBand`
  * permutation minima, where permutation p's value for shingle s is
  * xxhash64(p, s) — BIT-FOR-BIT the previous formulation's
  * `bands×rowsPerBand` separate `min(xxhash64(lit(p), s64))` aggregates
  * followed by `xxhash64(m_0..m_{R-1})` per band, so LSH dedup state
  * persisted by either formulation interoperates (the state contract of
  * Dedup.incrementalNearDups). Parity comes from chaining Spark's own
  * XXH64 exactly as the XxHash64 expression does: seed 42, IntegerType
  * permutation index via hashInt, LongType values via hashLong.
  *
  * Why an expression instead of the aggregates: the old shape paid a
  * SECOND full shuffle of the shingle index (the 64-aggregate groupBy,
  * beside the sets groupBy the exact verify needs anyway) and 64
  * codegen'd agg-buffer updates per shingle row; this computes the same
  * minima in one tight loop over the per-doc set array the sets table
  * already carries — signature work becomes map-side over a cache.
  * Empty sets hash the Long.MaxValue identity minima (such docs never
  * occur via shingleRows, which emits no row for shingle-less docs, but
  * persisted state must not crash on them).
  */
case class MinhashBands(child: Expression, bands: Int, rowsPerBand: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(bands >= 1 && rowsPerBand >= 1,
    s"bands/rowsPerBand must be >= 1, got $bands x $rowsPerBand")

  private def perms = bands * rowsPerBand

  /** Permutation seeds: xxhash64's hash of the Int permutation index at
    * the function's default seed 42, hoisted out of the per-row loop.
    */
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(perms)(p =>
      org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(p, 42L))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${dt.simpleString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val mins = Array.fill(perms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = v.getLong(i)
      var p = 0
      while (p < perms) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong(s, seeds(p))
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      i += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 42L
      var r = 0
      while (r < rowsPerBand) {
        h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong(mins(b * rowsPerBand + r), h)
        r += 1
      }
      out(b) = h
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sd = ctx.addReferenceObj("seeds", seeds, "long[]")
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val out = ctx.freshName("bandhash")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[$perms];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $s = $a.getLong($i);
         |  for (int $p = 0; $p < $perms; $p++) {
         |    long $h = $xxh.hashLong($s, $sd[$p]);
         |    if ($h < $mins[$p]) $mins[$p] = $h;
         |  }
         |}
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $h = 42L;
         |  for (int $r = 0; $r < $rowsPerBand; $r++) {
         |    $h = $xxh.hashLong($mins[$b * $rowsPerBand + $r], $h);
         |  }
         |  $out[$b] = $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Nearest-centroid assignment of a quantized vector in ONE native
  * expression: returns the cid minimizing (‖c‖² − 2·<v,c>, cid) — the
  * squared-L2 argmin with the row-constant ‖v‖² term dropped (it cannot
  * change the winner or the tiebreak), ties broken by cid ascending.
  * Bit-identical to the `array_min(array(struct(dist, cid)…))` shape it
  * replaces, so the DuckDB Lloyd-replay oracles are untouched.
  *
  * Why an expression: the struct-array shape materializes nlist structs
  * per row and carries nlist separate 64-long literal arrays in the plan;
  * with [[graft.operators.Similarity.semanticNlist]] sizing (nlist = √n,
  * ~10² at probe scales, unbounded with n) the generated code blows past
  * JIT limits and falls out of whole-stage codegen exactly where the
  * per-row work peaks. Here the centroid matrix ships once as a reference
  * object and one generated double loop does the argmin — the
  * [[HyperplaneSig]]/[[MinhashBands]] treatment applied to k-means
  * assignment, which every IVF-family operator (assign, Lloyd update,
  * PQ encode) sits on.
  *
  * Seq fields (not Array) keep case-class equality structural for plan
  * canonicalization / CacheManager sharing, as in [[HyperplaneSig]].
  */
case class ArgminCentroid(child: Expression, cids: Seq[Long],
    cents: Seq[Seq[Long]], dims: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(cents.nonEmpty && cids.length == cents.length &&
    cents.forall(_.length == dims),
    s"centroid matrix must be ${cids.length} x $dims")

  @transient private lazy val centArr: Array[Array[Long]] =
    cents.map(_.toArray).toArray
  @transient private lazy val cidArr: Array[Long] = cids.toArray
  @transient private lazy val cnsqArr: Array[Long] =
    centArr.map(_.map(x => x * x).sum)

  override def dataType: DataType = LongType
  override def prettyName: String = "argmin_centroid"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${dt.simpleString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (v.numElements() != dims)
      throw new IllegalArgumentException(
        s"argmin_centroid: expected $dims dims, got ${v.numElements()}")
    var best = Long.MaxValue
    var bestCid = Long.MaxValue
    var j = 0
    while (j < centArr.length) {
      val row = centArr(j)
      var dot = 0L
      var i = 0
      while (i < dims) { dot += v.getLong(i) * row(i); i += 1 }
      val s = cnsqArr(j) - 2L * dot
      if (s < best || (s == best && cidArr(j) < bestCid)) {
        best = s; bestCid = cidArr(j)
      }
      j += 1
    }
    bestCid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("cents", centArr, "long[][]")
      val cid = ctx.addReferenceObj("cids", cidArr, "long[]")
      val cnsq = ctx.addReferenceObj("cnsqs", cnsqArr, "long[]")
      val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val s = ctx.freshName("s")
      val row = ctx.freshName("row")
      s"""
         |if ($a.numElements() != $dims) {
         |  throw new IllegalArgumentException(
         |    "argmin_centroid: expected $dims dims, got " + $a.numElements());
         |}
         |long $best = Long.MAX_VALUE;
         |long $bestCid = Long.MAX_VALUE;
         |for (int $j = 0; $j < ${centArr.length}; $j++) {
         |  long[] $row = $m[$j];
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $dims; $i++) {
         |    $dot += $a.getLong($i) * $row[$i];
         |  }
         |  long $s = $cnsq[$j] - 2L * $dot;
         |  if ($s < $best || ($s == $best && $cid[$j] < $bestCid)) {
         |    $best = $s; $bestCid = $cid[$j];
         |  }
         |}
         |${ev.value} = $bestCid;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Two-level nearest-centroid: the centroids are pre-clustered into
  * groups (driver-side); a row scores every GROUP centroid, keeps the
  * `gProbes` nearest groups (by (score, group-index) ascending), and
  * runs [[ArgminCentroid]]'s exact (‖c‖² − 2·<v,c>, cid) argmin over
  * those groups' members only. Per-row cost falls from nlist·dims to
  * ~(ngroups + gProbes·nlist/ngroups)·dims — at ngroups ≈ √nlist the
  * flat FAISS coarse-assignment bottleneck (2M int ops/row at
  * nlist=31623) drops ~60×. Assignment is approximate near group
  * boundaries (more gProbes → tighter); with gProbes ≥ ngroups every
  * member is scored, and because the member tiebreak is identical and
  * every cid appears in exactly one group, the result is BIT-EQUAL to
  * [[ArgminCentroid]] over the union — the exactness anchor its spec
  * asserts.
  */
case class ArgminCentroidHier(child: Expression,
    groupCents: Seq[Seq[Long]], memberCids: Seq[Seq[Long]],
    memberCents: Seq[Seq[Seq[Long]]], gProbes: Int, dims: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(groupCents.nonEmpty && gProbes >= 1 &&
    groupCents.forall(_.length == dims) &&
    memberCids.length == groupCents.length &&
    memberCents.length == groupCents.length &&
    memberCents.zip(memberCids).forall { case (vs, ids) =>
      vs.length == ids.length && vs.forall(_.length == dims) } &&
    memberCids.exists(_.nonEmpty),
    "group/member tables must be consistent and non-empty")

  @transient private lazy val gcArr: Array[Array[Long]] =
    groupCents.map(_.toArray).toArray
  @transient private lazy val gnsqArr: Array[Long] =
    gcArr.map(_.map(x => x * x).sum)
  @transient private lazy val mcArr: Array[Array[Array[Long]]] =
    memberCents.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val midArr: Array[Array[Long]] =
    memberCids.map(_.toArray).toArray
  @transient private lazy val mnsqArr: Array[Array[Long]] =
    mcArr.map(_.map(_.map(x => x * x).sum))

  override def dataType: DataType = LongType
  override def prettyName: String = "argmin_centroid_hier"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${dt.simpleString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (v.numElements() != dims)
      throw new IllegalArgumentException(
        s"$prettyName: expected $dims dims, got ${v.numElements()}")
    val gp = math.min(gProbes, gcArr.length)
    val gs = Array.fill(gp)(Long.MaxValue)
    val gi = Array.fill(gp)(-1)
    var g = 0
    while (g < gcArr.length) {
      val row = gcArr(g)
      var dot = 0L
      var i = 0
      while (i < dims) { dot += v.getLong(i) * row(i); i += 1 }
      val s = gnsqArr(g) - 2L * dot
      // insertion into the sorted top-gp (score asc, group idx asc —
      // strict inequality keeps earlier groups on ties)
      var pos = gp
      while (pos > 0 && s < gs(pos - 1)) pos -= 1
      if (pos < gp) {
        var t = gp - 1
        while (t > pos) { gs(t) = gs(t - 1); gi(t) = gi(t - 1); t -= 1 }
        gs(pos) = s; gi(pos) = g
      }
      g += 1
    }
    var best = Long.MaxValue
    var bestCid = Long.MaxValue
    var t = 0
    while (t < gp) {
      val gg = gi(t)
      if (gg >= 0) {
        val mem = mcArr(gg); val mcid = midArr(gg); val mnsq = mnsqArr(gg)
        var j = 0
        while (j < mem.length) {
          val row = mem(j)
          var dot = 0L
          var i = 0
          while (i < dims) { dot += v.getLong(i) * row(i); i += 1 }
          val s = mnsq(j) - 2L * dot
          if (s < best || (s == best && mcid(j) < bestCid)) {
            best = s; bestCid = mcid(j)
          }
          j += 1
        }
      }
      t += 1
    }
    bestCid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val gc = ctx.addReferenceObj("gcents", gcArr, "long[][]")
      val gnsq = ctx.addReferenceObj("gnsqs", gnsqArr, "long[]")
      val mc = ctx.addReferenceObj("mcents", mcArr, "long[][][]")
      val mid = ctx.addReferenceObj("mcids", midArr, "long[][]")
      val mnsq = ctx.addReferenceObj("mnsqs", mnsqArr, "long[][]")
      val gp = math.min(gProbes, groupCents.length)
      val gs = ctx.freshName("gs"); val gi = ctx.freshName("gi")
      val g = ctx.freshName("g"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val t = ctx.freshName("t")
      val pos = ctx.freshName("pos"); val dot = ctx.freshName("dot")
      val s = ctx.freshName("s"); val row = ctx.freshName("row")
      val best = ctx.freshName("best"); val bestCid = ctx.freshName("bestCid")
      val gg = ctx.freshName("gg"); val mem = ctx.freshName("mem")
      val mcid = ctx.freshName("mcid"); val mns = ctx.freshName("mns")
      s"""
         |if ($a.numElements() != $dims) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: expected $dims dims, got " + $a.numElements());
         |}
         |long[] $gs = new long[$gp];
         |int[] $gi = new int[$gp];
         |for (int $t = 0; $t < $gp; $t++) {
         |  $gs[$t] = Long.MAX_VALUE; $gi[$t] = -1;
         |}
         |for (int $g = 0; $g < ${groupCents.length}; $g++) {
         |  long[] $row = $gc[$g];
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $dims; $i++) {
         |    $dot += $a.getLong($i) * $row[$i];
         |  }
         |  long $s = $gnsq[$g] - 2L * $dot;
         |  int $pos = $gp;
         |  while ($pos > 0 && $s < $gs[$pos - 1]) $pos--;
         |  if ($pos < $gp) {
         |    for (int $t = $gp - 1; $t > $pos; $t--) {
         |      $gs[$t] = $gs[$t - 1]; $gi[$t] = $gi[$t - 1];
         |    }
         |    $gs[$pos] = $s; $gi[$pos] = $g;
         |  }
         |}
         |long $best = Long.MAX_VALUE;
         |long $bestCid = Long.MAX_VALUE;
         |for (int $t = 0; $t < $gp; $t++) {
         |  int $gg = $gi[$t];
         |  if ($gg < 0) continue;
         |  long[][] $mem = $mc[$gg];
         |  long[] $mcid = $mid[$gg];
         |  long[] $mns = $mnsq[$gg];
         |  for (int $j = 0; $j < $mem.length; $j++) {
         |    long[] $row = $mem[$j];
         |    long $dot = 0L;
         |    for (int $i = 0; $i < $dims; $i++) {
         |      $dot += $a.getLong($i) * $row[$i];
         |    }
         |    long $s = $mns[$j] - 2L * $dot;
         |    if ($s < $best || ($s == $best && $mcid[$j] < $bestCid)) {
         |      $best = $s; $bestCid = $mcid[$j];
         |    }
         |  }
         |}
         |${ev.value} = $bestCid;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The `nprobe` nearest centroid cids of a quantized vector, ordered by
  * (‖c‖² − 2·<v,c>, cid) ascending — [[ArgminCentroid]]'s ordering
  * extended to a top-nprobe selection, bit-identical to the
  * `slice(array_sort(array(struct(dist, cid)…)), 1, nprobe)` shape it
  * replaces (the row-constant ‖v‖² term cannot change the ordering).
  * Used on the query side of IVF probing, so per-row cost is
  * nlist·(dims + nprobe) with constant-size generated code instead of an
  * nlist-struct literal forest in the plan.
  */
case class ProbeCentroids(child: Expression, cids: Seq[Long],
    cents: Seq[Seq[Long]], nprobe: Int, dims: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(cents.nonEmpty && cids.length == cents.length &&
    cents.forall(_.length == dims) && nprobe >= 1,
    s"centroid matrix must be ${cids.length} x $dims with nprobe >= 1")

  @transient private lazy val centArr: Array[Array[Long]] =
    cents.map(_.toArray).toArray
  @transient private lazy val cidArr: Array[Long] = cids.toArray
  @transient private lazy val cnsqArr: Array[Long] =
    centArr.map(_.map(x => x * x).sum)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "probe_centroids"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${dt.simpleString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (v.numElements() != dims)
      throw new IllegalArgumentException(
        s"probe_centroids: expected $dims dims, got ${v.numElements()}")
    val n = centArr.length
    val scores = new Array[Long](n)
    var j = 0
    while (j < n) {
      val row = centArr(j)
      var dot = 0L
      var i = 0
      while (i < dims) { dot += v.getLong(i) * row(i); i += 1 }
      scores(j) = cnsqArr(j) - 2L * dot
      j += 1
    }
    val take = math.min(nprobe, n)
    val out = new Array[Long](take)
    val taken = new Array[Boolean](n)
    var r = 0
    while (r < take) {
      var best = -1
      var p = 0
      while (p < n) {
        if (!taken(p) && (best < 0 || scores(p) < scores(best) ||
          (scores(p) == scores(best) && cidArr(p) < cidArr(best)))) best = p
        p += 1
      }
      taken(best) = true
      out(r) = cidArr(best)
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("cents", centArr, "long[][]")
      val cid = ctx.addReferenceObj("cids", cidArr, "long[]")
      val cnsq = ctx.addReferenceObj("cnsqs", cnsqArr, "long[]")
      val n = centArr.length
      val scores = ctx.freshName("scores")
      val taken = ctx.freshName("taken")
      val out = ctx.freshName("probes")
      val take = ctx.freshName("take")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val r = ctx.freshName("r")
      val p = ctx.freshName("p")
      val dot = ctx.freshName("dot")
      val row = ctx.freshName("row")
      val best = ctx.freshName("best")
      s"""
         |if ($a.numElements() != $dims) {
         |  throw new IllegalArgumentException(
         |    "probe_centroids: expected $dims dims, got " + $a.numElements());
         |}
         |long[] $scores = new long[$n];
         |for (int $j = 0; $j < $n; $j++) {
         |  long[] $row = $m[$j];
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $dims; $i++) {
         |    $dot += $a.getLong($i) * $row[$i];
         |  }
         |  $scores[$j] = $cnsq[$j] - 2L * $dot;
         |}
         |int $take = java.lang.Math.min($nprobe, $n);
         |long[] $out = new long[$take];
         |boolean[] $taken = new boolean[$n];
         |for (int $r = 0; $r < $take; $r++) {
         |  int $best = -1;
         |  for (int $p = 0; $p < $n; $p++) {
         |    if (!$taken[$p] && ($best < 0 || $scores[$p] < $scores[$best] ||
         |        ($scores[$p] == $scores[$best] && $cid[$p] < $cid[$best]))) {
         |      $best = $p;
         |    }
         |  }
         |  $taken[$best] = true;
         |  $out[$r] = $cid[$best];
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Two-level [[ProbeCentroids]]: score the group centroids, descend
  * into groups in (score, group-index) order until BOTH `gProbes`
  * groups are open AND their member count covers `nprobe` (so the
  * output length always equals min(nprobe, nlist), like the flat
  * probe), then select the top-nprobe members by the exact (dist, cid)
  * ordering. Bit-equal to [[ProbeCentroids]] when every group is
  * descended. Query/batch-side analog of [[ArgminCentroidHier]]:
  * per-row cost falls from nlist·dims to ~(ngroups +
  * covered·(dims+nprobe)).
  */
case class ProbeCentroidsHier(child: Expression,
    groupCents: Seq[Seq[Long]], memberCids: Seq[Seq[Long]],
    memberCents: Seq[Seq[Seq[Long]]], gProbes: Int, nprobe: Int,
    dims: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(groupCents.nonEmpty && gProbes >= 1 && nprobe >= 1 &&
    groupCents.forall(_.length == dims) &&
    memberCids.length == groupCents.length &&
    memberCents.length == groupCents.length &&
    memberCents.zip(memberCids).forall { case (vs, ids) =>
      vs.length == ids.length && vs.forall(_.length == dims) } &&
    memberCids.exists(_.nonEmpty),
    "group/member tables must be consistent and non-empty")

  @transient private lazy val gcArr: Array[Array[Long]] =
    groupCents.map(_.toArray).toArray
  @transient private lazy val gnsqArr: Array[Long] =
    gcArr.map(_.map(x => x * x).sum)
  @transient private lazy val mcArr: Array[Array[Array[Long]]] =
    memberCents.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val midArr: Array[Array[Long]] =
    memberCids.map(_.toArray).toArray
  @transient private lazy val mnsqArr: Array[Array[Long]] =
    mcArr.map(_.map(_.map(x => x * x).sum))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "probe_centroids_hier"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${dt.simpleString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (v.numElements() != dims)
      throw new IllegalArgumentException(
        s"$prettyName: expected $dims dims, got ${v.numElements()}")
    val ng = gcArr.length
    val gScores = new Array[Long](ng)
    var g = 0
    while (g < ng) {
      val row = gcArr(g)
      var dot = 0L
      var i = 0
      while (i < dims) { dot += v.getLong(i) * row(i); i += 1 }
      gScores(g) = gnsqArr(g) - 2L * dot
      g += 1
    }
    val gTaken = new Array[Boolean](ng)
    val chosen = new Array[Int](ng)
    var nChosen = 0
    var covered = 0
    while (nChosen < ng && (nChosen < gProbes || covered < nprobe)) {
      var best = -1
      var p = 0
      while (p < ng) {
        if (!gTaken(p) && (best < 0 || gScores(p) < gScores(best))) best = p
        p += 1
      }
      gTaken(best) = true
      chosen(nChosen) = best; nChosen += 1
      covered += midArr(best).length
    }
    val mScores = new Array[Long](covered)
    val mCid = new Array[Long](covered)
    var idx = 0
    var t = 0
    while (t < nChosen) {
      val gg = chosen(t)
      val mem = mcArr(gg); val mcid = midArr(gg); val mnsq = mnsqArr(gg)
      var j = 0
      while (j < mem.length) {
        val row = mem(j)
        var dot = 0L
        var i = 0
        while (i < dims) { dot += v.getLong(i) * row(i); i += 1 }
        mScores(idx) = mnsq(j) - 2L * dot
        mCid(idx) = mcid(j)
        idx += 1
        j += 1
      }
      t += 1
    }
    val take = math.min(nprobe, covered)
    val out = new Array[Long](take)
    val taken = new Array[Boolean](covered)
    var r = 0
    while (r < take) {
      var best = -1
      var p = 0
      while (p < covered) {
        if (!taken(p) && (best < 0 || mScores(p) < mScores(best) ||
          (mScores(p) == mScores(best) && mCid(p) < mCid(best)))) best = p
        p += 1
      }
      taken(best) = true
      out(r) = mCid(best)
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val gc = ctx.addReferenceObj("gcents", gcArr, "long[][]")
      val gnsq = ctx.addReferenceObj("gnsqs", gnsqArr, "long[]")
      val mc = ctx.addReferenceObj("mcents", mcArr, "long[][][]")
      val mid = ctx.addReferenceObj("mcids", midArr, "long[][]")
      val mnsq = ctx.addReferenceObj("mnsqs", mnsqArr, "long[][]")
      val ng = gcArr.length
      val gScores = ctx.freshName("gScores")
      val gTaken = ctx.freshName("gTaken")
      val chosen = ctx.freshName("chosen")
      val nChosen = ctx.freshName("nChosen")
      val covered = ctx.freshName("covered")
      val mScores = ctx.freshName("mScores")
      val mCid = ctx.freshName("mCid")
      val taken = ctx.freshName("taken")
      val out = ctx.freshName("out")
      val take = ctx.freshName("take")
      val g = ctx.freshName("g"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val t = ctx.freshName("t")
      val p = ctx.freshName("p"); val r = ctx.freshName("r")
      val dot = ctx.freshName("dot"); val row = ctx.freshName("row")
      val best = ctx.freshName("best"); val gg = ctx.freshName("gg")
      val idx = ctx.freshName("idx")
      val mem = ctx.freshName("mem"); val mcd = ctx.freshName("mcd")
      val mns = ctx.freshName("mns")
      s"""
         |if ($a.numElements() != $dims) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: expected $dims dims, got " + $a.numElements());
         |}
         |long[] $gScores = new long[$ng];
         |for (int $g = 0; $g < $ng; $g++) {
         |  long[] $row = $gc[$g];
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $dims; $i++) {
         |    $dot += $a.getLong($i) * $row[$i];
         |  }
         |  $gScores[$g] = $gnsq[$g] - 2L * $dot;
         |}
         |boolean[] $gTaken = new boolean[$ng];
         |int[] $chosen = new int[$ng];
         |int $nChosen = 0;
         |int $covered = 0;
         |while ($nChosen < $ng && ($nChosen < $gProbes || $covered < $nprobe)) {
         |  int $best = -1;
         |  for (int $p = 0; $p < $ng; $p++) {
         |    if (!$gTaken[$p] && ($best < 0 || $gScores[$p] < $gScores[$best])) {
         |      $best = $p;
         |    }
         |  }
         |  $gTaken[$best] = true;
         |  $chosen[$nChosen++] = $best;
         |  $covered += $mid[$best].length;
         |}
         |long[] $mScores = new long[$covered];
         |long[] $mCid = new long[$covered];
         |int $idx = 0;
         |for (int $t = 0; $t < $nChosen; $t++) {
         |  int $gg = $chosen[$t];
         |  long[][] $mem = $mc[$gg];
         |  long[] $mcd = $mid[$gg];
         |  long[] $mns = $mnsq[$gg];
         |  for (int $j = 0; $j < $mem.length; $j++) {
         |    long[] $row = $mem[$j];
         |    long $dot = 0L;
         |    for (int $i = 0; $i < $dims; $i++) {
         |      $dot += $a.getLong($i) * $row[$i];
         |    }
         |    $mScores[$idx] = $mns[$j] - 2L * $dot;
         |    $mCid[$idx] = $mcd[$j];
         |    $idx++;
         |  }
         |}
         |int $take = java.lang.Math.min($nprobe, $covered);
         |long[] $out = new long[$take];
         |boolean[] $taken = new boolean[$covered];
         |for (int $r = 0; $r < $take; $r++) {
         |  int $best = -1;
         |  for (int $p = 0; $p < $covered; $p++) {
         |    if (!$taken[$p] && ($best < 0 || $mScores[$p] < $mScores[$best] ||
         |        ($mScores[$p] == $mScores[$best] && $mCid[$p] < $mCid[$best]))) {
         |      $best = $p;
         |    }
         |  }
         |  $taken[$best] = true;
         |  $out[$r] = $mCid[$best];
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One subspace's ADC lookup table for a query subvector: a cid-INDEXED
  * array (position = cid, 0-based) of exact integer dots <q_sub,
  * centroid_cid>. Lloyd can leave cids non-contiguous, so unassigned
  * positions hold 0 — harmless, because the scan side only ever reads
  * positions that appear as codes, and codes are argmin winners over
  * the SAME codebook. Replaces the `map_from_arrays(lit(cids),
  * array(dotQ(q, lit(c0)), …))` shape, which carried m×ksub literal dot
  * expressions in the plan (at the retrieval-grade ksub=256 geometry the
  * generated projection blew the 64 KB JIT method limit and the whole
  * scan fell back to interpreted mode) AND cost an O(ksub) linear map
  * scan per element_at on the corpus side. Here the codebook ships once
  * as a reference object, LUT construction is one generated loop per
  * query row, and the corpus-side lookup is element_at on an array —
  * O(1) positional access inside whole-stage codegen.
  */
case class PqAdcLut(child: Expression, cids: Seq[Long],
    cents: Seq[Seq[Long]], dims: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(cents.nonEmpty && cids.length == cents.length &&
    cents.forall(_.length == dims) &&
    cids.forall(c => c >= 0 && c < (1 << 20)),
    s"codebook must be ${cids.length} x $dims with cids in [0, 2^20)")

  @transient private lazy val centArr: Array[Array[Long]] =
    cents.map(_.toArray).toArray
  @transient private lazy val cidArr: Array[Int] = cids.map(_.toInt).toArray
  @transient private lazy val width: Int = cidArr.max + 1

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_adc_lut"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${dt.simpleString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (v.numElements() != dims)
      throw new IllegalArgumentException(
        s"pq_adc_lut: expected $dims dims, got ${v.numElements()}")
    val out = new Array[Long](width)
    var j = 0
    while (j < centArr.length) {
      val row = centArr(j)
      var dot = 0L
      var i = 0
      while (i < dims) { dot += v.getLong(i) * row(i); i += 1 }
      out(cidArr(j)) = dot
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("cents", centArr, "long[][]")
      val cid = ctx.addReferenceObj("cids", cidArr, "int[]")
      val out = ctx.freshName("lut")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val row = ctx.freshName("row")
      s"""
         |if ($a.numElements() != $dims) {
         |  throw new IllegalArgumentException(
         |    "pq_adc_lut: expected $dims dims, got " + $a.numElements());
         |}
         |long[] $out = new long[$width];
         |for (int $j = 0; $j < ${centArr.length}; $j++) {
         |  long[] $row = $m[$j];
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $dims; $i++) {
         |    $dot += $a.getLong($i) * $row[$i];
         |  }
         |  $out[$cid[$j]] = $dot;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VecExprs {

  /** Exact integer dot product of two array<long> columns. */
  def dotQ(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(DotQ(GraftSqlBridge.expression(a),
      GraftSqlBridge.expression(b)))
  }

  /** Banded hyperplane buckets (array<long>, one bucket per band). */
  def hyperplaneSig(v: Column, planes: Seq[Seq[Long]], planesPerBand: Int,
      dims: Int): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(HyperplaneSig(GraftSqlBridge.expression(v),
      planes, planesPerBand, dims))
  }

  /** Intersection count of two sorted-distinct array<long> columns. */
  def intersectCountSorted(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(IntersectCountSorted(GraftSqlBridge.expression(a),
      GraftSqlBridge.expression(b)))
  }

  /** Banded MinHash band hashes (array<long>, one per band) over a
    * distinct-shingle array<long> column.
    */
  def minhashBands(ss: Column, bands: Int, rowsPerBand: Int): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(MinhashBands(GraftSqlBridge.expression(ss),
      bands, rowsPerBand))
  }

  /** Nearest-centroid cid for a quantized array<long> vector, ties by
    * cid ascending — one native argmin over the (cid, centroid) list.
    */
  def argminCentroid(v: Column, cs: Seq[(Long, Array[Long])]): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(ArgminCentroid(GraftSqlBridge.expression(v),
      cs.map(_._1), cs.map(_._2.toSeq), cs.head._2.length))
  }

  /** Two-level nearest-centroid cid (see [[ArgminCentroidHier]]):
    * `groups(g)` is group g's centroid, `members(g)` its (cid, vec)
    * list. Bit-equal to [[argminCentroid]] over the flattened members
    * when gProbes >= groups.size.
    */
  def argminCentroidHier(v: Column, groups: Seq[Array[Long]],
      members: Seq[Seq[(Long, Array[Long])]], gProbes: Int): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(ArgminCentroidHier(GraftSqlBridge.expression(v),
      groups.map(_.toSeq), members.map(_.map(_._1)),
      members.map(_.map(_._2.toSeq)), gProbes, groups.head.length))
  }

  /** Two-level top-nprobe probe (see [[ProbeCentroidsHier]]): descends
    * into enough nearest groups to cover gProbes AND nprobe, then exact
    * (dist, cid) top-nprobe over their members. Bit-equal to
    * [[probeCentroids]] over the flattened members when gProbes >=
    * groups.size.
    */
  def probeCentroidsHier(v: Column, groups: Seq[Array[Long]],
      members: Seq[Seq[(Long, Array[Long])]], gProbes: Int,
      nprobe: Int): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(ProbeCentroidsHier(GraftSqlBridge.expression(v),
      groups.map(_.toSeq), members.map(_.map(_._1)),
      members.map(_.map(_._2.toSeq)), gProbes, nprobe,
      groups.head.length))
  }

  /** The nprobe nearest centroid cids (array<long>, nearest first), same
    * ordering and tiebreak as [[argminCentroid]].
    */
  def probeCentroids(v: Column, cs: Seq[(Long, Array[Long])],
      nprobe: Int): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(ProbeCentroids(GraftSqlBridge.expression(v),
      cs.map(_._1), cs.map(_._2.toSeq), nprobe, cs.head._2.length))
  }

  /** Per-subspace ADC LUT: cid-indexed array<long> of <q_sub, centroid>
    * dots (position = cid; unassigned cids hold 0 and are never read).
    */
  def pqAdcLut(qsub: Column, cs: Seq[(Long, Array[Long])]): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(PqAdcLut(GraftSqlBridge.expression(qsub),
      cs.map(_._1), cs.map(_._2.toSeq), cs.head._2.length))
  }
}
