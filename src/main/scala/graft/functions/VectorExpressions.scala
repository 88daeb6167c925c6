package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over embedding
  * columns (`array<float>` / `array<double>`).
  *
  * The composable form — `aggregate(zip_with(a, b, ...), ...)` — builds a
  * zipped intermediate array and dispatches a Catalyst lambda per
  * element; at 100 TB of embeddings that is the per-row hot loop, so
  * this expression fuses dot product and both norms into one pass with
  * full `doGenCode` support (stays inside whole-stage codegen, no
  * intermediate allocation).
  *
  * Semantics match the composable form bit-for-bit: elements are widened
  * to double, then multiply-accumulated strictly left-to-right;
  * `dot / (sqrt(na) * sqrt(nb))`. Null arrays propagate null; element
  * nulls are not expected (embeddings are dense).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  private def isFloat(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val af = isFloat(left.dataType)
    val bf = isFloat(right.dataType)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // every local (including loop vars) via freshName: two instances of
      // this expression can land in ONE generated method, where sibling
      // `int i` declarations collide and janino drops the whole stage to
      // interpreted mode
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val getA = if (isFloat(left.dataType)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (isFloat(right.dataType)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $getA;
         |  double $y = $getB;
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native squared-L2 distance over embedding columns — the IVF coarse
  * quantizer's hot loop (every vector × every centroid, twice during
  * training). The composable `aggregate(zip_with(a, b, ...))` form is a
  * higher-order function chain that stays interpreted; this expression
  * fuses subtract-square-accumulate into one codegen'd pass.
  *
  * For equal-length dense arrays (the embedding contract) semantics
  * match the composable form bit-for-bit: widen to double, `(x-y)²`
  * accumulated strictly left-to-right. Null arrays propagate null.
  * Ragged inputs truncate to the shorter array (like
  * [[CosineSimilarity]]) — the zip_with form returned null there;
  * embeddings are fixed-dimension so the case is a data bug either way.
  */
case class L2Distance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"l2_dist expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  private def isFloat(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val af = isFloat(left.dataType)
    val bf = isFloat(right.dataType)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // loop vars via freshName too — see CosineSimilarity.doGenCode
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val getA = if (isFloat(left.dataType)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (isFloat(right.dataType)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $getA - $getB;
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** One-pass MinHash over a shingle array (`array<string>`): returns
  * `numHashes` lexicographic-min md5 hex strings, slot i minimizing
  * `md5("i:" ++ shingle)` — exactly the portable family in
  * [[graft.operators.Dedup]], but computed per-row with no
  * explode / groupBy shuffle. On a 100 TB corpus this turns candidate
  * generation from (shuffle tokens, aggregate) into a map-only pass.
  *
  * Interpreted eval only (md5 via MessageDigest is not worth inlining
  * into generated Java); still row-at-a-time tight JVM code.
  */
case class MinHashMd5(child: Expression, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.StringType, false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_md5 expects array<string>, got $t")
    }

  private val hexDigits = "0123456789abcdef".toCharArray

  // MessageDigest is mutable and NOT thread-safe; tasks deserialize
  // their own expression copies, but driver-side interpreted eval (e.g.
  // ConvertToLocalRelation) can share one instance across queries — a
  // ThreadLocal keeps the hot loop allocation-free AND safe everywhere.
  // The prefix table is immutable after init, so plain sharing is fine.
  @transient private lazy val digestTL =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(numHashes)(h => (h.toString + ":").getBytes("UTF-8"))

  private def md5Hex(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val digest = digestTL.get()
    // minimize over raw digests — unsigned byte order == hex string order
    val mins = new Array[Array[Byte]](numHashes)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val sb = s.getBytes
        var h = 0
        while (h < numHashes) {
          digest.reset()
          digest.update(prefixes(h))
          digest.update(sb)
          val d = digest.digest()
          if (mins(h) == null || java.util.Arrays.compareUnsigned(d, mins(h)) < 0)
            mins(h) = d
          h += 1
        }
      }
      i += 1
    }
    if (mins(0) == null) null
    else ArrayData.toArrayData(mins.map(d =>
      org.apache.spark.unsafe.types.UTF8String.fromString(md5Hex(d))))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The argmin kernel shared by [[NearestCell]] (matrix as expression
  * state) and [[NearestCellBroadcast]] (matrix behind a broadcast
  * handle): ONE implementation of the semantics both scaladocs promise
  * — left-to-right (x-y)² accumulation in double, truncation to the
  * shorter length, `java.lang.Double.compare` first-minimum tiebreak —
  * so a future change cannot drift the two forms apart. */
private[functions] object ArgminKernel {

  def eval(e: ArrayData, isFloat: Boolean, matrix: Array[Array[Double]],
           cids: Array[Int]): Int = {
    var best = 0
    var bestD = Double.NaN
    var k = 0
    while (k < matrix.length) {
      val c = matrix(k)
      val n = math.min(e.numElements(), c.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) e.getFloat(i).toDouble else e.getDouble(i)
        val d = x - c(i)
        acc += d * d
        i += 1
      }
      if (k == 0 || java.lang.Double.compare(acc, bestD) < 0) {
        bestD = acc; best = k
      }
      k += 1
    }
    cids(best)
  }

  /** The generated-Java body: identical loop for both expression forms;
    * `m`/`cd` are the matrix / cell-id variable names the caller bound
    * (a reference object or a broadcast-filled mutable field). Every
    * local goes through freshName — see CosineSimilarity.doGenCode. */
  def genBody(ctx: CodegenContext, e: String, get: String, m: String,
              cd: String, out: String): String = {
    val best = ctx.freshName("best")
    val bestD = ctx.freshName("bestD")
    val acc = ctx.freshName("acc")
    val c = ctx.freshName("c")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val k = ctx.freshName("k")
    val d = ctx.freshName("d")
    s"""
       |int $best = 0;
       |double $bestD = Double.NaN;
       |for (int $k = 0; $k < $m.length; $k++) {
       |  double[] $c = $m[$k];
       |  int $n = java.lang.Math.min($e.numElements(), $c.length);
       |  double $acc = 0.0;
       |  for (int $i = 0; $i < $n; $i++) {
       |    double $d = ((double) $e.$get($i)) - $c[$i];
       |    $acc += $d * $d;
       |  }
       |  if ($k == 0 || java.lang.Double.compare($acc, $bestD) < 0) {
       |    $bestD = $acc; $best = $k;
       |  }
       |}
       |$out = $cd[$best];
     """.stripMargin
  }
}

/** Nearest-centroid assignment for the IVF coarse quantizer: returns the
  * cell id (`cids(i)`) whose centroid minimizes squared-L2 distance to the
  * input vector, first-minimum tiebreak (cids are sorted ascending, so
  * ties go to the lowest cell id).
  *
  * This replaces the per-centroid-literal form — `element_at(array(cids),
  * array_position(ds, array_min(ds)))` over one `l2_dist` expression PER
  * centroid — which builds O(cells · dim) plan nodes and dies at the
  * 64k–1M cells a real 10B-vector index needs (codegen/plan-size limits,
  * long before data size matters). Here the centroid matrix is ONE
  * driver-held object referenced by a single expression node: codegen
  * attaches it via `addReferenceObj`, so the generated code is a fixed
  * two-level loop regardless of cell count and the plan stays
  * constant-sized. The matrix ships once per stage with the serialized
  * plan (the broadcast-module pattern of every MLlib model).
  *
  * Semantics match the literal form bit-for-bit: distances accumulate
  * `(x-y)²` left-to-right in double ([[L2Distance]]), ragged inputs
  * truncate to the shorter length, comparison uses the SQL total order
  * (NaN greatest — `java.lang.Double.compare`), null input → null cell.
  */
case class NearestCell(child: Expression, cids: Seq[Int],
                       centroids: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nearest_cell expects array<float|double>, got $t")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val matrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val cidArr: Array[Int] = cids.toArray

  override def nullSafeEval(v: Any): Any =
    ArgminKernel.eval(v.asInstanceOf[ArrayData], isFloat, matrix, cidArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("centroidMatrix", matrix, "double[][]")
    val cd = ctx.addReferenceObj("cellIds", cidArr, "int[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, e =>
      ArgminKernel.genBody(ctx, e, get, m, cd, ev.value))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[NearestCell]] with the centroid matrix held as a TORRENT BROADCAST
  * instead of expression state. The plain form attaches the matrix via
  * `addReferenceObj`, so it rides inside the serialized task binary of
  * every stage that uses it — ~65 MB at 64k cells × 128 dims, shipped
  * per stage. Here the expression carries only the two broadcast
  * HANDLES (bytes); executors fetch the matrix once via the broadcast
  * machinery and cache it process-wide, exactly like a broadcast join's
  * hash relation. [[graft.operators.Similarity.IvfIndex]] switches to
  * this form automatically at >= 4,096 cells.
  *
  * Eval semantics are identical to [[NearestCell]] (same kernel:
  * left-to-right (x-y)² accumulation, `java.lang.Double.compare`
  * first-minimum tiebreak, null → null); full `doGenCode`, with the
  * matrix lazily pulled out of the broadcast into a class-level field
  * on first row.
  */
case class NearestCellBroadcast(child: Expression,
    cidsBc: org.apache.spark.broadcast.Broadcast[Array[Int]],
    centroidsBc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nearest_cell expects array<float|double>, got $t")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val matrix: Array[Array[Double]] = centroidsBc.value
  @transient private lazy val cidArr: Array[Int] = cidsBc.value

  override def nullSafeEval(v: Any): Any =
    ArgminKernel.eval(v.asInstanceOf[ArrayData], isFloat, matrix, cidArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // only the HANDLES go into the references array / task binary
    val mBc = ctx.addReferenceObj("centroidBc", centroidsBc,
      "org.apache.spark.broadcast.Broadcast")
    val cdBc = ctx.addReferenceObj("cellIdsBc", cidsBc,
      "org.apache.spark.broadcast.Broadcast")
    val m = ctx.addMutableState("double[][]", "ncbMatrix")
    val cd = ctx.addMutableState("int[]", "ncbCids")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, e =>
      s"""
         |if ($m == null) {
         |  $m = (double[][]) $mBc.value();
         |  $cd = (int[]) $cdBc.value();
         |}
         |${ArgminKernel.genBody(ctx, e, get, m, cd, ev.value)}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The `nprobe` nearest cells for a query vector, ordered by
  * (distance, cell id) ascending — the multi-cell probe pick that
  * previously sorted a per-centroid-literal struct array
  * (`slice(array_sort(...), 1, nprobe)`), with the same plan-size
  * ceiling as the assignment form (see [[NearestCell]]). Query-side
  * only (rows = probes, not corpus), so interpreted eval is fine.
  * Ordering matches `array_sort` on `struct(d2, cid)` exactly: double
  * total order (NaN greatest) then cid. Null input → null.
  */
case class NearestCells(child: Expression, cids: Seq[Int],
                        centroids: Seq[Seq[Double]], nprobe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nearest_cells expects array<float|double>, got $t")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val matrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val cidArr: Array[Int] = cids.toArray

  override def nullSafeEval(v: Any): Any = {
    val e = v.asInstanceOf[ArrayData]
    val fl = isFloat
    val ds = new Array[Double](matrix.length)
    var k = 0
    while (k < matrix.length) {
      val c = matrix(k)
      val n = math.min(e.numElements(), c.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (fl) e.getFloat(i).toDouble else e.getDouble(i)
        val d = x - c(i)
        acc += d * d
        i += 1
      }
      ds(k) = acc
      k += 1
    }
    val idx = Array.tabulate(matrix.length)(identity)
    val sorted = idx.sortWith { (i, j) =>
      val c = java.lang.Double.compare(ds(i), ds(j))
      if (c != 0) c < 0 else cidArr(i) < cidArr(j)
    }
    ArrayData.toArrayData(
      sorted.take(math.min(nprobe, sorted.length)).map(cidArr))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API wrappers + SQL registration for the native expressions. */
object VectorFunctions {
  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def minhash_md5(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashMd5(ColumnBridge.expression(shingles), numHashes))

  def l2_dist(a: Column, b: Column): Column =
    ColumnBridge.column(L2Distance(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def nearest_cell(e: Column, cids: Seq[Int], centroids: Seq[Seq[Double]]): Column =
    ColumnBridge.column(NearestCell(ColumnBridge.expression(e), cids, centroids))

  def nearest_cells(e: Column, cids: Seq[Int], centroids: Seq[Seq[Double]],
                    nprobe: Int): Column =
    ColumnBridge.column(NearestCells(ColumnBridge.expression(e), cids, centroids, nprobe))

  def nearest_cell_bcast(e: Column,
      cidsBc: org.apache.spark.broadcast.Broadcast[Array[Int]],
      centroidsBc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]]): Column =
    ColumnBridge.column(NearestCellBroadcast(ColumnBridge.expression(e), cidsBc, centroidsBc))

  /** Register as SQL functions on a session (the
    * `SparkSessionExtensions` injection path uses the same calls). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_md5",
      exprs => MinHashMd5(exprs.head,
        exprs(1).eval().asInstanceOf[Int]), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2_dist", exprs => L2Distance(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unicode_normalize", exprs => UnicodeNormalize(exprs.head,
        exprs(1).eval().toString), "built-in")
  }
}
