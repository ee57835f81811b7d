package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native dot product over two array<double> columns.
  *
  * Semantically identical to the higher-order-function formulation
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, x) -> acc + x)`
  * — same sequential left-fold, same doubles, same null semantics (null
  * array, null element, or length mismatch → null) — so every SQL oracle
  * stays valid. The difference is execution: higher-order functions are
  * interpreted (no codegen, per-element closure dispatch); this expression
  * generates a tight primitive loop inside whole-stage codegen. At 100 TB
  * the dot product is the innermost loop of every ANN / embedding-dedup
  * scan — this is where a native `Expression` (preferred over any UDF)
  * earns its keep.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      sum += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |final int $n = $l.numElements();
         |if ($n != $r.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($l.isNullAt($i) || $r.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += $l.getDouble($i) * $r.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $sum; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

private object VectorExprUtil {
  /** Spark's `round(x, 4)` for doubles, exactly (RoundBase semantics):
    * NaN/Infinity pass through; otherwise decimal HALF_UP at scale 4 on
    * the Double.toString-based BigDecimal — bit-identical to the
    * `round(..., 4)` the SQL oracles compute. Fast path: away from a
    * decimal .00005 tie (the shortest-string value sits within ~1e-13 of
    * v·10⁴, far under the 1e-9 guard band) plain floor(x·10⁴ + 0.5)/10⁴
    * lands on the identical double, so BigDecimal only runs for the rare
    * near-tie values. */
  def round4(v: Double): Double =
    if (v.isNaN || v.isInfinity) v
    else {
      val scaled = v * 10000.0
      val frac = scaled - math.floor(scaled)
      if (math.abs(frac - 0.5) > 1e-9) math.floor(scaled + 0.5) / 10000.0
      else java.math.BigDecimal.valueOf(v).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    }

  /** Spark SQL double ordering (SQLOrderingUtil): -0.0 == 0.0, NaN largest. */
  def cmpDouble(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)
}

/** Top-k nearest centroids of the broadcast codebook for one embedding:
  * `graft_top_cells(emb, flat, nrms, ids, k)` returns the `k` centroid ids
  * ordered by (round(cosine, 4) DESC, id ASC) — the IVF cell assignment
  * (k=1) and query multi-probe (k=nprobe) in ONE tight loop.
  *
  * `flat` is the row-major concatenation of the C centroid embeddings
  * (C × d doubles), `nrms` their precomputed norms, `ids` their ids —
  * three flat arrays from the single-row broadcast codebook, so the whole
  * argmax is O(C·d) primitive multiply-adds per row with zero per-centroid
  * object churn. The equivalent declarative formulation (a `transform`
  * building C structs + `array_sort`) is semantically identical but runs
  * interpreted per element — ~20x slower at C=1000 (measured; HOFs get no
  * codegen). Per-row work is O(C·d), so CodegenFallback's row-at-a-time
  * dispatch overhead is immaterial — codegen would inline this same loop.
  *
  * Semantics mirrored in the SQL oracle: affinity = round(dot/(|e||c|), 4)
  * with Spark's HALF_UP double rounding, ties broken by smaller id, doubles
  * ordered with -0.0 == 0.0 and NaN largest (SQLOrderingUtil). Null input
  * or a shape mismatch (|flat| != C·d, d = 0) -> null. */
case class TopCells(emb: Expression, flat: Expression, nrms: Expression,
    ids: Expression, k: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(emb, flat, nrms, ids, k)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_top_cells"

  override def checkInputDataTypes(): TypeCheckResult = {
    def dArr(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true; case _ => false
    }
    val ok = dArr(emb.dataType) && dArr(flat.dataType) && dArr(nrms.dataType) &&
      (ids.dataType match { case ArrayType(LongType, _) => true; case _ => false }) &&
      k.dataType == IntegerType && k.foldable
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<double>, array<double>, " +
        s"array<bigint>, foldable int), got ${children.map(_.dataType.simpleString)}")
  }

  @transient private lazy val kVal: Int = k.eval(null).asInstanceOf[Int]

  /** The whole top-k loop, callable by-reference from generated code (the
    * CodegenFallback route would instead COPY the input row — including the
    * entire flat codebook — once per corpus row). Returns null on shape
    * mismatch. */
  def compute(e: ArrayData, f: ArrayData, nr: ArrayData, id: ArrayData): ArrayData = {
    val d = e.numElements()
    val c = id.numElements()
    if (d == 0 || c == 0 || f.numElements() != c * d || nr.numElements() != c) return null
    var j = 0
    // a null embedding element poisons every affinity in the declarative
    // formulation — propagate null rather than silently reading 0.0
    while (j < d) { if (e.isNullAt(j)) return null; j += 1 }
    j = 0
    var ss = 0.0
    while (j < d) { val x = e.getDouble(j); ss += x * x; j += 1 }
    val normE = math.sqrt(ss)
    val n = math.min(kVal, c)
    val topAff = new Array[Double](n)
    val topId  = new Array[Long](n)
    var filled = 0
    var ci = 0
    while (ci < c) {
      var dot = 0.0
      val base = ci * d
      j = 0
      while (j < d) { dot += e.getDouble(j) * f.getDouble(base + j); j += 1 }
      val aff = VectorExprUtil.round4(dot / (normE * nr.getDouble(ci)))
      val cid = id.getLong(ci)
      // insertion position: ordered by (aff desc, id asc)
      var pos = filled
      while (pos > 0 && {
        val cmp = VectorExprUtil.cmpDouble(aff, topAff(pos - 1))
        cmp > 0 || (cmp == 0 && cid < topId(pos - 1))
      }) pos -= 1
      if (pos < n) {
        val last = math.min(filled, n - 1)
        var m = last
        while (m > pos) { topAff(m) = topAff(m - 1); topId(m) = topId(m - 1); m -= 1 }
        topAff(pos) = aff
        topId(pos) = cid
        if (filled < n) filled += 1
      }
      ci += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(topId, filled))
  }

  override def eval(input: InternalRow): Any = {
    val eAny = emb.eval(input)
    val fAny = flat.eval(input)
    val nAny = nrms.eval(input)
    val iAny = ids.eval(input)
    if (eAny == null || fAny == null || nAny == null || iAny == null) null
    else compute(eAny.asInstanceOf[ArrayData], fAny.asInstanceOf[ArrayData],
      nAny.asInstanceOf[ArrayData], iAny.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val eGen = emb.genCode(ctx)
    val fGen = flat.genCode(ctx)
    val nGen = nrms.genCode(ctx)
    val iGen = ids.genCode(ctx)
    val self = ctx.addReferenceObj("topCellsExpr", this, classOf[TopCells].getName)
    val ad = classOf[ArrayData].getName
    ev.copy(code =
      code"""
        |${eGen.code}
        |${fGen.code}
        |${nGen.code}
        |${iGen.code}
        |boolean ${ev.isNull} = true;
        |$ad ${ev.value} = null;
        |if (!${eGen.isNull} && !${fGen.isNull} && !${nGen.isNull} && !${iGen.isNull}) {
        |  ${ev.value} = $self.compute(${eGen.value}, ${fGen.value}, ${nGen.value}, ${iGen.value});
        |  ${ev.isNull} = ${ev.value} == null;
        |}
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopCells =
    copy(emb = c(0), flat = c(1), nrms = c(2), ids = c(3), k = c(4))
}

private[expressions] object HashUtil {
  /** Per-thread MessageDigest — expression instances are shared across
    * tasks by codegen references, and MessageDigest is stateful. */
  private val md5 = ThreadLocal.withInitial(() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** The first `nibbles` hex digits of md5(bytes) as a long — identical to
    * the `instr('0123456789abcdef', substring(md5(s), i, 1)) - 1` digit
    * arithmetic the declarative formulation (and the SQL oracle) runs,
    * without materializing the hex string. */
  def md5Prefix(bytes: Array[Byte], nibbles: Int): Long = {
    val digest = md5.get()
    digest.reset()
    val h = digest.digest(bytes)
    var v = 0L
    var i = 0
    while (i < nibbles) {
      val b = h(i >> 1) & 0xFF
      val nib = if ((i & 1) == 0) b >> 4 else b & 0xF
      v = (v << 4) | nib
      i += 1
    }
    v
  }
}

/** `graft_md5_prefix(s, nibbles)`: the first `nibbles` hex digits of
  * md5(s) as a bigint — the base hash of the MinHash family and the
  * SimHash token value. Semantically identical to the declarative
  * md5 → substring → instr digit arithmetic (what the SQL oracles run),
  * but one native call instead of an interpreted let-bound HOF per row:
  * the md5 hex string is never materialized and the per-nibble
  * `substring`/`instr` expression tree disappears. */
case class Md5Prefix(child: Expression, nibbles: Expression)
    extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = nibbles
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_prefix"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType &&
      nibbles.dataType == IntegerType && nibbles.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, foldable int), got " +
        s"${children.map(_.dataType.simpleString)}")

  @transient private lazy val n: Int = nibbles.eval(null).asInstanceOf[Int]

  def compute(s: org.apache.spark.unsafe.types.UTF8String): Long =
    HashUtil.md5Prefix(s.getBytes, n)

  override def nullSafeEval(s: Any, k: Any): Any =
    compute(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("md5PrefixExpr", this, classOf[Md5Prefix].getName)
    nullSafeCodeGen(ctx, ev, (s, _) => s"${ev.value} = $self.compute($s);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Md5Prefix =
    copy(child = newLeft, nibbles = newRight)
}

/** `graft_minhash(shingles, a, b, p)`: the full MinHash signature of a
  * shingle array in ONE loop — per shingle one md5 (7-nibble base hash),
  * then every universal-hash slot `(a_i*h + b_i) mod p` folded into its
  * running min. Output: array<long> of length k = |a|.
  *
  * Replaces `transform(shingles, baseHash)` + k × `array_min(transform(
  * hashes, ...))` — 17 interpreted HOF passes per document (HOFs get no
  * codegen) — with one native call that the SQL oracle's
  * `list_aggregate(list_transform(...), 'min')` formulation mirrors
  * value-for-value. Null array -> null; null shingle elements are
  * skipped (Spark's transform would propagate null into array_min, which
  * ignores nulls — same outcome). Empty array -> null (callers filter
  * size > 0 first). */
case class MinhashSig(shingles: Expression, aCoefs: Expression,
    bCoefs: Expression, p: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(shingles, aCoefs, bCoefs, p)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (shingles.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) => true
      case _ => false
    }) && (aCoefs.dataType match {
      case ArrayType(LongType, _) => true; case _ => false
    }) && aCoefs.foldable && (bCoefs.dataType match {
      case ArrayType(LongType, _) => true; case _ => false
    }) && bCoefs.foldable && p.dataType == LongType && p.foldable
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, foldable array<bigint> x2, " +
        s"foldable bigint), got ${children.map(_.dataType.simpleString)}")
  }

  @transient private lazy val aArr: Array[Long] =
    aCoefs.eval(null).asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val bArr: Array[Long] =
    bCoefs.eval(null).asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val pVal: Long = p.eval(null).asInstanceOf[Long]

  def compute(sh: ArrayData): ArrayData = {
    val n = sh.numElements()
    if (n == 0) return null
    val k = aArr.length
    val mins = Array.fill(k)(Long.MaxValue)
    var contributed = false
    var i = 0
    while (i < n) {
      if (!sh.isNullAt(i)) {
        contributed = true
        val h = HashUtil.md5Prefix(sh.getUTF8String(i).getBytes, 7)
        var s = 0
        while (s < k) {
          val v = (aArr(s) * h + bArr(s)) % pVal
          if (v < mins(s)) mins(s) = v
          s += 1
        }
      }
      i += 1
    }
    // all-null shingles: the declarative array_min yields null per slot,
    // not a MaxValue signature that would band-collide with other
    // degenerate documents
    if (!contributed) return null
    new GenericArrayData(mins)
  }

  override def eval(input: InternalRow): Any = {
    val shAny = shingles.eval(input)
    if (shAny == null) null else compute(shAny.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val shGen = shingles.genCode(ctx)
    val self = ctx.addReferenceObj("minhashExpr", this, classOf[MinhashSig].getName)
    val ad = classOf[ArrayData].getName
    ev.copy(code =
      code"""
        |${shGen.code}
        |boolean ${ev.isNull} = true;
        |$ad ${ev.value} = null;
        |if (!${shGen.isNull}) {
        |  ${ev.value} = $self.compute(${shGen.value});
        |  ${ev.isNull} = ${ev.value} == null;
        |}
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinhashSig =
    copy(shingles = c(0), aCoefs = c(1), bCoefs = c(2), p = c(3))
}

/** All [[graft.operators.Similarity.LshTables]] sign-bit LSH buckets of one
  * embedding in one pass: `graft_lsh_buckets(emb, planes, planesPerTable,
  * maxDims)` returns array<long> with one bucket per table; bit p of table
  * t is [dot(emb, plane_{t·pp+p}) > 0].
  *
  * `planes` is ONE flat literal (tables × planesPerTable × maxDims doubles,
  * row-major, stride maxDims) — replacing the 4096-node literal forest the
  * per-plane Column formulation produced, which blew codegen out of
  * whole-stage and evaluated interpreted. The dot uses the first
  * min(d, maxDims) dims — identical to the sliced-coefficient fold the SQL
  * oracle runs. A null embedding -> null; a null element makes every
  * plane's dot null, which the old `when(dot > 0, ...)` formulation turned
  * into bit 0 — mirrored here as all-zero buckets. */
case class LshBuckets(emb: Expression, planes: Expression,
    planesPerTable: Expression, maxDims: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(emb, planes, planesPerTable, maxDims)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lsh_buckets"

  override def checkInputDataTypes(): TypeCheckResult = {
    def dArr(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true; case _ => false
    }
    val ok = dArr(emb.dataType) && dArr(planes.dataType) && planes.foldable &&
      planesPerTable.dataType == IntegerType && planesPerTable.foldable &&
      maxDims.dataType == IntegerType && maxDims.foldable
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, foldable array<double>, " +
        s"foldable int, foldable int), got ${children.map(_.dataType.simpleString)}")
  }

  @transient private lazy val pp: Int = planesPerTable.eval(null).asInstanceOf[Int]
  @transient private lazy val md: Int = maxDims.eval(null).asInstanceOf[Int]
  @transient private lazy val planeArr: Array[Double] =
    planes.eval(null).asInstanceOf[ArrayData].toDoubleArray()

  /** All-table bucket loop, callable by-reference from generated code. */
  def compute(e: ArrayData): ArrayData = {
    val d = e.numElements()
    val nTables = planeArr.length / md / pp
    val out = new Array[Long](nTables)
    val n = math.min(d, md)
    var j = 0
    while (j < d) { if (e.isNullAt(j)) return new GenericArrayData(out); j += 1 }
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var p = 0
      while (p < pp) {
        val base = (t * pp + p) * md
        var dot = 0.0
        j = 0
        while (j < n) { dot += e.getDouble(j) * planeArr(base + j); j += 1 }
        if (dot > 0) bucket |= 1L << p
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any = {
    val eAny = emb.eval(input)
    if (eAny == null) null else compute(eAny.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val eGen = emb.genCode(ctx)
    val self = ctx.addReferenceObj("lshBucketsExpr", this, classOf[LshBuckets].getName)
    val ad = classOf[ArrayData].getName
    ev.copy(code =
      code"""
        |${eGen.code}
        |boolean ${ev.isNull} = ${eGen.isNull};
        |$ad ${ev.value} = null;
        |if (!${ev.isNull}) {
        |  ${ev.value} = $self.compute(${eGen.value});
        |}
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): LshBuckets =
    copy(emb = c(0), planes = c(1), planesPerTable = c(2), maxDims = c(3))
}

/** `graft_skipgram(tokens, window)`: all unordered context-window token
  * pairs of one document in a single pass — position i pairs with
  * positions i+1..i+window, each pair normalized to (min, max) string
  * order. Output: array<struct<a:string, b:string>>.
  *
  * Semantically identical to the declarative formulation
  * `flatten(transform(sequence(1, n-1), i -> transform(sequence(i+1,
  * least(i+window, n)), j -> struct(least(t[i], t[j]), greatest(...)))))`
  * — which runs as interpreted HOFs (no codegen) and allocates a nested
  * array per position before flattening. This expression emits the final
  * flat array in one loop inside whole-stage codegen; the SQL oracle's
  * `list_transform`/`flatten` formulation mirrors it value-for-value.
  * Null array → null; null token elements are skipped as pair members
  * (the built-in tokenizer never produces them); fewer than 2 tokens →
  * empty array. */
case class SkipgramPairs(tokens: Expression, window: Expression)
    extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = window
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_skipgram"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (tokens.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) => true
      case _ => false
    }) && window.dataType == IntegerType && window.foldable
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, foldable int), got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  @transient private lazy val w: Int = {
    val v = window.eval(null).asInstanceOf[Int]
    require(v >= 1, s"$prettyName window must be >= 1, got $v")
    v
  }

  def compute(ts: ArrayData): ArrayData = {
    val n = ts.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n - 1) {
      if (!ts.isNullAt(i)) {
        val ti = ts.getUTF8String(i)
        val hi = math.min(i + w, n - 1)
        var j = i + 1
        while (j <= hi) {
          if (!ts.isNullAt(j)) {
            val tj = ts.getUTF8String(j)
            val (a, b) = if (ti.compareTo(tj) <= 0) (ti, tj) else (tj, ti)
            // UTF8String from ArrayData may share buffers; clone for the row
            out += InternalRow(a.clone(), b.clone())
          }
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def eval(input: InternalRow): Any = {
    val tAny = tokens.eval(input)
    if (tAny == null) null else compute(tAny.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tGen = tokens.genCode(ctx)
    val self = ctx.addReferenceObj("skipgramExpr", this, classOf[SkipgramPairs].getName)
    val ad = classOf[ArrayData].getName
    ev.copy(code =
      code"""
        |${tGen.code}
        |boolean ${ev.isNull} = ${tGen.isNull};
        |$ad ${ev.value} = null;
        |if (!${ev.isNull}) {
        |  ${ev.value} = $self.compute(${tGen.value});
        |}
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SkipgramPairs =
    copy(tokens = newLeft, window = newRight)
}
