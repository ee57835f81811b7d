package graft.expressions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy hitters) sketch expressions over the DataSketches
  * Misra-Gries-style `ItemsSketch[String]`: find the dominant tokens /
  * domains / keys of a 100 TB stream in ONE bounded-memory pass — the
  * boilerplate-detection and hot-key-census primitive at a scale where an
  * exact global count table no longer fits anywhere.
  *
  * Guarantees (no-false-negatives mode): every item whose TRUE count
  * reaches the threshold is reported; each reported estimate `est`
  * satisfies `lb <= true <= ub` with `est - true <= ε·N` for
  * ε ≈ 3.5/maxMapSize. Below `maxMapSize·0.75` distinct items nothing is
  * ever evicted, counts are exact, and output is deterministic — the
  * regime the SQL-oracle query runs in; the eviction regime is spec'd by
  * its bounds instead (order-dependent, like any Misra-Gries merge).
  *
  * Thresholds are BASIS POINTS (int), so both engines derive the cut
  * `ceil(bp·N / 10⁴)` in exact integer arithmetic — a double fraction
  * would make the cut itself FP-sensitive at ties. */
object FrequencyExpressions {
  private val serde = new ArrayOfStringsSerDe

  private[expressions] def toBytes(sk: ItemsSketch[String]): Array[Byte] =
    sk.toByteArray(serde)

  private[expressions] def fromBytes(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)
}

/** `graft_freq_agg(item, maxMapSize)` — build a heavy-hitters sketch of
  * string items; maxMapSize (power of 2) bounds both memory and error. */
case class FreqSketchAgg(
    left: Expression,
    right: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] with BinaryLike[Expression] {

  private lazy val maxMapSize =
    ThetaExpressions.litInt(right, "graft_freq_agg maxMapSize")

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string item column, got ${dt.simpleString}")
  }

  override def prettyName: String = "graft_freq_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buffer: ItemsSketch[String],
      input: InternalRow): ItemsSketch[String] = {
    val v = left.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: ItemsSketch[String],
      other: ItemsSketch[String]): ItemsSketch[String] =
    buffer.merge(other)

  override def eval(buffer: ItemsSketch[String]): Any =
    FrequencyExpressions.toBytes(buffer)

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    FrequencyExpressions.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    FrequencyExpressions.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FreqSketchAgg =
    copy(left = newLeft, right = newRight)
}

/** `graft_freq_merge_agg(sketch, maxMapSize)` — merge pre-built
  * heavy-hitters sketch rows (binary): the rollup-serve aggregate over a
  * sketch artifact. `maxMapSize` must match (or exceed) the build-side map
  * size: an ItemsSketch merge NEVER grows the TARGET's map, so a smaller
  * merge buffer would silently evict what the build sketches kept
  * (measured: a 128-map merge of 200-item exact sketches lost items). */
case class FreqMergeAgg(
    left: Expression,
    right: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] with BinaryLike[Expression] {

  private lazy val maxMapSize =
    ThetaExpressions.litInt(right, "graft_freq_merge_agg maxMapSize")

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch column, got ${dt.simpleString}")
  }

  override def prettyName: String = "graft_freq_merge_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buffer: ItemsSketch[String],
      input: InternalRow): ItemsSketch[String] = {
    val v = left.eval(input)
    if (v != null)
      buffer.merge(FrequencyExpressions.fromBytes(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: ItemsSketch[String],
      other: ItemsSketch[String]): ItemsSketch[String] =
    buffer.merge(other)

  override def eval(buffer: ItemsSketch[String]): Any =
    FrequencyExpressions.toBytes(buffer)

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    FrequencyExpressions.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    FrequencyExpressions.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FreqMergeAgg =
    copy(left = newLeft, right = newRight)
}

/** `graft_freq_items(sketch, bp)` — the reported heavy hitters at a
  * threshold of `bp` basis points of the sketch's stream length, in
  * no-false-negatives mode: array of (item, est, lb, ub) structs, ordered
  * by estimate descending then item (deterministic tie-break). */
case class FreqItems(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  private lazy val bp = ThetaExpressions.litInt(right, "graft_freq_items bp")

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch column, got ${dt.simpleString}")
  }

  override def prettyName: String = "graft_freq_items"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false))), containsNull = false)

  override def nullSafeEval(b: Any, bpAny: Any): Any = {
    val sk = FrequencyExpressions.fromBytes(b.asInstanceOf[Array[Byte]])
    // exact integer ceil(bp*N/10^4) — FP-free, mirrored by the SQL oracle
    val threshold = (bp.toLong * sk.getStreamLength + 9999L) / 10000L
    val rows = sk.getFrequentItems(threshold, ErrorType.NO_FALSE_NEGATIVES)
      .sortBy(r => (-r.getEstimate, r.getItem))
    new GenericArrayData(rows.toSeq.map { r =>
      InternalRow(UTF8String.fromString(r.getItem), r.getEstimate,
        r.getLowerBound, r.getUpperBound)
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FreqItems =
    copy(left = newLeft, right = newRight)
}
