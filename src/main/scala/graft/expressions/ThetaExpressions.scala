package graft.expressions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Sketches, Union}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Theta-sketch expressions (Apache DataSketches): the SET-OPERATION
  * sketch family the built-in `hll_*` functions lack. An HLL sketch can
  * only union; a theta sketch keeps a uniform hash SAMPLE of the distinct
  * items, so two sketches also support intersection and difference —
  * "how many training docs overlap the benchmark corpus", "how many of
  * yesterday's users are gone today" — each answered from two ~KB sketch
  * rows instead of a distinct-join of two 100 TB corpora.
  *
  * Same extension tier as Spark's own DataSketches aggregates (modeled on
  * `HllSketchAgg`, datasketchesAggregates.scala in the Spark source): a
  * `TypedImperativeAggregate` holds the live `Union` as an object buffer
  * (serialized only at the partial-aggregation exchange), so build cost is
  * one map-side-combined pass. The scalar set-op expressions run on merged
  * single-row sketches — `CodegenFallback` is fine OFF the hot path.
  *
  * Determinism: theta sketches hash with a fixed default seed, and union /
  * intersection / A-not-B results are seed- and order-independent sets of
  * retained hashes, so estimates are reproducible across runs, partitions
  * and AQE re-plans. Below ~4·2^lgK distinct items the sketch retains
  * EVERY hash (sampling never kicks in) and estimates are exact.
  */
object ThetaExpressions {
  /** Default lgK: 2¹² nominal entries ≈ 1.6% RSE, ~32 KB max per sketch. */
  val DefaultLgK = 12

  private[expressions] def heapify(bytes: Array[Byte]): Sketch =
    Sketches.heapifySketch(Memory.wrap(bytes))

  private[expressions] def newUnion(lgK: Int): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  private[expressions] def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
}

/** `graft_theta_agg(value, lgK)` — build a theta sketch of the distinct
  * `value`s (string or integral). Returns the compact sketch as binary. */
case class ThetaSketchAgg(
    left: Expression,
    right: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with BinaryLike[Expression] {

  private lazy val lgK = ThetaExpressions.litInt(right, "graft_theta_agg lgK")

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string or integral value column, got ${dt.simpleString}")
  }

  override def prettyName: String = "graft_theta_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union = ThetaExpressions.newUnion(lgK)

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = left.eval(input)
    if (v != null) v match {
      case s: UTF8String => buffer.update(s.toString)
      case l: java.lang.Long => buffer.update(l.longValue())
      case i: java.lang.Integer => buffer.update(i.longValue())
      case other => throw new IllegalStateException(
        s"unsupported theta input ${other.getClass}")
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaExpressions.newUnion(lgK)
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ThetaSketchAgg =
    copy(left = newLeft, right = newRight)
}

/** `graft_theta_union_agg(sketch)` — merge pre-built theta sketch rows
  * (binary) into one: the rollup-serve aggregate over a sketch artifact. */
case class ThetaUnionAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch column, got ${dt.simpleString}")
  }

  override def prettyName: String = "graft_theta_union_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union =
    ThetaExpressions.newUnion(ThetaExpressions.DefaultLgK)

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaExpressions.newUnion(ThetaExpressions.DefaultLgK)
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
}

/** `graft_theta_estimate(sketch)` — distinct-count estimate of a sketch. */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch column, got ${dt.simpleString}")
  }
  override def prettyName: String = "graft_theta_estimate"
  override def dataType: DataType = DoubleType
  override def nullSafeEval(b: Any): Any =
    ThetaExpressions.heapify(b.asInstanceOf[Array[Byte]]).getEstimate
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** `graft_theta_intersect(a, b)` — sketch of the set intersection. */
case class ThetaIntersect(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two binary sketch columns, got ${l.simpleString}, ${r.simpleString}")
    }
  override def prettyName: String = "graft_theta_intersect"
  override def dataType: DataType = BinaryType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val inter = SetOperation.builder().buildIntersection()
    inter.intersect(ThetaExpressions.heapify(a.asInstanceOf[Array[Byte]]))
    inter.intersect(ThetaExpressions.heapify(b.asInstanceOf[Array[Byte]]))
    inter.getResult.toByteArray
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ThetaIntersect =
    copy(left = newLeft, right = newRight)
}

/** `graft_theta_diff(a, b)` — sketch of the set difference A \ B. */
case class ThetaDiff(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two binary sketch columns, got ${l.simpleString}, ${r.simpleString}")
    }
  override def prettyName: String = "graft_theta_diff"
  override def dataType: DataType = BinaryType
  override def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildANotB().aNotB(
      ThetaExpressions.heapify(a.asInstanceOf[Array[Byte]]),
      ThetaExpressions.heapify(b.asInstanceOf[Array[Byte]]))
      .toByteArray
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ThetaDiff =
    copy(left = newLeft, right = newRight)
}
