package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{DotProduct, LshBuckets, Md5Prefix, MinhashSig, SkipgramPairs, TopCells}

/** Engine extensions, installed via `spark.sql.extensions`: registers the
  * native vector expressions as SQL functions so both the Column API
  * (`call_function("graft_dot", ...)`) and plain SQL can reach them. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def checkArity(name: String, expected: Int, actual: Int): Unit =
    if (actual != expected)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> expected.toString,
          "actualNum" -> actual.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        checkArity("graft_dot", 2, children.length)
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_top_cells"),
      new ExpressionInfo(classOf[TopCells].getName, "graft_top_cells"),
      (children: Seq[Expression]) => {
        checkArity("graft_top_cells", 5, children.length)
        TopCells(children(0), children(1), children(2), children(3), children(4))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_lsh_buckets"),
      new ExpressionInfo(classOf[LshBuckets].getName, "graft_lsh_buckets"),
      (children: Seq[Expression]) => {
        checkArity("graft_lsh_buckets", 4, children.length)
        LshBuckets(children(0), children(1), children(2), children(3))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_md5_prefix"),
      new ExpressionInfo(classOf[Md5Prefix].getName, "graft_md5_prefix"),
      (children: Seq[Expression]) => {
        checkArity("graft_md5_prefix", 2, children.length)
        Md5Prefix(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinhashSig].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        checkArity("graft_minhash", 4, children.length)
        MinhashSig(children(0), children(1), children(2), children(3))
      }))
    // Spark's internal runtime-filter Bloom expressions, surfaced as
    // callable functions for the explicit bloom-pruned join (Spark only
    // auto-injects them under its own runtime-filtering rule)
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (children: Seq[Expression]) => {
        checkArity("graft_bloom_agg", 3, children.length)
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children(0), children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (children: Seq[Expression]) => {
        checkArity("graft_might_contain", 2, children.length)
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_skipgram"),
      new ExpressionInfo(classOf[SkipgramPairs].getName, "graft_skipgram"),
      (children: Seq[Expression]) => {
        checkArity("graft_skipgram", 2, children.length)
        SkipgramPairs(children(0), children(1))
      }))
    // theta-sketch set-operation family (intersection/difference — the ops
    // HLL can't do); same TypedImperativeAggregate tier as Spark's own
    // DataSketches aggregates
    ext.injectFunction((
      new FunctionIdentifier("graft_theta_agg"),
      new ExpressionInfo(classOf[graft.expressions.ThetaSketchAgg].getName, "graft_theta_agg"),
      (children: Seq[Expression]) => {
        checkArity("graft_theta_agg", 2, children.length)
        graft.expressions.ThetaSketchAgg(children(0), children(1))
          .toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_theta_union_agg"),
      new ExpressionInfo(classOf[graft.expressions.ThetaUnionAgg].getName, "graft_theta_union_agg"),
      (children: Seq[Expression]) => {
        checkArity("graft_theta_union_agg", 1, children.length)
        graft.expressions.ThetaUnionAgg(children.head).toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_theta_estimate"),
      new ExpressionInfo(classOf[graft.expressions.ThetaEstimate].getName, "graft_theta_estimate"),
      (children: Seq[Expression]) => {
        checkArity("graft_theta_estimate", 1, children.length)
        graft.expressions.ThetaEstimate(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_theta_intersect"),
      new ExpressionInfo(classOf[graft.expressions.ThetaIntersect].getName, "graft_theta_intersect"),
      (children: Seq[Expression]) => {
        checkArity("graft_theta_intersect", 2, children.length)
        graft.expressions.ThetaIntersect(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_theta_diff"),
      new ExpressionInfo(classOf[graft.expressions.ThetaDiff].getName, "graft_theta_diff"),
      (children: Seq[Expression]) => {
        checkArity("graft_theta_diff", 2, children.length)
        graft.expressions.ThetaDiff(children(0), children(1))
      }))
    // heavy-hitters (frequent-items) sketch family — same tier
    ext.injectFunction((
      new FunctionIdentifier("graft_freq_agg"),
      new ExpressionInfo(classOf[graft.expressions.FreqSketchAgg].getName, "graft_freq_agg"),
      (children: Seq[Expression]) => {
        checkArity("graft_freq_agg", 2, children.length)
        graft.expressions.FreqSketchAgg(children(0), children(1))
          .toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_freq_merge_agg"),
      new ExpressionInfo(classOf[graft.expressions.FreqMergeAgg].getName, "graft_freq_merge_agg"),
      (children: Seq[Expression]) => {
        checkArity("graft_freq_merge_agg", 2, children.length)
        graft.expressions.FreqMergeAgg(children(0), children(1))
          .toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_freq_items"),
      new ExpressionInfo(classOf[graft.expressions.FreqItems].getName, "graft_freq_items"),
      (children: Seq[Expression]) => {
        checkArity("graft_freq_items", 2, children.length)
        graft.expressions.FreqItems(children(0), children(1))
      }))
    // declarative HOF dot products upgrade to the native expression
    ext.injectOptimizerRule(_ => graft.plans.RewriteHofDotProduct)
  }
}
