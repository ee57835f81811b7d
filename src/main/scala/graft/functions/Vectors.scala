package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `ArrayType` embedding columns.
  *
  * The dot product routes to the native codegen'd
  * [[graft.expressions.DotProduct]] expression (registered by
  * [[graft.engine.GraftExtensions]] — a tight primitive loop inside
  * whole-stage codegen), with the equivalent higher-order-function
  * formulation kept as [[dotHof]] for sessions without the extension.
  *
  * Arithmetic is forced to double (the parquet column is array<float>) so
  * accumulation order and precision match the DuckDB oracle formula
  * exactly: a sequential left-fold over the list in both engines — the
  * native expression implements the same fold.
  */
object Vectors {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    call_function("graft_dot", asDouble(a), asDouble(b))

  /** Pure built-in fallback with identical semantics (interpreted). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
