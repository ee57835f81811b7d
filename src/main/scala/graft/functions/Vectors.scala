package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `ArrayType` embedding columns, written with
  * higher-order functions (`zip_with`/`aggregate`) — no UDF, no
  * serialization boundary; evaluates inside the generated code of the
  * enclosing stage.
  *
  * Arithmetic is forced to double (the parquet column is array<float>) so
  * accumulation order and precision match the DuckDB oracle formula
  * exactly: a sequential left-fold over the list in both engines.
  */
object Vectors {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
