package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.DataType

/** Bridge into two `private[sql]` seams needed to evaluate a
  * DRIVER-BUILT catalyst expression inside a plan (the
  * [[SessionBridge]] pattern — a package-scoped object compiled
  * against the public Spark OSS jars): Column↔Expression conversion
  * and external→catalyst value conversion.
  *
  * Why it exists: the fused ingest probes hold their batch-side
  * relations (bucket→ids, id→vector) ON THE DRIVER already — shipping
  * them into the plan as broadcast LocalTableScans costs one
  * scheduler round (a one-task job) per broadcast per micro-batch,
  * measured as half the probe's per-trigger job count. A custom
  * expression wrapping the driver-held hash table keeps the O(1)
  * hash-join lookup without any build job — but constructing it needs
  * `Column(expr)` and catalyst-typed keys/values, both behind
  * `private[sql]`.
  */
object ExprBridge {

  /** Column wrapping a raw catalyst Expression. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** The catalyst Expression behind a Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** External (JVM) → catalyst value converter for `dt` — e.g.
    * String→UTF8String, Seq→ArrayData — so driver-built lookup tables
    * hold values comparable/returnable inside codegen'd plans.
    */
  def toCatalystConverter(dt: DataType): Any => Any =
    CatalystTypeConverters.createToCatalystConverter(dt)
}
