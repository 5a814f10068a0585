package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, MapType, StringType, StructType}

/** O(1) lookup into a DRIVER-BUILT hash table, evaluated in-plan.
  *
  * Why a custom Expression (brief preference order (b)): the fused
  * ingest probes already hold their batch-side relations on the
  * driver (bucket→probe-ids from the gather, probe-id→vector for the
  * verify). Shipping each one back into the plan as a broadcast
  * LocalTableScan costs a scheduler round — one single-task job per
  * broadcast per micro-batch, measured as HALF the probe's
  * per-trigger job count (the round-15 fixed-cost accounting: 4 probe
  * jobs of which 2 are these builds). A map LITERAL would avoid the
  * job but catalyst's `GetMapValue` linear-scans the map per row —
  * O(|batch|) per corpus row where the broadcast hash join it
  * replaces is O(1). This expression keeps the hash-table lookup
  * (same asymptotics as the join) with NO build job: the table rides
  * into the task binary exactly once per stage, like any plan
  * literal.
  *
  * Semantics match the broadcast-inner-join it replaces: null child
  * key → null; missing key → null (callers either `explode` the
  * result — dropping the row like a non-matching inner join — or
  * feed a null-rejecting predicate). Keys and values are stored
  * CATALYST-converted at construction ([[LocalLookup.apply]]), so
  * equality inside the plan (UTF8String, boxed numerics) is exact and
  * returned values are plan-native.
  */
case class LocalMapLookupExpr(
    child: Expression,
    table: java.util.HashMap[Any, Any],
    override val dataType: DataType)
    extends UnaryExpression {

  override def nullable: Boolean = true

  override def nullSafeEval(key: Any): Any = table.get(key)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      key => {
        val tableRef = ctx.addReferenceObj(
          "lookupTable", table, classOf[java.util.HashMap[Any, Any]].getName)
        val res = ctx.freshName("res")
        // (Object) cast boxes primitive keys — table keys are the
        // catalyst-converted (boxed) twins, so equality matches the
        // hash join's
        s"""
           |final Object $res = $tableRef.get((Object) $key);
           |${ev.isNull} = ($res == null);
           |if (!${ev.isNull}) {
           |  ${ev.value} = (${CodeGenerator.boxedType(dataType)}) $res;
           |}
         """.stripMargin
      })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "graft_local_lookup"
}

/** Column-level constructor for [[LocalMapLookupExpr]]. */
object LocalLookup {

  /** `key` looked up in a hash table built from `entries` (RAW JVM
    * keys/values — converted to catalyst form here, once, on the
    * driver). Value types must be JVM-object catalyst types (array /
    * string / binary / struct / map): primitive-typed values would
    * need an unboxing path no caller wants yet.
    */
  def apply(
      key: Column,
      keyType: DataType,
      valueType: DataType,
      entries: IterableOnce[(Any, Any)]): Column = {
    require(
      valueType match {
        case _: ArrayType | _: MapType | _: StructType | StringType |
            BinaryType => true
        case _ => false
      },
      s"LocalLookup supports object-typed values, got ${valueType.simpleString}")
    val kc = ExprBridge.toCatalystConverter(keyType)
    val vc = ExprBridge.toCatalystConverter(valueType)
    val table = new java.util.HashMap[Any, Any]()
    entries.iterator.foreach { case (k, v) => table.put(kc(k), vc(v)) }
    ExprBridge.column(
      LocalMapLookupExpr(ExprBridge.expression(key), table, valueType))
  }
}
