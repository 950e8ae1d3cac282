package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's `col ->> 'key'` extraction, type-dispatched at analysis:
  *
  *  - STRUCT column (Spark's JSON inference materializes objects as
  *    structs) → field access; primitives are cast to STRING to match
  *    `->>`'s text-returning contract, nested structs stay structs so
  *    chains (`x ->> 'a' ->> 'b'`) keep working
  *  - STRING column (raw JSON text) → `get_json_object(col, '$.key')`
  *
  * The reference relies on DuckDB's equivalent polymorphism: the same
  * handler SQL runs whether `properties` arrived as a JSON string or a
  * decoded object (`kafka.motherduck.yml` handler). The dialect shim
  * rewrites `->>` to this function (SqlDialect.rewriteJsonArrows).
  *
  * Evaluation delegates to the chosen native expression;
  * `get_json_object` is itself non-codegen in Spark, so the fallback
  * costs nothing extra on the JSON-string path, and the struct path is
  * a plain field read. */
case class DuckArrowExtract(child: Expression, key: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, key)
  override def prettyName: String = "duck_extract"
  override def nullable: Boolean = true
  override def foldable: Boolean = child.foldable

  private lazy val keyStr: String = key match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"duck_extract key must be a string literal, got $other")
  }

  @transient private lazy val delegate: Expression = child.dataType match {
    case s: StructType =>
      val idx = s.fieldNames.indexWhere(_.equalsIgnoreCase(keyStr))
      if (idx < 0) Literal(null, StringType)
      else s.fields(idx).dataType match {
        case _: StructType | StringType => GetStructField(child, idx)
        case _ => Cast(GetStructField(child, idx), StringType, Some("UTC"))
      }
    case StringType => GetJsonObject(child, Literal("$." + keyStr))
    case _ => GetJsonObject(Cast(child, StringType, Some("UTC")), Literal("$." + keyStr))
  }

  override def dataType: DataType = delegate.dataType
  override def eval(input: InternalRow): Any = delegate.eval(input)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DuckArrowExtract =
    copy(child = newChildren(0), key = newChildren(1))
}
