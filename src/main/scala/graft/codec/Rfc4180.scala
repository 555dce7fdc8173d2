package graft.codec

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable.ArrayBuffer

/** RFC-4180 CSV codec for list-valued catalog cells.
  *
  * The reference stores list-valued columns (RangeLabels) as one CSV record:
  * encode wraps a value in quotes when it contains `,` or `"` and doubles
  * embedded quotes (list_to_csv_string, WROS/Weighted Raster Overlay
  * Service.pyt:1308-1325); decode parses one record back to a list
  * (csv_string_to_list, pyt:1328-1332).
  *
  * Encoding composes from codegen-friendly built-ins. Decoding a
  * variable-arity record is not expressible with `from_csv` (fixed schema),
  * so it is a custom Catalyst expression.
  */
object Rfc4180 {

  /** Encode one cell per RFC-4180 (pyt:1317-1322): trim, double quotes,
    * wrap if the value contains a comma or quote. Null -> empty (pyt:1313). */
  def encodeCell(c: Column): Column = {
    val t = trim(coalesce(c.cast(StringType), lit("")))
    when(t.contains(",") || t.contains("\""),
      concat(lit("\""), regexp_replace(t, "\"", "\"\""), lit("\"")))
      .otherwise(t)
  }

  /** Encode an array<string> column as one RFC-4180 record (pyt:1308-1325). */
  def encodeList(arr: Column): Column =
    array_join(transform(arr, encodeCell _), ",")

  /** Decode one RFC-4180 record to array<string> (pyt:1328-1332). */
  def decodeList(c: Column): Column =
    GraftBridge.column(Rfc4180Decode(GraftBridge.expression(c)))

  /** Reference-parity Scala implementations (used by the expression and by
    * property tests: decode(encode(xs)) == xs). */
  def encode(xs: Seq[String]): String =
    xs.map { v0 =>
      val v = if (v0 == null) "" else v0.trim
      if (v.contains("\"") || v.contains(","))
        "\"" + v.replace("\"", "\"\"") + "\""
      else v
    }.mkString(",")

  /** Parse one CSV record per RFC 4180. Mirrors Python csv.reader on a
    * single record: quoted fields may contain commas and doubled quotes. */
  def decode(s: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder
    var i = 0
    var inQuotes = false
    val n = s.length
    while (i < n) {
      val ch = s.charAt(i)
      if (inQuotes) {
        if (ch == '"') {
          if (i + 1 < n && s.charAt(i + 1) == '"') { cur.append('"'); i += 1 }
          else inQuotes = false
        } else cur.append(ch)
      } else ch match {
        // a quote only opens quote mode at the start of a field; a quote
        // in the middle of an unquoted field stays literal (matches Python
        // csv.reader, the reference's csv_string_to_list pyt:1328-1332)
        case '"' if cur.length == 0 => inQuotes = true
        case ',' => out += cur.toString; cur.setLength(0)
        case c   => cur.append(c)
      }
      i += 1
    }
    out += cur.toString
    out.toSeq
  }
}

/** Catalyst expression: RFC-4180 single-record decode, string -> array<string>.
  * CodegenFallback keeps it off the whole-stage-codegen hot path; it is only
  * used at the catalog (dimension) edge, never per-cell. */
case class Rfc4180Decode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val parts = Rfc4180.decode(input.asInstanceOf[UTF8String].toString)
    new GenericArrayData(parts.map(UTF8String.fromString).toArray[Any])
  }
  override def prettyName: String = "rfc4180_decode"
  override protected def withNewChildInternal(newChild: Expression): Rfc4180Decode =
    copy(child = newChild)
}
