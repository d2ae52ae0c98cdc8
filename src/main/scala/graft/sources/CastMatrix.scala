package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's only type system: the Access→SQLite cast matrix
  * (SURVEY.md §1.2), recovered from the converter's tableswitch
  * (`mdb-sqlite.jar!com/plausiblelabs/mdb/AccessExporter.class`,
  * `createTable` @bc 105-284 and `populateTable` @bc 316-413).
  *
  * Three layers, kept faithfully:
  *   1. rich source types (here: Spark `StructType`, built from catalog
  *      metadata — never inferred from data);
  *   2. SQLite's five storage classes (the DDL strings below);
  *   3. value rules on copy: Boolean → 0/1 via setInt, MONEY →
  *      `Object.toString` via setString, NULL passthrough.
  *
  * Unknown types are a hard error — the reference throws
  * `SQLException("Unhandled MS Acess datatype")` (sic, @bc 254-284); we
  * fail equally fast with `IllegalArgumentException`.
  */
object CastMatrix {

  /** Jackcess `DataType` names (the Access catalog's type vocabulary). */
  sealed abstract class AccessType(val name: String)
  case object ABinary extends AccessType("BINARY")
  case object AOle extends AccessType("OLE")
  case object ABoolean extends AccessType("BOOLEAN")
  case object AByte extends AccessType("BYTE")
  case object AInt extends AccessType("INT")
  case object ALong extends AccessType("LONG")
  case object AShortDateTime extends AccessType("SHORT_DATE_TIME")
  case object ADouble extends AccessType("DOUBLE")
  case object AFloat extends AccessType("FLOAT")
  case object ANumeric extends AccessType("NUMERIC")
  case object AText extends AccessType("TEXT")
  case object AGuid extends AccessType("GUID")
  case object AMemo extends AccessType("MEMO")
  case object AMoney extends AccessType("MONEY")

  val all: Seq[AccessType] = Seq(ABinary, AOle, ABoolean, AByte, AInt, ALong,
    AShortDateTime, ADouble, AFloat, ANumeric, AText, AGuid, AMemo, AMoney)

  /** Fail-fast catalog lookup (reference parity: unhandled → throw). */
  def fromName(name: String): AccessType =
    all.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"Unhandled MS Access datatype: $name"))

  /** Access type → rich Spark type (layer 1). */
  def sparkType(t: AccessType): DataType = t match {
    case ABinary | AOle       => BinaryType
    case ABoolean             => BooleanType
    case AByte | AInt         => IntegerType
    case ALong                => LongType
    case AShortDateTime       => TimestampType
    case ADouble | AFloat     => DoubleType
    case ANumeric             => DoubleType // deliberately lossy, like the reference
    case AText | AGuid | AMemo => StringType
    case AMoney               => DecimalType(19, 4) // Access MONEY: 4 decimal places
  }

  /** Access type → SQLite DDL storage class (layer 2); the exact strings
    * the converter emits (`createTable` tableswitch cases 1-14).
    */
  def sqliteDdlType(t: AccessType): String = t match {
    case ABinary | AOle                  => "BLOB"
    case ABoolean | AByte | AInt | ALong => "INTEGER"
    case AShortDateTime                  => "DATETIME"
    case ADouble | AFloat | ANumeric     => "DOUBLE"
    case AText | AGuid | AMemo | AMoney  => "TEXT"
  }

  /** Column-level value rule at the SQLite-parity boundary (layer 3):
    * Boolean → 0/1 int (`populateTable` @bc 345-392), MONEY →
    * decimal-to-string (`@bc 316-342`), everything else passthrough.
    * NULLs survive every branch (`@bc 255-273`) — Spark `cast` is
    * null-preserving by construction.
    */
  def parityColumn(c: Column, t: AccessType): Column = t match {
    case ABoolean => when(c.isNull, lit(null).cast(IntegerType))
      .otherwise(when(c, 1).otherwise(0))
    case AMoney   => c.cast(StringType)
    case _        => c
  }

  /** Build a catalog-driven StructType (schema from metadata, no
    * inference) for a table described as (columnName → AccessType).
    */
  def schemaFor(columns: Seq[(String, AccessType)]): StructType =
    StructType(columns.map { case (n, t) => StructField(n, sparkType(t), nullable = true) })

  /** Apply the full §1.2 matrix to a DataFrame whose columns carry the
    * given Access types — the Spark equivalent of the converter's
    * per-table export loop.
    */
  def toSqliteParity(df: DataFrame, columns: Seq[(String, AccessType)]): DataFrame = {
    val byName = columns.toMap
    df.select(df.columns.toSeq.map { n =>
      byName.get(n) match {
        case Some(t) => parityColumn(col(n), t).as(n)
        case None => throw new IllegalArgumentException(
          s"Unhandled MS Access datatype: column $n has no catalog entry")
      }
    }: _*)
  }
}
