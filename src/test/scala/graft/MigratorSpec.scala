package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.DecimalType

import graft.sources.{CsvJsonEgress, SqliteDdl, TableMigrator}
import graft.sources.CastMatrix._

/** Full-catalog migration (S4→K1) and the S6 all-string CSV reader. */
class MigratorSpec extends SparkSpec {

  test("catalog migration: DDL + parity casts + unique assertion per table") {
    import spark.implicits._
    val licence = Seq((1L, "Fixed Link", true, BigDecimal("150.0000")),
      (2L, "Mobile", false, BigDecimal("75.5000")))
      .toDF("licenceid", "licencetype", "active", "fee")
      .select($"licenceid", $"licencetype", $"active",
        $"fee".cast(DecimalType(19, 4)).as("fee"))
    val catalog = Seq(TableMigrator.TableDef(
      "licence",
      Seq("licenceid" -> ALong, "licencetype" -> AText,
        "active" -> ABoolean, "fee" -> AMoney),
      Seq(SqliteDdl.IndexDef("pk", Seq("licenceid"), unique = true))))

    var written = Map.empty[String, DataFrame]
    val results = TableMigrator.migrate(spark, catalog,
      source = _ => licence,
      sink = (name, df) => written += name -> df,
      metricGraceSec = 0) // recording sink runs no action: skip the metric wait

    assert(results.head.ddl == Seq(
      "CREATE TABLE licence (licenceid INTEGER, licencetype TEXT, active INTEGER, fee TEXT);",
      "CREATE UNIQUE INDEX licence_pk ON licence (licenceid);"))
    assert(results.head.rows == 2)
    val rows = written("licence").collect()
    assert(rows(0).getInt(2) == 1 && rows(1).getInt(2) == 0) // boolean→0/1
    assert(rows(0).getString(3) == "150.0000")               // money→string
  }

  test("K1 transport: generated DDL + batched inserts execute on a Connection") {
    import spark.implicits._

    val rec = new JdbcRecorder

    val licence = Seq((1L, "Fixed Link", true, BigDecimal("150.0000")),
      (2L, "Mobile", false, BigDecimal("75.5000")))
      .toDF("licenceid", "licencetype", "active", "fee")
      .select($"licenceid", $"licencetype", $"active",
        $"fee".cast(DecimalType(19, 4)).as("fee"))
    val catalog = Seq(TableMigrator.TableDef(
      "licence",
      Seq("licenceid" -> ALong, "licencetype" -> AText,
        "active" -> ABoolean, "fee" -> AMoney),
      Seq(SqliteDdl.IndexDef("pk", Seq("licenceid"), unique = true))))

    val results =
      TableMigrator.migrateJdbc(spark, catalog, _ => licence, rec.connection)

    // The statements that ran are exactly the generated DDL, in order.
    assert(rec.executed.toSeq == results.head.ddl)
    assert(rec.prepared.toSeq == Seq(
      "INSERT INTO licence (licenceid, licencetype, active, fee) VALUES (?, ?, ?, ?)"))
    // Every row arrived through the batch path with §1.2 parity values.
    assert(results.head.rows == 2 && rec.inserted.size == 2)
    assert(rec.inserted(0) == Vector(1L, "Fixed Link", 1, "150.0000"))
    assert(rec.inserted(1) == Vector(2L, "Mobile", 0, "75.5000"))
    // The table writes as ONE transaction: autocommit suspended, a
    // single commit, caller's autocommit restored — never a rollback.
    assert(rec.txEvents.toSeq ==
      Seq("setAutoCommit(false)", "commit", "setAutoCommit(true)"))
  }

  test("migration fails fast when a unique index is violated") {
    import spark.implicits._
    val dup = Seq((1L, "a"), (1L, "b")).toDF("id", "name")
    val catalog = Seq(TableMigrator.TableDef("t",
      Seq("id" -> ALong, "name" -> AText),
      Seq(SqliteDdl.IndexDef("pk", Seq("id"), unique = true))))
    val e = intercept[IllegalArgumentException](
      TableMigrator.migrate(spark, catalog, _ => dup, (_, _) => ()))
    assert(e.getMessage.contains("UNIQUE violated"))
  }

  test("S6: header CSV reads back all-string, no inference") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("s6").toString
    val df = Seq((1, 2.5, "x")).toDF("a", "b", "c")
    CsvJsonEgress.writeCsvSingle(df, s"$dir/t.csv")
    val back = CsvJsonEgress.readCsvAllStrings(spark, s"$dir/t.csv")
    assert(back.schema.fields.forall(_.dataType.typeName == "string"))
    assert(back.columns.toSeq == Seq("a", "b", "c"))
    assert(back.head().getString(1) == "2.5")
  }
}
