package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import CastMatrix.AccessType

/** Full-database migration operator (SURVEY.md §2.1 S4 → §2.2 K1): the
  * converter's `createTables` + `populateTables` loop, catalog-driven —
  * enumerate every table, emit its DDL (type matrix §1.2), apply the
  * value rules, write. The reference copies *everything* — every table,
  * every column, every index — with no selection; so does this.
  *
  * Transport is pluggable: parquet locally (`migrate`), `df.write.jdbc`
  * when a JDBC sink exists. Per-table atomicity replaces the reference's
  * single whole-database transaction (the right unit at scale; each
  * table's write is independently retryable). Tables migrate
  * sequentially like the reference, but each table's copy is a fully
  * parallel distributed write.
  */
object TableMigrator {

  final case class TableDef(
      name: String,
      columns: Seq[(String, AccessType)],
      indexes: Seq[SqliteDdl.IndexDef] = Nil)

  final case class MigrationResult(table: String, ddl: Seq[String], rows: Long)

  /** Migrate one catalog of tables: for each, emit DDL statements,
    * apply the §1.2 parity casts, verify UNIQUE indexes as assertions,
    * and hand the frame to `sink`.
    *
    * Row counts are observed DURING the sink's write (the `migrateJdbc`
    * treatment for this path): an `observe` metric rides the frame, so
    * a sink that executes it — the normal parquet/JDBC case — yields
    * the count from the same job, not from a second full scan-and-cast
    * of the source. Only a sink that never runs an action (a recording
    * test sink) falls back to counting.
    *
    * SINK CONTRACT: a sink must either FULLY materialize the frame (any
    * complete action — a parquet/JDBC write, collect) or run no action
    * at all. A sink that runs a *partial* action (`limit(n).collect()`,
    * an aborted write) posts a partial count as the migrated-row figure,
    * which nothing downstream can detect — the observed metric reports
    * whatever the sink's action actually scanned.
    *
    * `metricGraceSec` bounds how long to wait for the listener bus to
    * surface the metric after the sink returns: metrics post
    * asynchronously, so on a loaded machine a sink that DID execute can
    * lag the return by seconds; falling back too eagerly silently pays a
    * second full scan-and-cast. Already-posted metrics short-circuit via
    * `isCompleted` regardless. Pass 0 for sinks known to run no action
    * (recording test sinks) to skip the wait entirely.
    */
  def migrate(
      spark: SparkSession,
      catalog: Seq[TableDef],
      source: String => DataFrame,
      sink: (String, DataFrame) => Unit,
      metricGraceSec: Int = 10): Seq[MigrationResult] =
    catalog.map { t =>
      val ddl = SqliteDdl.createTable(t.name, t.columns) +:
        t.indexes.map(SqliteDdl.createIndex(t.name, _))
      val df = CastMatrix.toSqliteParity(source(t.name), t.columns)
      t.indexes.filter(_.unique)
        .foreach(ix => SqliteDdl.assertUnique(df, ix.columns))
      val obs = org.apache.spark.sql.Observation(s"migrate_${t.name}")
      import org.apache.spark.sql.functions.{count, lit}
      sink(t.name, df.observe(obs, count(lit(1)).as("rows")))
      // Fast path: metric already on the bus when the sink returns.
      // Otherwise wait out the grace window; only an unexecuted frame
      // (no action ⇒ the future never completes) or an exhausted grace
      // falls through to the counting job.
      import scala.concurrent.Await
      import scala.concurrent.duration._
      val rows =
        if (obs.future.isCompleted || metricGraceSec > 0)
          try Await.result(obs.future, metricGraceSec.max(0).seconds).getAs[Long]("rows")
          catch { case _: java.util.concurrent.TimeoutException => df.count() }
        else df.count()
      MigrationResult(t.name, ddl, rows)
    }

  /** The same migration loop with the K1 SQL transport: DDL + batched
    * inserts executed end-to-end on `conn` (sqlite-jdbc in deployment;
    * any `java.sql.Connection` in tests). Row counts fall out of the
    * insert stream — no second counting job per table.
    */
  def migrateJdbc(
      spark: SparkSession,
      catalog: Seq[TableDef],
      source: String => DataFrame,
      conn: java.sql.Connection): Seq[MigrationResult] =
    catalog.map { t =>
      val ddl = SqliteDdl.createTable(t.name, t.columns) +:
        t.indexes.map(SqliteDdl.createIndex(t.name, _))
      val df = CastMatrix.toSqliteParity(source(t.name), t.columns)
      t.indexes.filter(_.unique)
        .foreach(ix => SqliteDdl.assertUnique(df, ix.columns))
      val rows = SqliteDdl.writeTable(conn, t.name, t.columns, t.indexes, df)
      MigrationResult(t.name, ddl, rows)
    }
}
