package graft.sinks

import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._

/** Postgres-dialect statement generation for the staging-merge sink —
  * the K1 parity layer. The reference's Postgres arm stages rows into
  * TEMP tables (share/postgresql.lib:1-62 `create_table_temp_cvterm`),
  * bulk-loads them (`COPY`/4000-row flush chunks,
  * Temp/WithPostgresql.pm:10-11), then merges with set-based SQL:
  * insert-where-absent via `LEFT JOIN … IS NULL`
  * (share/postgresql.lib:100-110 `insert_dbxref`) and update-from-
  * staging via `UPDATE … FROM (SELECT …) AS fresh`
  * (share/postgresql.lib:354-366 `update_cvterm_names`). This object
  * reproduces those statement shapes against any Spark schema:
  *
  *  - column DDL types come from Spark's OWN PostgresDialect
  *    (`JdbcDialects.get`), so the staging schema is exactly what
  *    `DataFrame.write.jdbc` would create against Postgres;
  *  - [[copyFrom]] + [[copyEncode]] are the `COPY … FROM STDIN (FORMAT
  *    csv)` fast path (statement + row encoding; the driver-specific
  *    CopyManager handoff is deployment glue);
  *  - [[insertMissing]] is engine-portable SQL — the spec EXECUTES it
  *    against embedded Derby through [[JdbcStore.mergeTransaction]],
  *    so the generated join shape is proven against a live engine, not
  *    just string-compared;
  *  - [[updateFrom]] and [[onConflictUpsert]] are Postgres-only
  *    (`UPDATE … FROM`, `ON CONFLICT`) and are pinned by golden spec.
  *
  * A full merge is [[mergePlan]]: one statement DAG for
  * [[JdbcStore.mergeTransaction]]'s one-connection
  * commit-or-rollback, the `txn_scope_guard` discipline
  * (gff3tochado.pm:251-277). */
object PgDialect {

  private val dialect = JdbcDialects.get("jdbc:postgresql://localhost/db")

  /** The Postgres DDL type for a Spark type — Spark's PostgresDialect
    * mapping first (TEXT, FLOAT8, BYTEA, …), the JDBC-standard
    * fallback for types it leaves to the common layer. */
  def pgType(dt: DataType): String =
    dialect.getJDBCType(dt).map(_.databaseTypeDefinition).getOrElse(
      dt match {
        case IntegerType => "INTEGER"
        case LongType => "BIGINT"
        case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
        case TimestampType => "TIMESTAMP"
        case DateType => "DATE"
        case _ => throw new IllegalArgumentException(
          s"no Postgres DDL type for ${dt.simpleString}")
      })

  /** `CREATE TEMP TABLE` staging DDL from a Spark schema — the
    * reference's temp_cvterm shape: NOT NULL riding the schema's own
    * nullability. */
  def stagingDdl(table: String, schema: StructType,
                 temp: Boolean = true): String = {
    val cols = schema.fields.map { f =>
      val nn = if (f.nullable) "" else " NOT NULL"
      s"  ${f.name} ${pgType(f.dataType)}$nn"
    }.mkString(",\n")
    s"CREATE ${if (temp) "TEMP " else ""}TABLE $table (\n$cols\n)"
  }

  /** The bulk-load statement for the staging table — Postgres' COPY
    * fast path in CSV form ('\N' as the null sentinel, matching
    * [[copyEncode]]). */
  def copyFrom(table: String, cols: Seq[String]): String =
    s"COPY $table (${cols.mkString(", ")}) FROM STDIN " +
      "WITH (FORMAT csv, NULL '\\N')"

  /** One row in [[copyFrom]]'s CSV encoding: '\N' for null, RFC-4180
    * quoting (fields holding comma/quote/newline are quoted, inner
    * quotes doubled) — deterministic so tests can pin bytes. */
  def copyEncode(values: Seq[Any]): String =
    values.map {
      case null => "\\N"
      case v =>
        val s = v.toString
        // a non-null field whose VALUE is exactly the null sentinel
        // must be quoted: COPY parses an unquoted \N as SQL NULL,
        // silently corrupting the value; "\N" round-trips the string
        if (s == "\\N" ||
            s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
          "\"" + s.replace("\"", "\"\"") + "\""
        else s
    }.mkString(",")

  /** Insert staging rows whose key is absent from the target — the
    * reference's `insert_dbxref` LEFT-JOIN-IS-NULL shape. Portable
    * SQL: executes on Derby in the spec, runs unchanged on Postgres. */
  def insertMissing(target: String, staging: String,
                    keyCols: Seq[String], allCols: Seq[String]): String = {
    val on = keyCols.map(k => s"$target.$k = s.$k").mkString(" AND ")
    val absent = keyCols.map(k => s"$target.$k IS NULL").mkString(" AND ")
    s"""INSERT INTO $target (${allCols.mkString(", ")})
       |SELECT ${allCols.map(c => s"s.$c").mkString(", ")} FROM $staging s
       |LEFT JOIN $target ON ($on)
       |WHERE $absent""".stripMargin
  }

  /** Update target rows from staging — the reference's
    * `update_cvterm_names` `UPDATE … FROM (SELECT …) AS fresh` shape
    * (Postgres-only syntax). */
  def updateFrom(target: String, staging: String,
                 keyCols: Seq[String], setCols: Seq[String]): String = {
    val on = keyCols.map(k => s"$target.$k = fresh.$k").mkString(" AND ")
    val sets = setCols.map(c => s"$c = fresh.$c").mkString(", ")
    val sel = (keyCols ++ setCols).map(c => s"s.$c").mkString(", ")
    s"""UPDATE $target SET $sets FROM (
       |  SELECT $sel FROM $staging s
       |) AS fresh
       |WHERE $on""".stripMargin
  }

  /** The modern single-statement Postgres upsert (`INSERT … ON
    * CONFLICT (key) DO UPDATE`) — equivalent to
    * [[updateFrom]]+[[insertMissing]] when the target has a unique
    * key constraint. */
  def onConflictUpsert(target: String, staging: String,
                       keyCols: Seq[String], setCols: Seq[String]): String = {
    val allCols = keyCols ++ setCols
    val sets = setCols.map(c => s"$c = EXCLUDED.$c").mkString(", ")
    s"""INSERT INTO $target (${allCols.mkString(", ")})
       |SELECT ${allCols.map(c => s"s.$c").mkString(", ")} FROM $staging s
       |ON CONFLICT (${keyCols.mkString(", ")}) DO UPDATE SET $sets"""
      .stripMargin
  }

  /** The whole Postgres merge as one transactional statement DAG for
    * [[JdbcStore.mergeTransaction]]: stage, bulk-load, update matches,
    * insert novelties. (COPY consumes the [[copyEncode]] row stream on
    * the same connection in a real deployment.) */
  def mergePlan(target: String, staging: String, schema: StructType,
                keyCols: Seq[String]): Seq[String] = {
    val setCols = schema.fieldNames.toSeq.filterNot(keyCols.contains)
    Seq(
      stagingDdl(staging, schema),
      copyFrom(staging, schema.fieldNames.toSeq),
      updateFrom(target, staging, keyCols, setCols),
      insertMissing(target, staging, keyCols, schema.fieldNames.toSeq))
  }
}
