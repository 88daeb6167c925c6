package graft.sinks

import java.sql.DriverManager
import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC live-store sink/source (SURVEY.md K1-K3 / S9): the reference
  * bulk-ingests staging rows (Pg `COPY`, SQLite `execute_array`) and
  * merges with set-based SQL; Spark's JDBC writer batches inserts the
  * same way (`batchsize`), and reads push predicates down
  * (`pushDownPredicate`, SURVEY.md §4).
  *
  * The merge itself stays driver-side and transactional: stage with the
  * batched writer, then issue the upsert statements over one connection —
  * exactly the reference's staging-table architecture
  * (share/postgresql_gff3.lib + §3.2 step 7). Tested against embedded
  * Derby (the in-container stand-in for Postgres).
  */
object JdbcStore {

  /** Batched append of a frame into a JDBC table (K3 `populate` analog);
    * `batchsize` mirrors the reference's 4000-row flush chunks
    * (Temp/WithPostgresql.pm:10-11). */
  def write(df: DataFrame, url: String, table: String,
            batchSize: Int = 4000, mode: String = "append",
            columnTypes: Option[String] = None): Unit = {
    // dialect-typed DDL (the reference's per-backend schema rewrites,
    // WithOracle.pm:9-36): without it Spark maps StringType to CLOB on
    // some dialects, which then rejects pushed-down comparisons
    val w = df.write.mode(mode).option("batchsize", batchSize.toString)
    columnTypes.fold(w)(t => w.option("createTableColumnTypes", t))
      .jdbc(url, table, new java.util.Properties)
  }

  /** Predicated scan of a JDBC table (S9); Catalyst pushes filters and
    * projections into the generated SQL. */
  def read(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.jdbc(url, table, new java.util.Properties)

  /** Driver-side transactional merge: run the statement DAG atomically on
    * one connection — commit on success, roll back on failure (the
    * `txn_scope_guard` analog, gff3tochado.pm:251-277). Returns per-
    * statement update counts. */
  def mergeTransaction(url: String, statements: Seq[String]): Seq[Int] = {
    val conn = DriverManager.getConnection(url)
    try {
      conn.setAutoCommit(false)
      val counts = try {
        val st = conn.createStatement()
        // force strictly: a lazy Seq would defer executeUpdate past the
        // commit and "commit" an empty transaction
        val res = statements.toList.map(st.executeUpdate)
        conn.commit()
        res
      } catch {
        case e: Throwable =>
          // a rollback on a dead connection must not mask the root cause
          try conn.rollback() catch { case re: Throwable => e.addSuppressed(re) }
          throw e
      }
      counts
    } finally conn.close()
  }
}
