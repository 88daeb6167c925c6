package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Postgres-dialect merge generation (K1 parity beyond Derby): DDL
  * types come from Spark's own PostgresDialect, statement shapes
  * mirror share/postgresql.lib, the portable arm EXECUTES against
  * embedded Derby through the one-connection transactional merge, and
  * the transaction rolls back whole. */
class PgDialectSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", IntegerType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true)))

  test("DDL types are Spark's PostgresDialect mapping") {
    assert(PgDialect.pgType(StringType) == "TEXT")
    assert(PgDialect.pgType(DoubleType) == "FLOAT8")
    assert(PgDialect.pgType(BinaryType) == "BYTEA")
    assert(PgDialect.pgType(BooleanType) == "BOOLEAN")
    assert(PgDialect.pgType(IntegerType) == "INTEGER")
    assert(PgDialect.pgType(LongType) == "BIGINT")
    val ddl = PgDialect.stagingDdl("temp_docs", schema)
    assert(ddl ==
      """CREATE TEMP TABLE temp_docs (
        |  k INTEGER NOT NULL,
        |  name TEXT,
        |  score FLOAT8
        |)""".stripMargin, ddl)
  }

  test("COPY statement and CSV row encoding are deterministic") {
    assert(PgDialect.copyFrom("temp_docs", Seq("k", "name")) ==
      "COPY temp_docs (k, name) FROM STDIN WITH (FORMAT csv, NULL '\\N')")
    assert(PgDialect.copyEncode(Seq(1, "plain", null)) == "1,plain,\\N")
    assert(PgDialect.copyEncode(Seq("a,b", "say \"hi\"", "two\nlines")) ==
      "\"a,b\",\"say \"\"hi\"\"\",\"two\nlines\"")
    // a non-null field whose VALUE is the null sentinel must quote:
    // unquoted \N would load as SQL NULL and corrupt the value
    assert(PgDialect.copyEncode(Seq("\\N", null)) == "\"\\N\",\\N")
  }

  test("pg-only statements pin the reference's merge shapes") {
    // update-from-staging: share/postgresql.lib:354-366 update_cvterm_names
    assert(PgDialect.updateFrom("live", "stage", Seq("k"), Seq("name")) ==
      """UPDATE live SET name = fresh.name FROM (
        |  SELECT s.k, s.name FROM stage s
        |) AS fresh
        |WHERE live.k = fresh.k""".stripMargin)
    assert(PgDialect.onConflictUpsert("live", "stage", Seq("k"),
      Seq("name")) ==
      """INSERT INTO live (k, name)
        |SELECT s.k, s.name FROM stage s
        |ON CONFLICT (k) DO UPDATE SET name = EXCLUDED.name""".stripMargin)
    // the full plan is stage -> COPY -> update -> insert, txn-shaped
    val plan = PgDialect.mergePlan("live", "stage", schema, Seq("k"))
    assert(plan.size == 4 && plan(0).startsWith("CREATE TEMP TABLE") &&
      plan(1).startsWith("COPY ") && plan(2).startsWith("UPDATE ") &&
      plan(3).startsWith("INSERT "))
  }

  test("insertMissing executes against a live engine; rollback leaves the table whole") {
    val url = "jdbc:derby:memory:graftpgd;create=true"
    val live = Seq((1, "one"), (2, "two")).toDF("k", "name")
    val stage = Seq((2, "two_new"), (3, "three")).toDF("k", "name")
    JdbcStore.write(live, url, "live_t", mode = "overwrite")
    JdbcStore.write(stage, url, "stage_t", mode = "overwrite")
    // Spark's JDBC writer quotes identifiers — generate with quoted cols
    val ins = PgDialect.insertMissing("live_t", "stage_t",
      Seq("\"k\""), Seq("\"k\"", "\"name\""))
    val counts = JdbcStore.mergeTransaction(url, Seq(ins))
    assert(counts == Seq(1), s"only the novel key inserts, got $counts")
    val after = JdbcStore.read(spark, url, "live_t")
      .select(col("k").cast("int"), col("name")).as[(Int, String)]
      .collect().toSeq.sorted
    assert(after == Seq((1, "one"), (2, "two"), (3, "three")))
    // a failing DAG rolls back WHOLE: the valid first statement must
    // not survive its transaction
    intercept[java.sql.SQLException] {
      JdbcStore.mergeTransaction(url, Seq(
        """UPDATE live_t SET "name" = 'poisoned' WHERE "k" = 1""",
        "INSERT INTO no_such_table VALUES (1)"))
    }
    val untouched = JdbcStore.read(spark, url, "live_t")
      .filter(col("k") === 1).select(col("name")).head().getString(0)
    assert(untouched == "one", "rollback must undo the whole transaction")
  }
}
