package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import sinks.Sinks.{JdbcKeyedOverwrite, JdbcReplace}
import sources.Jdbc

/** JDBC source/sink semantics against embedded Derby (the in-container
  * stand-in for the reference's Postgres; same Spark JDBC code path). */
class JdbcSpec extends AnyFunSuite {
  System.setProperty("derby.stream.error.file", "/tmp/derby.log")
  lazy val spark: SparkSession = Engine.session()
  val dbDir = s"/tmp/graft-derby-${System.nanoTime()}"
  val url = s"jdbc:derby:$dbDir;create=true"

  private def frame(rows: Seq[(String, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("county", "votes", "prop_yes")
  }

  test("JdbcReplace: write, read back, replace with different contents") {
    val a = frame(Seq(("SUFFOLK", 100L, 0.51), ("ESSEX", 80L, 0.47)))
    JdbcReplace.write(a.coalesce(1), url, "outcomes_replace")
    val r1 = Jdbc.read(spark, url, "outcomes_replace")
    assert(r1.count() == 2)
    val b = frame(Seq(("NORFOLK", 55L, 0.62)))
    JdbcReplace.write(b.coalesce(1), url, "outcomes_replace")
    val r2 = Jdbc.read(spark, url, "outcomes_replace").collect()
    assert(r2.length == 1 && r2.head.getString(0) == "NORFOLK")
  }

  // Derby maps StringType to CLOB (not '='-comparable); explicit DDL
  // types via createTableColumnTypes is the standard Spark answer —
  // Postgres (the reference's target) needs none of this
  val varcharKey = Map("createTableColumnTypes" -> "county VARCHAR(64)")

  test("JdbcKeyedOverwrite: delete-and-append replaces only incoming keys, idempotently") {
    val initial = frame(Seq(
      ("SUFFOLK", 100L, 0.51), ("ESSEX", 80L, 0.47), ("ESSEX", 20L, 0.33)))
    JdbcKeyedOverwrite.write(initial.coalesce(1), url, "election", "county", varcharKey)
    // reload ESSEX with corrected rows; SUFFOLK must be untouched
    val reload = frame(Seq(("ESSEX", 85L, 0.49)))
    JdbcKeyedOverwrite.write(reload.coalesce(1), url, "election", "county", varcharKey)
    val after = Jdbc.read(spark, url, "election").cache()
    assert(after.count() == 2)
    assert(after.filter(col("county") === "SUFFOLK").head.getLong(1) == 100L)
    assert(after.filter(col("county") === "ESSEX").head.getLong(1) == 85L)
    // idempotent re-run: same incoming frame → same table state
    JdbcKeyedOverwrite.write(reload.coalesce(1), url, "election", "county", varcharKey)
    assert(Jdbc.read(spark, url, "election").count() == 2)
  }

  test("JdbcKeyedOverwrite: null keys delete-and-append like any other key") {
    // no VARCHAR override here: Derby refuses setNull(CLOB-typed) into a
    // VARCHAR column, and the null path needs no '=' comparison anyway
    // (IS NULL is legal on CLOB)
    val a = frame(Seq((null, 10L, 0.1), ("DUKES", 3L, 0.5)))
    JdbcKeyedOverwrite.write(a.coalesce(1), url, "election_nulls", "county")
    val b = frame(Seq((null, 12L, 0.2)))
    JdbcKeyedOverwrite.write(b.coalesce(1), url, "election_nulls", "county")
    val after = Jdbc.read(spark, url, "election_nulls").cache()
    // '= NULL' matches nothing in SQL; without the IS NULL delete form
    // the re-load would duplicate the null-keyed row
    assert(after.count() == 2)
    assert(after.filter(col("county").isNull).count() == 1)
    assert(after.filter(col("county").isNull).head.getLong(1) == 12L)
  }

  test("JdbcKeyedOverwrite: first load creates the table (no delete needed)") {
    val first = frame(Seq(("PLYMOUTH", 42L, 0.58)))
    JdbcKeyedOverwrite.write(first.coalesce(1), url, "election_fresh", "county")
    assert(Jdbc.read(spark, url, "election_fresh").count() == 1)
  }

  test("JdbcKeyedOverwrite rejects unsafe identifiers") {
    val df = frame(Seq(("X", 1L, 0.1)))
    intercept[IllegalArgumentException] {
      JdbcKeyedOverwrite.write(df, url, "t; DROP TABLE x", "county")
    }
    intercept[IllegalArgumentException] {
      JdbcKeyedOverwrite.write(df, url, "t", "county = 'X' OR --")
    }
  }

  test("partitioned JDBC read returns the same rows over parallel connections") {
    import spark.implicits._
    val wide = (1L to 97L).map(i => (i, s"row$i")).toDF("id", "payload")
    JdbcReplace.write(wide.coalesce(1), url, "wide_table")
    val part = Jdbc.readPartitioned(spark, url, "wide_table", "id", 1L, 97L, 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == 97)
    assert(part.agg(sum("id")).head.getLong(0) == (1L to 97L).sum)
  }
}
