package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Smoke + schema contract for every SparkEntry query against the sf0.001
 * testdata: each must run, return rows, and every oracle-checked query's
 * column set must be stable (the driver's DuckDB compare matches columns by
 * name). Value-level parity vs DuckDB is asserted by tools/check_oracle.py
 * (DuckDB is python-side only); this spec guards the Spark half in CI.
 */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle for unknown queries: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001 with rows > 0") {
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n > 0, s"$name returned no rows")
      assert(df.columns.toSet.size === df.columns.length, "duplicate column names")
    }
  }

  test("entry: flagship fixture crawl returns validated output rows") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.length === 3)
    val psnrIdx = df.columns.indexOf("psnr")
    val capIdx = df.columns.indexOf("caption_ok")
    assert(rows.forall(_.getDouble(psnrIdx) >= 40.0))
    assert(rows.forall(_.getBoolean(capIdx)))
  }
}
