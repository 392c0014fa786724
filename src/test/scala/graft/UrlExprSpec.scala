package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import graft.functions.CrawlFunctions.{canonicalizeUdf, hostOfUdf}
import graft.functions.UrlExpressions
import graft.urls.CUrl

/**
 * The codegen'd Catalyst URL expressions (graft_canonicalize / graft_host)
 * must be bit-identical to the UDF + pure-core semantics the UrlCanonSpec
 * goldens pin, AND must actually run inside a WholeStageCodegen span — the
 * whole point of promoting them off the UDF path (PLANS.md "non-codegen
 * islands").
 */
class UrlExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("expressions match UDF semantics on goldens incl. malformed + null") {
    UrlExpressions.register(spark)
    val urls = Seq(
      "HTTP://Host.TEST:80/a/./p/../x?q=1", "http://h.test/", "https://A.B:8443/p",
      "notaurl", ":/:/bad", "", null, "ftp://F.Q:2121/x", "http://h.test/a/b/../../c")
    val got = urls.toDF("raw").select(
      call_function("graft_canonicalize", $"raw").as("c"),
      call_function("graft_host", $"raw").as("h"),
      canonicalizeUdf($"raw").as("cu"),
      hostOfUdf($"raw").as("hu")).collect()
    got.foreach { r =>
      assert(r.get(0) === r.get(2), s"canonicalize mismatch: $r")
      assert(r.get(1) === r.get(3), s"host mismatch: $r")
    }
  }

  test("property: expression == pure CUrl.canonicalize for arbitrary strings") {
    UrlExpressions.register(spark)
    // one batched pass: evaluate a sample of generated strings through the
    // expression in a single job, then compare against the pure core
    val genUrl = Gen.oneOf(
      Gen.asciiPrintableStr,
      for {
        scheme <- Gen.oneOf("http", "HTTP", "https", "xyz")
        host <- Gen.alphaNumStr.suchThat(_.nonEmpty)
        path <- Gen.oneOf("", "/", "/a/./b", "/a/../b/", "/p?q=1#f")
      } yield s"$scheme://$host$path")
    val samples = Gen.listOfN(200, genUrl).sample.getOrElse(Nil)
    val got = samples.toDF("raw")
      .select($"raw", call_function("graft_canonicalize", $"raw").as("c"))
      .collect()
    got.foreach { r =>
      assert(Option(r.getString(1)) === CUrl.canonicalize(r.getString(0)),
        s"mismatch for '${r.getString(0)}'")
    }
  }

  test("url projection runs inside WholeStageCodegen with no UDF node") {
    UrlExpressions.register(spark)
    // a non-literal source (range) so the projection cannot be constant-
    // folded away — the expression must execute inside generated code
    val df = spark.range(64)
      .select(concat(lit("HTTP://H"), $"id", lit(".Test/a/./b/../c")).as("raw"))
      .select(call_function("graft_canonicalize", $"raw").as("url"))
      .select(call_function("graft_host", $"url").as("host"), $"url")
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators inside WholeStageCodegen span n:
    // BOTH url projections must carry it (and no UDF node anywhere)
    assert(plan.contains("*(1) Project [graft_host"), plan)
    assert(plan.contains("*(1) Project [graft_canonicalize"), plan)
    assert(!plan.contains("UDF"), plan)
    val rows = df.collect()
    assert(rows.length === 64)
    assert(rows.map(_.getString(0)).toSet.contains("h0.test"))
    assert(rows.forall(_.getString(1).endsWith(".test/a/c")))
  }
}
