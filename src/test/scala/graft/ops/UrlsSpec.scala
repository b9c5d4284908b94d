package graft.ops

import graft.SparkSpec

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(Urls.canonicalizeUrl($"url").as("c"))
      .as[String].collect().toSeq

  test("canonicalizeUrl applies each rule in isolation") {
    val cases = Seq(
      // scheme + host case-folded
      "HTTPS://Shop.Example.COM/a?x=1" -> "https://shop.example.com/a?x=1",
      // default port dropped per scheme
      "https://h.com:443/a" -> "https://h.com/a",
      "http://h.com:80/a" -> "http://h.com/a",
      // non-default port KEPT
      "https://h.com:8443/a" -> "https://h.com:8443/a",
      "http://h.com:443/a" -> "http://h.com:443/a", // 443 not http default
      // fragment dropped
      "https://h.com/a#sec" -> "https://h.com/a",
      // utm_* stripped, remaining params sorted
      "https://h.com/a?utm_source=x&ref=2&b=1" -> "https://h.com/a?b=1&ref=2",
      "https://h.com/a?ref=2&b=1" -> "https://h.com/a?b=1&ref=2",
      // all params stripped -> no '?'
      "https://h.com/a?utm_campaign=z" -> "https://h.com/a",
      // trailing slash dropped, root slash kept
      "https://h.com/a/b/" -> "https://h.com/a/b",
      "https://h.com/" -> "https://h.com/")
    val got = canon(cases.map(_._1): _*)
    cases.map(_._2).zip(got).zip(cases.map(_._1)).foreach {
      case ((want, actual), in) =>
        assert(actual == want, s"canon($in) = $actual, want $want")
    }
  }

  test("alias family collapses to ONE canonical form") {
    val aliases = Seq(
      "https://shop.example.com/p/1?a=1&ref=2",
      "HTTPS://SHOP.EXAMPLE.COM/p/1?ref=2&a=1",
      "https://shop.example.com:443/p/1/?a=1&ref=2#frag",
      "Https://Shop.Example.Com/p/1?utm_source=m&a=1&ref=2")
    assert(canon(aliases: _*).toSet.size == 1,
      "all aliases must canonicalize identically")
    // and a genuinely different resource must NOT collapse
    val other = canon("https://shop.example.com:8443/p/1?a=1&ref=2").head
    assert(other != canon(aliases.head).head)
  }

  test("canonicalization plans no shuffle (row-local expression)") {
    val df = Seq("https://h.com/a?x=1").toDF("url")
      .select(Urls.canonicalizeUrl($"url"))
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("compiled kernel agrees with the composed-Column form everywhere") {
    // the kernel (graft_canonical_url) replaced the composed expression
    // tree for speed; this pins them bit-identical on every rule edge —
    // including unicode case-folding, multiple '://', shuffled/empty
    // params, and the malformed->NULL contract
    val inputs = Seq(
      "HTTPS://Shop.Example.COM/a?x=1", "https://h.com:443/a",
      "http://h.com:80/a", "https://h.com:8443/a", "http://h.com:443/a",
      "https://h.com/a#sec", "https://h.com/a?utm_source=x&ref=2&b=1",
      "https://h.com/a?ref=2&b=1", "https://h.com/a?utm_campaign=z",
      "https://h.com/a/b/", "https://h.com/", "no-scheme.com/a",
      "https://hostonly-no-path", "https://ÉXample.com/Ä/?b=2&utm_x=1&a=1#f",
      "://starts-with-sep.com/a", "https://x.com/a://weird/b?z=1&z=1",
      "https://h.com:/empty-port/", "https://h.com/a?&&a=1&",
      "https://h.com//", "HTTP://H.COM:80/A/?C=2&B=1#x")
    val both = inputs.toDF("url").select(
      Urls.canonicalizeUrl($"url").as("kernel"),
      Urls.canonicalizeUrlComposed($"url").as("composed")).collect()
    both.zip(inputs).foreach { case (r, in) =>
      val k = if (r.isNullAt(0)) null else r.getString(0)
      val c = if (r.isNullAt(1)) null else r.getString(1)
      assert(k == c, s"kernel($in) = $k, composed = $c")
    }
    // and via the registered SQL function, same answer
    graft.functions.GraftFunctions.register(spark)
    inputs.take(3).toDF("url").createOrReplaceTempView("urls_kernel_test")
    val sqlGot = spark.sql(
      "SELECT graft_canonical_url(url) FROM urls_kernel_test")
      .collect().map(_.getString(0)).toSeq
    assert(sqlGot == both.take(3).map(_.getString(0)).toSeq)
  }

  test("malformed URLs canonicalize to NULL, not garbage") {
    val out = Seq("no-scheme.com/a", "https://hostonly-no-path",
        "https://ok.com/a")
      .toDF("url").select(Urls.canonicalizeUrl($"url").as("c")).collect()
    assert(out(0).isNullAt(0) && out(1).isNullAt(0))
    assert(out(2).getString(0) == "https://ok.com/a")
  }
}
