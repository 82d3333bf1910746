package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, UrlCuration}

/** Unit coverage for the URL-curation family (normalize / domain /
  * dedup / blocklist) and the quality-aware keepBest cluster policy.
  */
class UrlCurationSpec extends SparkSpec {

  private def normOf(url: String): (String, Option[String], Option[String]) = {
    import spark.implicits._
    val r = Seq(url).toDF("url")
      .select(UrlCuration.normalizeUrl(col("url")).as("n"),
        UrlCuration.host(col("url")).as("h"),
        UrlCuration.registeredDomain(UrlCuration.host(col("url"))).as("d"))
      .head()
    (r.getString(0), Option(r.getString(1)), Option(r.getString(2)))
  }

  test("normalizeUrl: case, www, default port, tracking params, sort, fragment") {
    assert(normOf("HTTPS://WWW.Example.COM:443/Path/?utm_source=x&b=2&a=1#frag") ==
      (("https://example.com/Path?a=1&b=2", Some("example.com"), Some("example.com"))))
    assert(normOf("http://example.com:80/") ==
      (("http://example.com", Some("example.com"), Some("example.com"))))
    // Non-default port names a different origin — kept.
    assert(normOf("http://example.com:8080/x")._1 == "http://example.com:8080/x")
    // Userinfo stripped; multi-part public suffix → three-label domain.
    assert(normOf("https://user:pw@sub.example.co.uk/a/b/") ==
      (("https://sub.example.co.uk/a/b", Some("sub.example.co.uk"), Some("example.co.uk"))))
    // All-tracking query collapses to no query at all.
    assert(normOf("https://a.com/?utm_a=1&utm_b=2&gclid=z")._1 == "https://a.com")
    // Path case preserved; non-http(s) scheme ports untouched.
    assert(normOf("ftp://Files.Example.com/Data")._1 == "ftp://files.example.com/Data")
  }

  test("normalizeUrl: opaque (scheme-less) values pass through with null host") {
    assert(normOf("not a url") == (("not a url", None, None)))
    assert(normOf("example.com/path") == (("example.com/path", None, None)))
  }

  test("registeredDomain: single label, multi-part suffix, deep subdomains") {
    import spark.implicits._
    val got = Seq("localhost", "a.b.com.cn", "x.y.z.org", "news.bbc.co.uk")
      .toDF("h")
      .select(UrlCuration.registeredDomain(col("h")).as("d"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("localhost", "b.com.cn", "z.org", "bbc.co.uk"))
  }

  test("dedupByUrl groups normalization-equal urls under the min-id keeper") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://a.com/x?b=2&a=1"),
      (2L, "HTTPS://WWW.A.COM/x/?a=1&b=2&utm_source=f"),
      (3L, "https://a.com:443/x?a=1&b=2#frag"),
      (4L, "https://b.com/y"),
      (5L, "opaque-key")).toDF("doc_id", "url")
    val got = UrlCuration.dedupByUrl(docs).orderBy("url_norm").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("https://a.com/x?a=1&b=2", 1L, 3L),
      ("https://b.com/y", 4L, 1L),
      ("opaque-key", 5L, 1L)))
  }

  test("domainFilter drops blocked domains, keeps opaque rows") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://bad.com/x"),
      (2L, "https://sub.bad.com/y"),
      (3L, "https://good.com/z"),
      (4L, "no scheme here")).toDF("doc_id", "url")
    val kept = UrlCuration.domainFilter(docs, Seq("BAD.com"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L))
    val counts = UrlCuration.domainCounts(docs, Seq("bad.com")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(counts == Seq(("good.com", 1L)))
  }

  test("urlFeatures: length, depth, surviving params, tracking flag, host digits") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://a1b2.com/x/y/z?a=1&utm_source=f&b=2"),
      (2L, "https://c.co.uk/"),
      (3L, "http://x.com/p#frag?notaquery"),
      (4L, "no scheme")).toDF("doc_id", "url")
    val got = UrlCuration.urlFeatures(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), Option(r.get(5)).map(_.asInstanceOf[Long]))).toSeq
    assert(got == Seq(
      (1L, 43L, 3L, 2L, true, Some(2L)),   // utm stripped from count, flagged
      (2L, 16L, 0L, 0L, false, Some(0L)),
      (3L, 29L, 1L, 0L, false, Some(0L)),  // '?' inside fragment is no query
      (4L, 9L, 0L, 0L, false, None)))
  }

  test("normalizeUrl is an idempotent canonical key; host/domain contracts hold") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val label = Gen.oneOf("ex", "Site", "b2", "x9", "Alpha")
    val structured = for {
      sch <- Gen.oneOf("http", "HTTPS", "https", "Ftp")
      ui <- Gen.oneOf("", "user@", "u:p@")
      www <- Gen.oneOf("", "www.", "WWW.")
      labels <- Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, label))
      suffix <- Gen.oneOf("", ".com", ".co.uk", ".de", ".org")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/", "/A/b", "/A/b/", "/x//", "/p")
      query <- Gen.oneOf("", "?", "?b=2&a=1", "?utm_source=x", "?a=1&&b=2",
        "?utm_a=1&z=9", "?UTM_k=1")
      frag <- Gen.oneOf("", "#f", "#a?b") // '?' inside a fragment is legal
    } yield s"$sch://$ui$www${labels.mkString(".")}$suffix$port$path$query$frag"
    val junk = Gen.oneOf("not a url", "", "example.com/x", "://nohost", "http//x", "x")
    val urlGen = Gen.frequency(9 -> structured, 1 -> junk)

    val prop = Prop.forAll(Gen.listOfN(150, urlGen)) { urls =>
      import spark.implicits._
      val rows = urls.toDF("url").select(col("url"),
        UrlCuration.normalizeUrl(col("url")).as("n1"),
        UrlCuration.normalizeUrl(UrlCuration.normalizeUrl(col("url"))).as("n2"),
        UrlCuration.host(col("url")).as("h"),
        UrlCuration.registeredDomain(UrlCuration.host(col("url"))).as("d"))
        .collect()
      rows.forall { r =>
        val (url, n1, n2) = (r.getString(0), r.getString(1), r.getString(2))
        val h = Option(r.getString(3))
        val d = Option(r.getString(4))
        val hasScheme = url.matches("^[a-zA-Z][a-zA-Z0-9+.-]*://.+")
        // The canonical key is a fixed point; opaque inputs pass through;
        // domain is defined iff host is, and is a suffix of it; the key
        // never carries a fragment.
        n1 == n2 &&
          (hasScheme || (h.isEmpty && n1 == url)) &&
          h.isEmpty == d.isEmpty &&
          h.zip(d).forall { case (hh, dd) => hh.endsWith(dd) } &&
          (h.isEmpty || !n1.contains("#"))
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }

  test("dedupByUrlIncremental equals the full run restricted to shard urls") {
    import spark.implicits._
    val mk = (id: Long, u: String) => (id, u)
    val corpus = Seq(
      mk(1L, "https://a.com/x?b=2&a=1"),
      mk(2L, "HTTPS://WWW.A.COM/x/?a=1&b=2"),
      mk(3L, "https://b.com/y"),
      mk(4L, "https://c.com/z")).toDF("doc_id", "url")
    val shard = Seq(
      mk(10L, "https://a.com/x?a=1&b=2#f"), // joins an existing group
      mk(11L, "https://d.com/new"),         // new url
      mk(12L, "https://d.com/new")).toDF("doc_id", "url")
    val dir = "/tmp/graft_test_urlidx"
    UrlCuration.urlIndex(corpus).write.mode("overwrite").parquet(dir)
    val incr = UrlCuration.dedupByUrlIncremental(shard, spark.read.parquet(dir))
    val full = UrlCuration.dedupByUrl(corpus.unionByName(shard))
      .join(UrlCuration.parseUrls(shard).select("url_norm").distinct(), Seq("url_norm"))
    assert(snap(incr.orderBy("url_norm")) == snap(full.orderBy("url_norm")))
    // Shard-only group has the shard keeper; merged group keeps min id.
    val got = incr.orderBy("url_norm").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("https://a.com/x?a=1&b=2", 1L, 3L),
      ("https://d.com/new", 11L, 2L)))
    val bad = intercept[IllegalArgumentException] {
      UrlCuration.dedupByUrlIncremental(shard, corpus)
    }
    assert(bad.getMessage.contains("urlIndex"))
  }

  test("keepBest keeps the max-score member per cluster, ties to min id") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val scores = Seq((1L, 5L), (2L, 9L), (3L, 7L), (10L, 4L), (11L, 4L))
      .toDF("doc_id", "score")
    val got = Dedup.keepBest(pairs, scores).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(got == Seq(
      (1L, 1L, 5L, false), (2L, 1L, 9L, true), (3L, 1L, 7L, false),
      (10L, 10L, 4L, true), (11L, 10L, 4L, false)))
    // Exactly one keeper per cluster, and it is the min-id arg-max.
    val perCluster = got.groupBy(_._2).values
    assert(perCluster.forall(_.count(_._4) == 1))
  }
}
