package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PII redaction + URL host extraction: exact replacements, counts,
  * non-matching inputs. */
class PiiSpec extends SparkSpec {

  test("redactPii replaces every email and phone, counts match") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a.b+c@d-e.org or x@y.io, call +1-555-0199 now"),
      (2L, "no contact info here"),
      (3L, "edge: @not-an-email, +1-55-0199 not a phone"))
      .toDF("doc_id", "text")
    val got = TextOps.redactPii(df, "text")
      .select("doc_id", "n_emails", "n_phones", "text_redacted")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((2L, 1L,
      "mail <EMAIL> or <EMAIL>, call <PHONE> now")))
    assert(got(2L) === ((0L, 0L, "no contact info here")))
    assert(got(3L)._1 === 0L)
    assert(got(3L)._2 === 0L)
  }

  test("urlHost extracts the authority, empty for non-URLs") {
    import spark.implicits._
    val df = Seq(
      "https://www.example.com/path?q=1",
      "http://a.b.c:8080/",
      "ftp+ssh://host.tld",
      "not a url").toDF("url")
    val got = df.select(TextOps.urlHost(col("url")))
      .collect().map(_.getString(0))
    assert(got === Array(
      "www.example.com", "a.b.c:8080", "host.tld", ""))
  }

  test("the fixture exercises all shapes") {
    val fx = graft.engine.DataQueries.webDocs(spark)
    val red = TextOps.redactPii(fx, "text")
    val totals = red.agg(sum("n_emails"), sum("n_phones"))
      .collect().head
    assert(totals.getLong(0) === 100L) // 50 single + 50 double docs
    assert(totals.getLong(1) === 100L)
    val hosts = fx.select(TextOps.urlHost(col("url"))).distinct().count()
    assert(hosts === 51L) // 3 prefixes x 17 sites
  }
}
