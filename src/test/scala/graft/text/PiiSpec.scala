package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PII detection/redaction (the cur_pii_* gates): pattern truth table
  * against a JVM-regex reference, redaction ordering and idempotence, and
  * the gate injection's non-degeneracy (every kind actually appears in the
  * corpus the oracle checks).
  */
class PiiSpec extends SparkSpec {

  import spark.implicits._

  private val cases = Seq(
    // (text, n_email, n_phone, n_ip)
    ("plain words only", 0, 0, 0),
    ("write to alice@example.com today", 1, 0, 0),
    ("two: a@b.co and c.d+e@f-g.org end", 2, 0, 0),
    ("call 555-123-4567 now", 0, 1, 0),
    ("host 10.0.0.1 up", 0, 0, 1),
    ("all bob@x.io 555-000-1111 192.168.1.255 mixed", 1, 1, 1),
    // NOT matches: 4-digit first octet breaks the word boundary; a
    // 3-part dotted number is not an IPv4; missing TLD; 2-digit phone arm
    ("1234.1.1.1 and 1.2.3 and user@host and 55-123-4567", 0, 0, 0),
    // boundary: trailing punctuation still matches
    ("ping 8.8.8.8.", 0, 0, 1),
    ("mail x@y.zw.", 1, 0, 0))

  test("fused native kernels equal the Column specs (truth table + corpus)") {
    val texts = cases.map(_._1) ++ Seq("", " ", "a@b.co" * 50,
      "555-123-4567 inside alice@555-123-4567.example.com")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val corpus = graft.text.TextQueries.piiInjectedDocs(
      graft.Tables.documents(spark, sf001))
    Seq(df, corpus).foreach { d =>
      val badCounts = d.select(
          TextOps.piiCounts(col("text")).as("k"),
          TextOps.piiCountsSpec(col("text")).as("s"))
        .where(col("k.n_email") =!= col("s.n_email") ||
          col("k.n_phone") =!= col("s.n_phone") ||
          col("k.n_ip") =!= col("s.n_ip")).count()
      assert(badCounts == 0L, "PiiCounts kernel diverges from regexp_count spec")
      val redacted = TextOps.piiRedact(col("text"))
      val badRedact = d.select(
          TextOps.piiRedactStats(col("text")).as("k"),
          TextOps.piiCountsSpec(col("text")).as("p"),
          length(redacted).as("len"),
          TextOps.polyHash(redacted).as("fp"))
        .where(col("k.n_redacted") =!=
            col("p.n_email") + col("p.n_phone") + col("p.n_ip") ||
          col("k.clean_len") =!= col("len") ||
          col("k.clean_fp") =!= col("fp")).count()
      assert(badRedact == 0L, "PiiRedactStats kernel diverges from the composed spec")
    }
  }

  test("pattern truth table: counts match the JVM-regex reference") {
    val df = cases.map(_._1).zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("id", "text")
      .select(col("id"), TextOps.piiCounts(col("text")).as("p"))
      .select(col("id"), col("p.n_email"), col("p.n_phone"), col("p.n_ip"))
      .orderBy("id")
      .as[(Int, Int, Int, Int)].collect()
    cases.zipWithIndex.foreach { case ((t, e, p, ip), i) =>
      assert(df(i) === ((i, e, p, ip)), s"counts for: $t")
      // the Spark result must also agree with java.util.regex directly
      def jc(pat: String) = pat.r.findAllIn(t).size
      assert(jc(TextOps.EmailPattern) === e, s"jvm email for: $t")
      assert(jc(TextOps.PhonePattern) === p, s"jvm phone for: $t")
      assert(jc(TextOps.Ipv4Pattern) === ip, s"jvm ip for: $t")
    }
  }

  test("redaction replaces every match with its typed placeholder") {
    val got = Seq("all bob@x.io 555-000-1111 192.168.1.255 mixed")
      .toDF("text").select(TextOps.piiRedact(col("text"))).as[String].head()
    assert(got === "all <EMAIL> <PHONE> <IP> mixed")
  }

  test("redaction is idempotent and no-PII text is unchanged") {
    val texts = cases.map(_._1)
    val once = texts.toDF("text")
      .select(TextOps.piiRedact(col("text")).as("r")).as[String].collect()
    val twice = once.toSeq.toDF("r")
      .select(TextOps.piiRedact(col("r"))).as[String].collect()
    assert(once.toSeq === twice.toSeq)
    assert(once(0) === texts(0))
  }

  test("gate injection is non-degenerate: every kind appears at sf0.001, controls stay clean") {
    val stats = graft.SparkEntry.queries("cur_pii_stats")(spark, sf0001)
    val agg = stats.agg(
      sum("n_email").as("e"), sum("n_phone").as("p"), sum("n_ip").as("i"),
      sum(when(col("has_pii"), 0L).otherwise(1L)).as("clean"))
      .as[(Long, Long, Long, Long)].head()
    assert(agg._1 > 0 && agg._2 > 0 && agg._3 > 0,
      s"every PII kind must be planted: $agg")
    assert(agg._4 > 0, "the control branch (no injection) must be non-empty")
    // multi-kind docs (doc_id % 8 == 7) carry all three kinds at once
    val multi = stats.where(col("n_email") > 0 && col("n_phone") > 0 && col("n_ip") > 0)
    assert(multi.count() > 0, "the multi-kind branch must be exercised")
  }

  test("redact gate: n_redacted matches stats and clean text has no residual PII") {
    val red = graft.SparkEntry.queries("cur_pii_redact")(spark, sf0001)
      .select(col("doc_id"), col("n_redacted"))
    val stats = graft.SparkEntry.queries("cur_pii_stats")(spark, sf0001)
      .select(col("doc_id"),
        (col("n_email") + col("n_phone") + col("n_ip")).as("expect"))
    assert(red.join(stats, "doc_id").where(col("n_redacted") =!= col("expect"))
      .count() === 0)
    // independent residual check on the actual redacted strings: after
    // redaction, every PII count is zero on every doc
    val residual = TextQueries.piiInjectedDocs(graft.Tables.documents(spark, sf0001))
      .select(TextOps.piiCounts(TextOps.piiRedact(col("text"))).as("p"))
      .where(col("p.n_email") + col("p.n_phone") + col("p.n_ip") > 0)
    assert(residual.count() === 0)
  }
}
