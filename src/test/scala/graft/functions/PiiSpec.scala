package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: (Long, String)*): Map[Long, (String, Int, Int, Int)] =
    texts.toSeq.toDF("id", "text")
      .select($"id", Pii.redact($"text").as("r"),
        Pii.emailCount($"text").as("e"),
        Pii.phoneCount($"text").as("p"),
        Pii.ipv4Count($"text").as("i"))
      .as[(Long, String, Int, Int, Int)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap

  test("each PII type redacts to its placeholder, audit counts match") {
    val out = run(
      1L -> "mail bob.smith+spam@ex-ample.org now",
      2L -> "call 555-867-5309 today",
      3L -> "from 203.0.113.77 and 10.0.0.1",
      4L -> "clean text with numbers 12345 and dots...")
    assert(out(1L) == (("mail <EMAIL> now", 1, 0, 0)))
    assert(out(2L) == (("call <PHONE> today", 0, 1, 0)))
    assert(out(3L) == (("from <IP> and <IP>", 0, 0, 2)))
    assert(out(4L) == (("clean text with numbers 12345 and dots...", 0, 0, 0)))
  }

  test("adjacent and mixed matches: all three types in one document") {
    val out = run(1L ->
      "a@b.co 555-123-4567 1.2.3.4 then c.d@e.org beside 999-888-7777")
    assert(out(1L) ==
      (("<EMAIL> <PHONE> <IP> then <EMAIL> beside <PHONE>", 2, 2, 1)))
  }

  test("boundaries: digits glued to words are not IPs; long digit runs " +
    "still expose an embedded phone shape") {
    val out = run(
      1L -> "version x1.2.3.4 is fine",   // no \b before the first octet
      2L -> "serial 1234-567-8901 here",  // \d{3}-\d{3}-\d{4} matches inside
      3L -> "user123@x.com then 123-456-7890")
    assert(out(1L) == (("version x1.2.3.4 is fine", 0, 0, 0)))
    assert(out(2L)._3 == 1) // the 234-567-8901 suffix matches
    assert(out(2L)._1 == "serial 1<PHONE> here")
    // email consumed FIRST: its digits can't later feed the phone pattern
    assert(out(3L) == (("<EMAIL> then <PHONE>", 1, 1, 0)))
  }

  test("redaction order is load-bearing: emails go before digit patterns") {
    // the numeric local-part + short TLD parses as an email; if phones ran
    // first nothing here would match the phone pattern anyway, but the
    // email must win the overlap with the IP-like domain
    val out = run(1L -> "odd address 123@45.67.89.com end")
    assert(out(1L)._1 == "odd address <EMAIL> end")
    assert(out(1L)._2 == 1)
  }
}
