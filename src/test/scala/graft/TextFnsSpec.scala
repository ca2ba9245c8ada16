package graft

import graft.functions.TextFns
import org.apache.spark.sql.functions._

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, v: String): T =
    Seq(v).toDF("c").select(c.as("r")).collect()(0).getAs[T]("r")

  // Cross-engine anchor: DuckDB CAST(('0x'||substr(md5('0|a'),1,15)) AS BIGINT)
  test("portableHash matches the DuckDB-derived anchor value") {
    assert(one[Long](TextFns.portableHash(col("c")), "0|a") == 348003567260221709L)
  }

  test("normText collapses whitespace and lowercases") {
    assert(one[String](TextFns.normText(col("c")), "  A  b\t c ") == "a b c")
  }

  test("tokenCount: empty text is zero tokens") {
    assert(one[Int](TextFns.tokenCount(col("c")), "") == 0)
    assert(one[Int](TextFns.tokenCount(col("c")), "one two three") == 3)
  }

  test("subwordCount: letter runs, single digits, single punct") {
    // "ab12, c" → [ab][1][2][,][c] = 5
    assert(one[Int](TextFns.subwordCount(col("c")), "ab12, c") == 5)
  }

  test("null-text contract: null behaves as empty text, never propagates") {
    // One null-text row through every derived-text root (the TextFns
    // object scaladoc's contract): tokens [] / count 0 / score 0.0 /
    // shingles [""] — and all four outputs are non-null.
    val df = Seq[Option[String]](None).toDF("c").select(
      TextFns.tokens(col("c")).as("toks"),
      TextFns.tokenCount(col("c")).as("n"),
      TextFns.qualityScore(col("c")).as("q"),
      TextFns.wordShingles(col("c"), 3).as("sh"))
    val r = df.collect()(0)
    assert(!r.isNullAt(0) && r.getAs[scala.collection.Seq[String]]("toks").isEmpty,
      "null text must tokenize to []")
    assert(r.getAs[Int]("n") == 0, "null text must count 0 tokens")
    assert(r.getAs[Double]("q") == 0.0, "null text must score 0.0")
    assert(r.getAs[scala.collection.Seq[String]]("sh") == Seq(""),
      "null text must yield the empty-text singleton shingle")
    // and the declared schema is non-nullable for all four
    assert(df.schema.fields.forall(!_.nullable),
      s"all null-text contract outputs must be declared non-nullable: ${df.schema}")
  }

  test("wordShingles: distinct n-grams; short docs collapse to one shingle") {
    assert(one[scala.collection.Seq[String]](TextFns.wordShingles(col("c"), 3), "a b c d").toSet
      == Set("a b c", "b c d"))
    assert(one[scala.collection.Seq[String]](TextFns.wordShingles(col("c"), 3), "a b")
      == Seq("a b"))
    // repeated shingles dedup
    assert(one[scala.collection.Seq[String]](TextFns.wordShingles(col("c"), 2), "x y x y").toSet
      == Set("x y", "y x"))
  }

  test("segments: non-overlapping windows, tail dropped, duplicates kept") {
    assert(one[scala.collection.Seq[String]](TextFns.segments(col("c"), 3), "a b c d e f g")
      == Seq("a b c", "d e f")) // trailing "g" dropped
    assert(one[scala.collection.Seq[String]](TextFns.segments(col("c"), 3), "a b")
      == Seq.empty) // shorter than one window → no segments
    assert(one[scala.collection.Seq[String]](TextFns.segments(col("c"), 2), "x y x y")
      == Seq("x y", "x y")) // positional: duplicates NOT collapsed
  }

  test("charShingles windows over normalized text") {
    assert(one[scala.collection.Seq[String]](TextFns.charShingles(col("c"), 3), "abcd").toSet
      == Set("abc", "bcd"))
    assert(one[scala.collection.Seq[String]](TextFns.charShingles(col("c"), 5), "ab") == Seq("ab"))
  }

  test("langId picks marker-majority language, unknown on ties/zero") {
    assert(one[String](TextFns.langId(col("c")), "the cat and the dog is here with us") == "en")
    assert(one[String](TextFns.langId(col("c")), "el perro y la casa de que los gatos") == "es")
    assert(one[String](TextFns.langId(col("c")), "xyz qrs") == "unknown")
    // one en marker + one es marker → tie → unknown
    assert(one[String](TextFns.langId(col("c")), "word the word el word") == "unknown")
  }

  test("winnowingFingerprints: deterministic, shared-substring guarantee, short-text floor") {
    def fps(v: String) =
      one[scala.collection.Seq[Long]](TextFns.winnowingFingerprints(col("c"), 5, 4), v).toSet
    val a = "the quick brown fox jumps over the lazy dog near the river bank"
    assert(fps(a) == fps(a)) // deterministic
    // winnowing guarantee: any shared substring of length >= k+w-1 (8)
    // yields at least one shared fingerprint
    val b = "completely different prefix text but jumps over the lazy dog too"
    assert(fps(a).intersect(fps(b)).nonEmpty)
    // ~1/w of the grams survive as prints
    assert(fps(a).size < a.length - 4)
    // below k+w-1 chars: single minimum
    assert(fps("abc").size == 1 && fps("").size == 1)
  }

  test("qualityScore is in [0,1] and rewards word-shaped text") {
    val good = one[Double](TextFns.qualityScore(col("c")),
      "This is a reasonably long sentence made of ordinary words that flows well together okay")
    val bad = one[Double](TextFns.qualityScore(col("c")), "@@ ## $$ 11 22")
    assert(good > 0.6 && good <= 1.0)
    assert(bad >= 0.0 && bad < 0.3)
  }

  test("scrubPii redacts every email, phone, and IPv4 with typed tags") {
    def s(v: String) = one[String](TextFns.scrubPii(col("c")), v)
    assert(s("mail a.b+c@ex-site.org now") == "mail <EMAIL> now")
    assert(s("call +1-555-0042 or +52-800-1234") == "call <PHONE> or <PHONE>")
    assert(s("host 10.0.3.9 up") == "host <IP> up")
    assert(s("v1.2.3 release") == "v1.2.3 release") // 3 octets ≠ an IP
    assert(s("u10.0.0.1@x.com home") == "<EMAIL> home") // email wins before IP nibbles it
    assert(s("plain text stays put") == "plain text stays put")
  }

  test("piiCounts counts per kind") {
    val r = Seq("a@b.io and c@d.io from 10.1.1.1 call +1-555-9999").toDF("c")
      .select(TextFns.piiCounts(col("c")).as("p"))
      .select("p.emails", "p.phones", "p.ips").collect()(0)
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((2, 1, 1)))
  }
}
