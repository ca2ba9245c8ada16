package graft

import graft.functions.CleanFns
import org.apache.spark.sql.functions._

/** Parity-quirk specs for the row-level cleaning library (SURVEY §7.4(1)):
  * each asserts a behavior of /root/reference/src/transformacion.py that a
  * naive Spark mapping would get wrong. */
class CleanFnsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, input: (String, Any)*): T = {
    val df = input.toSeq match {
      case Seq(("s", v: String))      => Seq(Option(v)).toDF("c")
      case Seq(("ns", _))             => Seq(Option.empty[String]).toDF("c")
      case Seq(("d", v: Double))      => Seq(Option(v)).toDF("c")
      case Seq(("nd", _))             => Seq(Option.empty[Double]).toDF("c")
      case other                      => sys.error(s"bad input $other")
    }
    df.select(c.as("r")).collect()(0).getAs[T]("r")
  }

  // P6 — transformacion.py:14-23: strip [$,], null/unparseable → 0.0
  test("cleanPrice strips symbols and zeroes nulls") {
    assert(one[Double](CleanFns.cleanPrice(col("c")), "s" -> "$1,234.56") == 1234.56)
    assert(one[Double](CleanFns.cleanPrice(col("c")), "s" -> "900000") == 900000.0)
    assert(one[Double](CleanFns.cleanPrice(col("c")), "ns" -> null) == 0.0)
    assert(one[Double](CleanFns.cleanPrice(col("c")), "s" -> "garbage") == 0.0)
    // notebook variant (nb cell 9:20): unparseable → null, not 0.0
    assert(one[Any](CleanFns.cleanPrice(col("c"), nullToZero = false), "s" -> "garbage") == null)
  }

  // P7 — transformacion.py:25-42: permissive formats, err → null
  test("normDate parses permissive formats, null on garbage") {
    assert(one[String](CleanFns.normDate(col("c")), "s" -> "2016-01-08") == "2016-01-08")
    assert(one[String](CleanFns.normDate(col("c")), "s" -> "2016-01-08 10:30:00") == "2016-01-08")
    assert(one[String](CleanFns.normDate(col("c")), "s" -> "2016/01/08") == "2016-01-08")
    assert(one[Any](CleanFns.normDate(col("c")), "s" -> "not a date") == null)
  }

  // D1 — transformacion.py:44-58: weekday Monday=0 (pandas dt.dayofweek)
  test("timeParts weekday is Monday=0") {
    val df = Seq("2024-01-01").toDF("d").select(to_date($"d").as("d")) // a Monday
    val parts = CleanFns.timeParts(col("d")).toMap
    val r = df.select(parts("dia_semana").as("w"), parts("nombre_mes").as("m"),
      parts("trimestre").as("q")).collect()(0)
    assert(r.getAs[Int]("w") == 0)
    assert(r.getAs[String]("m") == "January")
    assert(r.getAs[Int]("q") == 1)
  }

  // D2 — transformacion.py:60-94 ladder with boundary inclusivity (<=)
  test("priceCategory ladder boundaries") {
    def cat(p: Double) = one[String](CleanFns.priceCategory(col("c")), "d" -> p)
    assert(cat(500.0) == "Económico")
    assert(cat(500.01) == "Medio")
    assert(cat(2000.0) == "Medio-Alto")
    assert(cat(5000.0) == "Alto")
    assert(cat(5000.01) == "Premium")
    assert(one[String](CleanFns.priceCategory(col("c")), "nd" -> null) == "No especificado")
  }

  // D3 — transformacion.py:96-154: JSON list, char-strip, scalar fallback
  test("parseAmenities handles lists, empties, and scalar fallback") {
    def arr(s: String) = one[scala.collection.Seq[String]](CleanFns.parseAmenities(col("c")), "s" -> s)
    assert(arr("""["Wifi", "Full kitchen!", ""]""") == Seq("Wifi", "Full kitchen"))
    assert(arr("[]") == Seq())
    assert(arr("just wifi") == Seq("just wifi"))
    assert(one[scala.collection.Seq[String]](CleanFns.parseAmenities(col("c")), "ns" -> null) == Seq())
  }

  // D4 — transformacion.py:156-181: case-insensitive SUBSTRING match
  test("amenityFlag matches substrings case-insensitively") {
    val df = Seq(Seq("Free WiFi", "Cable TV")).toDF("a")
    val r = df.select(
      CleanFns.amenityFlag(col("a"), "WiFi").as("wifi"),
      CleanFns.amenityFlag(col("a"), "TV").as("tv"),
      CleanFns.amenityFlag(col("a"), "Pool").as("pool")).collect()(0)
    assert(r.getAs[Int]("wifi") == 1)
    assert(r.getAs[Int]("tv") == 1)
    assert(r.getAs[Int]("pool") == 0)
  }

  // D5 — transformacion.py:355-364: duplicate lexicon entries count twice;
  // per-entry membership (not per-occurrence); substring matches
  test("sentiment parity quirks") {
    def s(t: String) = one[Int](CleanFns.sentiment(col("c")), "s" -> t)
    assert(s("terrible stay") == -2)      // 'terrible' twice in the list
    assert(s("good good") == 1)           // membership, not occurrences
    assert(s("goodness") == 1)            // substring
    assert(s("The flat is very nice newly renovated. The host is good.") == 1)
    assert(s("nan") == 0)                 // null → 'nan' → 0
  }

  // P9 — transformacion.py:263-287 accepted truthy spellings
  test("boolBin truthy set") {
    def b(v: String) = one[Int](CleanFns.boolBin(col("c")), "s" -> v)
    assert(Seq("t", "true", "True", " T ", "1", "yes", "si").map(b) == Seq(1, 1, 1, 1, 1, 1, 1))
    assert(Seq("f", "false", "0", "no", "").map(b) == Seq(0, 0, 0, 0, 0))
    assert(one[Int](CleanFns.boolBin(col("c")), "ns" -> null) == 0)
  }

  // P12 — transformacion.py:229-261: map, passthrough, null
  test("remapCategory maps known, passes unknown, nulls to No especificado") {
    def m(v: String) = one[String](CleanFns.remapCategory(col("c"), CleanFns.RoomTypeMap), "s" -> v)
    assert(m("Entire home/apt") == "Casa/Apartamento completo")
    assert(m("Castle") == "Castle")
    assert(one[String](CleanFns.remapCategory(col("c"), CleanFns.RoomTypeMap), "ns" -> null) == "No especificado")
  }

  // P13 — pandas str.title() capitalizes after ANY non-alpha
  test("titleCase matches pandas str.title, not initcap") {
    def t(v: String) = one[String](CleanFns.titleCase(col("c")), "s" -> v)
    assert(t("o'neil mcgregor") == "O'Neil Mcgregor")
    assert(t("MARIA-JOSE") == "Maria-Jose")
    assert(t("2nd floor") == "2Nd Floor") // pandas quirk: alpha after digit
  }

  // P13 non-ASCII parity: word boundaries are CASED characters and the
  // word-start mapping is the full Unicode titlecase (Python semantics)
  test("titleCase unicode parity with pandas str.title") {
    def t(v: String) = one[String](CleanFns.titleCase(col("c")), "s" -> v)
    assert(t("josé ángel") == "José Ángel")
    assert(t("straße") == "Straße")    // ß mid-word stays ß
    assert(t("ßeta") == "Sseta")       // ß at word start expands to Ss
    assert(t("ǳur") == "ǲur")          // digraph gets TITLEcase ǲ, not Ǳ
    assert(t("ŉa") == "ʼNa")           // U+0149: first CASED codepoint of
                                        // the expansion upper, not the first
                                        // codepoint (Python title = ʼN)
    assert(t("漢a字b") == "漢A字B")     // uncased letters don't end a word
  }

  // P14/§1.3(5) — null comment → 'nan' string of length 3
  test("commentClean null becomes literal nan") {
    assert(one[String](CleanFns.commentClean(col("c")), "ns" -> null) == "nan")
  }
}
