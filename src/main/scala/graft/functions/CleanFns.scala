package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference engine's row-level cleaning / derivation operators
  * (SURVEY.md §2.2–2.3), re-expressed as pure `Column => Column`
  * functions so Catalyst can fuse, prune, and push them down. None of
  * these is a UDF except [[titleCase]] — everything stays inside
  * whole-stage codegen.
  *
  * Semantics follow the reference (`/root/reference/src/transformacion.py`)
  * including its parity quirks: null price → 0.0 (transformacion.py:15-23),
  * null text → 'No especificado' (:311), weekday Monday=0 (:53),
  * sentiment duplicate lexicon entries count twice (:358-359).
  */
object CleanFns {

  // ── P6: price normalization ─ strip [$,], cast, null/err → 0.0 ──────
  /** transformacion.py:14-23. `nullToZero=false` gives the notebook
    * variant (nb cell 9:20) where unparseable → null. */
  def cleanPrice(c: Column, nullToZero: Boolean = true): Column = {
    // try_cast, not cast: under ANSI mode (Spark 4 default) a plain cast
    // THROWS on malformed input; the reference's semantics are coerce-to-null.
    val parsed = regexp_replace(c.cast(StringType), "[$,]", "").try_cast(DoubleType)
    if (nullToZero) coalesce(parsed, lit(0.0)) else parsed
  }

  // ── P7: permissive date parsing ──────────────────────────────────────
  /** transformacion.py:25-42: parse the formats actually present
    * (ISO date, ISO datetime, slash dates, Mongo $date millis) → DateType,
    * unparseable → null. */
  def parseDate(c: Column): Column = {
    val s = trim(c.cast(StringType))
    coalesce(
      try_to_timestamp(s, lit("yyyy-MM-dd")),
      try_to_timestamp(s, lit("yyyy-MM-dd HH:mm:ss")),
      try_to_timestamp(s, lit("yyyy/MM/dd")),
      try_to_timestamp(s, lit("dd/MM/yyyy")),
      try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ss")),
      try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ss.SSS")),
      try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ssX")),
      try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ss.SSSX"))
    ).cast(DateType)
  }

  /** P7 Mongo extended-JSON date (transformacion.py:31-32): unwrap
    * `{"$date": <iso-string | epoch-millis>}` carried either as a raw
    * JSON string or already-extracted scalar, then parse permissively. */
  def mongoDate(c: Column): Column = {
    val s      = trim(c.cast(StringType))
    val inner  = coalesce(get_json_object(s, "$['$date']"), s)
    val millis = inner.try_cast(LongType)
    when(millis.isNotNull, timestamp_millis(millis).cast(DateType))
      .otherwise(parseDate(inner))
  }

  /** P7 sink form: 'yyyy-MM-dd' string, null on unparseable. */
  def normDate(c: Column): Column = date_format(parseDate(c), "yyyy-MM-dd")

  // ── D1: time-part derivation (transformacion.py:44-58) ──────────────
  /** Monday=0 weekday (pandas dt.dayofweek) — Spark `weekday`, NOT
    * `dayofweek` (which is Sunday=1). Month name English (pandas
    * month_name default locale). */
  def timeParts(d: Column): Seq[(String, Column)] = Seq(
    "año"        -> year(d),
    "mes"        -> month(d),
    "dia"        -> dayofmonth(d),
    "trimestre"  -> quarter(d),
    "dia_semana" -> weekday(d),
    "nombre_mes" -> date_format(d, "MMMM")
  )

  // ── D2: price bucketing (transformacion.py:60-94) ────────────────────
  val DefaultBuckets: Seq[(Double, String)] = Seq(
    500.0 -> "Económico", 1000.0 -> "Medio", 2000.0 -> "Medio-Alto",
    5000.0 -> "Alto")
  /** `<= bound` ladder; above all bounds → `top`; null → 'No especificado'. */
  def priceCategory(c: Column,
                    buckets: Seq[(Double, String)] = DefaultBuckets,
                    top: String = "Premium"): Column = {
    val ladder = buckets.foldRight(lit(top): Column) { case ((bound, label), rest) =>
      when(c <= lit(bound), lit(label)).otherwise(rest)
    }
    when(c.isNull, lit("No especificado")).otherwise(ladder)
  }

  // ── D3: amenities parse (transformacion.py:96-154) ───────────────────
  /** Stringified list → cleaned array<string>: JSON-parse if it looks like
    * a list, else wrap the cleaned scalar; strip non-[a-zA-Z0-9 ] chars per
    * element, trim, drop empties. Null → empty array. */
  def parseAmenities(c: Column): Column = {
    def cleanArr(a: Column): Column =
      filter(
        transform(a, x => trim(regexp_replace(x, "[^a-zA-Z0-9\\s]", ""))),
        x => x =!= "")
    val s      = trim(c.cast(StringType))
    val parsed = from_json(s, ArrayType(StringType))
    when(c.isNull, array().cast(ArrayType(StringType)))
      .when(s.startsWith("["), coalesce(cleanArr(parsed), array().cast(ArrayType(StringType))))
      .otherwise(cleanArr(array(s)))
  }

  // ── D4: amenity flag (transformacion.py:156-181) ─────────────────────
  /** 1 if ANY element case-insensitively CONTAINS the amenity substring
    * ("Free WiFi" sets wifi; "TV" matches inside "Cable TV"). */
  def amenityFlag(arr: Column, amenity: String): Column =
    exists(arr, x => contains(lower(x), lit(amenity.toLowerCase))).cast(IntegerType)

  val DefaultAmenities: Seq[String] = Seq(
    "WiFi", "Kitchen", "Air conditioning", "Heating", "TV",
    "Washer", "Dryer", "Pool", "Gym", "Parking")

  // ── D5: lexicon sentiment (transformacion.py:355-364) ────────────────
  /** (# positive entries whose lowercase substring occurs in the text) −
    * (# negative entries ...). Entry lists may carry duplicates — the
    * reference's negative list has 'terrible'/'horrible' twice (EN+ES),
    * so each occurrence counts −2. Pure substring match, per-entry (not
    * per-occurrence). */
  def sentiment(c: Column, positive: Seq[String] = DefaultPositive,
                negative: Seq[String] = DefaultNegative): Column =
    TextFns.bindOnce(lower(c.cast(StringType))) { t =>
      def hits(words: Seq[String]): Column =
        size(filter(lit(words.map(_.toLowerCase).toArray), w => contains(t, w)))
      hits(positive) - hits(negative)
    }
  /** transformacion.py:356-357 */
  val DefaultPositive: Seq[String] = Seq(
    "good", "great", "excellent", "amazing", "perfect", "wonderful",
    "bueno", "excelente", "perfecto", "maravilloso")
  /** transformacion.py:358-359 — 'terrible'/'horrible' appear twice
    * (identical EN+ES spellings); keep both so each counts −2. */
  val DefaultNegative: Seq[String] = Seq(
    "bad", "terrible", "awful", "poor", "horrible",
    "malo", "terrible", "horrible", "pésimo")

  // ── P9/P10: boolean binarization (transformacion.py:263-287,396-397) ─
  /** 't'/'true'/'1'/'yes'/'si' (case/space-insensitive) → 1 else 0
    * (null → 0). */
  def boolBin(c: Column): Column =
    when(lower(trim(c.cast(StringType))).isin("t", "true", "1", "yes", "si"), 1)
      .otherwise(0)

  // ── P8: numeric coercion (transformacion.py:289-303) ─────────────────
  /** to_numeric(errors='coerce').fillna(0) — try_cast for ANSI-safety. */
  def numClean(c: Column): Column = coalesce(c.try_cast(DoubleType), lit(0.0))

  // ── P11: text cleanup (transformacion.py:305-316) ────────────────────
  /** fillna('No especificado') then strip. */
  def textClean(c: Column): Column =
    coalesce(trim(c.cast(StringType)), lit("No especificado"))

  // ── P12: categorical remap (transformacion.py:229-261) ───────────────
  /** dict-map with passthrough for unknown, 'No especificado' for null. */
  def remapCategory(c: Column, mapping: Map[String, String]): Column = {
    val t = trim(c.cast(StringType))
    val m = map(mapping.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq: _*)
    when(c.isNull, lit("No especificado"))
      .otherwise(coalesce(element_at(m, t), t))
  }

  /** transformacion.py:231-237 */
  val RoomTypeMap: Map[String, String] = Map(
    "Entire home/apt" -> "Casa/Apartamento completo",
    "Private room"    -> "Habitación privada",
    "Shared room"     -> "Habitación compartida",
    "Hotel room"      -> "Habitación de hotel")

  /** transformacion.py:238-244 */
  val PropertyTypeMap: Map[String, String] = Map(
    "Apartment"   -> "Apartamento",
    "House"       -> "Casa",
    "Condominium" -> "Condominio",
    "Loft"        -> "Loft",
    "Other"       -> "Otro")

  // ── P13: title case (transformacion.py:367-368) ──────────────────────
  /** pandas str.title() parity: titlecase every character that follows a
    * non-CASED character (or start), lowercase the rest — `initcap` only
    * splits on whitespace so "o'neil" would differ. Word boundaries use
    * Python's cased test (Lu/Ll/Lt + Other_Lower/Uppercase — so "漢a" →
    * "漢A": a letter that isn't cased doesn't end a word), and the
    * word-start mapping is the FULL titlecase mapping ("ß" → "Ss",
    * "ﬁne" → "Fine"), which Java's char-level Character.toTitleCase
    * can't expand — detect expansion via the string uppercase mapping.
    * The one genuine UDF in the library; keep it off hot paths. */
  val titleCase: Column => Column = {
    val f = udf { s: String =>
      if (s == null) null
      else {
        val sb = new java.lang.StringBuilder(s.length)
        var prevCased = false
        var i = 0
        while (i < s.length) {
          val cp = s.codePointAt(i)
          val cased = Character.isLowerCase(cp) || Character.isUpperCase(cp) ||
            Character.isTitleCase(cp)
          if (prevCased) {
            // full lowercase mapping (e.g. "İ" → "i" + combining dot)
            sb.append(new String(Character.toChars(cp)).toLowerCase(java.util.Locale.ROOT))
          } else {
            val up = new String(Character.toChars(cp)).toUpperCase(java.util.Locale.ROOT)
            if (up.codePointCount(0, up.length) > 1) {
              // Multi-char expansion: Unicode title mapping = uppercase
              // expansion with every cased codepoint AFTER the first
              // cased one lowered (SpecialCasing.txt title forms:
              // "ß" → "Ss", "ﬁ" → "Fi", and "ŉ" → "ʼN" — the leading
              // modifier letter ʼ is not cased, so the N stays upper).
              var j = 0
              var seenCased = false
              while (j < up.length) {
                val ucp = up.codePointAt(j)
                val uc = Character.isLowerCase(ucp) || Character.isUpperCase(ucp) ||
                  Character.isTitleCase(ucp)
                if (uc && seenCased)
                  sb.append(new String(Character.toChars(ucp)).toLowerCase(java.util.Locale.ROOT))
                else sb.appendCodePoint(ucp)
                if (uc) seenCased = true
                j += Character.charCount(ucp)
              }
            } else sb.appendCodePoint(Character.toTitleCase(cp))
          }
          prevCased = cased
          i += Character.charCount(cp)
        }
        sb.toString
      }
    }
    c => f(c.cast(StringType))
  }

  // ── P14: comment cleanup + length (transformacion.py:351-353) ────────
  /** astype(str).str.strip(): null → literal 'nan' string (pandas quirk,
    * SURVEY §1.3(3)); length counts codepoints in both engines. */
  def commentClean(c: Column): Column =
    trim(coalesce(c.cast(StringType), lit("nan")))
}
