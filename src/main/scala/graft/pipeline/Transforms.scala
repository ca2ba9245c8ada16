package graft.pipeline

import graft.functions.CleanFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference ETL's transform phase (transformacion.py:185-422)
  * re-expressed as lazy `DataFrame => DataFrame` steps. Where the
  * reference runs 10 eager full-copy passes (31 s for 26k rows), these
  * compose into a single Catalyst-fused projection — one scan, zero
  * copies, whole-stage codegen'd, partition-parallel at any scale.
  *
  * Column-presence guards mirror the reference's `if col in df.columns`
  * totality: every step is a no-op on frames lacking its inputs.
  */
object Transforms {

  private def has(df: DataFrame, c: String): Boolean = df.columns.contains(c)

  /** Mongo extended-JSON landing shape: schema inference turns
    * `{"$date": ...}` into a one-field struct — unwrap those to scalars
    * so the date pipeline sees plain values (extraccion.py lands exactly
    * this shape; transformacion.py:31-32 unwraps per-row). */
  def unwrapMongo(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case st: org.apache.spark.sql.types.StructType
            if st.fieldNames.sameElements(Array("$date")) =>
          d.withColumn(f.name, col(s"`${f.name}`.`$$date`"))
        case _ => d
      }
    }

  /** P4 with the reference's keep-first semantics (pandas drop_duplicates
    * keeps first in input order). Distributed input has no "input order",
    * so the survivor is chosen by `orderCol` when given (deterministic
    * row_number dedup — one shuffle on the key); otherwise an arbitrary
    * survivor per key (Spark dropDuplicates — same shuffle, less state). */
  def dedupByKey(df: DataFrame, key: String, orderCol: Option[String]): DataFrame =
    orderCol match {
      case Some(o) if has(df, o) =>
        val w = Window.partitionBy(col(key)).orderBy(col(o).asc)
        df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
      case _ => df.dropDuplicates(key)
    }

  private def withEach(df: DataFrame, cols: Seq[String], suffix: String)(f: Column => Column): DataFrame =
    cols.filter(has(df, _)).foldLeft(df)((d, c) => d.withColumn(s"$c$suffix", f(col(c))))

  /** transformar_listings (transformacion.py:185-329): 10 steps. */
  def listings(df0raw: DataFrame, dedupOrder: Option[String] = None): DataFrame = {
    val df0 = unwrapMongo(df0raw)
    // 1-2: critical-null filter + key dedup
    var df = df0.na.drop(Seq("id", "latitude", "longitude").filter(has(df0, _)))
    df = dedupByKey(df, "id", dedupOrder)
    // 3: price normalization (null/unparseable → 0.0)
    if (has(df, "price")) df = df.withColumn("price_clean", CleanFns.cleanPrice(col("price")))
    // 4: date normalization → 'yyyy-MM-dd' strings
    df = withEach(df, Seq("host_since", "calendar_last_scraped", "last_scraped"), "_clean")(CleanFns.normDate)
    // 5: price bucketing
    if (has(df, "price_clean"))
      df = df.withColumn("categoria_precio", CleanFns.priceCategory(col("price_clean")))
    // 6: amenities parse + 10 substring flag columns
    if (has(df, "amenities")) {
      df = df.withColumn("amenities_procesados", CleanFns.parseAmenities(col("amenities")))
      df = CleanFns.DefaultAmenities.foldLeft(df) { (d, a) =>
        d.withColumn(s"amenity_${a.toLowerCase.replace(' ', '_')}",
          CleanFns.amenityFlag(col("amenities_procesados"), a))
      }
    }
    // 7: categorical remap (unknown passthrough, null → 'No especificado')
    if (has(df, "room_type"))
      df = df.withColumn("room_type_normalizado", CleanFns.remapCategory(col("room_type"), CleanFns.RoomTypeMap))
    if (has(df, "property_type"))
      df = df.withColumn("property_type_normalizado", CleanFns.remapCategory(col("property_type"), CleanFns.PropertyTypeMap))
    // 8: boolean binarization
    df = withEach(df, Seq("host_is_superhost", "host_identity_verified", "has_availability"), "_bin")(CleanFns.boolBin)
    // 9: numeric coercion (coerce-or-0)
    df = withEach(df, Seq("accommodates", "bedrooms", "beds", "minimum_nights",
      "maximum_nights", "availability_30", "availability_60",
      "availability_90", "availability_365"), "_clean")(CleanFns.numClean)
    // 10: text cleanup
    withEach(df, Seq("neighbourhood_cleansed", "name", "description"), "_clean")(CleanFns.textClean)
  }

  /** transformar_reviews (transformacion.py:331-374): 5 steps. */
  def reviews(df0raw: DataFrame, dedupOrder: Option[String] = None): DataFrame = {
    val df0 = unwrapMongo(df0raw)
    var df = df0.na.drop(Seq("id", "listing_id").filter(has(df0, _)))
    df = dedupByKey(df, "id", dedupOrder)
    if (has(df, "date")) {
      df = df.withColumn("date_clean", CleanFns.normDate(col("date")))
      df = CleanFns.timeParts(to_date(col("date_clean"))).foldLeft(df) {
        case (d, (n, c)) => d.withColumn(n, c)
      }
    }
    if (has(df, "comments")) {
      df = df.withColumn("comments_clean", CleanFns.commentClean(col("comments")))
        .withColumn("comments_length", length(col("comments_clean")))
        .withColumn("sentiment_score", CleanFns.sentiment(col("comments_clean")))
    }
    if (has(df, "reviewer_name"))
      df = df.withColumn("reviewer_name_clean",
        CleanFns.titleCase(trim(col("reviewer_name").cast("string"))))
    df
  }

  /** transformar_calendar (transformacion.py:376-402): 4 steps. */
  def calendar(df0raw: DataFrame): DataFrame = {
    val df0 = unwrapMongo(df0raw)
    var df = df0.na.drop(Seq("listing_id", "date").filter(has(df0, _)))
    if (has(df, "date")) {
      df = df.withColumn("date_clean", CleanFns.normDate(col("date")))
      df = CleanFns.timeParts(to_date(col("date_clean"))).foldLeft(df) {
        case (d, (n, c)) => d.withColumn(n, c)
      }
    }
    if (has(df, "price")) df = df.withColumn("price_clean", CleanFns.cleanPrice(col("price")))
    if (has(df, "available")) df = df.withColumn("available_bin", CleanFns.boolBin(col("available")))
    df
  }

  /** ejecutar_transformacion_completa (transformacion.py:404-422): apply
    * the matching transform per table name; unknown tables pass through. */
  def all(tables: Map[String, DataFrame]): Map[String, DataFrame] =
    tables.map {
      case ("listings", df) => "listings" -> listings(df)
      case ("reviews", df)  => "reviews"  -> reviews(df)
      case ("calendar", df) => "calendar" -> calendar(df)
      case other            => other
    }
}
