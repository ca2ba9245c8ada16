package graft

import graft.functions.{CleanFns, Det}
import org.apache.spark.sql.functions._

/** Oracle-checked queries for the cleaning functions that round 1 covered
  * by spec only: P12 categorical remap, D3 amenities parse, D4 amenity
  * flags, P8 numeric coercion, P13 pandas-parity title-case. Inputs are
  * synthesized deterministically from testdata keys so every branch of
  * each function (known key, unknown passthrough, null, scalar fallback,
  * unparsable string) is exercised; the DuckDB oracle re-derives the same
  * inputs and applies independent SQL with the same semantics.
  *
  * Scale: every query here is a narrow projection + one map-side-combined
  * aggregation — one shuffle of a handful of rows regardless of input
  * size; the per-row expressions are all codegen'd (the one UDF, q52's
  * titleCase, is documented as the library's single off-hot-path UDF).
  */
object CleanQueries {
  import Queries.tbl

  // q49 — P12 categorical remap (transformacion.py:229-261): known keys
  // map to Spanish labels, unknown values pass through, null becomes
  // 'No especificado'. Room types are derived from o_orderkey so all
  // three branches occur.
  private val q49 = Q(
    "q49_cat_remap",
    (s, dir) => {
      val m = col("o_orderkey") % 6
      val room = when(m === 0, lit("Entire home/apt"))
        .when(m === 1, lit("Private room"))
        .when(m === 2, lit("Shared room"))
        .when(m === 3, lit("Hotel room"))
        .when(m === 4, lit("Boutique hotel")) // not in the map → passthrough
      // m === 5 → null → 'No especificado'
      tbl(s, dir, "orders")
        .withColumn("room_type", CleanFns.remapCategory(room, CleanFns.RoomTypeMap))
        .groupBy("room_type").agg(count(lit(1)).as("cnt"))
        .orderBy("room_type")
    },
    Some("""WITH r AS (SELECT CASE o_orderkey % 6
        WHEN 0 THEN 'Entire home/apt' WHEN 1 THEN 'Private room'
        WHEN 2 THEN 'Shared room' WHEN 3 THEN 'Hotel room'
        WHEN 4 THEN 'Boutique hotel' END AS rt FROM orders)
      SELECT CASE WHEN rt IS NULL THEN 'No especificado'
        WHEN rt = 'Entire home/apt' THEN 'Casa/Apartamento completo'
        WHEN rt = 'Private room' THEN 'Habitación privada'
        WHEN rt = 'Shared room' THEN 'Habitación compartida'
        WHEN rt = 'Hotel room' THEN 'Habitación de hotel'
        ELSE rt END AS room_type, COUNT(*) AS cnt
      FROM r GROUP BY 1 ORDER BY room_type"""))

  // q50 — D3 amenities parse + D4 substring flags
  // (transformacion.py:96-181): JSON-list strings are parsed, scalars
  // wrapped, elements stripped of non-alphanumerics, blanks dropped,
  // null → empty; a flag is set when any element case-insensitively
  // contains the amenity ("Cable TV" sets tv, "Free WiFi" sets wifi).
  private val q50 = Q(
    "q50_amenities",
    (s, dir) => {
      val m = col("doc_id") % 5
      val raw = when(m === 0, lit("""["Free WiFi", "Cable TV", "Heating!!"]"""))
        .when(m === 1, lit("Kitchen & stuff"))
        .when(m === 2, lit(null).cast("string"))
        .when(m === 3, lit("""["Pool!!", "   ", "Gym", "Free parking"]"""))
        .otherwise(lit("""["TV"]"""))
      val arr = CleanFns.parseAmenities(raw)
      def flag(a: String) = sum(CleanFns.amenityFlag(arr, a).cast("long"))
      tbl(s, dir, "documents")
        .agg(
          count(lit(1)).as("cnt"),
          sum(size(arr).cast("long")).as("total_amenities"),
          flag("WiFi").as("n_wifi"), flag("TV").as("n_tv"),
          flag("Kitchen").as("n_kitchen"), flag("Pool").as("n_pool"),
          flag("Gym").as("n_gym"), flag("Parking").as("n_parking"),
          flag("Heating").as("n_heating"))
    },
    Some("""WITH a AS (SELECT CASE doc_id % 5
        WHEN 0 THEN '["Free WiFi", "Cable TV", "Heating!!"]'
        WHEN 1 THEN 'Kitchen & stuff'
        WHEN 2 THEN NULL
        WHEN 3 THEN '["Pool!!", "   ", "Gym", "Free parking"]'
        ELSE '["TV"]' END AS raw FROM documents),
      p AS (SELECT CASE
          WHEN raw IS NULL THEN []::VARCHAR[]
          WHEN trim(raw) LIKE '[%' THEN list_filter(list_transform(
            string_split(replace(replace(replace(trim(raw), '[', ''), ']', ''), '"', ''), ', '),
            x -> trim(regexp_replace(x, '[^a-zA-Z0-9 ]', '', 'g'))), x -> x <> '')
          ELSE list_filter([trim(regexp_replace(trim(raw), '[^a-zA-Z0-9 ]', '', 'g'))], x -> x <> '')
        END AS arr FROM a)
      SELECT COUNT(*) AS cnt,
        CAST(SUM(len(arr)) AS BIGINT) AS total_amenities,
        CAST(SUM(CASE WHEN len(list_filter(arr, x -> contains(lower(x), 'wifi'))) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_wifi,
        CAST(SUM(CASE WHEN len(list_filter(arr, x -> contains(lower(x), 'tv'))) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tv,
        CAST(SUM(CASE WHEN len(list_filter(arr, x -> contains(lower(x), 'kitchen'))) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kitchen,
        CAST(SUM(CASE WHEN len(list_filter(arr, x -> contains(lower(x), 'pool'))) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pool,
        CAST(SUM(CASE WHEN len(list_filter(arr, x -> contains(lower(x), 'gym'))) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gym,
        CAST(SUM(CASE WHEN len(list_filter(arr, x -> contains(lower(x), 'parking'))) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_parking,
        CAST(SUM(CASE WHEN len(list_filter(arr, x -> contains(lower(x), 'heating'))) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_heating
      FROM p"""))

  // q51 — P8 numeric coercion (transformacion.py:289-303):
  // to_numeric(errors='coerce').fillna(0). Inputs derived from c_custkey
  // (no float formatting → no printf rounding-mode dependence): a
  // parseable decimal, garbage, null, and a whitespace-padded integer.
  private val q51 = Q(
    "q51_num_clean",
    (s, dir) => {
      val m = col("c_custkey") % 4
      val raw = when(m === 0, concat(lit("-"), (col("c_custkey") % 1000).cast("string"), lit(".25")))
        .when(m === 1, lit("not-a-number"))
        .when(m === 2, lit(null).cast("string"))
        .otherwise(concat(lit("  "), col("c_custkey").cast("string"), lit(" ")))
      val v = CleanFns.numClean(raw)
      tbl(s, dir, "customer")
        .agg(
          count(lit(1)).as("cnt"),
          Det.dsum(v).as("sum_val"),
          sum((v === 0.0).cast("long")).as("n_zero"))
    },
    Some("""WITH r AS (SELECT CASE c_custkey % 4
        WHEN 0 THEN '-' || CAST(c_custkey % 1000 AS VARCHAR) || '.25'
        WHEN 1 THEN 'not-a-number'
        WHEN 2 THEN NULL
        ELSE '  ' || CAST(c_custkey AS VARCHAR) || ' ' END AS raw FROM customer),
      v AS (SELECT COALESCE(TRY_CAST(raw AS DOUBLE), 0.0) AS v FROM r)
      SELECT COUNT(*) AS cnt,
        CAST(SUM(CAST(v AS DECIMAL(28,2))) AS DOUBLE) AS sum_val,
        CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
      FROM v"""))

  // q52 — P13 pandas str.title() parity (transformacion.py:367-368):
  // uppercase every letter that follows a non-letter (or start),
  // lowercase the rest — "o'neil" → "O'Neil", which initcap gets wrong.
  // The oracle replays the per-character rule with a DuckDB list lambda
  // (input is ASCII, so [A-Za-z] ≡ Character.isLetter here).
  private val q52 = Q(
    "q52_title_case",
    (s, dir) => tbl(s, dir, "customer")
      .select(CleanFns.titleCase(concat(lit("o'neil-"), lower(col("c_name")))).as("name_t"))
      .groupBy("name_t").agg(count(lit(1)).as("cnt"))
      .orderBy("name_t"),
    Some("""WITH t AS (SELECT 'o''neil-' || lower(c_name) AS s FROM customer)
      SELECT list_aggregate(list_transform(string_split(s, ''), (c, i) ->
          CASE WHEN regexp_matches(c, '[A-Za-z]')
                    AND (i = 1 OR NOT regexp_matches(s[i-1:i-1], '[A-Za-z]'))
               THEN upper(c) ELSE lower(c) END), 'string_agg', '') AS name_t,
        COUNT(*) AS cnt
      FROM t GROUP BY 1 ORDER BY name_t"""))

  val all: Seq[Q] = Seq(q49, q50, q51, q52)
}
