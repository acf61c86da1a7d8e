package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.functions.VectorOps

/** Scalar function families (SURVEY.md §2.B Q-STR1, Q-DATE1, Q-MATH1,
  * Q-ARR1, Q-JSON1, Q-MAP1) — all codegen'd built-ins, no UDFs.
  * Transcendental outputs are rounded to 6 dp (libm last-ulp differences
  * between engines, SURVEY.md §7.4.1); exact ops ship unrounded.
  */
object ScalarQueries extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q-STR1: ticker/name normalization family (reference R13 string prep).
    "q_str1" -> ((s, d) =>
      Tables.load(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("up_name"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_name"), 1, 4).as("name4"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("devoweled"),
        split_part(col("p_name"), lit(" "), lit(1)).as("first_word"))
        .orderBy("p_partkey")),

    // Q-DATE1: datetime family (reference R8 Year derivation and friends).
    "q_date1" -> ((s, d) =>
      Tables.load(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        (weekday(col("o_orderdate")) + 1).cast("long").as("dow_iso"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        datediff(to_date(lit("1998-01-01")), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_98"),
        add_months(col("o_orderdate"), 3).as("plus3m"))
        .orderBy("o_orderkey")),

    // Q-MATH1: math family incl. null-safe divide.
    "q_math1" -> ((s, d) =>
      // unit_price is deliberately UNROUNDED: IEEE division of identical
      // operands is bitwise-identical across engines, while round-to-2dp
      // diverges on exact half-cent quotients (e.g. 67322.93/2) because
      // Spark rounds the shortest decimal representation and DuckDB the
      // binary value. Transcendentals (ln/exp/sqrt) get 6dp rounding for
      // libm last-ulp differences — over SMALL-DOMAIN arguments only:
      // tools/fragility.py measured ln(l_extendedprice) at 6dp sitting
      // 714 ulps from a rounding boundary (59 821 distinct prices pack
      // the boundary neighborhood; no precision clears 1e6 ulps), while
      // ln over l_quantity's 50 integer values keeps 1.2e7 ulps of
      // margin — the same small-pinned-domain rule as Bm25's idf.
      Tables.load(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") / col("l_quantity")).as("unit_price"),
        abs(col("l_discount") - lit(0.05)).as("abs_disc_dev"),
        round(log(col("l_quantity")), 6).as("ln_qty"),
        round(exp(col("l_discount")), 6).as("exp_disc"),
        round(pow(col("l_quantity"), 2), 1).as("qty_sq"),
        round(sqrt(col("l_quantity")), 6).as("sqrt_qty"),
        (col("l_extendedprice") / nullif(col("l_discount"), lit(0.0))).as("price_per_disc"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("unit_price"),
          col("qty_sq"), col("abs_disc_dev"))),

    // Q-ARR1: array higher-order functions over embeddings.
    "q_arr1" -> ((s, d) =>
      Tables.load(s, d, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first_val"),
        round(VectorOps.norm2(col("embedding")), 6).as("l2norm"))
        .orderBy("vec_id")),

    // Q-JSON1: JSON extraction from events.props.
    "q_json1" -> ((s, d) =>
      Tables.load(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")),

    // Spark 4 VARIANT path for semi-structured data: parse once into the
    // binary variant encoding, then typed extraction — the scale-friendly
    // alternative to repeated string JSON parsing.
    "q_json2" -> ((s, d) =>
      Tables.load(s, d, "events").select(
        col("event_id"),
        variant_get(parse_json(col("props")), "$.k", "long").as("k"),
        try_variant_get(parse_json(col("props")), "$.missing", "string").isNull
          .as("missing_is_null"))
        .orderBy("event_id")),

    // Q-MAP1: map build + lookup. The MAP itself is not emitted (key order
    // is undefined in both engines, SURVEY.md §7.4.7) — but the projected
    // size() and element_at() values are order-independent, so the query IS
    // oracle-checked through the relational equivalent (count + CASE max).
    "q_map1" -> ((s, d) => {
      val perSeg = Tables.load(s, d, "customer")
        .groupBy("c_nationkey", "c_mktsegment").agg(count(lit(1)).as("n"))
      perSeg.groupBy("c_nationkey")
        .agg(map_from_entries(sort_array(collect_list(struct(col("c_mktsegment"), col("n")))))
          .as("seg_counts"))
        .select(col("c_nationkey"),
          size(col("seg_counts")).cast("long").as("n_segments"),
          try_element_at(col("seg_counts"), lit("BUILDING")).as("building_cnt"))
        .orderBy("c_nationkey")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_map1" ->
      """WITH perseg AS (
        |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
        |  FROM customer GROUP BY 1, 2)
        |SELECT c_nationkey, COUNT(*) AS n_segments,
        |  max(CASE WHEN c_mktsegment = 'BUILDING' THEN n END) AS building_cnt
        |FROM perseg GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_str1" ->
      """SELECT p_partkey, upper(p_name) AS up_name,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  substring(p_name, 1, 4) AS name4,
        |  p_brand || ':' || p_type AS brand_type,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled,
        |  split_part(p_name, ' ', 1) AS first_word
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_date1" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(isodow(o_orderdate) AS BIGINT) AS dow_iso,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT) AS days_to_98,
        |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_math1" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice / l_quantity AS unit_price,
        |  abs(l_discount - 0.05) AS abs_disc_dev,
        |  round(ln(l_quantity), 6) AS ln_qty,
        |  round(exp(l_discount), 6) AS exp_disc,
        |  round(pow(l_quantity, 2), 1) AS qty_sq,
        |  round(sqrt(l_quantity), 6) AS sqrt_qty,
        |  l_extendedprice / nullif(l_discount, 0.0) AS price_per_disc
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, unit_price, qty_sq, abs_disc_dev""".stripMargin,
    "q_arr1" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS first_val,
        |  round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_json1" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q_json2" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  json_extract_string(props, '$.missing') IS NULL AS missing_is_null
        |FROM events ORDER BY event_id""".stripMargin,
  )
}
