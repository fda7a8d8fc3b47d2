package graft.testqueries

import org.apache.spark.sql.functions._

/** Scalar-function surface breadth: string, math, and date/time families
  * beyond the reference's X1-X9 set (engine completeness). Only
  * functions with engine-exact semantics are included: sqrt is IEEE
  * correctly-rounded (safe); ln/exp/pow are not and are excluded rather
  * than rounded over a knife edge.
  */
object FunctionQueries {
  import Tables._

  val all: Seq[QueryDef] = Seq(

    QueryDef("q41_string_funcs",
      (s, d) => customer(s, d).select(
        col("c_custkey"),
        upper(col("c_name")).as("u"),
        lower(col("c_mktsegment")).as("l"),
        length(col("c_name")).as("len"),
        substring(col("c_name"), 3, 5).as("sub"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("pad"),
        regexp_replace(col("c_name"), "[0-9]+", "#").as("repl"),
        reverse(col("c_mktsegment")).as("rev"),
        instr(col("c_name"), "1").as("pos"),
        levenshtein(col("c_mktsegment"), lit("BUILDING")).as("lev"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("tr"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
        upper(c_name) AS u, lower(c_mktsegment) AS l,
        length(c_name) AS len, substring(c_name, 3, 5) AS sub,
        lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS pad,
        regexp_replace(c_name, '[0-9]+', '#', 'g') AS repl,
        reverse(c_mktsegment) AS rev,
        instr(c_name, '1') AS pos,
        levenshtein(c_mktsegment, 'BUILDING') AS lev,
        translate(c_mktsegment, 'AEIOU', 'aeiou') AS tr
        FROM customer ORDER BY c_custkey""")),

    QueryDef("q42_math_funcs",
      (s, d) => supplier(s, d).select(
        col("s_suppkey"),
        abs(col("s_acctbal")).as("ab"),
        ceil(col("s_acctbal")).as("ce"),
        floor(col("s_acctbal")).as("fl"),
        round(col("s_acctbal"), 1).as("ro"),
        signum(col("s_acctbal")).cast("int").as("sg"),
        sqrt(abs(col("s_acctbal"))).as("sq"),
        greatest(col("s_acctbal"), lit(0.0)).as("gr"),
        least(col("s_acctbal"), lit(0.0)).as("le"),
        pmod(col("s_suppkey"), lit(7)).as("md"))
        .orderBy("s_suppkey"),
      Some("""SELECT s_suppkey,
        abs(s_acctbal) AS ab,
        CAST(ceil(s_acctbal) AS BIGINT) AS ce,
        CAST(floor(s_acctbal) AS BIGINT) AS fl,
        round(s_acctbal, 1) AS ro,
        CAST(sign(s_acctbal) AS INTEGER) AS sg,
        sqrt(abs(s_acctbal)) AS sq,
        greatest(s_acctbal, CAST(0.0 AS DOUBLE)) AS gr,
        least(s_acctbal, CAST(0.0 AS DOUBLE)) AS le,
        s_suppkey % 7 AS md
        FROM supplier ORDER BY s_suppkey""")),

    QueryDef("q43_datetime_funcs",
      (s, d) => orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        hour(col("o_orderdate")).as("h"),
        date_trunc("day", col("o_orderdate")).as("day_start"),
        (col("o_orderdate") + expr("INTERVAL 5 DAYS")).as("plus5"),
        datediff(col("o_orderdate"),
          lit("2024-01-01").cast("date")).as("days_since"),
        quarter(col("o_orderdate")).as("q"),
        expr("unix_micros(cast(o_orderdate as timestamp))").as("us"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
        CAST(year(o_orderdate) AS INTEGER) AS y,
        CAST(month(o_orderdate) AS INTEGER) AS m,
        CAST(dayofmonth(o_orderdate) AS INTEGER) AS dom,
        CAST(hour(o_orderdate) AS INTEGER) AS h,
        date_trunc('day', o_orderdate) AS day_start,
        o_orderdate + INTERVAL 5 DAY AS plus5,
        CAST(datediff('day', DATE '2024-01-01', o_orderdate) AS INTEGER)
          AS days_since,
        CAST(quarter(o_orderdate) AS INTEGER) AS q,
        epoch_us(o_orderdate) AS us
        FROM orders ORDER BY o_orderkey"""))
  )
}
