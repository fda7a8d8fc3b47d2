package graft

import java.sql.Timestamp
import graft.ops.TemporalJoins

class TemporalJoinsSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("rangeJoin finds exactly the in-window pairs (bucket edges)") {
    // window = 60s; pairs straddling a bucket boundary must be found
    val l = Seq((1L, ts("2026-01-01 10:00:30")),
      (2L, ts("2026-01-01 10:02:00"))).toDF("id", "ts")
    val r = Seq((10L, ts("2026-01-01 10:00:59")), // in l1's window
      (11L, ts("2026-01-01 10:01:25")),           // in l1's window, next bucket
      (12L, ts("2026-01-01 10:01:31")),           // 61s after l1 -> out
      (13L, ts("2026-01-01 10:02:00"))            // == l2.ts -> in (inclusive)
    ).toDF("id", "ts")
    val out = TemporalJoins.rangeJoin(l, r, "ts", 60000000L, "id", "id")
      .select("l_id", "r_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(out == Set((1L, 10L), (1L, 11L), (2L, 13L)))
  }

  test("rangeCount == rangeJoin + groupBy count on a random dense " +
      "corpus (sweep vs enumeration)") {
    // dense timestamps with ties and bucket-boundary values: window =
    // 1000us over a 20000us span, ts multiples of 250 force probes and
    // points to collide exactly on bucket edges
    val df = TestSpark.spark.range(400)
      .selectExpr("id",
        "timestamp_micros(cast(floor(rand(47) * 80) as long) * 250) " +
          "as ts")
      .localCheckpoint(true) // freeze the rand() draw for both sides
    val sweep = TemporalJoins.rangeCount(df, df, "ts", 1000L, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val enum_ = TemporalJoins.rangeJoin(df, df, "ts", 1000L, "id", "id")
      .groupBy("l_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sweep.size == 400) // self-inclusive: every event counted
    assert(sweep == enum_)
  }

  test("rangeJoin == brute-force cross filter on a random corpus") {
    // the ground-truth formulation with NO bucket arithmetic anywhere:
    // since round 6 the q39/q76 DuckDB oracles reuse the bucket
    // decomposition for hash-join speed, so this spec is the
    // independent check that the decomposition equals the bare
    // predicate (boundary ties included — ts multiples of 250 with a
    // 1000us window land probes exactly on bucket edges)
    val df = TestSpark.spark.range(300)
      .selectExpr("id",
        "timestamp_micros(cast(floor(rand(11) * 60) as long) * 250) " +
          "as ts")
      .localCheckpoint(true)
    val viaBuckets = TemporalJoins
      .rangeJoin(df, df, "ts", 1000L, "id", "id")
      .select("l_id", "r_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val l = df.selectExpr("id as l_id",
      "unix_micros(cast(ts as timestamp)) as l_us")
    val r = df.selectExpr("id as r_id",
      "unix_micros(cast(ts as timestamp)) as r_us")
    val brute = l.crossJoin(r)
      .filter(org.apache.spark.sql.functions.expr(
        "r_us >= l_us AND r_us - l_us < 1000"))
      .select("l_id", "r_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(viaBuckets == brute)
  }

  test("rangeCount is exact for pre-1970 (negative epoch) timestamps") {
    // floor vs truncate-toward-zero bucketing diverges only below epoch:
    // with truncation, bucket 0 spans (-w, w) and the low probe
    // overcounts points in [t+w, w). Straddle the epoch densely.
    val df = TestSpark.spark.range(300)
      .selectExpr("id",
        "timestamp_micros((cast(floor(rand(53) * 80) as long) - 40) " +
          "* 250) as ts") // us in [-10000, 10000), multiples of 250
      .localCheckpoint(true)
    val sweep = TemporalJoins.rangeCount(df, df, "ts", 1000L, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val enum_ = TemporalJoins.rangeJoin(df, df, "ts", 1000L, "id", "id")
      .groupBy("l_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sweep.size == 300)
    assert(sweep == enum_)
  }

  test("rangeCount keeps a string id column intact (no silent cast)") {
    val l = Seq(("a", ts("2026-01-01 10:00:30")),
      ("b", ts("2026-01-01 10:02:00"))).toDF("name", "ts")
    val r = Seq(ts("2026-01-01 10:00:59"), ts("2026-01-01 10:01:25"),
      ts("2026-01-01 10:01:31"), ts("2026-01-01 10:02:00"))
      .toDF("ts")
    val out = TemporalJoins.rangeCount(l, r, "ts", 60000000L, "name")
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(out == Map("a" -> 2L, "b" -> 1L))
  }

  test("asOfJoin picks the latest prior row; none -> null match") {
    val left = Seq((100L, 7L, ts("2026-01-01 12:00:00")),
      (101L, 7L, ts("2026-01-01 09:00:00")),
      (102L, 8L, ts("2026-01-01 12:00:00"))).toDF("oid", "k", "ts")
    val right = Seq((1L, 7L, ts("2026-01-01 10:00:00")),
      (2L, 7L, ts("2026-01-01 11:30:00")),
      (3L, 9L, ts("2026-01-01 08:00:00"))).toDF("eid", "k", "ts")
    val out = TemporalJoins.asOfJoin(left, right, "k", "ts", "oid", "eid")
      .collect().map(r => r.getAs[Long]("l_id") ->
        Option(r.getAs[java.lang.Long]("matched"))).toMap
    assert(out(100L).contains(2L))  // latest of the two prior events
    assert(out(101L).isEmpty)       // nothing at or before 09:00
    assert(out(102L).isEmpty)       // key 8 has no right rows
  }

  test("asOfJoin ties on ts resolve to the largest right id") {
    val left = Seq((100L, 7L, ts("2026-01-01 10:00:00"))).toDF("oid", "k", "ts")
    val right = Seq((1L, 7L, ts("2026-01-01 10:00:00")),
      (2L, 7L, ts("2026-01-01 10:00:00"))).toDF("eid", "k", "ts")
    val m = TemporalJoins.asOfJoin(left, right, "k", "ts", "oid", "eid")
      .collect().head.getAs[Long]("matched")
    assert(m == 2L) // equal ts counts (<=); deterministic max id wins
  }
}
