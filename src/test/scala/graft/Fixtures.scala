package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import graft.schema.{CodeImplementation, Observation, TestSpec}

/** FIXTURES.md §A4/§A5: minimal synthetic olake-domain fixtures.
  * A4: 3 implementations (i1, i2 behaviorally identical; i3 divergent at
  * step 1 of t2), 2 tests × 2 steps, 1 run → 12 observation rows.
  */
object Fixtures {
  import TestSpark.spark.implicits._

  private val ts = Timestamp.valueOf("2026-01-01 00:00:00")

  private def obs(impl: String, test: String, step: Int, out: String,
      oracle: Boolean = false): Observation =
    Observation("HumanEval", "p1", impl, test, "", "", "run1", "env1", step,
      Some("op()"), Some("1,2"), Some(out), Some(1.5), None, None,
      Some(ts), None, None, None, Some(oracle))

  /** i1 ≡ i2; i3 diverges at (t2, step 1). */
  def observations: DataFrame = Seq(
    obs("i1", "t1", 0, "a"), obs("i1", "t1", 1, "b"),
    obs("i1", "t2", 0, "c"), obs("i1", "t2", 1, "d"),
    obs("i2", "t1", 0, "a"), obs("i2", "t1", 1, "b"),
    obs("i2", "t2", 0, "c"), obs("i2", "t2", 1, "d"),
    obs("i3", "t1", 0, "a"), obs("i3", "t1", 1, "b"),
    obs("i3", "t2", 0, "c"), obs("i3", "t2", 1, "X")).toDF()

  def code: DataFrame = Seq(
    CodeImplementation("HumanEval", "p1", "i1", "class A {}", Some("h1"),
      Some(ts), Some(1), None, Some("java")),
    CodeImplementation("HumanEval", "p1", "i2", "class B {}", Some("h2"),
      Some(ts), Some(1), None, Some("java")),
    CodeImplementation("HumanEval", "p1", "i3", "class C {}", Some("h3"),
      Some(ts), Some(1), None, Some("java"))).toDF()

  def tests: DataFrame = Seq(
    TestSpec("HumanEval", "p1", "t1", """{"cells":{}}""", "IFace",
      Some("th1"), Some(ts), Some("java")),
    TestSpec("HumanEval", "p1", "t2", """{"cells":{}}""", "IFace",
      Some("th2"), Some(ts), Some("java"))).toDF()

  /** A5: raw wide arena export — includes a Y = -1 metadata row, an
    * oracle row, and multi-X input cells to exercise ordered STRING_AGG. */
  def rawArena: DataFrame = {
    // (EXECUTIONID, ABSTRACTIONID, SYSTEMID, VARIANTID, ADAPTERID,
    //  SHEETID, ARENAID, X, Y, TYPE, VALUE, EXECUTIONTIME)
    val rows = Seq(
      // implementation metadata row (interface source)
      ("e1", "p1", "sysA", "", "0", "t1", "a1", 0, -1, "interface",
        "class A {}", 0.0),
      // oracle metadata row — excluded from code dimension
      ("e1", "p1", "oracle", "", "0", "t1", "a1", 0, -1, "interface",
        "class O {}", 0.0),
      // step 0 of t1 on sysA: op + two input cells (X order 2 then 1) +
      // output value
      ("e1", "p1", "sysA", "", "0", "t1", "a1", 0, 0, "op", "create", 1.0),
      ("e1", "p1", "sysA", "", "0", "t1", "a1", 2, 0, "input_value", "7", 1.0),
      ("e1", "p1", "sysA", "", "0", "t1", "a1", 1, 0, "input_value", "3", 1.0),
      ("e1", "p1", "sysA", "", "0", "t1", "a1", 3, 0, "value", "10", 2.0),
      // second output cell on step 0 (X=4): exercises the ordered
      // STRING_AGG output column (arena.py:87-90)
      ("e1", "p1", "sysA", "", "0", "t1", "a1", 4, 0, "value", "11", 2.0),
      // step 1: single output
      ("e1", "p1", "sysA", "", "0", "t1", "a1", 0, 1, "value", "[]", 3.0),
      // oracle execution rows — excluded at ingest (arena.py:103)
      ("e1", "p1", "oracle", "", "0", "t1", "a1", 0, 0, "value", "10", 1.0),
      // test-specification metadata rows (abstraction pseudo-system):
      // t1 has sheet source + interface; t2 interface only (dropped)
      ("e1", "p1", "abstraction", "", "0", "t1", "a1", 0, -1,
        "stimulussheet", """{"cells":{"A1":"create"}}""", 0.0),
      ("e1", "p1", "abstraction", "", "0", "t1", "a1", 0, -1, "interface",
        "IFace", 0.0),
      ("e1", "p1", "abstraction", "", "0", "t2", "a1", 0, -1, "interface",
        "IFace2", 0.0))
    rows.toDF("EXECUTIONID", "ABSTRACTIONID", "SYSTEMID", "VARIANTID",
      "ADAPTERID", "SHEETID", "ARENAID", "X", "Y", "TYPE", "VALUE",
      "EXECUTIONTIME")
  }
}
