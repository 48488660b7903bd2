package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the scalar_try_suite bad_cast gate: the validity regexp in
  * front of `try_cast(s AS INT)` must be a NECESSARY condition for
  * ANSI string→int acceptance, so gating changes nothing but the cost
  * (the per-row throw/catch try_cast pays on failing input — measured
  * ~3.3 s of the query's 3.6 s at sf0.1 before the gate).
  *
  * The corpus covers the acceptance grammar's edges: ≤0x20
  * control/space padding and 0x7F DEL (accepted — UTF8String's
  * numeric parse trims bytes via isWhitespaceOrISOControl, which
  * includes DEL; ADVICE r15),
  * NBSP and unicode/fullwidth/arabic digits (rejected), fractions and
  * scientific notation (rejected by integral casts), INT min/max and
  * one-past overflow, bare signs, empty/blank, embedded text, NULL.
  */
class TryCastGateSpec extends SparkSpec {

  private val gateRe = "^[\\x00-\\x20\\x7F]*[+-]?[0-9]+[\\x00-\\x20\\x7F]*$"

  test("gated try_cast equals raw try_cast on the adversarial corpus") {
    val tricky = Seq(
      " 12 ", "+3", "-0", "007", "1.5", "1.", ".5", "1e2",
      "2147483647", "2147483648", "-2147483648", "-2147483649",
      "", " ", "--1", "++1", "+-1", "12abc", "abc12", "1_000",
      "\t42\n", "\u000b7\u000c", "\u001f42", "\u00a042",
      "\u007f42", "42\u007f", "\u007f", "\u008042",
      "0x1A", "9999999999999999999999", "+", "-", "1-URGENT",
      "٣٤", "４２", null.asInstanceOf[String])
    val df = spark.createDataFrame(tricky.map(Tuple1(_))).toDF("s")
    val rows = df.select(
        col("s"),
        expr("try_cast(s AS INT)").as("ref"),
        when(col("s").rlike(gateRe), expr("try_cast(s AS INT)"))
          .as("gated"))
      .collect()
    assert(rows.length === tricky.length)
    rows.foreach { r =>
      val s = Option(r.getString(0)).getOrElse("<null>")
      val ref = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val gated = if (r.isNullAt(2)) None else Some(r.getInt(2))
      assert(ref === gated, s"input ${s.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
    // the corpus must exercise BOTH branches or the pin is vacuous
    assert(rows.exists(!_.isNullAt(1)), "no accepted value in corpus")
    assert(rows.exists(_.isNullAt(1)), "no rejected value in corpus")
  }

  test("the gate regexp matches the fixture's priority strings nowhere") {
    // the production column is all-failing — the gate must short
    // every row (this is the entire point of the gate)
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
      "5-LOW")
    prios.foreach(p => assert(!p.matches(gateRe), p))
  }
}
