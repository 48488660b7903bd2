package graft.protocol

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Codec behaviors replicated from `lib/util.js:223-246` (parse) and
  * `:188-206` (serialize): malformed frames → null op (the reference
  * returns `false`); JSON detection on leading '{'/'['; `_q` surfaced
  * as seq.
  */
class FramesSpec extends SparkSpec {
  import spark.implicits._

  private def parse(raws: String*): Array[Row] =
    raws.toDF("raw")
      .select(Frames.parseFrame(col("raw")).as("p"))
      .select("p.op", "p.seq", "p.channel", "p.message", "p.payload")
      .collect()

  test("well-formed JSON frame parses fully") {
    val Array(r) = parse("""M|{"c":"news","m":"hi","s":"node-1","_q":7}""")
    assert(r.getString(0) == "M")
    assert(r.getInt(1) == 7)
    assert(r.getString(2) == "news")
    assert(r.getString(3) == "hi")
  }

  test("malformed frames yield null op (reference returns false)") {
    // no pipe; empty; pipe-first (empty opcode)
    for (raw <- Seq("no-pipe-here", "", "|{\"c\":1}")) {
      val Array(r) = parse(raw)
      assert(r.isNullAt(0), s"op should be null for frame: '$raw'")
    }
  }

  test("non-JSON payload stays opaque (no struct fields)") {
    val Array(r) = parse("M|just a string")
    assert(r.getString(0) == "M")
    assert(r.isNullAt(2)) // channel null — payload not JSON
    assert(r.getString(4) == "just a string")
  }

  test("bad JSON payload → null envelope fields (PERMISSIVE mode)") {
    val Array(r) = parse("""M|{"c":unterminated""")
    assert(r.getString(0) == "M")
    assert(r.isNullAt(2))
  }

  test("serialize → parse round-trips including seq injection") {
    val df = Seq(("news", "hello world", "node-2", 42))
      .toDF("channel", "message", "sender", "seqno")
    val framed = df.select(Frames.serializeFrame(
      lit("M"), col("channel"), col("message"), col("sender"),
      col("seqno")).as("frame"))
    val Array(r) = framed
      .select(Frames.parseFrame(col("frame")).as("p"))
      .select("p.op", "p.seq", "p.channel", "p.message", "p.sender")
      .collect()
    assert(r.getString(0) == "M" && r.getInt(1) == 42 &&
      r.getString(2) == "news" && r.getString(3) == "hello world" &&
      r.getString(4) == "node-2")
  }

  test("payload containing a pipe splits only at the FIRST pipe") {
    val Array(r) = parse("M|left|right")
    assert(r.getString(0) == "M")
    assert(r.getString(4) == "left|right")
  }
}
