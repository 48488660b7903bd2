package graft

import org.apache.spark.sql.functions._

/** Schema evolution — the data-lake reality a 100 TB table accretes:
  * yesterday's files lack columns today's writer adds. Covers the two
  * mechanisms a reader/composer needs: parquet mergeSchema reads over
  * heterogeneous file generations (old rows null-fill new columns,
  * column order irrelevant), and unionByName(allowMissingColumns) for
  * composing frames across generations — plus the pruning check that a
  * query naming only v1 columns still reads merged data correctly.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_evo").toString
    // generation 1: (id, val); generation 2 adds quality + reorders
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "val")
      .repartition(1).write.parquet(s"$d/t/gen=1")
    Seq((0.9, 3L, 30.0), (0.1, 4L, 40.0)).toDF("quality", "id", "val")
      .repartition(1).write.parquet(s"$d/t/gen=2")
    d
  }

  test("mergeSchema read unifies generations; old rows null-fill") {
    val t = spark.read.option("mergeSchema", "true").parquet(s"$dir/t")
    assert(t.columns.toSet === Set("id", "val", "quality", "gen"))
    val rows = t.orderBy("id")
      .select("id", "val", "quality").collect()
    assert(rows.length === 4)
    assert(rows(0).isNullAt(2) && rows(1).isNullAt(2),
      "gen-1 rows must null-fill the new column")
    assert(rows(2).getDouble(2) === 0.9)
    // aggregates treat missing as NULL (skipped by avg), not zero
    val avgQ = t.agg(avg("quality")).collect()(0).getDouble(0)
    assert(math.abs(avgQ - 0.5) < 1e-12)
  }

  test("a v1-column query over merged data is unaffected by evolution") {
    val t = spark.read.option("mergeSchema", "true").parquet(s"$dir/t")
    val sum = t.agg(org.apache.spark.sql.functions.sum("val"))
      .collect()(0).getDouble(0)
    assert(sum === 100.0)
  }

  test("unionByName with allowMissingColumns composes generations") {
    val g1 = Seq((1L, 10.0)).toDF("id", "val")
    val g2 = Seq((0.9, 3L, 30.0)).toDF("quality", "id", "val")
    val u = g1.unionByName(g2, allowMissingColumns = true)
    assert(u.columns.toSet === Set("id", "val", "quality"))
    val byId = u.collect().map(r => r.getLong(u.columns.indexOf("id")) -> r).toMap
    assert(byId(1L).isNullAt(u.columns.indexOf("quality")))
    assert(byId(3L).getDouble(u.columns.indexOf("quality")) === 0.9)
    // positional union of reordered columns must be refused, not mangled
    intercept[org.apache.spark.sql.AnalysisException] {
      g1.union(g2).collect()
    }
  }
}
