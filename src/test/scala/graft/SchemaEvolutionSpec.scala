package graft

import graft.operators.IncrementalMerge
import graft.sources.SchemaEvolution

class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private val existing = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
  private val incoming = Seq((2L, "b2", 10), (3L, "c", 20)).toDF("k", "v", "extra")

  test("appendNewColumns: target grows, old rows null-filled, merge works") {
    val (e, i) = SchemaEvolution.appendNewColumns(existing, incoming)
    assert(e.columns.toSeq === Seq("k", "v", "extra"))
    assert(e.schema("extra").dataType === i.schema("extra").dataType)
    val merged = IncrementalMerge.merge(e, i, Seq("k")).orderBy("k").collect()
    assert(merged.map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) -1 else r.getInt(2))).toSeq ===
      Seq((1L, "a", -1), (2L, "b2", 10), (3L, "c", 20)))
  }

  test("appendNewColumns: columns dropped by the batch survive null-filled") {
    val slim = Seq((5L, 7)).toDF("k", "extra")
    val (e, i) = SchemaEvolution.appendNewColumns(existing, slim)
    assert(i.columns.toSeq === Seq("k", "v", "extra"))
    val r = i.head
    assert(r.isNullAt(1) && r.getInt(2) === 7)
  }

  test("syncAllColumns: incoming schema wins, dropped column disappears") {
    val slim = Seq((5L, 7)).toDF("k", "extra")
    val (e, i) = SchemaEvolution.syncAllColumns(existing, slim)
    assert(e.columns.toSeq === Seq("k", "extra") && i.columns.toSeq === Seq("k", "extra"))
    assert(e.orderBy("k").head.isNullAt(1)) // existing has no 'extra' → null
  }
}
