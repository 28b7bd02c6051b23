package graft

import org.apache.spark.sql.functions._
import graft.api._

/** The README "Recipes" section, compiled and executed (round-9 verdict
  * item 8): every snippet in the doc is pasted here near-verbatim so the
  * docs cannot rot — if a recipe stops compiling or returning sane rows,
  * this suite goes red before a user hits it.
  */
class RecipesSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.sources.Tables.documents(spark, dir)
    .select(col("doc_id"), col("text"),
      lit("2024-01-01").cast("timestamp").as("ts"))

  test("recipe: dedup a corpus (exact → near-dup clusters → overlap)") {
    val exact = dedup.keepLatest(docs, Seq(col("doc_id")), col("ts"),
      col("doc_id"))
    assert(exact.count() == docs.select("doc_id").distinct().count())

    val clusters = nearDupClusters(docs.limit(200), "doc_id", "text",
      threshold = 0.7)
    val keepOne = clusters.groupBy(col("cluster_id"))
      .agg(min(col("doc_id")).as("doc_id"))
    assert(keepOne.count() <= 200)

    val overlap = crossDocOverlap(docs.limit(100), "doc_id", "text", k = 13)
    assert(overlap.columns.toSeq ==
      Seq("doc_id", "n_windows", "n_shared_windows"))
    assert(overlap.count() > 0)
  }

  test("recipe: build an ANN index once, probe many (SRP + IVF)") {
    val corpus = graft.sources.Tables.embeddings(spark, dir)
    val queries = corpus.where(col("vec_id") < 5)
    val path = java.nio.file.Files
      .createTempDirectory("recipe_srp").toString
    annIndex.invalidate(path)
    var builds = 0
    annIndex.ensureBuilt(path) {
      builds += 1
      annIndex.buildSrp(corpus, "vec_id", "embedding",
        planes = 8, dim = 64, path = path)
    }
    annIndex.ensureBuilt(path) { builds += 1 } // second ensure: no-op
    assert(builds == 1, "ensureBuilt must build exactly once per JVM")

    val index = annIndex.readIndex(spark, path)
    assert(index.schema("bucket").dataType ==
      org.apache.spark.sql.types.LongType)
    val nn = annIndex.probeSrp(index, queries, "vec_id", "embedding",
      k = 10, planes = 8, dim = 64)
    assert(nn.count() > 0)
    assert(nn.groupBy("q_id").count().agg(max("count")).as[Long].head <= 10)

    val ivfPath = java.nio.file.Files
      .createTempDirectory("recipe_ivf").toString
    annIndex.buildIvf(corpus, "vec_id", "embedding", numCells = 8,
      path = ivfPath)
    val nn2 = annIndex.probeIvf(spark, ivfPath, queries,
      "vec_id", "embedding", k = 5)
    assert(nn2.count() > 0)
  }

  test("recipe: train the quantizer / grow the index (trained IVF + appends)") {
    val corpus = graft.sources.Tables.embeddings(spark, dir)
    val ivf = java.nio.file.Files
      .createTempDirectory("recipe_ivftr").toString + "/ivf"
    annIndex.buildIvfTrained(corpus.where(col("vec_id") < 400),
      "vec_id", "embedding", numCells = 8, rounds = 2, path = ivf)
    annIndex.appendIvf(spark, ivf, corpus.where(col("vec_id") >= 400),
      "vec_id", "embedding", dim = 64, stagePath = ivf + "_stage")
    assert(annIndex.readIndex(spark, s"$ivf/cells").count() == corpus.count())
    val nn = annIndex.probeIvf(spark, ivf, corpus.where(col("vec_id") < 5),
      "vec_id", "embedding", k = 3, nprobe = 2)
    assert(nn.count() > 0)

    val srp = java.nio.file.Files
      .createTempDirectory("recipe_srpinc").toString + "/srp"
    annIndex.buildSrp(corpus.where(col("vec_id") < 400),
      "vec_id", "embedding", planes = 8, dim = 64, path = srp)
    annIndex.appendSrp(spark, srp, corpus.where(col("vec_id") >= 400),
      "vec_id", "embedding", planes = 8, dim = 64, stagePath = srp + "_stage")
    assert(annIndex.readIndex(spark, srp).count() == corpus.count())
  }

  test("recipe: changed vectors are update = deleteIds + append") {
    val corpus = graft.sources.Tables.embeddings(spark, dir)
    val srp = java.nio.file.Files
      .createTempDirectory("recipe_srpdel").toString + "/srp"
    annIndex.buildSrp(corpus, "vec_id", "embedding",
      planes = 8, dim = 64, path = srp)
    val stale = corpus.where(col("vec_id") < 10)
    annIndex.deleteIds(spark, srp, stale.select(col("vec_id")), "vec_id",
      stagePath = srp + "_delstage")
    assert(annIndex.readIndex(spark, srp).count() == corpus.count() - 10)
    annIndex.appendSrp(spark, srp,
      stale.select(col("vec_id"), reverse(col("embedding")).as("embedding")),
      "vec_id", "embedding", planes = 8, dim = 64, stagePath = srp + "_stage")
    val after = annIndex.readIndex(spark, srp)
    assert(after.count() == corpus.count())
    assert(after.groupBy(col("id")).count().where(col("count") > 1).count() == 0)
  }

  test("recipe: probe scan is dynamic-partition-prunable (layout check)") {
    // the build wrote one directory per bucket — the layout that makes
    // the probe's partition-column join prunable at all
    val path = java.nio.file.Files
      .createTempDirectory("recipe_srp_layout").toString
    annIndex.buildSrp(graft.sources.Tables.embeddings(spark, dir),
      "vec_id", "embedding", planes = 4, dim = 64, path = path)
    val dirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
    assert(dirs.nonEmpty && dirs.length <= 16,
      s"expected <=2^4 bucket dirs, got ${dirs.length}")
    // and the probe's index scan is DYNAMIC-PARTITION-PRUNED on that
    // column — the property that makes probe cost corpus/2^planes
    // instead of corpus (PlanAudit shows the same expression at sf0.01)
    val index = annIndex.readIndex(spark, path)
    val q = graft.sources.Tables.embeddings(spark, dir)
      .where(col("vec_id") < 5)
    val plan = annIndex.probeSrp(index, q, "vec_id", "embedding",
      k = 3, planes = 4, dim = 64).queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      "probe scan must carry a dynamic partition pruning filter on bucket")
  }

  test("recipe: run the reference pipeline by model name") {
    val pipeline = graft.plans.ModelCatalog(spark, dir)
    val fct = pipeline.build("fct_orders")
    assert(fct.count() > 0)
  }

  test("recipe: incremental merge with lookback") {
    val existing = Seq((1L, "2024-01-01", "old"), (2L, "2024-01-02", "keep"))
      .toDF("order_id", "order_date", "v")
      .withColumn("order_date", col("order_date").cast("date"))
    val fresh = Seq((1L, "2024-01-05", "new"), (3L, "2023-01-01", "stale"))
      .toDF("order_id", "order_date", "v")
      .withColumn("order_date", col("order_date").cast("date"))
    val merged = incremental.mergeWithLookback(existing, fresh,
      keys = Seq("order_id"),
      lookbackPredicate = col("order_date") >= lit("2024-01-01").cast("date"))
    val byKey = merged.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(byKey == Map(1L -> "new", 2L -> "keep")) // stale row filtered
  }

  test("recipe: per-key sequential recurrence via sortedFold") {
    val flows = Seq((1L, 1L, 10L), (1L, 2L, 20L), (2L, 1L, 5L))
      .toDF("user_id", "ts", "v")
    val folded = flows.repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts"))
      .as[(Long, Long, Long)]
      .mapPartitions { rows =>
        sortedFold.foldGroups(rows, (r: (Long, Long, Long)) => r._1) {
          (user, g) => (user, g.map(_._3).sum)
        }
      }
      .collect().toMap
    assert(folded == Map(1L -> 30L, 2L -> 5L))
  }
}
