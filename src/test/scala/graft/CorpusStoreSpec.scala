package graft

import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.sources.CorpusStore

/** Corpus materialization: partition layout, shard-size bounds, and
  * partition pruning on read.
  */
class CorpusStoreSpec extends SparkSpec {
  import spark.implicits._

  test("write lays out split/lang partitions, bounds shards, prunes on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus").toString
    val docs = (0L until 400L).map(i => (i, s"doc $i text", if (i % 4 == 0) "de" else "en"))
      .toDF("doc_id", "text", "lang")
      .withColumn("split",
        TextOps.splitAssign(col("doc_id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))

    CorpusStore.write(docs, dir, Seq("split", "lang"), maxRecordsPerFile = 50L)

    // layout: split=?/lang=? directories exist for the populated combos
    val root = new java.io.File(dir)
    val splits = root.listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(splits.contains("split=train") && splits.contains("split=val"))
    val trainLangs = new java.io.File(dir, "split=train")
      .listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(trainLangs == Set("lang=en", "lang=de"))

    // shard bound: no file holds more than maxRecordsPerFile rows —
    // train/en has ~240 docs, so at least 5 files
    val trainEn = new java.io.File(s"$dir/split=train/lang=en")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(trainEn >= 5, s"expected >=5 bounded shards, got $trainEn")

    // read back: complete and partition-pruned
    val back = CorpusStore.read(spark, dir)
    assert(back.count() == 400)
    val pruned = back.filter($"split" === "train" && $"lang" === "de")
    val plan = pruned.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters: [isnotnull(split"), plan.take(2000))
    assert(pruned.count() ==
      docs.filter($"split" === "train" && $"lang" === "de").count())

    // manifest counts match the source grouping
    val m = CorpusStore.manifest(spark, dir, Seq("split", "lang"))
      .as[(String, String, Long)].collect().toSet
    val want = docs.groupBy($"split", $"lang").agg(count(lit(1)))
      .as[(String, String, Long)].collect().toSet
    assert(m == want)
  }

  test("pipeline-to-store round trip: dedup + gates + split land partitioned and complete") {
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_e2e").toString
    // small corpus with planted dups and junk the pipeline must drop
    val raw = (
      (0L until 60L).map(i => (i, s"unique document number $i with several words", "en")) ++
      Seq((100L, "copy copy copy", "en"), (101L, "copy copy copy", "en"), // exact dups
          (102L, "", "en"))                                              // empty -> gated
    ).toDF("doc_id", "text", "lang")

    val keepers = TextOps.exactDedupGroups(raw, "doc_id", "text")
      .select(col("keeper_id").as("doc_id"))
    val cleaned = raw
      .join(keepers, Seq("doc_id"))
      .filter(length(trim(col("text"))) > 0)
      .withColumn("split",
        TextOps.splitAssign(col("doc_id"), Seq("train" -> 0.8, "val" -> 0.2)))
    CorpusStore.write(cleaned, dir, Seq("split", "lang"), maxRecordsPerFile = 1000L)

    val back = CorpusStore.read(spark, dir)
    assert(back.count() == 61)                       // 60 uniques + 1 dup keeper
    assert(back.filter($"doc_id" === 101L).count() == 0) // non-keeper gone
    assert(back.filter($"doc_id" === 102L).count() == 0) // empty doc gated
    assert(back.select("split").distinct().count() == 2)
  }
}
