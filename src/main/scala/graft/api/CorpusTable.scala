package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.operators.DedupGroups
import graft.sources.CorpusStore

/** The corpus-side facade, mirroring [[CandleTable]] for the
  * training-data surface: one object that chains the pipeline a corpus
  * owner actually runs, as composable lazy DataFrames.
  *
  * {{{
  * CorpusTable(docs)
  *   .redacted                                  // PII masking
  *   .dedupedExact                              // hash keepers
  *   .withoutNearDups()                         // minhash+LSH -> CC keepers
  *   .spanDeduped(blockTokens = 20, minDocs = 2) // boilerplate blocks
  *   .gated(minTokens = 10)                     // quality floor
  *   .split(Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
  *   .write("/corpus/v2", Seq("split"), maxRecordsPerFile = 1000000)
  * }}}
  *
  * Every step returns a lazy plan; the terminal `write` partitions via
  * [[CorpusStore]]. Non-text columns ride along untouched.
  */
final class CorpusTable private (
    val df: DataFrame,
    val idCol: String,
    val textCol: String
) {

  private def rewrap(d: DataFrame): CorpusTable = new CorpusTable(d, idCol, textCol)

  /** Mask emails and long digit runs in the text column. */
  def redacted: CorpusTable = rewrap(
    df.withColumn(textCol, TextOps.redactPii(col(textCol))))

  /** Weight-proportional deterministic Bernoulli sample — keep each
    * row with probability min(1, rate * weight / weightScale); pure
    * filter, nested in `rate`.
    */
  def sampledByWeight(weightCol: String, weightScale: Long, rate: Double): CorpusTable =
    rewrap(TextOps.weightedSample(df, idCol, col(weightCol), weightScale, rate))

  /** Keep one document per exact content hash (min id wins). */
  def dedupedExact: CorpusTable = rewrap(
    df.join(
      TextOps.exactDedupGroups(df, idCol, textCol)
        .select(col("keeper_id").as(idCol)),
      Seq(idCol)))

  /** Keep one document per near-duplicate group: MinHash+LSH candidate
    * pairs resolved to keepers by connected components.
    */
  def withoutNearDups(
      bands: Int = 4,
      rowsPerBand: Int = 2,
      shingleSize: Int = 3
  ): CorpusTable = {
    // star edges, not pair cliques: identical components, linear
    // edge volume (see TextOps.minhashStarFromBanded)
    val pairs = TextOps.minhashStarEdges(df, idCol, textCol,
      bands, rowsPerBand, shingleSize)
    val keepers = DedupGroups.resolveKeepers(df, idCol, pairs)
      .filter(col("is_keeper"))
      .select(col("doc_id").as(idCol))
    rewrap(df.join(keepers, Seq(idCol)))
  }

  /** Strip cross-document duplicated token blocks; documents that were
    * entirely boilerplate drop out.
    */
  def spanDeduped(blockTokens: Int, minDocs: Long): CorpusTable = {
    val cleaned = TextOps.spanDedup(df, idCol, textCol, blockTokens, minDocs)
      .select(col("doc_id").as(idCol), col("text_clean"))
    rewrap(
      df.join(cleaned, Seq(idCol))
        .withColumn(textCol, col("text_clean"))
        .drop("text_clean"))
  }

  /** Quality floor: at least `minTokens` whitespace tokens. */
  def gated(minTokens: Int): CorpusTable = rewrap(
    df.filter(size(org.apache.spark.sql.functions.split(
      trim(col(textCol)), "\\s+")) >= minTokens))

  /** Gopher-style signal gates plus the compressibility floor, all
    * row-local projections (one codegen'd char scan + one deflate per
    * doc — no shuffle): drop docs that are mostly symbols, mostly
    * bullet/ellipsis lines, or compress below `minCompressRatio`
    * (near-pure repetition).
    */
  def gatedQuality(
      maxSymbolWordRatio: Double = 0.1,
      maxBulletLineFrac: Double = 0.9,
      minCompressRatio: Double = 0.05
  ): CorpusTable = {
    val sig = graft.functions.TextSignals.text_signals(col(textCol))
    rewrap(
      df.withColumn("__sig", sig)
        .withColumn("__cr", graft.functions.CompressRatio.compress_ratio(col(textCol)))
        .filter(
          (col("__sig.symbol_word_ratio").isNull ||
            col("__sig.symbol_word_ratio") <= maxSymbolWordRatio) &&
          (col("__sig.bullet_line_frac").isNull ||
            col("__sig.bullet_line_frac") <= maxBulletLineFrac) &&
          col("__cr") >= minCompressRatio)
        .drop("__sig", "__cr"))
  }

  /** Deterministic id-hash split assignment as a `split` column. */
  def split(weights: Seq[(String, Double)]): CorpusTable = rewrap(
    df.withColumn("split", TextOps.splitAssign(col(idCol), weights)))

  /** Per-stratum deterministic rate sampling. */
  def sampled(
      strataCol: String,
      rates: Seq[(String, Double)],
      defaultRate: Double
  ): CorpusTable = rewrap(
    TextOps.stratifiedSample(df, idCol, strataCol, rates, defaultRate))

  /** Sampled at the rates that hit `budgetTokens` under the requested
    * per-stratum weights — [[TextOps.sourceMixRates]] composed with
    * [[sampled]]. The rate table is #strata rows, collected once and
    * folded into the deterministic id-hash filter.
    */
  def sampledToBudget(
      strataCol: String,
      weights: Seq[(String, Double)],
      defaultWeight: Double,
      budgetTokens: Long
  ): CorpusTable = {
    val rates = TextOps.sourceMixRates(df, idCol, textCol, strataCol,
        weights, defaultWeight, budgetTokens)
      .select(col("source").as(strataCol), col("rate"))
    // same 16-bit id-hash cutoff as stratifiedSample, but the rate
    // arrives by broadcast join instead of literals — stays one lazy
    // plan, works for unbounded strata, no driver round-trip
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("int")
    rewrap(
      df.join(broadcast(rates), Seq(strataCol))
        .filter(bucket < (col("rate") * 65536).cast("int"))
        .drop("rate"))
  }

  /** Out-of-vocabulary rate per document (joined on, as `oov_rate` /
    * `n_oov` columns) against the corpus's deterministic top-k vocab.
    */
  def withOovRate(vocabSize: Int): CorpusTable = rewrap(
    df.join(
      TextOps.oovRate(df, idCol, textCol, vocabSize)
        .select(col("doc_id").as(idCol), col("n_oov"), col("oov_rate")),
      Seq(idCol)))

  /** Training-window packing columns (`tok_start`, `win_first`,
    * `win_last`) for a `capacity`-token context, packed per
    * `groupCol` shard in id order.
    */
  def packed(groupCol: String, capacity: Long): CorpusTable = rewrap(
    df.join(
      TextOps.packSequences(df, idCol, textCol, groupCol, capacity)
        .select(col("doc_id").as(idCol), col("tok_start"),
          col("win_first"), col("win_last")),
      Seq(idCol)))

  /** Materialize partitioned with bounded shards. */
  def write(path: String, partitionCols: Seq[String], maxRecordsPerFile: Long): Unit =
    CorpusStore.write(df, path, partitionCols, maxRecordsPerFile)

  /** Per-doc token-rarity (surprisal-proxy) quality signal. */
  def rarityScores: DataFrame = TextOps.rarityScore(df, idCol, textCol)

  /** Dataset-card summary per (source, lang). */
  def card: DataFrame = TextOps.corpusCard(df, textCol)

  /** Top distinctive terms per cluster of a (doc_id, cluster) frame. */
  def clusterTopics(clusters: DataFrame, k: Int = 5): DataFrame =
    TextOps.clusterTopTerms(df, clusters, idCol, textCol, k)

  /** Per-doc fraction of shingles first contributed by that doc. */
  def noveltyScores(shingleSize: Int = 3): DataFrame =
    TextOps.ngramNovelty(df, idCol, textCol, shingleSize)

  /** Per-doc mean corpus-conditional bigram probability (milli). */
  def fluencyScores: DataFrame = TextOps.bigramFluency(df, idCol, textCol)
}

object CorpusTable {
  def apply(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): CorpusTable =
    new CorpusTable(df, idCol, textCol)

  def fromParquet(spark: SparkSession, path: String): CorpusTable =
    apply(spark.read.parquet(path))
}
